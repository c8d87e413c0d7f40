"""Fuzzy record linkage: blocking + pairwise edit-distance verify.

The fuzzy generalization of the reference's exact-hash record dedup
(Deduper.kt:195-240 — its demo corpus IS address records): instead of
"same MD5 over the hash columns", a match is "same blocking key AND
edit distance ≤ d over the compare column". Classic two-stage
record-linkage shape (Fellegi-Sunter blocking):

  1. block: groupby on a cheap deterministic key (exact column value,
     prefix, phonetic code) — ONE keyed all-to-all of narrow rows;
  2. verify inside each block: all candidate pairs scored with exact
     Levenshtein, fully VECTORIZED ACROSS PAIRS (one DP matrix whose
     leading axis is the pair batch — per character step, O(pairs ×
     maxlen) numpy, no per-pair Python inner loop).

Scale shape: pair volume is quadratic in BLOCK size, not corpus size —
the same bound every LSH bucket in stages/lsh.py lives under; pick
blocking keys so blocks stay worker-sized (``max_block`` guards the
adversarial case by striding, with documented recall loss).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _codepoint_matrix(strings: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Pad strings to a (n, maxlen) uint32 codepoint matrix + lengths.
    Padding is 0xFFFFFFFF (never a valid codepoint, never matches)."""
    n = len(strings)
    lens = np.array([len(s) for s in strings], dtype=np.int64)
    maxlen = int(lens.max()) if n else 0
    mat = np.full((n, maxlen), 0xFFFFFFFF, dtype=np.uint32)
    for i, s in enumerate(strings):
        if s:
            mat[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    return mat, lens


def levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for each (a[i], b[i]) pair — unicode
    CODEPOINT semantics. Equal to DuckDB's ``levenshtein`` on ASCII
    (pinned by test); DuckDB counts UTF-8 BYTE edits on multibyte
    input, where this implementation counts character edits (the
    standard definition) — oracle queries therefore compare ASCII
    columns.

    One DP across ALL pairs at once: the row axis is the pair batch, so
    each of the ``max(len(a))`` character steps is pure vectorized
    numpy. The sequential insertion recurrence along the column axis
    collapses to a running min: cur[j] = j + min_{k ≤ j}(m[k] − k) with
    m = min(substitution, deletion) — one ``np.minimum.accumulate``.
    """
    assert len(a) == len(b)
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    A, la = _codepoint_matrix(list(a))
    B, lb = _codepoint_matrix(list(b))
    maxla, maxlb = A.shape[1], B.shape[1]
    out = np.empty(n, dtype=np.int64)
    cols = np.arange(maxlb + 1, dtype=np.int64)
    prev = np.tile(cols, (n, 1))
    done = la == 0
    out[done] = lb[done]
    for i in range(1, maxla + 1):
        sub = prev[:, :-1] + (A[:, i - 1 : i] != B)  # substitution/match
        dele = prev[:, 1:] + 1  # deletion from a
        m = np.minimum(sub, dele)
        stacked = np.concatenate(
            [np.full((n, 1), i, dtype=np.int64), m], axis=1
        )
        cur = np.minimum.accumulate(stacked - cols, axis=1) + cols
        at = la == i
        if at.any():
            out[at] = cur[at, lb[at]]
        prev = cur
    return out


def fuzzy_block_pairs(
    ds: rd.Dataset,
    *,
    block_col: str,
    compare_col: str,
    id_col: str,
    max_distance: int,
    max_block: int | None = None,
) -> rd.Dataset:
    """All within-block pairs with Levenshtein(compare) ≤ max_distance.

    Returns (id_a, id_b, dist) with id_a < id_b, exactly distinct
    (each pair exists in exactly one block). ``max_block`` strides
    oversized blocks (documented recall loss) — leave None for exact
    semantics on well-chosen blocking keys.
    """

    def _pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids = ids[order]
        col = group[compare_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = [
            s or ""
            for s in col.take(pa.array(order, type=pa.int64())).to_pylist()
        ]
        n = ids.size
        if max_block is not None and n > max_block:
            ids, texts, n = ids[:max_block], texts[:max_block], max_block
        if n < 2:
            return _empty()
        ia, ib = np.triu_indices(n, k=1)
        d = levenshtein_batch(
            [texts[i] for i in ia], [texts[j] for j in ib]
        )
        keep = d <= max_distance
        if not keep.any():
            return _empty()
        return pa.table(
            {
                "id_a": pa.array(ids[ia[keep]], type=pa.int64()),
                "id_b": pa.array(ids[ib[keep]], type=pa.int64()),
                "dist": pa.array(d[keep], type=pa.int64()),
            }
        )

    narrow = ds.map_batches(
        lambda t: t.select([block_col, compare_col, id_col]),
        batch_format="pyarrow",
    )
    return narrow.groupby(block_col).map_groups(
        _pairs, batch_format="pyarrow"
    )


def _empty() -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "dist": pa.array([], type=pa.int64()),
        }
    )
