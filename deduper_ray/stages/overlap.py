"""Corpus-wide exact substring overlap (winnowing fingerprints).

Finds every document pair sharing an exact byte substring of length ≥
``min_len`` — the "find all exact overlaps corpus-wide" operator the
per-pair suffix-array probe (functions/suffix.py) answers only for
already-known pairs (VERDICT r3 missing #3). The reference engine has
no equivalent; this generalizes its exact MD5 whole-row identity
(Deduper.kt:201) to exact PARTIAL-content identity.

Algorithm (public: Schleimer, Wilkerson, Aiken — "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003; PAPERS.md):

  1. per doc, rolling 64-bit hashes of all ``min_len``-byte grams
     (the stages/minhash.py shingle scheme — k shifted multiply-adds,
     no per-gram Python);
  2. winnowing: per sliding window of ``window`` consecutive gram
     hashes, keep the MINIMUM — any common substring of length
     ≥ min_len + window − 1 is guaranteed to share an anchor, and the
     anchor density is O(2/window) per byte. ``window=1`` keeps every
     gram (exact at min_len — the oracle configuration);
  3. (anchor, doc_id) narrow rows → ONE 16 B/row sort → the
     stages/lsh.py run scan (same bucket cap + boundary-fragment
     stitching) → candidate pairs;
  4. pairs are exact up to 64-bit rolling-hash collisions
     (P ≈ n_grams²/2^65 — negligible at any realistic scale; pass the
     pairs to functions/suffix.py common-substring probes when
     cryptographic certainty is required).

Scale shape: content is touched ONCE in a stateless map stage; the
all-to-all moves only (int64, int64) anchor rows, and anchor volume is
corpus_bytes × 2/window — window is the knob that trades recall
threshold (min_len + window − 1) against shuffle volume at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from deduper_ray.stages.minhash import _rolling_hashes


def gram_hashes(data: bytes | memoryview, k: int) -> np.ndarray:
    """Position-ordered rolling hashes of all k-byte grams (NOT
    deduplicated — winnowing needs the positional sequence). Binary-
    doubling combine (minhash._rolling_hashes): ~log2(k) passes, which
    matters here because min_len is typically 32+ (5 passes vs 32),
    bit-identical to the k-pass Horner form."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    if b.size < k:
        return np.empty(0, dtype=np.uint64)
    return _rolling_hashes(b, k)


def winnow(hashes: np.ndarray, window: int) -> np.ndarray:
    """Unique winnowing anchors: the minimum of every ``window``
    consecutive gram hashes (vectorized sliding-window minimum)."""
    if hashes.size == 0:
        return hashes
    if window <= 1 or hashes.size <= window:
        return np.unique(hashes)
    from numpy.lib.stride_tricks import sliding_window_view

    return np.unique(sliding_window_view(hashes, window).min(axis=1))


class AnchorExploder:
    """map_batches stage: documents → (band_key=anchor, row_id) rows.
    Emits the lsh.py column convention so the candidate machinery
    (sort + run scan + fragment stitch + bucket caps) is reused
    verbatim. Anchors are bit-viewed int64 (Ray sort boxes uint64)."""

    def __init__(
        self,
        *,
        min_len: int = 32,
        window: int = 1,
        text_column: str = "text",
        id_column: str = "doc_id",
    ):
        self.min_len = min_len
        self.window = window
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from deduper_ray.functions.hashing import _utf8_slices

        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        # zero-copy doc bytes off the Arrow value buffer (nulls read as
        # empty slices) — no per-doc str materialization / re-encode
        offsets, buf = _utf8_slices(batch[self.text_column])
        keys: list[np.ndarray] = []
        out_ids: list[np.ndarray] = []
        for i, (a, b) in enumerate(zip(offsets, offsets[1:])):
            anchors = winnow(
                gram_hashes(buf[a:b], self.min_len), self.window
            )
            if anchors.size:
                keys.append(anchors)
                out_ids.append(np.full(anchors.size, ids[i], dtype=np.int64))
        if not keys:
            return pa.table(
                {
                    "band_key": pa.array([], type=pa.int64()),
                    "row_id": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "band_key": pa.array(
                    np.concatenate(keys).view(np.int64), type=pa.int64()
                ),
                "row_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            }
        )


def substring_overlap_pairs(
    ds: rd.Dataset,
    *,
    min_len: int = 32,
    window: int = 1,
    text_column: str = "text",
    id_column: str = "doc_id",
    max_pairs_per_bucket: int = 2000,
) -> tuple[rd.Dataset, int]:
    """All (id_a < id_b) pairs sharing ≥ 1 anchor — i.e. an exact
    common substring of length ≥ min_len (window=1) or guaranteed for
    length ≥ min_len + window − 1 (window>1). Returns (pair Dataset,
    dropped-pair count from capped hot anchors)."""
    from deduper_ray.stages.lsh import (
        _scan_sorted_block,
        candidate_pair_dataset,
    )

    anchors = ds.map_batches(
        AnchorExploder(
            min_len=min_len, window=window,
            text_column=text_column, id_column=id_column,
        ),
        batch_format="pyarrow",
    )
    scanned = anchors.sort("band_key").map_batches(
        lambda t: _scan_sorted_block(t, max_pairs_per_bucket),
        batch_format="pyarrow",
        batch_size=None,
    )
    return candidate_pair_dataset(
        scanned, max_pairs_per_bucket=max_pairs_per_bucket
    )
