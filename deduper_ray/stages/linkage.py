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
import pyarrow.compute as pc
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


def levenshtein_batch(
    a: list[str], b: list[str], *, chunk: int = 32_768
) -> np.ndarray:
    """Exact Levenshtein distance for each (a[i], b[i]) pair — unicode
    CODEPOINT semantics. Equal to DuckDB's ``levenshtein`` on ASCII
    (pinned by test); DuckDB counts UTF-8 BYTE edits on multibyte
    input, where this implementation counts character edits (the
    standard definition) — oracle queries therefore compare ASCII
    columns.

    One DP across a CHUNK of pairs at once: the row axis is the pair
    batch, so each of the ``max(len(a))`` character steps is pure
    vectorized numpy. The sequential insertion recurrence along the
    column axis collapses to a running min: cur[j] = j + min_{k ≤
    j}(m[k] − k) with m = min(substitution, deletion) — one
    ``np.minimum.accumulate``. All DP state lives in two preallocated
    int32 buffers reused across steps, and pairs process in
    cache-sized chunks — the naive all-pairs int64 variant measured
    5× slower at 340k pairs from allocation/bandwidth alone.
    """
    assert len(a) == len(b)
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        out[s:e] = _lev_chunk(a[s:e], b[s:e])
    return out


def _lev_chunk(a: list[str], b: list[str]) -> np.ndarray:
    n = len(a)
    A, la = _codepoint_matrix(list(a))
    B, lb = _codepoint_matrix(list(b))
    maxla, maxlb = A.shape[1], B.shape[1]
    out = np.empty(n, dtype=np.int64)
    cols = np.arange(maxlb + 1, dtype=np.int32)
    prev = np.tile(cols, (n, 1))
    cur = np.empty_like(prev)
    tmp = np.empty((n, maxlb), dtype=np.int32)
    neq = np.empty((n, maxlb), dtype=bool)
    done = la == 0
    out[done] = lb[done]
    for i in range(1, maxla + 1):
        np.not_equal(A[:, i - 1 : i], B, out=neq)
        np.add(prev[:, :-1], neq, out=cur[:, 1:])
        np.add(prev[:, 1:], 1, out=tmp)
        np.minimum(cur[:, 1:], tmp, out=cur[:, 1:])
        cur[:, 0] = i
        cur -= cols
        np.minimum.accumulate(cur, axis=1, out=cur)
        cur += cols
        at = la == i
        if at.any():
            out[at] = cur[at, lb[at]]
        prev, cur = cur, prev
    return out


def jaro_winkler(a: str, b: str) -> float:
    """Jaro-Winkler similarity, DuckDB-parity variant (pinned by test):
    match window ``max(len)//2 - 1``, transpositions ``t//2``, Winkler
    prefix bonus (≤4 chars, p=0.1) applied only when Jaro > 0.7, and
    0.0 when EITHER string is empty (including both — DuckDB's
    convention, not the textbook 1.0).

    Per-pair Python over short strings — a verify-stage metric bounded
    by candidate-pair volume (like the suffix-array containment check),
    not a corpus-scan kernel; use :func:`levenshtein_batch` when the
    metric must be vectorized."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    md = max(max(la, lb) // 2 - 1, 0)
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        lo, hi = max(0, i - md), min(lb, i + md + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    j = (m / la + m / lb + (m - t // 2) / m) / 3
    if j > 0.7:
        prefix = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            prefix += 1
        j += prefix * 0.1 * (1 - j)
    return j


def jaro_winkler_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Jaro-Winkler for each (a[i], b[i]) pair."""
    return np.array(
        [jaro_winkler(x or "", y or "") for x, y in zip(a, b)],
        dtype=np.float64,
    )


def fuzzy_block_pairs(
    ds: rd.Dataset,
    *,
    block_col: str,
    compare_col: str,
    id_col: str,
    max_distance: int | None = None,
    min_similarity: float | None = None,
    max_block: int | None = None,
) -> rd.Dataset:
    """All within-block pairs that pass the string-metric verify:
    Levenshtein(compare) ≤ ``max_distance`` (output column ``dist``,
    int64) or Jaro-Winkler(compare) ≥ ``min_similarity`` (output column
    ``sim``, float64) — exactly one of the two must be given.

    Returns (id_a, id_b, dist|sim) with id_a < id_b, exactly distinct
    (each pair exists in exactly one block). ``max_block`` TRUNCATES an
    oversized block to its first ``max_block`` rows in (block, id)
    order — a deterministic, prefix-biased cap (pairs among higher-id
    rows of a hot block are lost, O(max_block²) work bound per block)
    — leave None for exact semantics on well-chosen blocking keys; use
    sorted-neighborhood (snm_pairs) when hot blocks need bounded work
    WITHOUT a hard cutoff.
    """
    if (max_distance is None) == (min_similarity is None):
        raise ValueError(
            "give exactly one of max_distance / min_similarity"
        )
    use_lev = max_distance is not None

    # bucket by the block key's fingerprint: Python dispatch count is
    # #buckets (not #blocks — blocking keys are corpus-cardinality),
    # and ALL candidate pairs in a bucket verify in ONE batched metric
    # call (the pair-vectorized DP amortizes across blocks)
    import ray as _ray

    from deduper_ray.functions.hashing import fingerprint64

    cpus = int(_ray.cluster_resources().get("CPU", 4))
    num_partitions = max(4, min(128, cpus * 2))

    def _tag(t: pa.Table) -> pa.Table:
        t = t.select([block_col, compare_col, id_col])
        col = t[block_col]
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(
            col.type
        ):
            col = pc.cast(col, pa.string())
        fp = np.asarray(fingerprint64(pc.fill_null(col, "")))
        bucket = (fp % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("_bucket", pa.array(bucket))

    def _pairs(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.select([block_col, compare_col, id_col]).to_pandas()
        df = df.sort_values([block_col, id_col])
        codes, _ = pd.factorize(df[block_col], sort=False)
        ids = df[id_col].to_numpy()
        texts = ["" if s is None else s for s in df[compare_col].tolist()]
        n = ids.size
        change = np.nonzero(codes[1:] != codes[:-1])[0] + 1
        starts = np.concatenate(([0], change)) if n else np.empty(0, int)
        ends = np.concatenate((change, [n])) if n else np.empty(0, int)
        pa_idx: list[np.ndarray] = []
        pb_idx: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            m = e - s
            if max_block is not None and m > max_block:
                e = s + max_block
                m = max_block
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, k=1)
            pa_idx.append(ia + s)
            pb_idx.append(ib + s)
        if not pa_idx:
            return _empty(use_lev)
        ia = np.concatenate(pa_idx)
        ib = np.concatenate(pb_idx)
        if use_lev:
            # exact prefilter: Levenshtein ≥ |len(a) − len(b)|, so
            # pairs with a larger length gap can't pass — skip their
            # DP entirely (pure numpy over the candidate pairs)
            tlens = np.fromiter(
                (len(s) for s in texts), dtype=np.int64, count=len(texts)
            )
            near = np.abs(tlens[ia] - tlens[ib]) <= max_distance
            ia, ib = ia[near], ib[near]
            if ia.size == 0:
                return _empty(use_lev)
        ta = [texts[i] for i in ia]
        tb = [texts[j] for j in ib]
        if use_lev:
            d = levenshtein_batch(ta, tb)
            keep = d <= max_distance
        else:
            d = jaro_winkler_batch(ta, tb)
            keep = d >= min_similarity
        if not keep.any():
            return _empty(use_lev)
        score = pa.array(
            d[keep], type=pa.int64() if use_lev else pa.float64()
        )
        return pa.table(
            {
                "id_a": pa.array(ids[ia[keep]], type=pa.int64()),
                "id_b": pa.array(ids[ib[keep]], type=pa.int64()),
                ("dist" if use_lev else "sim"): score,
            }
        )

    return (
        ds.map_batches(_tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(_pairs, batch_format="pyarrow")
    )


def _empty(use_lev: bool = True) -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            ("dist" if use_lev else "sim"): pa.array(
                [], type=pa.int64() if use_lev else pa.float64()
            ),
        }
    )


def sorted_neighborhood_pairs(
    ds: rd.Dataset,
    *,
    sort_col: str,
    id_col: str,
    window: int,
    max_distance: int | None = None,
) -> "pa.Table | rd.Dataset":
    """Sorted-neighborhood blocking (Hernández-Stolfo): order the
    corpus by (sort_col, id_col) and pair every row with its next
    ``window`` neighbors in that order; optionally verify with exact
    Levenshtein over ``sort_col`` ≤ ``max_distance``.

    The second classic record-linkage blocking scheme, complementary
    to :func:`fuzzy_block_pairs`: key blocking misses matches whose
    blocking key disagrees; sorted-neighborhood catches near-misses
    that SORT adjacently. Returns (id_a, id_b, rank_dist[, dist]) with
    id_a the lower-RANK row.

    Distributed shape: one global sort; per sorted block, interior
    pairs are emitted with a vectorized offset scan; each block also
    emits its first/last ``window`` rows + its row count as METADATA,
    and the driver stitches cross-block pairs from those fringes —
    O(window × #blocks) driver rows, never data-sized (the
    stitch_fragment_pairs pattern from stages/lsh.py). Any pair within
    rank distance ``window`` spans at most the fringes of its blocks,
    so the union of interior + stitched pairs is exactly the
    rank-window pair set.
    """
    import pandas as pd

    sorted_ds = ds.map_batches(
        lambda t: t.select([sort_col, id_col]), batch_format="pyarrow"
    ).sort([sort_col, id_col])

    def _scan(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty_meta = {
            "kind": pa.array([], type=pa.int8()),
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "rank_dist": pa.array([], type=pa.int64()),
            "dist": pa.array([], type=pa.int64()),
            "_sort": pa.array([], type=pa.string()),
            "_id": pa.array([], type=pa.int64()),
            "_pos": pa.array([], type=pa.int64()),
            "_cnt": pa.array([], type=pa.int64()),
        }
        if n == 0:
            return pa.table(empty_meta)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        col = t[sort_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = [s or "" for s in col.to_pylist()]
        # interior pairs: offsets 1..window, vectorized per offset
        ia_parts, ib_parts, rd_parts = [], [], []
        for d in range(1, window + 1):
            if n - d <= 0:
                break
            i = np.arange(n - d)
            ia_parts.append(i)
            ib_parts.append(i + d)
            rd_parts.append(np.full(n - d, d, dtype=np.int64))
        if ia_parts:
            ia = np.concatenate(ia_parts)
            ib = np.concatenate(ib_parts)
            rdist = np.concatenate(rd_parts)
            if max_distance is not None:
                dist = levenshtein_batch(
                    [texts[i] for i in ia], [texts[j] for j in ib]
                )
                keep = dist <= max_distance
                ia, ib, rdist, dist = ia[keep], ib[keep], rdist[keep], dist[keep]
            else:
                dist = np.full(ia.size, -1, dtype=np.int64)
        else:
            ia = ib = rdist = dist = np.empty(0, dtype=np.int64)
        npairs = ia.size
        # fringe metadata: first/last `window` positions (deduped)
        fringe = sorted(
            set(range(min(window, n))) | set(range(max(n - window, 0), n))
        )
        fr = np.array(fringe, dtype=np.int64)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(npairs, np.int8), np.ones(fr.size, np.int8)]
                    )
                ),
                "id_a": pa.array(
                    np.concatenate([ids[ia], np.zeros(fr.size, np.int64)]),
                    type=pa.int64(),
                ),
                "id_b": pa.array(
                    np.concatenate([ids[ib], np.zeros(fr.size, np.int64)]),
                    type=pa.int64(),
                ),
                "rank_dist": pa.array(
                    np.concatenate([rdist, np.zeros(fr.size, np.int64)]),
                    type=pa.int64(),
                ),
                "dist": pa.array(
                    np.concatenate([dist, np.zeros(fr.size, np.int64)]),
                    type=pa.int64(),
                ),
                "_sort": pa.array(
                    [""] * npairs + [texts[int(i)] for i in fr],
                    type=pa.string(),
                ),
                "_id": pa.array(
                    np.concatenate([np.zeros(npairs, np.int64), ids[fr]]),
                    type=pa.int64(),
                ),
                "_pos": pa.array(
                    np.concatenate([np.zeros(npairs, np.int64), fr]),
                    type=pa.int64(),
                ),
                "_cnt": pa.array(
                    np.full(npairs + fr.size, n, dtype=np.int64)
                ),
            }
        )

    scanned = sorted_ds.map_batches(
        _scan, batch_format="pyarrow", batch_size=None
    ).materialize()
    interior = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(
            ["id_a", "id_b", "rank_dist", "dist"]
        ),
        batch_format="pyarrow",
    )
    fringes = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)).select(
            ["_sort", "_id", "_pos", "_cnt"]
        ),
        batch_format="pyarrow",
    ).to_pandas()

    # driver stitch: order fringe rows globally; global rank of a
    # fringe row = (rows of earlier blocks) + _pos. Blocks are
    # range-disjoint under the strict (sort, id) order, so ordering
    # blocks by their min fringe row IS block order.
    stitched_rows = []
    if len(fringes):
        fringes = fringes.sort_values(["_sort", "_id"]).reset_index(drop=True)
        # recover block identity: a block's fringe rows share _cnt and
        # are contiguous in global order; group by cumulative offsets
        # via (first row of each block = _pos it claims). Simpler:
        # blocks ordered by min row — reconstruct by walking rows in
        # order and starting a new block whenever _pos resets below
        # the previous _pos (positions within a block are ascending).
        blocks: list[pd.DataFrame] = []
        prev_pos = None
        start = 0
        for i, p in enumerate(fringes["_pos"].tolist()):
            if prev_pos is not None and p <= prev_pos:
                blocks.append(fringes.iloc[start:i])
                start = i
            prev_pos = p
        blocks.append(fringes.iloc[start:])
        base = 0
        granks, gids, gtexts = [], [], []
        for blk in blocks:
            granks.extend((base + blk["_pos"]).tolist())
            gids.extend(blk["_id"].tolist())
            gtexts.extend(blk["_sort"].tolist())
            base += int(blk["_cnt"].iloc[0])
        block_of = np.repeat(
            np.arange(len(blocks)), [len(b) for b in blocks]
        )
        granks = np.array(granks, dtype=np.int64)
        order = np.argsort(granks)
        granks, block_of = granks[order], block_of[order]
        gids = np.array(gids, dtype=np.int64)[order]
        gtexts = [gtexts[int(i)] for i in order]
        pa_, pb_ = [], []
        for i in range(granks.size):
            for j in range(i + 1, granks.size):
                rd_ = granks[j] - granks[i]
                if rd_ > window:
                    break
                if block_of[i] == block_of[j]:
                    continue  # interior pair, already emitted
                pa_.append(i)
                pb_.append(j)
        if pa_:
            d = levenshtein_batch(
                [gtexts[i] for i in pa_], [gtexts[j] for j in pb_]
            )
            for i, j, dd in zip(pa_, pb_, d):
                if max_distance is not None and dd > max_distance:
                    continue
                stitched_rows.append(
                    {
                        "id_a": int(gids[i]),
                        "id_b": int(gids[j]),
                        "rank_dist": int(granks[j] - granks[i]),
                        "dist": int(dd) if max_distance is not None else -1,
                    }
                )

    out = interior
    if stitched_rows:
        out = out.union(
            rd.from_arrow(
                pa.Table.from_pylist(
                    stitched_rows,
                    schema=pa.schema(
                        [
                            ("id_a", pa.int64()),
                            ("id_b", pa.int64()),
                            ("rank_dist", pa.int64()),
                            ("dist", pa.int64()),
                        ]
                    ),
                )
            )
        )
    if max_distance is None:
        out = out.map_batches(
            lambda t: t.drop_columns(["dist"]), batch_format="pyarrow"
        )
    return out
