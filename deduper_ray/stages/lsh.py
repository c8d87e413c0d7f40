"""LSH banding → candidate pairs.

Shape (SURVEY.md §7.1 step 5):
  signatures (row_id, minhash[K])
    → band explode: one narrow row per (doc, band): (band_key, row_id)
    → global sort by band_key            [the one LSH all-to-all]
    → per-block vectorized run scan emits pairs for interior runs;
      runs touching a block edge are emitted as FRAGMENTS and stitched
      on the driver (bounded: ≤ 2 runs per block)
    → driver dedup (np.unique) of pairs found in >1 band

Why sort+scan instead of groupby().map_groups: Ray's map_groups fires
one Python call per group — O(docs × bands) interpreter overhead when
most buckets are singletons — and its sort-based aggregate is several
times slower than a plain sort. The run scan is numpy over each sorted
block; singleton runs cost one comparison.

Skew: boilerplate code makes some band buckets huge. A bucket of g
docs emits g·(g-1)/2 pairs — quadratic. ``max_pairs_per_bucket`` caps
the emission deterministically with a chain+stride pattern (connected
pairs, so union-find transitivity recovers the full cluster) and the
dropped count is surfaced via sentinel rows that the caller logs — no
silent truncation (SURVEY.md §4.2 skew row; FP-Hadoop/Scarlett
pattern, PAPERS.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_BAND_MULT = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 golden-ratio constant

DROPPED_SENTINEL = -1  # id_a == -1 rows carry per-bucket dropped counts in id_b


def band_keys(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, K) signature matrix → (n, bands) uint64 band keys.

    Each key mixes the band's r signature values AND the band index, so
    equal keys across different bands cannot collide into one bucket.
    Fully vectorized across the batch. When K % bands != 0 the trailing
    K - bands·r signature slots are unused (r = K // bands).
    """
    n, K = sigs.shape
    r = K // bands
    view = sigs[:, : bands * r].reshape(n, bands, r)
    h = np.full((n, bands), np.arange(bands, dtype=np.uint64), dtype=np.uint64)
    for j in range(r):
        h = (h ^ view[:, :, j]) * _BAND_MULT
        h ^= h >> np.uint64(29)
    return h


class BandExploder:
    """map_batches stage: signature rows → (band_key, row_id) rows
    (bands× row multiplication, but each row is 16 bytes)."""

    def __init__(self, *, bands: int = 32, id_column: str = "row_id"):
        self.bands = bands
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        K = batch["minhash"].type.list_size
        flat = batch["minhash"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        sigs = flat.reshape(n, K).astype(np.uint64)  # widen for key mixing
        keys = band_keys(sigs, self.bands)  # (n, bands)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        # int64 bit-view: Ray's sort/groupby paths box keys as Python
        # ints and overflow on uint64 > 2^63 (falls back to pickled
        # object blocks); the signed reinterpretation preserves equality
        return pa.table(
            {
                "band_key": pa.array(
                    keys.reshape(-1).view(np.int64), type=pa.int64()
                ),
                "row_id": pa.array(
                    np.repeat(ids, self.bands), type=pa.int64()
                ),
            }
        )


def _pairs_for_bucket(ids: np.ndarray, max_pairs: int):
    """Pairs for one bucket's unique sorted ids; returns (a, b, dropped)."""
    g = ids.size
    total = g * (g - 1) // 2
    if total <= max_pairs:
        iu = np.triu_indices(g, k=1)
        return ids[iu[0]], ids[iu[1]], 0
    # deterministic cap: chain + stride pairs keep the bucket connected
    # (transitive closure via union-find recovers the full cluster)
    a_list, b_list = [], []
    budget = max_pairs
    stride = 1
    while budget > 0 and stride < g:
        m = min(budget, g - stride)
        a_list.append(ids[:m])
        b_list.append(ids[stride : stride + m])
        budget -= m
        stride += 1
    a = np.concatenate(a_list)
    b = np.concatenate(b_list)
    return a, b, total - a.size


def _scan_sorted_block(t: pa.Table, max_pairs: int) -> pa.Table:
    """Vectorized run scan over one band_key-sorted block.

    Interior runs → pairs (+ dropped-count sentinels); first/last runs
    → fragment rows (kind=1) for driver stitching."""
    keys = t["band_key"].to_numpy(zero_copy_only=False)
    ids = t["row_id"].to_numpy(zero_copy_only=False)
    n = keys.size
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    frag_keys: list[np.ndarray] = []
    frag_ids: list[np.ndarray] = []
    dropped_total = 0
    if n:
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [n]))
        n_runs = starts.size
        # block-edge runs: may continue in a neighboring block
        frag_keys.append(keys[starts[0]:ends[0]])
        frag_ids.append(ids[starts[0]:ends[0]])
        if n_runs > 1:
            frag_keys.append(keys[starts[-1]:ends[-1]])
            frag_ids.append(ids[starts[-1]:ends[-1]])
        # multi-row interior runs, fully vectorized: LSH buckets are
        # overwhelmingly singletons, but near-dup-heavy corpora leave
        # thousands of multi-runs per block — a Python iteration per
        # run (np.unique + triu each) measured 141 ms/block at 2×10^6
        # docs. Instead: gather the multi-run subset once, sort ids
        # within runs (one lexsort over the small subset), mask in-run
        # duplicate ids, then emit pairs with ONE batched triu gather
        # per DISTINCT run length (≤ tens of lengths, not thousands of
        # runs). Cap-exceeding runs keep the chain+stride loop (rare).
        lens = ends - starts
        interior = (np.arange(n_runs) > 0) & (np.arange(n_runs) < n_runs - 1)
        multi = np.nonzero(interior & (lens >= 2))[0]
        if multi.size:
            ls = lens[multi]
            idx = np.arange(int(ls.sum()), dtype=np.int64)
            idx -= np.repeat(np.cumsum(ls) - ls, ls)
            idx += np.repeat(starts[multi], ls)
            run_of = np.repeat(multi, ls)
            order = np.lexsort((ids[idx], run_of))
            sv = ids[idx][order]
            rv = run_of[order]
            keep = np.empty(sv.size, dtype=bool)
            keep[0] = True
            keep[1:] = (sv[1:] != sv[:-1]) | (rv[1:] != rv[:-1])
            sv, rv = sv[keep], rv[keep]
            bnd = np.empty(sv.size, dtype=bool)
            bnd[0] = True
            bnd[1:] = rv[1:] != rv[:-1]
            ustarts = np.flatnonzero(bnd)
            ulens = np.diff(np.append(ustarts, sv.size))
            over = ulens.astype(np.int64) * (ulens - 1) // 2 > max_pairs
            small = ~over & (ulens >= 2)
            for L in np.unique(ulens[small]):
                sel = ustarts[small & (ulens == L)]
                # ids are sorted ascending within each run, so the
                # upper triangle already satisfies id_a < id_b
                mat = sv[sel[:, None] + np.arange(int(L))]
                iu0, iu1 = np.triu_indices(int(L), k=1)
                out_a.append(mat[:, iu0].ravel())
                out_b.append(mat[:, iu1].ravel())
            for s, L in zip(ustarts[over], ulens[over]):
                a, b, dropped = _pairs_for_bucket(
                    sv[s : s + L], max_pairs
                )
                out_a.append(a)
                out_b.append(b)
                dropped_total += dropped
    a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
    if a.size:
        # block-local pair dedup (distributed): pairs repeated across
        # bands that land in the same sorted block collapse here, so the
        # driver-side collect sees far fewer rows
        from deduper_ray.stages.verify import dedup_pairs_arrays

        a, b = dedup_pairs_arrays(a, b)
    fk = np.concatenate(frag_keys) if frag_keys else np.empty(0, dtype=np.int64)
    fi = np.concatenate(frag_ids) if frag_ids else np.empty(0, dtype=np.int64)
    kind = np.concatenate(
        [
            np.zeros(a.size, dtype=np.int8),
            np.ones(fk.size, dtype=np.int8),
            np.full(1 if dropped_total else 0, 2, dtype=np.int8),
        ]
    )
    return pa.table(
        {
            "kind": pa.array(kind),
            "id_a": pa.array(
                np.concatenate(
                    [a, fk, np.full(1 if dropped_total else 0, DROPPED_SENTINEL)]
                ),
                type=pa.int64(),
            ),
            "id_b": pa.array(
                np.concatenate(
                    [b, fi,
                     np.full(1 if dropped_total else 0, dropped_total)]
                ),
                type=pa.int64(),
            ),
        }
    )


def salt_hot_buckets(
    exploded: rd.Dataset, *, hot_threshold: int
) -> tuple[rd.Dataset, int]:
    """Count-then-salt skew guard for pathological LSH bands
    (boilerplate corpora: one band bucket holding 10^5-10^6 docs).

    1. COUNT — shuffle-free two-pass candidate scheme (a full
       groupby over the ~n·bands distinct band keys measured 12 s at
       2.1M rows; this is two narrow map passes, ~0.3 s):
       a. per block, ``np.unique`` counts filtered to keys with local
          count ≥ cutoff = max(2, hot_threshold // n_blocks); the tiny
          survivor set collects to the driver. Pigeonhole: while
          n_blocks ≤ hot_threshold, any key with total > hot_threshold
          MUST exceed the cutoff in at least one block, so no hot key
          is missed. Beyond that block count detection is
          probabilistic (a g>threshold bucket evades only by landing
          ≤cutoff-1 in every one of g⁺ blocks — vanishing for real
          boilerplate skew) and the lossy-but-logged per-bucket pair
          cap remains the residual guard.
       b. exact totals for the candidate keys only: broadcast the
          sorted candidate array, per-block searchsorted + bincount,
          driver sums (O(candidates) driver state, not O(keys)).
    2. SALT: each row of a hot bucket re-keys to sub-bucket
       ``salt = row_id % S`` (S = ceil(g / hot_threshold)) and ALSO
       emits a chain copy into sub-bucket ``(salt+1) % S`` — sub-bucket
       s therefore holds salt classes {s-1, s}, so pairs inside
       sub-buckets keep the whole original bucket CONNECTED (union-find
       transitivity recovers the full cluster) while every sorted run
       is now ≤ ~2·hot_threshold rows instead of g.

    Returns (salted dataset, number of hot buckets). Cold buckets pass
    through untouched; with no hot buckets the input is returned as-is.
    """
    import ray

    from deduper_ray.functions.util import dataset_to_table

    n_blocks = max(1, exploded.num_blocks())
    cutoff = max(2, hot_threshold // n_blocks)

    def _local_hot(t: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            t["band_key"].to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        m = counts >= cutoff
        return pa.table(
            {
                "band_key": pa.array(keys[m], type=pa.int64()),
                "n": pa.array(counts[m], type=pa.int64()),
            }
        )

    cand_tbl = dataset_to_table(
        exploded.map_batches(_local_hot, batch_format="pyarrow"),
        pa.schema([("band_key", pa.int64()), ("n", pa.int64())]),
    )
    if cand_tbl.num_rows == 0:
        return exploded, 0
    cand_keys = np.unique(cand_tbl["band_key"].to_numpy(zero_copy_only=False))
    cand_ref = ray.put(cand_keys)

    def _exact_counts(t: pa.Table) -> pa.Table:
        cand: np.ndarray = ray.get(cand_ref)
        keys = t["band_key"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cand, keys)
        pos_c = np.minimum(pos, cand.size - 1)
        hit = cand[pos_c] == keys
        counts = np.bincount(pos_c[hit], minlength=cand.size)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "idx": pa.array(nz, type=pa.int64()),
                "n": pa.array(counts[nz], type=pa.int64()),
            }
        )

    totals_tbl = dataset_to_table(
        exploded.map_batches(_exact_counts, batch_format="pyarrow"),
        pa.schema([("idx", pa.int64()), ("n", pa.int64())]),
    )
    totals = np.zeros(cand_keys.size, dtype=np.int64)
    np.add.at(
        totals,
        totals_tbl["idx"].to_numpy(zero_copy_only=False),
        totals_tbl["n"].to_numpy(zero_copy_only=False),
    )
    hot_mask = totals > hot_threshold
    if not hot_mask.any():
        return exploded, 0
    hot_keys = cand_keys[hot_mask]  # already sorted (np.unique output)
    hot_sizes = totals[hot_mask]
    n_hot = int(hot_mask.sum())
    hot_ref = ray.put(
        {
            "keys": hot_keys,
            "salts": np.maximum(
                2, -(-hot_sizes // hot_threshold)
            ).astype(np.int64),
        }
    )

    def _salt(t: pa.Table) -> pa.Table:
        from deduper_ray.stages.relational import _fetch_broadcast

        hot = _fetch_broadcast(hot_ref)
        keys = t["band_key"].to_numpy(zero_copy_only=False)
        ids = t["row_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(hot["keys"], keys)
        pos_c = np.minimum(pos, hot["keys"].size - 1)
        is_hot = hot["keys"][pos_c] == keys
        cold_k, cold_i = keys[~is_hot], ids[~is_hot]
        hk, hi = keys[is_hot], ids[is_hot]
        S = hot["salts"][pos_c[is_hot]]
        salt = (hi % S).astype(np.uint64)
        salt2 = ((hi + 1) % S).astype(np.uint64)

        def _rekey(k, s):
            mixed = (k.view(np.uint64) ^ (s + np.uint64(1)) * _BAND_MULT)
            mixed ^= mixed >> np.uint64(29)
            return mixed.view(np.int64)

        return pa.table(
            {
                "band_key": pa.array(
                    np.concatenate(
                        [cold_k, _rekey(hk, salt), _rekey(hk, salt2)]
                    ),
                    type=pa.int64(),
                ),
                "row_id": pa.array(
                    np.concatenate([cold_i, hi, hi]), type=pa.int64()
                ),
            }
        )

    return (
        exploded.map_batches(_salt, batch_format="pyarrow"),
        n_hot,
    )


def candidate_pairs(
    signatures: rd.Dataset,
    *,
    bands: int = 32,
    max_pairs_per_bucket: int = 2000,
    id_column: str = "row_id",
    hot_bucket_threshold: int | None = None,
) -> rd.Dataset:
    """Signatures → candidate (id_a < id_b) pairs, possibly repeated
    across bands (dedup happens driver-side in the verify stage).

    ``hot_bucket_threshold``: when set, runs the count-then-salt skew
    guard (``salt_hot_buckets``) so no sorted run exceeds
    ~2×threshold rows; connectivity (and therefore clustering) is
    preserved via chained sub-buckets.

    Returned dataset rows: kind=0 pairs, kind=1 boundary fragments
    (band_key in id_a, row_id in id_b), kind=2 dropped-count sentinel.
    Use ``collect_candidate_pairs`` to resolve to a final pair table.
    """
    exploded = signatures.map_batches(
        BandExploder(bands=bands, id_column=id_column),
        batch_format="pyarrow",
    )
    if hot_bucket_threshold is not None:
        exploded = exploded.materialize()
        exploded, n_hot = salt_hot_buckets(
            exploded, hot_threshold=hot_bucket_threshold
        )
        if n_hot:
            import logging

            logging.getLogger(__name__).info(
                "salted %d hot LSH buckets (> %d rows)",
                n_hot, hot_bucket_threshold,
            )
    sorted_ds = exploded.sort("band_key")
    return sorted_ds.map_batches(
        lambda t: _scan_sorted_block(t, max_pairs_per_bucket),
        batch_format="pyarrow",
        batch_size=None,  # one scan per sorted block — runs stay intact
    )


def stitch_fragment_pairs(
    scanned: rd.Dataset, *, max_pairs_per_bucket: int = 2000
) -> tuple[pa.Table, int]:
    """Driver-side: collect ONLY the fragment/sentinel rows (≤2 runs +
    1 sentinel per block — tiny), stitch boundary runs into pairs, sum
    dropped counts. Returns (fragment pair table, dropped)."""
    import pyarrow.compute as pc

    from deduper_ray.functions.util import dataset_to_table

    side = dataset_to_table(
        scanned.map_batches(
            lambda t: t.filter(pc.not_equal(t["kind"], 0)),
            batch_format="pyarrow",
        ),
        pa.schema(
            [("kind", pa.int8()), ("id_a", pa.int64()), ("id_b", pa.int64())]
        ),
    )
    kind = side["kind"].to_numpy(zero_copy_only=False)
    id_a = side["id_a"].to_numpy(zero_copy_only=False)
    id_b = side["id_b"].to_numpy(zero_copy_only=False)
    dropped = int(id_b[kind == 2].sum())
    fk, fi = id_a[kind == 1], id_b[kind == 1]
    pa_list, pb_list = [], []
    if fk.size:
        order = np.lexsort((fi, fk))
        fk, fi = fk[order], fi[order]
        change = np.nonzero(fk[1:] != fk[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [fk.size]))
        for s, e in zip(starts, ends):
            uids = np.unique(fi[s:e])
            if uids.size < 2:
                continue
            a, b, d = _pairs_for_bucket(uids, max_pairs_per_bucket)
            pa_list.append(a)
            pb_list.append(b)
            dropped += d
    if pa_list:
        a = np.concatenate(pa_list)
        b = np.concatenate(pb_list)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
    else:
        lo = hi = np.empty(0, dtype=np.int64)
    return (
        pa.table(
            {
                "id_a": pa.array(lo, type=pa.int64()),
                "id_b": pa.array(hi, type=pa.int64()),
            }
        ),
        dropped,
    )


def candidate_pair_dataset(
    scanned: rd.Dataset, *, max_pairs_per_bucket: int = 2000
) -> tuple[rd.Dataset, int]:
    """Fully distributed resolution: pair rows stay a Dataset. A second
    sort on (id_a, id_b) makes cross-band duplicates block-adjacent so
    each block dedups itself; the only driver work is fragment
    stitching (tiny). Block-boundary duplicate pairs (≤1 per boundary)
    survive — harmless for verification/union-find and removed with the
    final verified set. Returns (pair dataset, dropped count)."""
    import pyarrow.compute as pc

    scanned = scanned.materialize()
    frag_pairs, dropped = stitch_fragment_pairs(
        scanned, max_pairs_per_bucket=max_pairs_per_bucket
    )
    pair_ds = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(["id_a", "id_b"]),
        batch_format="pyarrow",
    )
    if frag_pairs.num_rows:
        pair_ds = pair_ds.union(rd.from_arrow(frag_pairs))

    def _block_dedup(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        if a.size == 0:
            return t
        keep = np.ones(a.size, dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return t.filter(pa.array(keep))

    deduped = pair_ds.sort(["id_a", "id_b"]).map_batches(
        _block_dedup, batch_format="pyarrow", batch_size=None
    )
    return deduped, dropped


def collect_candidate_pairs(
    scanned: rd.Dataset, *, max_pairs_per_bucket: int = 2000
) -> tuple[pa.Table, int]:
    """Driver-side resolution: gather pair rows, stitch boundary-run
    fragments (grouped by band_key, pairs emitted with the same cap),
    sum dropped counts. Returns (unique pair table, total dropped)."""
    from deduper_ray.functions.util import dataset_to_table

    tbl = dataset_to_table(
        scanned,
        pa.schema(
            [("kind", pa.int8()), ("id_a", pa.int64()), ("id_b", pa.int64())]
        ),
    )
    kind = tbl["kind"].to_numpy(zero_copy_only=False)
    id_a = tbl["id_a"].to_numpy(zero_copy_only=False)
    id_b = tbl["id_b"].to_numpy(zero_copy_only=False)
    pairs_a = [id_a[kind == 0]]
    pairs_b = [id_b[kind == 0]]
    dropped = int(id_b[kind == 2].sum())
    fk, fi = id_a[kind == 1], id_b[kind == 1]
    if fk.size:
        order = np.lexsort((fi, fk))
        fk, fi = fk[order], fi[order]
        change = np.nonzero(fk[1:] != fk[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [fk.size]))
        for s, e in zip(starts, ends):
            uids = np.unique(fi[s:e])
            if uids.size < 2:
                continue
            a, b, d = _pairs_for_bucket(uids, max_pairs_per_bucket)
            pairs_a.append(a)
            pairs_b.append(b)
            dropped += d
    a = np.concatenate(pairs_a)
    b = np.concatenate(pairs_b)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    from deduper_ray.stages.verify import dedup_pairs_arrays

    lo, hi = dedup_pairs_arrays(lo, hi)
    return (
        pa.table(
            {
                "id_a": pa.array(lo, type=pa.int64()),
                "id_b": pa.array(hi, type=pa.int64()),
            }
        ),
        dropped,
    )


def candidate_pair_rows(
    scanned: rd.Dataset, *, max_pairs_per_bucket: int = 2000
) -> tuple[rd.Dataset, int]:
    """LATE-DEDUP resolution — the scale default: raw pair rows flow
    straight to verification WITHOUT the cross-band distinct (which
    costs a full (id_a, id_b) all-to-all sort of every candidate row —
    the largest non-scaling term measured at 2M docs / 8 CPUs: 65 s).
    Cross-band duplicates (~2× inflation at 21 bands) just get scored
    twice — perfectly parallel work — and the distinct happens on the
    far smaller VERIFIED set. Fragment stitching stays driver-side
    (≤2 runs per block). Returns (raw pair dataset, dropped count)."""
    import pyarrow.compute as pc

    frag_pairs, dropped = stitch_fragment_pairs(
        scanned, max_pairs_per_bucket=max_pairs_per_bucket
    )
    pair_ds = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(["id_a", "id_b"]),
        batch_format="pyarrow",
    )
    if frag_pairs.num_rows:
        pair_ds = pair_ds.union(rd.from_arrow(frag_pairs))
    return pair_ds, dropped
