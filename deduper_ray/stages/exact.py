"""Exact dedup core: first-occurrence-wins over a hash column.

Reference semantics (Deduper.kt:207-240): first row carrying a given
hash is the keeper; later rows are dupes; rows whose hash is in the
preloaded seen set are ALWAYS dupes with first_found_row_number = 0.

Ray-native decomposition — the key scale decision is that the ONLY
full shuffle moves a NARROW projection, never the (wide) row payload:

  1. ``group_stats``: project to (row_md5, row_id, is_seen) and run a
     NATIVE vectorized groupby-aggregate → one row per distinct hash:
     (hash, first_row_id, n_rows, any_seen). This is the one required
     all-to-all; the key is a crypto hash so it is skew-free by
     construction (SURVEY.md §7.3).
  2. Dupe groups = stats where n_rows > 1 or any_seen — typically a
     tiny fraction. Their member row_ids are re-gathered from the
     narrow projection only (second small shuffle over dupe hashes).
  3. The wide target output is produced WITHOUT shuffling row payloads:
     the drop set (row_ids of non-keepers) is broadcast via ``ray.put``
     and applied as a vectorized anti-filter inside map_batches.

The broadcast in (3) assumes |dupes| ≪ |rows| (same assumption the
reference bakes in by holding dupeMap in producer heap,
Deduper.kt:106-107). For dupe-heavy corpora use strategy="shuffle",
which instead does grouped first-wins over full rows (one wide
shuffle, no driver state).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from deduper_ray.stages.seen import SEEN_FLAG

HASH_COL = "row_md5"
ROW_ID = "row_id"


@dataclass
class GroupStats:
    """Driver-side scalar aggregates derived from the per-hash stats."""

    record_count: int
    distinct_unseen_hashes: int
    dupe_count: int
    distinct_dupe_count: int


def group_stats(hashed: rd.Dataset, *, hash_col: str = HASH_COL) -> rd.Dataset:
    """One row per distinct hash: (hash, first_row_id, n_rows, any_seen).

    Narrow-projection shuffle — ~40 bytes/row regardless of payload
    width (SURVEY.md §4.2 spill row: project before groupby).

    Implemented as sort + vectorized run scan with driver-stitched
    block-boundary runs (same pattern as the LSH stage) — Ray's
    sort-based ``groupby().aggregate`` is several× slower than a plain
    sort for high-cardinality keys, and the scan is pure numpy.
    """
    narrow = hashed.map_batches(
        lambda t: pa.table(
            {
                hash_col: t[hash_col],
                ROW_ID: t[ROW_ID],
                "_seen": pc.cast(t[SEEN_FLAG], pa.int8()),
            }
        ),
        batch_format="pyarrow",
    )
    scanned = (
        narrow.sort(hash_col)
        .map_batches(
            lambda t: _scan_hash_block(t, hash_col),
            batch_format="pyarrow",
            batch_size=None,  # one scan per sorted block
        )
        .materialize()
    )
    # boundary runs (≤2 per block) stitched on the driver
    frags = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)), batch_format="pyarrow"
    ).to_pandas()
    interior = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).drop_columns(["kind"]),
        batch_format="pyarrow",
    )
    if len(frags):
        agg = (
            frags.groupby(hash_col)
            .agg(
                first_row_id=("first_row_id", "min"),
                n_rows=("n_rows", "sum"),
                any_seen=("any_seen", "max"),
            )
            .reset_index()
        )
        stitched = pa.table(
            {
                hash_col: pa.array(agg[hash_col], type=pa.string()),
                "first_row_id": pa.array(agg["first_row_id"], type=pa.int64()),
                "n_rows": pa.array(agg["n_rows"], type=pa.int64()),
                "any_seen": pa.array(agg["any_seen"], type=pa.int8()),
            }
        )
        return interior.union(rd.from_arrow(stitched))
    return interior


def _scan_hash_block(t: pa.Table, hash_col: str) -> pa.Table:
    """Run scan over one hash-sorted block: per-run (first_row_id,
    n_rows, any_seen); first/last runs flagged kind=1 for stitching."""
    import numpy as np

    n = t.num_rows
    if n == 0:
        return pa.table(
            {
                "kind": pa.array([], type=pa.int8()),
                hash_col: pa.array([], type=pa.string()),
                "first_row_id": pa.array([], type=pa.int64()),
                "n_rows": pa.array([], type=pa.int64()),
                "any_seen": pa.array([], type=pa.int8()),
            }
        )
    hashes = t[hash_col].combine_chunks()
    row_ids = t[ROW_ID].to_numpy(zero_copy_only=False)
    seen = t["_seen"].to_numpy(zero_copy_only=False)
    # run boundaries via vectorized string inequality
    neq = pc.not_equal(hashes.slice(1), hashes.slice(0, n - 1))
    change = np.nonzero(neq.to_numpy(zero_copy_only=False))[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    # vectorized per-run aggregates (min over sorted row_id requires a
    # reduceat; row order within a run is NOT sorted after the hash
    # sort, so use minimum.reduceat)
    first_ids = np.minimum.reduceat(row_ids, starts)
    n_rows = (ends - starts).astype(np.int64)
    any_seen = np.maximum.reduceat(seen, starts)
    kinds = np.zeros(starts.size, dtype=np.int8)
    kinds[0] = 1
    kinds[-1] = 1
    return pa.table(
        {
            "kind": pa.array(kinds),
            hash_col: hashes.take(pa.array(starts, type=pa.int64())),
            "first_row_id": pa.array(first_ids, type=pa.int64()),
            "n_rows": pa.array(n_rows, type=pa.int64()),
            "any_seen": pa.array(any_seen.astype(np.int8)),
        }
    )


def _scan_member_block(t: pa.Table, hash_col: str) -> pa.Table:
    """Run scan over one hash-sorted block of dupe-group MEMBERS:
    one output row per run with the run's member ids as a SORTED
    list<int64> (built with one vectorized lexsort + ListArray
    construction — no per-group Python loop). First/last runs are
    flagged kind=1 for driver stitching."""
    n = t.num_rows
    empty = pa.table(
        {
            "kind": pa.array([], type=pa.int8()),
            hash_col: pa.array([], type=pa.string()),
            "row_ids": pa.array([], type=pa.list_(pa.int64())),
            "any_seen": pa.array([], type=pa.int8()),
        }
    )
    if n == 0:
        return empty
    hashes = t[hash_col].combine_chunks()
    ids = t[ROW_ID].to_numpy(zero_copy_only=False)
    seen = t["_seen"].to_numpy(zero_copy_only=False)
    neq = pc.not_equal(hashes.slice(1), hashes.slice(0, n - 1))
    change = np.nonzero(neq.to_numpy(zero_copy_only=False))[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    nruns = starts.size
    run_idx = np.repeat(np.arange(nruns), ends - starts)
    # sort ids within each run (stable two-key lexsort, fully vectorized)
    order = np.lexsort((ids, run_idx))
    ordered_ids = ids[order]
    any_seen = np.maximum.reduceat(seen, starts).astype(np.int8)
    kinds = np.zeros(nruns, dtype=np.int8)
    kinds[0] = 1
    kinds[-1] = 1
    offsets = pa.array(np.append(starts, n).astype(np.int32))
    return pa.table(
        {
            "kind": pa.array(kinds),
            hash_col: hashes.take(pa.array(starts, type=pa.int64())),
            "row_ids": pa.ListArray.from_arrays(
                offsets, pa.array(ordered_ids, type=pa.int64())
            ),
            "any_seen": pa.array(any_seen),
        }
    )


def _finalize_groups(t: pa.Table, hash_col: str) -> pa.Table:
    """Vectorized per-batch finalization of assembled dupe groups:
    drop the keeper id from unseen groups, render the dupe-id list as
    a JSON string (Arrow binary_join — no per-group Python), compute
    first_found_row_number (0 for preloaded hashes, Deduper.kt:152)
    and the first-dupe row id used to fetch dupe_values."""
    out_schema = pa.schema(
        [
            ("hash", pa.string()),
            ("row_ids", pa.string()),
            ("first_found_row_number", pa.int64()),
            ("first_dupe_row_id", pa.int64()),
        ]
    )
    if t.num_rows == 0:
        return out_schema.empty_table()
    la = t["row_ids"].combine_chunks()
    lengths = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64)
    vals = la.flatten().to_numpy(zero_copy_only=False)
    off = np.concatenate(([0], np.cumsum(lengths)))
    seen = t["any_seen"].to_numpy(zero_copy_only=False) > 0
    starts = off[:-1]
    # unseen groups: first (min) id is the keeper — excluded from dupes
    keep = np.ones(vals.size, dtype=bool)
    keep[starts[~seen]] = False
    dupe_vals = vals[keep]
    new_len = lengths - (~seen).astype(np.int64)
    new_off = np.concatenate(([0], np.cumsum(new_len)))
    first_found = np.where(seen, 0, vals[starts]).astype(np.int64)
    first_dupe = dupe_vals[new_off[:-1]]
    # JSON render matching json.dumps(list): "[a, b, c]"
    svals = pc.cast(pa.array(dupe_vals, type=pa.int64()), pa.string())
    jlist = pa.ListArray.from_arrays(
        pa.array(new_off.astype(np.int32)), svals
    )
    inner = pc.binary_join(jlist, ", ")
    rjson = pc.binary_join_element_wise(
        pa.scalar("["), inner, pa.scalar("]"), ""
    )
    return pa.table(
        {
            "hash": pc.cast(t[hash_col], pa.string()),
            "row_ids": rjson,
            "first_found_row_number": pa.array(first_found),
            "first_dupe_row_id": pa.array(first_dupe, type=pa.int64()),
        }
    )


def dupe_groups_ds(
    hashed: rd.Dataset,
    stats: rd.Dataset,
    *,
    hash_col: str = HASH_COL,
    columns_for_json: list[str] | None = None,
    frag_driver_budget: int = 262_144,
) -> rd.Dataset:
    """DISTRIBUTED dupe-group assembly (reference dupeMap, Deduper.kt:107)
    — one output row per duplicated hash with the reference dupes-sink
    schema: (hash, row_ids JSON, first_found_row_number, dupe_values).

    Nothing corpus- or dupe-volume-sized lands on the driver
    (VERDICT r3 finding #2): the member projection (hash, row_id) is
    gathered per dupe hash via a broadcast hash set (bounded by the
    DISTINCT dupe count), sorted, and run-scanned per block into
    per-group rows with vectorized sorted-list construction; block
    boundary runs (≤2/block) are stitched on the driver; dupe_values
    JSON rows are rendered distributed and attached with a
    hash-partitioned join. Driver residency: O(2·blocks) boundary
    FRAGMENT ROWS + the distinct-dupe-hash broadcast — but a fragment
    carries its run's member-id list, so one hot hash spanning many
    sorted blocks would put its whole member set through the driver
    stitch. Above ``frag_driver_budget`` total fragment member ids the
    stitch therefore runs as a DISTRIBUTED groupby(hash) pass instead
    (the simhash_nd.py boundary-bucket fallback) and the driver holds
    nothing fragment-sized.
    """
    dupe_hashes: list[pa.Array] = []
    for batch in stats.map_batches(
        lambda t: t.filter(
            pc.or_(pc.greater(t["n_rows"], 1), pc.greater(t["any_seen"], 0))
        ).select([hash_col]),
        batch_format="pyarrow",
    ).iter_batches(batch_size=262144, batch_format="pyarrow"):
        dupe_hashes.append(pc.cast(batch[hash_col], pa.string()).combine_chunks())
    hash_arr = (
        pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in dupe_hashes])
        if dupe_hashes
        else pa.array([], type=pa.string())
    )
    out_schema_names = ["hash", "row_ids", "first_found_row_number", "dupe_values"]
    if len(hash_arr) == 0:
        return rd.from_arrow(
            pa.schema(
                [
                    ("hash", pa.string()),
                    ("row_ids", pa.string()),
                    ("first_found_row_number", pa.int64()),
                    ("dupe_values", pa.string()),
                ]
            ).empty_table()
        )
    hashes_ref = ray.put(hash_arr)

    def _members(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[hash_col], value_set=ray.get(hashes_ref))
        t = batch.filter(mask)
        return pa.table(
            {
                hash_col: t[hash_col],
                ROW_ID: t[ROW_ID],
                "_seen": pc.cast(t[SEEN_FLAG], pa.int8()),
            }
        )

    scanned = (
        hashed.map_batches(_members, batch_format="pyarrow")
        .sort(hash_col)
        .map_batches(
            lambda t: _scan_member_block(t, hash_col),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
    )
    frag_ds = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)).drop_columns(["kind"]),
        batch_format="pyarrow",
    ).materialize()
    groups = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).drop_columns(["kind"]),
        batch_format="pyarrow",
    )
    # fragment MEMBER-ID volume (not row count) is the driver-stitch
    # cost: a hot hash spanning B blocks ships its whole member set
    n_frag_ids = sum(
        int(pc.sum(pc.list_value_length(b["row_ids"])).as_py() or 0)
        for b in frag_ds.iter_batches(
            batch_size=65536, batch_format="pyarrow"
        )
        if b.num_rows
    )
    if n_frag_ids > frag_driver_budget:
        def _stitch_group(g: pa.Table) -> pa.Table:
            rid = np.sort(
                np.concatenate(
                    [
                        np.asarray(x, dtype=np.int64)
                        for x in g["row_ids"].to_pylist()
                    ]
                )
            )
            return pa.table(
                {
                    hash_col: pa.array(
                        [g[hash_col][0].as_py()], type=pa.string()
                    ),
                    "row_ids": pa.array(
                        [rid.tolist()], type=pa.list_(pa.int64())
                    ),
                    "any_seen": pa.array(
                        [int(pc.max(g["any_seen"]).as_py())],
                        type=pa.int8(),
                    ),
                }
            )

        groups = groups.union(
            frag_ds.groupby(hash_col).map_groups(
                _stitch_group, batch_format="pyarrow"
            )
        )
        frags = pd.DataFrame()
    else:
        frags = frag_ds.to_pandas()
    if len(frags):
        merged = (
            frags.groupby(hash_col)
            .agg(
                row_ids=(
                    "row_ids",
                    lambda s: np.sort(
                        np.concatenate([np.asarray(v, dtype=np.int64) for v in s])
                    ),
                ),
                any_seen=("any_seen", "max"),
            )
            .reset_index()
        )
        stitched = pa.table(
            {
                hash_col: pa.array(merged[hash_col], type=pa.string()),
                "row_ids": pa.array(
                    [v.tolist() for v in merged["row_ids"]],
                    type=pa.list_(pa.int64()),
                ),
                "any_seen": pa.array(
                    merged["any_seen"].astype(np.int8), type=pa.int8()
                ),
            }
        )
        groups = groups.union(rd.from_arrow(stitched))
    finalized = groups.map_batches(
        lambda t: _finalize_groups(t, hash_col),
        batch_format="pyarrow",
    ).materialize()

    # -- dupe_values: JSON of the FIRST duplicate occurrence's row
    #    (Deduper.kt:226-240), rendered distributed and joined back on
    #    the first-dupe row id (hash-partitioned join — both sides are
    #    one row per dupe group) -------------------------------------
    first_ids: list[np.ndarray] = []
    for batch in finalized.select_columns(["first_dupe_row_id"]).iter_batches(
        batch_size=262144, batch_format="pyarrow"
    ):
        first_ids.append(
            batch["first_dupe_row_id"].to_numpy(zero_copy_only=False)
        )
    first_ref = ray.put(
        pa.array(np.concatenate(first_ids), type=pa.int64())
    )
    json_cols = columns_for_json

    def _json_rows(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[ROW_ID], value_set=ray.get(first_ref))
        t = batch.filter(mask)
        cols = json_cols or [
            c for c in t.column_names if c not in (ROW_ID, hash_col, SEEN_FLAG)
        ]
        payload = [
            json.dumps(
                {c: rec[c] for c in cols}, default=str, ensure_ascii=False
            )
            for rec in t.select(cols).to_pylist()
        ]
        return pa.table(
            {
                "first_dupe_row_id": pc.cast(t[ROW_ID], pa.int64()),
                "dupe_values": pa.array(payload, type=pa.string()),
            }
        )

    jds = hashed.map_batches(_json_rows, batch_format="pyarrow")

    # Attach dupe_values with a bucketed co-partition merge (union +
    # groupby(bucket) + one vectorized pandas merge per bucket) rather
    # than Dataset.join — Ray 2.49's hash-shuffle join crashes when a
    # partition receives zero left rows (empty ArrowBlockBuilder drops
    # the schema, acero then can't find the key field), which is
    # guaranteed here whenever #groups < #partitions. groupby only
    # materializes non-empty groups, so it has no such failure mode.
    cpus = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(4, min(256, cpus * 2))

    def _tag_left(t: pa.Table) -> pa.Table:
        ids = t["first_dupe_row_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array(ids % nparts, type=pa.int64()),
                "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "hash": t["hash"],
                "row_ids": t["row_ids"],
                "first_found_row_number": t["first_found_row_number"],
                "first_dupe_row_id": t["first_dupe_row_id"],
                "dupe_values": pa.nulls(t.num_rows, type=pa.string()),
            }
        )

    def _tag_right(t: pa.Table) -> pa.Table:
        ids = t["first_dupe_row_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array(ids % nparts, type=pa.int64()),
                "_side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "hash": pa.nulls(t.num_rows, type=pa.string()),
                "row_ids": pa.nulls(t.num_rows, type=pa.string()),
                "first_found_row_number": pa.nulls(t.num_rows, type=pa.int64()),
                "first_dupe_row_id": t["first_dupe_row_id"],
                "dupe_values": t["dupe_values"],
            }
        )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == 0]
        right = df[df["_side"] == 1][["first_dupe_row_id", "dupe_values"]]
        out = left.drop(columns=["dupe_values"]).merge(
            right, on="first_dupe_row_id", how="left"
        )
        # the union'd column carries nulls on the right side, which
        # pandas widens to float64 — restore the sink dtype
        out["first_found_row_number"] = out["first_found_row_number"].astype(
            np.int64
        )
        return out[out_schema_names]

    both = finalized.map_batches(_tag_left, batch_format="pyarrow").union(
        jds.map_batches(_tag_right, batch_format="pyarrow")
    )
    return both.groupby("_b").map_groups(_merge, batch_format="pandas")


def dupe_group_details(
    hashed: rd.Dataset,
    stats: rd.Dataset,
    *,
    hash_col: str = HASH_COL,
    columns_for_json: list[str] | None = None,
) -> pd.DataFrame:
    """Driver-side view of :func:`dupe_groups_ds` (reference dupeMap):
    one row per duplicated hash — hash, row_ids (python list of dupe
    row ids, ascending, keeper excluded), first_found_row_number,
    dupe_values JSON.

    Assembly is fully distributed (see dupe_groups_ds); only the FINAL
    per-group rows land here, bounded by dupe volume — the same bound
    the reference accepts for its in-heap dupeMap. For dupe-heavy
    corpora use ``dupes_detail='distributed'`` in the pipeline, which
    writes the groups Dataset straight to the sink instead.
    """
    df = dupe_groups_ds(
        hashed, stats, hash_col=hash_col, columns_for_json=columns_for_json
    ).to_pandas()
    if df.empty:
        return pd.DataFrame(
            {
                "hash": pd.Series([], dtype=str),
                "row_ids": pd.Series([], dtype=object),
                "first_found_row_number": pd.Series([], dtype=np.int64),
                "dupe_values": pd.Series([], dtype=str),
            }
        )
    df["row_ids"] = df["row_ids"].map(json.loads)
    return (
        df[["hash", "row_ids", "first_found_row_number", "dupe_values"]]
        .sort_values("hash")
        .reset_index(drop=True)
    )


def _scan_policy_block(
    t: pa.Table, key_col: str, id_col: str, score_col: str | None
) -> pa.Table:
    """Run scan over one key-sorted block for keeper election.

    Emits kind=0 rows (definitive drop ids — every non-local-keeper
    member; correct even for runs spanning blocks, since at most one
    fragment's local keeper survives the stitch) and kind=1 rows (the
    LOCAL keeper of the block's first/last runs, with key and score,
    for the driver stitch). Fully vectorized: one lexsort per block.
    """
    n = t.num_rows
    empty = pa.table(
        {
            "kind": pa.array([], type=pa.int8()),
            "key": pa.array([], type=pa.string()),
            "id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )
    if n == 0:
        return empty
    keys = pc.cast(t[key_col], pa.string()).combine_chunks()
    ids = t[id_col].to_numpy(zero_copy_only=False)
    neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
    change = np.nonzero(neq.to_numpy(zero_copy_only=False))[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    nruns = starts.size
    run_idx = np.repeat(np.arange(nruns), ends - starts)
    if score_col is None:
        scores = np.zeros(n, dtype=np.float64)
        order = np.lexsort((ids, run_idx))
    else:
        scores = (
            t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        )
        # keeper = max score, ties to min id (int scores beyond 2^53
        # may tie-collapse in float64 — documented in policy_drop_ids)
        order = np.lexsort((ids, -scores, run_idx))
    ordered_ids = ids[order]
    is_keeper = np.zeros(n, dtype=bool)
    is_keeper[starts] = True
    drops = ordered_ids[~is_keeper]
    bsel = np.array([0, nruns - 1] if nruns > 1 else [0])
    bstarts = starts[bsel]
    out_kind = np.concatenate(
        (np.zeros(drops.size, dtype=np.int8), np.ones(bsel.size, dtype=np.int8))
    )
    out_ids = np.concatenate((drops, ordered_ids[bstarts]))
    out_scores = np.concatenate(
        (np.zeros(drops.size, dtype=np.float64), scores[order][bstarts])
    )
    out_keys = pa.concat_arrays(
        [
            pa.nulls(drops.size, type=pa.string()),
            keys.take(pa.array(bstarts, type=pa.int64())),
        ]
    )
    return pa.table(
        {
            "kind": pa.array(out_kind),
            "key": out_keys,
            "id": pa.array(out_ids, type=pa.int64()),
            "score": pa.array(out_scores),
        }
    )


def policy_drop_ids(
    narrow: rd.Dataset,
    *,
    key_col: str,
    id_col: str = ROW_ID,
    score_col: str | None = None,
) -> tuple[np.ndarray, dict]:
    """Distributed keeper election over a NARROW (key[, score], id)
    projection: returns (sorted row-id array of every NON-keeper row —
    the broadcast anti-set, plus counters).

    Keeper per key group = min(id) when ``score_col`` is None, else
    max(score) with ties broken by min(id). Int scores beyond 2^53 may
    lose tie precision (ordered through float64).

    Scale shape (VERDICT r3 findings #1/#3): ONE narrow all-to-all
    sort (tens of bytes/row regardless of payload width) + a
    vectorized per-block run scan. Interior non-keepers stream back as
    int64 drop rows; block-boundary runs contribute only their LOCAL
    keeper (≤2 rows/block) to a driver stitch that demotes all but the
    global keeper. Driver residency is O(total drops) + O(2·blocks) —
    bounded by DUPE volume, never by corpus or distinct-key count.

    Keys must be non-null (callers hash/fill-null upstream).
    """
    scanned = (
        narrow.sort(key_col)
        .map_batches(
            lambda t: _scan_policy_block(t, key_col, id_col, score_col),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
    )
    frags = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)).select(
            ["key", "id", "score"]
        ),
        batch_format="pyarrow",
    ).to_pandas()
    drop_parts: list[np.ndarray] = []
    for batch in scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(["id"]),
        batch_format="pyarrow",
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        drop_parts.append(batch["id"].to_numpy(zero_copy_only=False))
    extra: list[np.ndarray] = []
    if len(frags):
        # all-but-the-best local keeper per key becomes a drop
        frags = frags.sort_values(
            ["key", "score", "id"], ascending=[True, False, True]
        )
        losers = frags[frags.duplicated(subset=["key"], keep="first")]
        if len(losers):
            extra.append(losers["id"].to_numpy(dtype=np.int64, copy=True))
    parts = drop_parts + extra
    drops = (
        np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    )
    return drops, {"n_drops": int(drops.size), "n_fragments": int(len(frags))}


def drop_row_ids(dupe_groups: pd.DataFrame) -> np.ndarray:
    """Sorted row_ids of every non-keeper row — the broadcast anti-set."""
    if dupe_groups.empty:
        return np.array([], dtype=np.int64)
    return np.sort(
        np.fromiter(
            (i for ids in dupe_groups["row_ids"] for i in ids), dtype=np.int64
        )
    )


class DropFilter:
    """map_batches anti-filter: drop rows whose row_id is in the drop set.

    The set rides the object store once (``ray.put``); each actor binds
    it in ``__init__`` as a sorted numpy array and filters with
    ``np.searchsorted`` — O(batch · log |drops|), fully vectorized.
    """

    def __init__(self, drops_ref: ray.ObjectRef):
        self.drops: np.ndarray = ray.get(drops_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.drops.size == 0:
            return batch
        ids = batch[ROW_ID].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.drops, ids)
        pos[pos >= self.drops.size] = self.drops.size - 1
        keep = self.drops[pos] != ids
        return batch.filter(pa.array(keep))


# single-slot per-worker-process cache for the broadcast drop set:
# plasma ``ray.get`` of a local numpy array is already zero-copy, the
# cache just skips the per-batch plasma round-trip. One job → one ref,
# so a single slot suffices and cannot grow.
_DROPS_SLOT: list = [None, None]  # [ref_hex, np.ndarray]


def make_drop_filter(
    drops_ref: "ray.ObjectRef",
    *,
    drop_cols: list[str] | None = None,
    id_col: str = ROW_ID,
):
    """Stateless-task variant of :class:`DropFilter`.

    A plain function for ``map_batches`` (task pool, not actor pool):
    no actor startup on the critical path, no concurrency ceiling, and
    Ray fuses it with the adjacent projection + Write into one task
    stage. ``drop_cols`` are dropped in the same pass.
    """

    def _drop(batch: pa.Table) -> pa.Table:
        key = drops_ref.hex()
        if _DROPS_SLOT[0] != key:
            _DROPS_SLOT[0] = key
            _DROPS_SLOT[1] = ray.get(drops_ref)
        drops: np.ndarray = _DROPS_SLOT[1]
        if drops.size:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(drops, ids)
            pos[pos >= drops.size] = drops.size - 1
            batch = batch.filter(pa.array(drops[pos] != ids))
        if drop_cols:
            batch = batch.drop_columns([c for c in drop_cols if c in batch.column_names])
        return batch

    return _drop


def dedupe_keep_best(
    ds: rd.Dataset,
    *,
    group_col: str,
    score_col: str,
    id_col: str = ROW_ID,
    strategy: str = "auto",
    max_broadcast_drops: int = 50_000_000,
) -> rd.Dataset:
    """Policy-dedup: one keeper per ``group_col`` value — the row with
    the MAX ``score_col`` (ties broken by MIN ``id_col``).

    Generalizes the reference's first-occurrence-wins keeper rule
    (Deduper.kt:207-240, keeper = lowest ordinal) to a quality policy:
    "of the near-identical variants, keep the best one" — the standard
    choice in training-data curation where later/longer versions beat
    the first-crawled one. First-wins is the special case
    score = -ordinal.

    Scale shape (VERDICT r3 finding #3): the DEFAULT path never
    shuffles row payloads. A narrow (md5(group), score, id) projection
    goes through :func:`policy_drop_ids` (one ~48 B/row sort + run
    scan electing the keeper per group), and the wide rows are
    anti-filtered in place against the broadcast drop set — for a text
    corpus where payload dominates row width this moves ~0.5% of the
    bytes the wide shuffle would. ``strategy="auto"`` falls back to the
    bucketed wide shuffle when the drop set itself would blow the
    broadcast budget (dupe-heavy corpora, > ``max_broadcast_drops``
    ids ≈ 8 B each); ``strategy="wide"`` forces it.

    Group identity for the narrow path is md5 of the group value's
    string form (nulls → a sentinel; distinct groups collide with
    probability ~2^-128, i.e. never).

    NOTE: ``ds`` is consumed TWICE on the narrow path (keeper election
    + anti-filter). A plain read re-executes cheaply; if ``ds`` ends in
    an expensive lazy transform, checkpoint/materialize it first —
    deliberately NOT done here, since pinning the full wide corpus in
    the object store is usually worse than re-reading it.
    """
    if strategy not in ("auto", "narrow", "wide"):
        raise ValueError(
            f"strategy must be 'auto', 'narrow' or 'wide', got {strategy!r}"
        )
    drops_arr: np.ndarray | None = None
    if strategy in ("auto", "narrow"):
        from deduper_ray.functions.hashing import md5_hex_array

        def _proj(t: pa.Table) -> pa.Table:
            col = t[group_col]
            if not pa.types.is_string(col.type) and not pa.types.is_large_string(
                col.type
            ):
                col = pc.cast(col, pa.string())
            key = md5_hex_array(pc.fill_null(col, "\x00__group_null__"))
            return pa.table(
                {
                    "_g": key,
                    score_col: pc.cast(t[score_col], pa.float64()),
                    id_col: t[id_col],
                }
            )

        narrow = ds.map_batches(_proj, batch_format="pyarrow")
        drops_arr, _ = policy_drop_ids(
            narrow, key_col="_g", id_col=id_col, score_col=score_col
        )
        if strategy == "narrow" or drops_arr.size <= max_broadcast_drops:
            drops_ref = ray.put(drops_arr)
            return ds.map_batches(
                make_drop_filter(drops_ref, id_col=id_col),
                batch_format="pyarrow",
            )
    return _keep_best_wide(
        ds, group_col=group_col, score_col=score_col, id_col=id_col
    )


def _keep_best_wide(
    ds: rd.Dataset,
    *,
    group_col: str,
    score_col: str,
    id_col: str = ROW_ID,
) -> rd.Dataset:
    """Dupe-heavy fallback: grouped argmax over full rows — one keyed
    wide all-to-all, BUCKETED on the group key's 64-bit fingerprint
    (each group wholly in one bucket); one C-level pandas sort +
    drop_duplicates per bucket picks the keepers, so Python dispatch
    count is #buckets, not #groups."""
    import ray as _ray

    from deduper_ray.functions.hashing import fingerprint64

    cpus = int(_ray.cluster_resources().get("CPU", 4))
    num_partitions = max(4, min(128, cpus * 2))

    def _tag(t: pa.Table) -> pa.Table:
        col = t[group_col]
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(
            col.type
        ):
            col = pc.cast(col, pa.string())
        fp = np.asarray(fingerprint64(pc.fill_null(col, "")))
        bucket = (fp % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("_bucket", pa.array(bucket))

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [group_col, score_col, id_col],
            ascending=[True, False, True],
        )
        out = df.drop_duplicates(subset=[group_col], keep="first")
        return out.drop(columns=["_bucket"])

    return (
        ds.map_batches(_tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(_best, batch_format="pandas")
    )


def dedupe_shuffle(hashed: rd.Dataset, *, hash_col: str = HASH_COL) -> rd.Dataset:
    """Alternative full-shuffle strategy: grouped first-wins over FULL
    rows. One wide all-to-all, zero driver state — the right choice when
    dupes are a large fraction of the corpus. (SURVEY.md §2 O7 second
    formulation.)

    BUCKETED on the hash fingerprint like ``_keep_best_wide`` (every
    hash wholly in one bucket): one C-level pandas sort +
    drop_duplicates per bucket picks the first-seen keeper and the
    SEEN_FLAG filter drops preloaded hashes — Python dispatch count is
    #buckets, not #distinct-hashes (a ``groupby(hash).map_groups`` pays
    one Python call per group: millions of hashes ⇒ millions of
    dispatches)."""
    import ray as _ray

    from deduper_ray.functions.hashing import fingerprint64

    cpus = int(_ray.cluster_resources().get("CPU", 4))
    num_partitions = max(4, min(128, cpus * 2))

    def _tag(t: pa.Table) -> pa.Table:
        fp = np.asarray(fingerprint64(pc.fill_null(t[hash_col], "")))
        bucket = (fp % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("_bucket", pa.array(bucket))

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([hash_col, ROW_ID])
        out = df.drop_duplicates(subset=[hash_col], keep="first")
        # SEEN_FLAG is a pure function of the hash, so it is identical
        # across a group: a flagged keeper means the whole group was
        # preloaded — no keeper at all
        out = out[~out[SEEN_FLAG].astype(bool)]
        return out.drop(columns=["_bucket"])

    return (
        hashed.map_batches(_tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(_first, batch_format="pandas")
    )
