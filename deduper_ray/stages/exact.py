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


def dupe_group_details(
    hashed: rd.Dataset,
    stats: rd.Dataset,
    *,
    hash_col: str = HASH_COL,
    columns_for_json: list[str] | None = None,
) -> pd.DataFrame:
    """Materialize the dupe groups (reference dupeMap, Deduper.kt:107).

    Returns a driver-side DataFrame with one row per duplicated hash:
      hash, row_ids (list of dupe row ids, ascending, keeper excluded),
      first_found_row_number (0 when the hash was preloaded,
      Deduper.kt:152), dupe_values (JSON of the FIRST duplicate
      occurrence's row, canonical schema-order keys — reference
      Deduper.kt:226-240).

    Driver residency is bounded by the number of DUPE rows, the same
    bound the reference accepts for its in-heap dupeMap.
    """
    dupe_stats = stats.map_batches(
        lambda t: t.filter(
            pc.or_(pc.greater(t["n_rows"], 1), pc.greater(t["any_seen"], 0))
        ),
        batch_format="pyarrow",
    ).to_pandas()
    if dupe_stats.empty:
        return pd.DataFrame(
            {
                "hash": pd.Series([], dtype=str),
                "row_ids": pd.Series([], dtype=object),
                "first_found_row_number": pd.Series([], dtype=np.int64),
                "dupe_values": pd.Series([], dtype=str),
            }
        )

    hashes_ref = ray.put(pa.array(dupe_stats[hash_col], type=pa.string()))

    def _members(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[hash_col], value_set=ray.get(hashes_ref))
        t = batch.filter(mask)
        return pa.table({hash_col: t[hash_col], ROW_ID: t[ROW_ID]})

    members = (
        hashed.map_batches(_members, batch_format="pyarrow")
        .to_pandas()
        .sort_values(ROW_ID)
    )

    seen_map = dict(zip(dupe_stats[hash_col], dupe_stats["any_seen"] > 0))
    first_map = dict(zip(dupe_stats[hash_col], dupe_stats["first_row_id"]))

    rows = []
    for h, grp in members.groupby(hash_col, sort=True):
        ids = grp[ROW_ID].to_numpy()
        if seen_map[h]:
            dupe_ids = ids  # every occurrence is a dupe
            first_found = 0  # preload convention, Deduper.kt:152
        else:
            dupe_ids = ids[1:]  # first occurrence is the keeper
            first_found = int(ids[0])
        rows.append(
            {
                "hash": h,
                "row_ids": [int(i) for i in dupe_ids],
                "first_found_row_number": first_found,
                "first_dupe_row_id": int(dupe_ids[0]),
            }
        )
    out = pd.DataFrame(rows)

    # JSON of the first duplicate occurrence's values (reference
    # Deduper.kt:230). The first-dupe id set is one row per group —
    # broadcast it, pull just those rows, render canonical JSON.
    first_ids = ray.put(pa.array(out["first_dupe_row_id"].to_numpy(), type=pa.int64()))
    json_cols = columns_for_json

    def _json_rows(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[ROW_ID], value_set=ray.get(first_ids))
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
            {ROW_ID: t[ROW_ID], "dupe_values": pa.array(payload, type=pa.string())}
        )

    jdf = hashed.map_batches(_json_rows, batch_format="pyarrow").to_pandas()
    jmap = dict(zip(jdf[ROW_ID], jdf["dupe_values"]))
    out["dupe_values"] = out["first_dupe_row_id"].map(jmap)
    return out.drop(columns=["first_dupe_row_id"]).reset_index(drop=True)


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


def make_drop_filter(drops_ref: "ray.ObjectRef", *, drop_cols: list[str] | None = None):
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
            ids = batch[ROW_ID].to_numpy(zero_copy_only=False)
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
) -> rd.Dataset:
    """Policy-dedup: one keeper per ``group_col`` value — the row with
    the MAX ``score_col`` (ties broken by MIN ``id_col``).

    Generalizes the reference's first-occurrence-wins keeper rule
    (Deduper.kt:207-240, keeper = lowest ordinal) to a quality policy:
    "of the near-identical variants, keep the best one" — the standard
    choice in training-data curation where later/longer versions beat
    the first-crawled one. First-wins is the special case
    score = -ordinal.

    Scale shape: grouped argmax over full rows — one keyed wide
    all-to-all (the keeper row must survive with its payload, same as
    ``dedupe_shuffle``), BUCKETED: rows hash-partition on the group
    key's 64-bit fingerprint (each group wholly in one bucket) and one
    C-level pandas sort + drop_duplicates per bucket picks the keepers
    — Python dispatch count is #buckets, not #groups (the
    grouped_ordered_concat rationale). When the payload is heavy and
    groups are dupe-sparse, run this over a narrow (group, score, id)
    projection instead and anti-filter with the broadcast keeper set
    (the drop-set pattern).
    """
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
    """

    def _first(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group[ROW_ID])
        first = group.take(order[:1])
        if first[SEEN_FLAG][0].as_py():
            return first.slice(0, 0)  # preloaded hash: no keeper at all
        return first

    return hashed.groupby(hash_col).map_groups(_first, batch_format="pyarrow")
