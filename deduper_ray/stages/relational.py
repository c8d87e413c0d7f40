"""Relational building blocks: joins, distinct, top-k.

Join strategy (SURVEY.md §2.5 gap table; ray_guide "Joins and lookups"):
- ``broadcast_join``: the dimension side rides the object store once
  (``ray.put``), each actor merges per batch with a pandas hash join.
  No shuffle. The right choice whenever one side fits in worker heap —
  dimension tables, cluster maps, seen-sets.
- ``partitioned_join``: both sides large → Ray's hash-partitioned
  ``Dataset.join`` (all-to-all on the key). Use only when broadcast is
  impossible; key skew should be pre-checked with a count aggregate.
- ``top_k``: per-block partial top-k inside map_batches, then a final
  k-merge on the driver — never a full global sort for a k-row answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


# Per-worker-process cache of fetched broadcast sides. ray.get on a
# local object is cheap, but the payload still deserializes per call —
# the cache makes that once per worker process instead of once per
# batch. Capped at 2 entries (only the current job's side is ever
# reused; unbounded growth leaks worker heap on long-lived clusters).
_BROADCAST_CACHE: dict[bytes, object] = {}


def _fetch_broadcast(ref: ray.ObjectRef):
    key = ref.binary()
    obj = _BROADCAST_CACHE.get(key)
    if obj is None:
        if len(_BROADCAST_CACHE) >= 2:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
        obj = _BROADCAST_CACHE[key] = ray.get(ref)
    return obj


_JOIN_TYPES = {"inner": "inner", "left": "left outer", "right": "right outer"}


def broadcast_join(
    left: rd.Dataset,
    right: pd.DataFrame | pa.Table,
    on: list[str] | str,
    *,
    how: str = "inner",
) -> rd.Dataset:
    """Join ``left`` (big, streamed) with ``right`` (small, broadcast).

    Arrow-native: the broadcast side rides the object store as a
    ``pa.Table`` and each batch does one zero-copy-in ``pa.Table.join``
    (acero hash join) — no per-batch pandas round-trip.

    Deliberately STATELESS tasks, not an actor pool: chained joins as
    actor pools each reserve ``concurrency`` CPUs and can deadlock a
    small cluster (pools starving the read/shuffle stages); stateless
    tasks share the CPU pool elastically, and the per-process cache
    gives the same fetch-once behavior an actor would.
    """
    if isinstance(right, pd.DataFrame):
        right = pa.Table.from_pandas(right, preserve_index=False)
    on = [on] if isinstance(on, str) else list(on)
    right_ref = ray.put(right.combine_chunks())
    join_type = _JOIN_TYPES.get(how, how)

    def _join(batch: pa.Table) -> pa.Table:
        r = _fetch_broadcast(right_ref)
        return batch.join(
            r, keys=on, join_type=join_type, right_suffix="_r"
        )

    return left.map_batches(_join, batch_format="pyarrow")


def partitioned_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: list[str] | str,
    *,
    how: str = "inner",
    num_partitions: int = 64,
) -> rd.Dataset:
    """Large×large hash-partitioned join (one all-to-all per side)."""
    on = (on,) if isinstance(on, str) else tuple(on)
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on,
        right_on=on,
    )


def top_k(
    ds: rd.Dataset,
    k: int,
    *,
    sort_keys: list[str],
    descending: list[bool] | bool = True,
) -> pa.Table:
    """Global top-k without a global sort: per-block partial top-k
    (vectorized pandas nsmallest/nlargest-equivalent via sort_values
    head), then a driver merge over ≤ #blocks × k rows."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_keys)
    ascending = [not d for d in descending]

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(sort_keys, ascending=ascending).head(k)

    from deduper_ray.functions.util import dataset_to_table

    cand = dataset_to_table(
        ds.map_batches(_partial, batch_format="pandas")
    ).to_pandas()
    out = cand.sort_values(sort_keys, ascending=ascending).head(k)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def asof_join(
    left: rd.Dataset,
    right: pd.DataFrame,
    *,
    by: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> rd.Dataset:
    """As-of join: for each left row, the latest right row with
    right_ts ≤ left_ts (direction='backward') sharing the ``by`` key.

    Broadcast form: the right side (dimension-sized — e.g. an orders
    table against an event stream) is sorted once and shipped via the
    object store; each batch does one ``pd.merge_asof``. For two large
    sides, bucket both by hash(by) and run the same merge per bucket
    pair (ray_guide "As-of / range join") — not needed at current
    sizes.
    """
    right = right.sort_values([right_ts, by]).reset_index(drop=True)
    right_ref = ray.put(right)

    def _asof(batch: pd.DataFrame) -> pd.DataFrame:
        r = _fetch_broadcast(right_ref)
        b = batch.sort_values(left_ts)
        out = pd.merge_asof(
            b, r, left_on=left_ts, right_on=right_ts, by=by,
            direction=direction,
        )
        return out

    return left.map_batches(_asof, batch_format="pandas")


def grouped_top_k(
    ds: rd.Dataset,
    k: int,
    *,
    group_keys: list[str],
    sort_keys: list[str],
    descending: list[bool] | bool = True,
) -> pa.Table:
    """Top-k rows PER GROUP without a global shuffle: each block keeps
    its local per-group top-k (vectorized pandas groupby head), the
    driver merges ≤ #blocks × #groups-in-block × k rows. Right for
    few-to-moderate group counts (per-language/per-source selections);
    for millions of groups use a sort on (group, keys) + run scan."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_keys)
    ascending = [not d for d in descending]

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(sort_keys, ascending=ascending)
            .groupby(group_keys, sort=False)
            .head(k)
        )

    from deduper_ray.functions.util import dataset_to_table

    cand = dataset_to_table(
        ds.map_batches(_partial, batch_format="pandas")
    ).to_pandas()
    out = (
        cand.sort_values(sort_keys, ascending=ascending)
        .groupby(group_keys, sort=False)
        .head(k)
        .sort_values(group_keys + sort_keys, ascending=[True] * len(group_keys) + ascending)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def distinct(ds: rd.Dataset, columns: list[str]) -> rd.Dataset:
    """Distinct rows over ``columns``: batch-local dedup first (cheap,
    shrinks the shuffle), then the native groupby-count collapse."""
    from ray.data.aggregate import Count

    def _local(t: pa.Table) -> pa.Table:
        df = t.select(columns).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pre = ds.map_batches(_local, batch_format="pyarrow")
    agg = pre.groupby(columns).aggregate(Count(alias_name="_n"))
    return agg.map_batches(lambda t: t.select(columns), batch_format="pyarrow")
