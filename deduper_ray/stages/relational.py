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
import pyarrow.compute as pc
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


def _ts_us(col, name: str, fn: str) -> np.ndarray:
    """Epoch-microsecond int64 values of a timestamp column, unit-safe.

    The band-join kernels add ``window_sec * 1e6`` to these values; a
    bare ``pc.cast(col, int64)`` would accept date32 or epoch-second
    ints and silently make windows 10^6× off — so non-timestamp types
    are rejected, and any timestamp unit (s/ms/us/ns) is normalized to
    microseconds through a timestamp-to-timestamp cast."""
    if not pa.types.is_timestamp(col.type):
        raise TypeError(
            f"{fn}: column {name!r} must be a timestamp type, got "
            f"{col.type} — cast to timestamp first (window offsets are "
            "computed in microseconds)"
        )
    return pc.cast(
        pc.cast(col, pa.timestamp("us")), pa.int64()
    ).to_numpy(zero_copy_only=False)


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
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Large×large hash-partitioned join (one all-to-all per side).

    Default partition count scales with cluster CPUs — Ray's hash
    shuffle spawns one aggregator per partition (0.125 CPU each) and a
    64-partition join DEADLOCKS a ≤4-CPU cluster waiting for
    aggregator slots.

    Memory caveat: each aggregator buffers its partition of BOTH sides
    in actor heap (measured ~3 GB/actor joining 10^7 512-byte-blob rows
    — a global OOM; SCALE.md round-5 session-4). Fine for the narrow
    rows this repo joins; for wide-payload co-location use the
    sort-merge attach pattern (stages/verify.py
    ``_attach_endpoint_signatures``) instead."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, min(64, cpus * 2))
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
    (Arrow-native ``pc.sort_indices`` + head-k ``take`` — zero-copy
    blocks, no pandas round-trip), then a driver merge over
    ≤ #blocks × k rows."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_keys)
    spec = [
        (c, "descending" if d else "ascending")
        for c, d in zip(sort_keys, descending)
    ]

    def _partial(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=spec)
        return batch.take(order.slice(0, k))

    from deduper_ray.functions.util import dataset_to_table

    cand = dataset_to_table(ds.map_batches(_partial, batch_format="pyarrow"))
    order = pc.sort_indices(cand, sort_keys=spec)
    return cand.take(order.slice(0, k)).combine_chunks()


def asof_join(
    left: rd.Dataset,
    right: pd.DataFrame | rd.Dataset,
    *,
    by: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """As-of join: for each left row, the latest right row with
    right_ts ≤ left_ts (direction='backward') sharing the ``by`` key.

    Dispatch: a pandas DataFrame right side (dimension-sized) takes
    the BROADCAST path — sorted once, shipped via the object store,
    one ``pd.merge_asof`` per batch, no shuffle. A Dataset right side
    takes the BUCKETED path (``asof_join_partitioned``) — both sides
    hash-co-partitioned on ``by``, correct for two event-scale sides.
    """
    if isinstance(right, rd.Dataset):
        return asof_join_partitioned(
            left, right, by=by, left_ts=left_ts, right_ts=right_ts,
            direction=direction, num_partitions=num_partitions,
        )
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


def asof_join_partitioned(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Two-LARGE-sides as-of join: hash-bucket BOTH sides on the ``by``
    key (every row of a key lands in exactly one bucket, so the as-of
    semantics are preserved bucket-locally), co-group via one
    ``groupby(bucket)`` shuffle, and run one vectorized
    ``pd.merge_asof`` per bucket. Nothing is broadcast; the driver
    holds nothing. Output columns match the broadcast path.
    """
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(4, min(128, cpus * 2))
    left_cols = [c for c in left.schema().names]
    right_cols = [c for c in right.schema().names]
    right_only = [c for c in right_cols if c not in left_cols or c == by]

    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def _tag(side: int, all_cols: list[str], own_cols: list[str],
             schema_types: dict):
        def _f(t: pa.Table) -> pa.Table:
            key = t[by].to_numpy(zero_copy_only=False).astype(np.uint64)
            bucket = ((key * GOLD) >> np.uint64(33)) % np.uint64(
                num_partitions
            )
            cols = {
                "_bucket": pa.array(bucket.astype(np.int64)),
                "_side": pa.array(
                    np.full(t.num_rows, side, dtype=np.int8)
                ),
            }
            for c in all_cols:
                if c in own_cols:
                    cols[c] = t[c]
                else:
                    cols[c] = pa.nulls(t.num_rows, type=schema_types[c])
            return pa.table(cols)

        return _f

    types: dict = {}
    for name, typ in zip(left.schema().names, left.schema().types):
        types[name] = typ
    for name, typ in zip(right.schema().names, right.schema().types):
        types.setdefault(name, typ)
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    tagged = left.map_batches(
        _tag(0, all_cols, left_cols, types), batch_format="pyarrow"
    ).union(
        right.map_batches(
            _tag(1, all_cols, right_cols, types), batch_format="pyarrow"
        )
    )

    out_cols = all_cols

    # integer/bool columns pick up nulls from the OTHER side's rows in
    # the co-grouped frame and arrive float64/object in pandas; cast
    # back after the side split (side rows are null-free in own cols)
    int_like = {
        c: ("int64" if pa.types.is_integer(types[c]) else "bool")
        for c in all_cols
        if pa.types.is_integer(types[c]) or pa.types.is_boolean(types[c])
    }

    def _restore(frame: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
        casts = {
            c: int_like[c]
            for c in cols
            if c in int_like and str(frame[c].dtype) != int_like[c]
        }
        return frame.astype(casts) if casts else frame

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        l = _restore(df[df["_side"] == 0][left_cols], left_cols).sort_values(
            left_ts
        )
        r = _restore(
            df[df["_side"] == 1][right_cols], right_cols
        ).sort_values([right_ts, by])
        if l[left_ts].dtype != r[right_ts].dtype:
            # datetime columns of different resolution (e.g. event
            # timestamp[us] vs order date[s]) → lossless common ns
            if (l[left_ts].dtype.kind == "M"
                    and r[right_ts].dtype.kind == "M"):
                l = l.assign(
                    **{left_ts: l[left_ts].astype("datetime64[ns]")}
                )
                r = r.assign(
                    **{right_ts: r[right_ts].astype("datetime64[ns]")}
                )
            else:
                r = r.assign(
                    **{right_ts: r[right_ts].astype(l[left_ts].dtype)}
                )
        merged = pd.merge_asof(
            l, r, left_on=left_ts, right_on=right_ts, by=by,
            direction=direction,
        )
        return merged.reindex(columns=out_cols)

    return tagged.groupby("_bucket").map_groups(
        _merge, batch_format="pandas"
    )


def _lex_insert_left(
    pk: np.ndarray, pt: np.ndarray, qk: np.ndarray, qt: np.ndarray
) -> np.ndarray:
    """Vectorized lexicographic searchsorted: for each query (qk, qt),
    the count of points (pk, pt) strictly before it under (key, ts)
    order with insert-LEFT tie rule (i.e. #points with key<qk, or
    key==qk and ts<qt). Points need not be pre-sorted. O((P+Q) log)."""
    n, m = pk.size, qk.size
    keys = np.concatenate([pk, qk])
    ts = np.concatenate([pt, qt])
    # tie rank: queries sort BEFORE equal points → insert-left
    tie = np.concatenate(
        [np.ones(n, dtype=np.int8), np.zeros(m, dtype=np.int8)]
    )
    order = np.lexsort((tie, ts, keys))
    pos = np.empty(order.size, dtype=np.int64)
    pos[order] = np.arange(order.size)
    q_pos = pos[n:]
    is_q = np.zeros(order.size, dtype=np.int64)
    is_q[order >= n] = 1
    q_before_incl = np.cumsum(is_q)  # queries at-or-before each slot
    return q_pos - (q_before_incl[q_pos] - 1)


def range_join_count(
    points: rd.Dataset,
    intervals: rd.Dataset,
    *,
    by: str,
    point_ts: str,
    interval_start: str,
    window_sec: int,
    interval_id: str,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Interval/range join, count form: for each interval row, the
    number of point rows sharing the ``by`` key with
    ``interval_start ≤ point_ts < interval_start + window_sec``
    (LEFT-join semantics: intervals with no matching points count 0).

    The band-join class Ray Data lacks (SQL: ``ON key = key AND ts
    BETWEEN start AND start + w``). Naive formulations shuffle an
    exploded equi-join (every key collision × every point) — this one
    hash-co-partitions BOTH sides on the key (same bucketing as
    ``asof_join_partitioned``) and resolves each bucket with a fully
    vectorized lexicographic rank difference: count = rank(key, end) −
    rank(key, start) over the bucket's points — O((P+Q) log) per
    bucket, no per-row or per-key Python, nothing broadcast, no driver
    state. Partitioning assumption: a single hot key's points fit one
    bucket task (salt the key upstream if not).

    Returns (interval_id, n_points).
    """
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(4, min(128, cpus * 2))
    GOLD = np.uint64(0x9E3779B97F4A7C15)
    win_us = np.int64(window_sec) * 1_000_000

    def _bucket_of(key: np.ndarray) -> np.ndarray:
        return (
            ((key.astype(np.uint64) * GOLD) >> np.uint64(33))
            % np.uint64(num_partitions)
        ).astype(np.int64)

    def _tag_points(t: pa.Table) -> pa.Table:
        key = t[by].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_us(t[point_ts], point_ts, "range_join_count")
        return pa.table(
            {
                "_bucket": pa.array(_bucket_of(key)),
                "_side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "k": pa.array(key),
                "t": pa.array(ts),
                "iid": pa.nulls(t.num_rows, type=pa.int64()),
            }
        )

    def _tag_intervals(t: pa.Table) -> pa.Table:
        key = t[by].to_numpy(zero_copy_only=False).astype(np.int64)
        start = _ts_us(t[interval_start], interval_start, "range_join_count")
        return pa.table(
            {
                "_bucket": pa.array(_bucket_of(key)),
                "_side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "k": pa.array(key),
                "t": pa.array(start),
                "iid": pc.cast(t[interval_id], pa.int64()),
            }
        )

    tagged = points.map_batches(_tag_points, batch_format="pyarrow").union(
        intervals.map_batches(_tag_intervals, batch_format="pyarrow")
    )

    def _count(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        k = g["k"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        p, q = side == 0, side == 1
        if not q.any():
            return pa.table(
                {
                    interval_id: pa.array([], type=pa.int64()),
                    "n_points": pa.array([], type=pa.int64()),
                }
            )
        iid = g["iid"].to_numpy(zero_copy_only=False)[q].astype(np.int64)
        pk, pt = k[p], t[p]
        qk, qs = k[q], t[q]
        lo = _lex_insert_left(pk, pt, qk, qs)
        hi = _lex_insert_left(pk, pt, qk, qs + win_us)
        return pa.table(
            {
                interval_id: pa.array(iid, type=pa.int64()),
                "n_points": pa.array(hi - lo, type=pa.int64()),
            }
        )

    return tagged.groupby("_bucket").map_groups(_count, batch_format="pyarrow")


def grouped_ordered_concat(
    ds: rd.Dataset,
    *,
    key: str,
    order_cols: list[str],
    value_col: str,
    sep: str = ",",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """``string_agg(value_col, sep ORDER BY order_cols)`` per key —
    grouped sequence assembly at corpus-scale key cardinality.

    Bucket backend (the grouped_row_number pattern): rows hash-bucket
    by key (each key wholly in one bucket), ONE grouped task per bucket
    runs a pandas sort + C-level groupby-agg — Python dispatch count is
    #buckets, not #keys (a ``groupby(key).map_groups`` pays a Python
    call per key: millions of users ⇒ millions of calls)."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(4, min(128, cpus * 2))
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def _tag(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = ((k * GOLD) >> np.uint64(33)) % np.uint64(num_partitions)
        return t.append_column(
            "_bucket", pa.array(bucket.astype(np.int64))
        )

    def _concat(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols)
        g = df.groupby(key, sort=True)
        return pd.DataFrame(
            {
                key: g.size().index,
                "n_events": g.size().to_numpy(),
                "seq": g[value_col].agg(sep.join).to_numpy(),
            }
        )

    return (
        ds.map_batches(_tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(_concat, batch_format="pandas")
    )


def funnel_first_conversion(
    triggers: rd.Dataset,
    conversions: rd.Dataset,
    *,
    by: str,
    trigger_ts: str,
    conversion_ts: str,
    window_sec: int,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Temporal funnel: per key, the FIRST conversion event preceded by
    a trigger event within ``window_sec`` (trigger strictly before the
    conversion). Returns (by, first_conv_ts_us).

    Both sides hash-co-partition on the key; each bucket resolves with
    TWO lexicographic rank differences (the range_join_count kernel):
    a conversion qualifies iff #triggers before (key, t) exceeds
    #triggers before (key, t − window) — fully vectorized, no per-key
    Python. First-per-key selection is a sorted run scan."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(4, min(128, cpus * 2))
    GOLD = np.uint64(0x9E3779B97F4A7C15)
    win_us = np.int64(window_sec) * 1_000_000

    def _tag(side: int, ts_col: str):
        def _f(t: pa.Table) -> pa.Table:
            k = t[by].to_numpy(zero_copy_only=False).astype(np.int64)
            bucket = (
                (k.astype(np.uint64) * GOLD) >> np.uint64(33)
            ) % np.uint64(num_partitions)
            return pa.table(
                {
                    "_bucket": pa.array(bucket.astype(np.int64)),
                    "_side": pa.array(
                        np.full(t.num_rows, side, dtype=np.int8)
                    ),
                    "k": pa.array(k),
                    "t": pa.array(
                        _ts_us(t[ts_col], ts_col, "funnel_first_conversion")
                    ),
                }
            )

        return _f

    tagged = triggers.map_batches(
        _tag(0, trigger_ts), batch_format="pyarrow"
    ).union(
        conversions.map_batches(_tag(1, conversion_ts), batch_format="pyarrow")
    )

    def _resolve(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        k = g["k"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        trig, conv = side == 0, side == 1
        empty = pa.table(
            {
                by: pa.array([], type=pa.int64()),
                "first_conv_ts_us": pa.array([], type=pa.int64()),
            }
        )
        if not trig.any() or not conv.any():
            return empty
        tk, tt = k[trig], t[trig]
        ck, ct = k[conv], t[conv]
        lo = _lex_insert_left(tk, tt, ck, ct - win_us)
        hi = _lex_insert_left(tk, tt, ck, ct)
        ok = hi > lo
        if not ok.any():
            return empty
        qk, qt = ck[ok], ct[ok]
        order = np.lexsort((qt, qk))
        qk, qt = qk[order], qt[order]
        first = np.concatenate(([True], qk[1:] != qk[:-1]))
        return pa.table(
            {
                by: pa.array(qk[first], type=pa.int64()),
                "first_conv_ts_us": pa.array(qt[first], type=pa.int64()),
            }
        )

    return tagged.groupby("_bucket").map_groups(
        _resolve, batch_format="pyarrow"
    )


def grouped_top_k(
    ds: rd.Dataset,
    k: int,
    *,
    group_keys: list[str],
    sort_keys: list[str],
    descending: list[bool] | bool = True,
) -> pa.Table:
    """Top-k rows PER GROUP without a global shuffle: each block keeps
    its local per-group top-k (Arrow-native sort + vectorized run-rank
    scan — no pandas round-trip), the driver merges ≤ #blocks ×
    #groups-in-block × k rows. Right for few-to-moderate group counts
    (per-language/per-source selections); for millions of groups use a
    sort on (group, keys) + run scan."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_keys)
    spec = [(g, "ascending") for g in group_keys] + [
        (c, "descending" if d else "ascending")
        for c, d in zip(sort_keys, descending)
    ]

    def _group_head(batch: pa.Table) -> pa.Table:
        """Sort by (groups, keys), then keep each group run's first k
        rows via a vectorized within-run rank."""
        n = batch.num_rows
        if n == 0:
            return batch
        t = batch.take(pc.sort_indices(batch, sort_keys=spec))
        change = np.zeros(max(n - 1, 0), dtype=bool)
        for g in group_keys:
            col = t[g].combine_chunks()
            neq = pc.fill_null(
                pc.not_equal(col.slice(1), col.slice(0, n - 1)), True
            )
            change |= neq.to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.nonzero(change)[0] + 1))
        lens = np.diff(np.concatenate((starts, [n])))
        rank = np.arange(n) - np.repeat(starts, lens)
        return t.filter(pa.array(rank < k))

    from deduper_ray.functions.util import dataset_to_table

    cand = dataset_to_table(
        ds.map_batches(_group_head, batch_format="pyarrow")
    ).combine_chunks()
    return _group_head(cand).combine_chunks()


def distinct(ds: rd.Dataset, columns: list[str]) -> rd.Dataset:
    """Distinct rows over ``columns``: batch-local dedup first (cheap,
    shrinks the shuffle), then the native groupby-count collapse."""
    from ray.data.aggregate import Count

    def _local(t: pa.Table) -> pa.Table:
        # Arrow-native local pre-dedup (zero-copy from the object
        # store; a to_pandas().drop_duplicates() here paid a full
        # pandas conversion per batch)
        return t.select(columns).group_by(columns).aggregate([])

    pre = ds.map_batches(_local, batch_format="pyarrow")
    agg = pre.groupby(columns).aggregate(Count(alias_name="_n"))
    return agg.map_batches(lambda t: t.select(columns), batch_format="pyarrow")


def token_heavy_hitters(
    ds: rd.Dataset,
    *,
    text_column: str = "text",
    k: int = 20,
    split: str = " ",
) -> pa.Table:
    """Top-k most frequent tokens across a text corpus.

    Classic combiner shape: each batch splits its text (one vectorized
    ``split_pattern`` + flatten) and collapses to batch-local (token,
    count) partials, so the shuffle moves per-batch VOCABULARY rows,
    not per-token rows. The global groupby-sum then works on bounded
    data, and the final top-k is the partial-top-k merge (no global
    sort). Ties break lexicographically (count desc, token asc) so the
    result is deterministic and oracle-comparable.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t[text_column], split))
        tbl = pa.table({"token": pc.drop_null(toks)})
        tbl = tbl.filter(pc.not_equal(tbl["token"], ""))
        return pa.TableGroupBy(tbl, "token").aggregate([("token", "count")])

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("token_count", alias_name="cnt"))
    )
    out = top_k(
        counts, k, sort_keys=["cnt", "token"], descending=[True, False]
    )
    return out.select(["token", "cnt"])


def token_heavy_hitters_mg(
    ds: rd.Dataset,
    *,
    text_column: str = "text",
    k: int = 20,
    split: str = " ",
    capacity: int = 4096,
) -> pa.Table:
    """Top-k tokens with BOUNDED state at unbounded vocabularies —
    the Misra-Gries upgrade of :func:`token_heavy_hitters` (whose
    per-batch vocabulary combiner still shuffles one row per distinct
    token; fine for language-sized vocabularies, unbounded for
    e.g. URL/id-like token domains).

    Two passes, both narrow:
      1. per-block Misra-Gries summaries of ``capacity`` counters
         (exact block counts compressed by subtracting the
         (capacity+1)-th largest — the classic mergeable-summary
         form), merged + re-compressed on the driver. Any token with
         true count > n/capacity is guaranteed to survive the merge;
         driver state is O(capacity), never O(vocabulary).
      2. exact recount of the surviving candidates only (broadcast
         membership filter + per-block counts), so the RETURNED counts
         are exact. Result equals the exact top-k whenever the true
         k-th count exceeds n/capacity (one undercount bound per
         merge level); ties break (count desc, token asc).
    """
    def _mg_compress(tokens: np.ndarray, counts: np.ndarray, cap: int):
        if tokens.size <= cap:
            return tokens, counts
        # subtract the (cap+1)-th largest count; drop non-positive
        kth = np.partition(counts, -cap - 1)[-cap - 1]
        keep = counts > kth
        return tokens[keep], counts[keep] - kth

    def _block_summary(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t[text_column], split))
        toks = pc.drop_null(toks)
        arr = toks.to_numpy(zero_copy_only=False)
        arr = arr[arr != ""]
        tokens, counts = np.unique(arr, return_counts=True)
        tokens, counts = _mg_compress(tokens, counts, capacity)
        return pa.table(
            {
                "token": pa.array(tokens, type=pa.string()),
                "cnt": pa.array(counts, type=pa.int64()),
            }
        )

    from deduper_ray.functions.util import dataset_to_table

    merged = dataset_to_table(
        ds.map_batches(_block_summary, batch_format="pyarrow")
    )
    if merged.num_rows == 0:
        return pa.table(
            {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    tdf = merged.to_pandas().groupby("token", sort=False)["cnt"].sum()
    tokens, counts = _mg_compress(
        tdf.index.to_numpy(), tdf.to_numpy(), capacity
    )
    # candidates: over-select beyond k to absorb summary undercounts
    order = np.argsort(-counts, kind="stable")[: max(4 * k, 64)]
    cand = np.sort(tokens[order])
    cand_ref = ray.put(cand)

    def _recount(t: pa.Table) -> pa.Table:
        c: np.ndarray = _fetch_broadcast(cand_ref)
        toks = pc.list_flatten(pc.split_pattern(t[text_column], split))
        arr = pc.drop_null(toks).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(c, arr)
        pos_c = np.minimum(pos, c.size - 1)
        hit = c[pos_c] == arr
        counts = np.bincount(pos_c[hit], minlength=c.size)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "idx": pa.array(nz, type=pa.int64()),
                "cnt": pa.array(counts[nz], type=pa.int64()),
            }
        )

    parts = dataset_to_table(
        ds.map_batches(_recount, batch_format="pyarrow"),
        pa.schema([("idx", pa.int64()), ("cnt", pa.int64())]),
    )
    exact = np.zeros(cand.size, dtype=np.int64)
    np.add.at(
        exact,
        parts["idx"].to_numpy(zero_copy_only=False),
        parts["cnt"].to_numpy(zero_copy_only=False),
    )
    out = pa.table(
        {
            "token": pa.array(cand, type=pa.string()),
            "cnt": pa.array(exact, type=pa.int64()),
        }
    )
    order = pc.sort_indices(
        out, sort_keys=[("cnt", "descending"), ("token", "ascending")]
    )
    return out.take(order.slice(0, k))


def _group_buckets(
    t: pa.Table, group_cols: list[str], num_partitions: int
) -> pa.Table:
    """Append a ``_bucket`` column = fingerprint of the group key(s) mod
    partitions — every group lands wholly in one bucket."""
    from deduper_ray.functions.hashing import fingerprint64

    key = None
    for c in group_cols:
        col = t[c]
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(
            col.type
        ):
            col = pc.cast(col, pa.string())
        col = pc.fill_null(col, "\x00null\x00")
        key = col if key is None else pc.binary_join_element_wise(
            key, col, "\x1f"
        )
    fp = np.asarray(fingerprint64(key))
    bucket = (fp % np.uint64(num_partitions)).astype(np.int64)
    return t.append_column("_bucket", pa.array(bucket))


def _auto_partitions(num_partitions: int | None) -> int:
    if num_partitions is not None:
        return num_partitions
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(4, min(128, cpus * 2))


def grouped_argmax(
    ds: rd.Dataset,
    *,
    group_cols: list[str],
    order_by: list[tuple[str, bool]],
    num_partitions: int | None = None,
) -> rd.Dataset:
    """One row per group: the FIRST row under the ``order_by`` spec
    [(col, ascending), ...] — SQL ``row_number() OVER (PARTITION BY
    group ORDER BY ...) = 1``, i.e. argmax/argmin/latest-per-key.

    Scale shape: rows hash-bucket on the group fingerprint (each group
    wholly in one bucket), ONE C-level pandas sort + drop_duplicates
    per bucket — Python dispatch count is #buckets, not #groups.
    Generalizes dedupe_keep_best's wide path to arbitrary multi-column
    order specs (string tie-breakers included)."""
    nparts = _auto_partitions(num_partitions)
    cols = [c for c, _ in order_by]
    asc = [a for _, a in order_by]

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(list(group_cols) + cols, ascending=[True] * len(group_cols) + asc)
        return df.drop_duplicates(subset=group_cols, keep="first").drop(
            columns=["_bucket"]
        )

    return (
        ds.map_batches(
            lambda t: _group_buckets(t, group_cols, nparts),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(_best, batch_format="pandas")
    )


def grouped_running_sum(
    ds: rd.Dataset,
    *,
    key: str,
    order_cols: list[str],
    value_col: str,
    out: str = "running_sum",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """``SUM(value) OVER (PARTITION BY key ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` — the cumulative-sequence window function.

    Bucketed on the key fingerprint; per bucket one pandas sort +
    C-level ``groupby(key).cumsum()``. Pass an INT value column for
    exact cross-engine equality (the _cents protocol)."""
    nparts = _auto_partitions(num_partitions)

    def _cum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols)
        df[out] = df.groupby(key, sort=False)[value_col].cumsum()
        return df.drop(columns=["_bucket"])

    return (
        ds.map_batches(
            lambda t: _group_buckets(t, [key], nparts),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(_cum, batch_format="pandas")
    )


def grouped_moving_avg(
    ds: rd.Dataset,
    *,
    key: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    out: str = "moving_avg",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """``AVG(value) OVER (PARTITION BY key ORDER BY order_cols ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW)`` — the bounded-frame
    moving average. Bucketed like grouped_running_sum; the frame is a
    C-level pandas ``groupby.rolling(window, min_periods=1).mean()``.

    For exact cross-engine equality feed an INT value column and
    divide by the SAME frame counts on both sides (the mean of k ints
    is one float division — bit-equal when numerator/denominator
    match)."""
    nparts = _auto_partitions(num_partitions)

    def _mov(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols)
        g = df.groupby(key, sort=False)[value_col]
        s = g.rolling(window, min_periods=1).sum().reset_index(drop=True)
        n = g.rolling(window, min_periods=1).count().reset_index(drop=True)
        df = df.reset_index(drop=True)
        df[out] = s.to_numpy() / n.to_numpy()
        return df.drop(columns=["_bucket"])

    return (
        ds.map_batches(
            lambda t: _group_buckets(t, [key], nparts),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(_mov, batch_format="pandas")
    )


def global_running_sum(
    ds: rd.Dataset,
    *,
    order_col: str,
    value_col: str,
    out: str = "running_sum",
) -> rd.Dataset:
    """``SUM(value) OVER (ORDER BY order_col ROWS UNBOUNDED PRECEDING)``
    — the GLOBAL (keyless) distributed scan, the primitive behind
    token-budget shard assignment and offset planning.

    Two passes, no data rows on the driver: sort by ``order_col``, then
    (1) per sorted block emit ONE metadata row (block min order, block
    sum); the driver orders these and prefix-sums → per-block starting
    offsets, broadcast via ``ray.put`` keyed by block min order;
    (2) per block, running = offset + vectorized cumsum. Driver holds
    one row PER BLOCK — O(blocks), never O(rows).

    Requires ``order_col`` values globally unique (a total order —
    same contract as grouped_row_number's runscan backend; raises on
    block-min collisions, which unique orders make impossible). The
    order column may be int or string (e.g. an md5 shuffle key).
    """
    import bisect

    sorted_ds = ds.sort(order_col).materialize()

    def _meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "mo": pa.array([], type=t[order_col].type),
                    "s": pa.array([], type=pa.int64()),
                }
            )
        v = t[value_col].to_numpy(zero_copy_only=False)
        # block is sorted by order_col → min is the first element
        return pa.table(
            {
                "mo": t[order_col].slice(0, 1),
                "s": pa.array([int(v.sum())], type=pa.int64()),
            }
        )

    meta = sorted_ds.map_batches(
        _meta, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    meta = meta.sort_values("mo").reset_index(drop=True)
    if meta["mo"].duplicated().any():
        raise ValueError(
            "global_running_sum: duplicate block-min order values — "
            f"{order_col!r} must be globally unique"
        )
    offsets = np.concatenate(([0], meta["s"].cumsum().to_numpy()[:-1]))
    off_ref = ray.put(
        {
            "mins": meta["mo"].tolist(),
            "offs": offsets.astype(np.int64),
        }
    )

    def _scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out, pa.array([], type=pa.int64()))
        m = _fetch_broadcast(off_ref)
        v = t[value_col].to_numpy(zero_copy_only=False)
        # this block is one sorted run; locate its offset by block min
        i = bisect.bisect_left(m["mins"], t[order_col][0].as_py())
        run = np.cumsum(v, dtype=np.int64) + np.int64(m["offs"][i])
        return t.append_column(out, pa.array(run, type=pa.int64()))

    return sorted_ds.map_batches(
        _scan, batch_format="pyarrow", batch_size=None
    )


def grouped_row_number(
    ds: rd.Dataset,
    *,
    key: str,
    order_col: str,
    out: str = "rn",
    backend: str = "runscan",
) -> rd.Dataset:
    """1-based ``row_number() OVER (PARTITION BY key ORDER BY order_col)``
    as a distributed operator (windowed-rank coverage; the building
    block for stratified sampling).

    ``backend="runscan"`` (default — LOW-cardinality keys, e.g.
    language/source strata): no per-group ``map_groups`` and no data
    rows on the driver — sort by (key, order_col), then
      pass 1: per sorted block, emit one METADATA row per key-run —
              (key, run_min_order, run_count); #runs ≈ #keys + #blocks.
      driver: order runs by (key, run_min_order), prefix-sum counts per
              key → each run's global starting offset; broadcast the
              map via ``ray.put``.
      pass 2: per block, rank = run offset + vectorized arange.
    The driver holds one row PER DISTINCT KEY — pick the bucket
    backend when key cardinality is corpus-scale.

    ``backend="bucket"`` (HIGH-cardinality keys, e.g. per-user): hash-
    bucket rows by key (every key's rows land in one bucket), then one
    bounded-cardinality ``groupby(bucket)`` with a vectorized
    sort+cumcount per bucket. Nothing on the driver at any cardinality;
    requires each bucket (≈ corpus / #buckets) to fit a worker.

    Requires ``order_col`` values unique within each key (true
    row_number needs a total order to be deterministic); the runscan
    backend raises if two runs collide on (key, run_min_order).
    """
    import pyarrow.compute as pc

    if backend == "bucket":
        return _grouped_row_number_bucketed(
            ds, key=key, order_col=order_col, out=out
        )
    if backend != "runscan":
        raise ValueError(f"unknown grouped_row_number backend {backend!r}")

    sorted_ds = ds.sort([key, order_col]).materialize()

    def _run_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {key: pa.array([], t.schema.field(key).type),
                 "_run_min": pa.array([], t.schema.field(order_col).type),
                 "_run_n": pa.array([], pa.int64())}
            )
        keys = t[key].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(keys)]))
        order = t[order_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {key: pa.array(keys[starts]),
             "_run_min": pa.array(order[starts]),
             "_run_n": pa.array(ends - starts, type=pa.int64())}
        )

    meta = sorted_ds.map_batches(
        _run_meta, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    meta = meta.sort_values([key, "_run_min"], kind="mergesort")
    meta["_off"] = meta.groupby(key)["_run_n"].cumsum() - meta["_run_n"]
    pairs = list(zip(meta[key], meta["_run_min"]))
    if len(set(pairs)) != len(pairs):
        raise ValueError(
            f"grouped_row_number: {order_col!r} not unique within "
            f"{key!r} at a block boundary — rank would be ambiguous"
        )
    offsets_ref = ray.put(dict(zip(pairs, meta["_off"].astype(int))))

    def _rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out, pa.array([], pa.int64()))
        offsets = _fetch_broadcast(offsets_ref)
        keys = t[key].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(keys)]))
        order = t[order_col].to_numpy(zero_copy_only=False)
        rn = np.empty(len(keys), dtype=np.int64)
        for s, e in zip(starts, ends):
            base = offsets[(keys[s], order[s])]
            rn[s:e] = base + np.arange(1, e - s + 1)
        return t.append_column(out, pa.array(rn))

    return sorted_ds.map_batches(
        _rank, batch_format="pyarrow", batch_size=None
    )


def stratified_sample(
    ds: rd.Dataset,
    *,
    key: str,
    order_col: str,
    every_k: int,
) -> rd.Dataset:
    """Deterministic stratified sample: within each ``key`` partition
    (ordered by ``order_col``) keep every ``every_k``-th row starting
    from the first. Same sampling fraction per stratum regardless of
    stratum size — the standard shape for per-language / per-source
    training-data subsampling. Built on ``grouped_row_number``."""
    import pyarrow.compute as pc

    ranked = grouped_row_number(ds, key=key, order_col=order_col)

    def _keep(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((rn - 1) % every_k == 0)).drop_columns(
            ["rn"]
        )

    return ranked.map_batches(_keep, batch_format="pyarrow")


def grouped_quantiles(
    ds: rd.Dataset,
    *,
    key: str,
    value_col: str,
    quantiles: list[float],
) -> pd.DataFrame:
    """Exact per-group discrete quantiles (``percentile_disc``: the
    element at 1-indexed position ceil(q*n)) for an integer-valued
    column, computed as a distributed VALUE HISTOGRAM:

      1. per-batch (key, value) count combiner — shuffle moves
         distinct-(key, value) pairs, never rows;
      2. global groupby-sum of the counts;
      3. per-key selection over the sorted (value, count) histogram —
         bounded by distinct values per key (fixed-decimal money / int
         columns stay bounded at any corpus size), done in one pandas
         pass on the driver.

    Returns a DataFrame (key, q_<pct> per quantile).
    """
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        return pa.TableGroupBy(
            t.select([key, value_col]), [key, value_col]
        ).aggregate([([], "count_all")])

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby([key, value_col])
        .aggregate(Sum("count_all", alias_name="cnt"))
    )
    from deduper_ray.functions.util import dataset_to_table

    hist = dataset_to_table(counts).to_pandas()
    hist = hist.sort_values([key, value_col], kind="mergesort")
    rows = []
    for kk, g in hist.groupby(key, sort=True):
        n = int(g["cnt"].sum())
        cum = g["cnt"].cumsum().to_numpy()
        vals = g[value_col].to_numpy()
        row = {key: kk, "n": n}
        for q in quantiles:
            pos = max(1, int(np.ceil(q * n)))
            row[f"q{int(round(q * 100))}"] = vals[
                np.searchsorted(cum, pos, side="left")
            ]
        rows.append(row)
    return pd.DataFrame(rows)


def grouped_quantiles_binned(
    ds: rd.Dataset,
    *,
    key: str,
    value_col: str,
    quantiles: list[float],
    num_bins: int = 1024,
    max_enumeration: int = 65536,
    max_rounds: int = 16,
) -> pd.DataFrame:
    """Exact per-group discrete quantiles (``percentile_disc``) for
    REAL-VALUED columns — the binning upgrade of
    :func:`grouped_quantiles`, whose value-histogram shuffle is bounded
    only for integer-like domains (distinct float values ≈ rows).

    Iterative range refinement (the standard distributed exact-quantile
    scheme): per (key, quantile) target keep an active interval
    [lo, hi] + residual rank; each round one narrow map pass histograms
    every active target's interval into ``num_bins`` bins (counts
    summed on the driver), the target descends into the bin containing
    its residual rank — interval mass shrinks ~num_bins× per round
    (10^12 rows resolve in ~4 rounds). When a target's interval mass
    ≤ ``max_enumeration`` its values are gathered and selected exactly.
    Driver state: O(#keys × #quantiles × num_bins) counts per round —
    never value-cardinality. Returns (key, n, q<pct>...) like
    ``grouped_quantiles``.
    """
    from ray.data.aggregate import Count, Max, Min

    narrow = ds.map_batches(
        lambda t: t.select([key, value_col]), batch_format="pyarrow"
    ).materialize()
    from deduper_ray.functions.util import dataset_to_table

    gs = dataset_to_table(
        narrow.groupby(key).aggregate(
            Min(value_col, alias_name="_lo"),
            Max(value_col, alias_name="_hi"),
            Count(alias_name="_n"),
        )
    ).to_pandas().sort_values(key)

    # One target per (key, quantile): residual rank within the active
    # half-open interval [lo, hi) (hi inclusive only while the target
    # still owns the group's global max — flag hi_incl). Membership and
    # binning both use DRIVER-COMPUTED edge arrays shipped to workers,
    # so float-boundary decisions are bit-identical everywhere.
    targets = []
    for _, r in gs.iterrows():
        for q in quantiles:
            pos = max(1, int(np.ceil(q * r["_n"])))
            targets.append(
                {
                    "key": r[key], "q": q, "lo": float(r["_lo"]),
                    "hi": float(r["_hi"]), "hi_incl": True, "rank": pos,
                    "mass": int(r["_n"]), "value": None,
                }
            )

    def _interval_spec(ts: list[dict], with_edges: bool):
        spec = {
            "keys": np.array([t["key"] for t in ts]),
            "lo": np.array([t["lo"] for t in ts], dtype=np.float64),
            "hi": np.array([t["hi"] for t in ts], dtype=np.float64),
            "hi_incl": np.array([t["hi_incl"] for t in ts], dtype=bool),
        }
        if with_edges:
            spec["edges"] = np.stack(
                [
                    t["lo"]
                    + (t["hi"] - t["lo"])
                    * np.arange(num_bins + 1, dtype=np.float64)
                    / num_bins
                    for t in ts
                ]
            )
        return ray.put(spec)

    def _select(s, i, kv, vv):
        """Values of target i's key inside its active interval."""
        v = vv[kv == s["keys"][i]]
        if s["hi_incl"][i]:
            return v[(v >= s["lo"][i]) & (v <= s["hi"][i])]
        return v[(v >= s["lo"][i]) & (v < s["hi"][i])]

    def _hist_pass(active: list[dict]) -> np.ndarray:
        spec = _interval_spec(active, with_edges=True)

        def _block_hist(t: pa.Table) -> pa.Table:
            s = _fetch_broadcast(spec)
            kv = t[key].to_numpy(zero_copy_only=False)
            vv = t[value_col].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            rows_i, rows_b, rows_c = [], [], []
            for i in range(s["keys"].size):
                v = _select(s, i, kv, vv)
                if v.size == 0:
                    continue
                # bin = searchsorted over the SHARED edges: exactly
                # consistent with the next round's [edge_b, edge_b+1)
                # membership filter
                b = np.searchsorted(s["edges"][i], v, side="right") - 1
                np.clip(b, 0, num_bins - 1, out=b)
                bins, cnts = np.unique(b, return_counts=True)
                rows_i.append(np.full(bins.size, i, dtype=np.int64))
                rows_b.append(bins)
                rows_c.append(cnts.astype(np.int64))
            if not rows_i:
                return pa.table(
                    {
                        "i": pa.array([], pa.int64()),
                        "b": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "i": pa.array(np.concatenate(rows_i)),
                    "b": pa.array(np.concatenate(rows_b)),
                    "c": pa.array(np.concatenate(rows_c)),
                }
            )

        parts = dataset_to_table(
            narrow.map_batches(_block_hist, batch_format="pyarrow"),
            pa.schema([("i", pa.int64()), ("b", pa.int64()), ("c", pa.int64())]),
        )
        hist = np.zeros((len(active), num_bins), dtype=np.int64)
        np.add.at(
            hist,
            (
                parts["i"].to_numpy(zero_copy_only=False),
                parts["b"].to_numpy(zero_copy_only=False),
            ),
            parts["c"].to_numpy(zero_copy_only=False),
        )
        return hist

    for _ in range(max_rounds):
        active = [
            t for t in targets
            if t["value"] is None and t["mass"] > max_enumeration
        ]
        if not active:
            break
        hist = _hist_pass(active)
        for i, t in enumerate(active):
            edges = (
                t["lo"]
                + (t["hi"] - t["lo"])
                * np.arange(num_bins + 1, dtype=np.float64)
                / num_bins
            )
            cum = np.cumsum(hist[i])
            b = int(np.searchsorted(cum, t["rank"], side="left"))
            below = int(cum[b - 1]) if b else 0
            t["rank"] -= below
            new_mass = int(hist[i][b])
            t["hi_incl"] = bool(t["hi_incl"] and b == num_bins - 1)
            t["lo"], t["hi"] = float(edges[b]), float(edges[b + 1])
            if b == num_bins - 1:
                t["hi"] = float(edges[num_bins])
            if new_mass == t["mass"] and t["hi"] == t["lo"]:
                # fully degenerate interval (all values identical)
                t["value"] = t["lo"]
            t["mass"] = new_mass

    # final exact enumeration for every unresolved target
    pending = [t for t in targets if t["value"] is None]
    if pending:
        spec = _interval_spec(pending, with_edges=False)

        def _gather(t: pa.Table) -> pa.Table:
            s = _fetch_broadcast(spec)
            kv = t[key].to_numpy(zero_copy_only=False)
            vv = t[value_col].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            out_i, out_v = [], []
            for i in range(s["keys"].size):
                v = _select(s, i, kv, vv)
                if v.size:
                    out_i.append(np.full(v.size, i, dtype=np.int64))
                    out_v.append(v)
            if not out_i:
                return pa.table(
                    {"i": pa.array([], pa.int64()),
                     "v": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "i": pa.array(np.concatenate(out_i)),
                    "v": pa.array(np.concatenate(out_v)),
                }
            )

        vals = dataset_to_table(
            narrow.map_batches(_gather, batch_format="pyarrow"),
            pa.schema([("i", pa.int64()), ("v", pa.float64())]),
        ).to_pandas()
        for i, t in enumerate(pending):
            v = np.sort(vals.loc[vals["i"] == i, "v"].to_numpy())
            t["value"] = float(v[t["rank"] - 1]) if v.size else t["lo"]

    rows = {}
    n_by_key = dict(zip(gs[key], gs["_n"].astype(int)))
    for t in targets:
        row = rows.setdefault(
            t["key"], {key: t["key"], "n": n_by_key[t["key"]]}
        )
        row[f"q{int(round(t['q'] * 100))}"] = t["value"]
    return pd.DataFrame(list(rows.values())).sort_values(key).reset_index(
        drop=True
    )


def _grouped_row_number_bucketed(
    ds: rd.Dataset,
    *,
    key: str,
    order_col: str,
    out: str = "rn",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Bucket backend for grouped_row_number: co-locate each key's rows
    by key hash (string keys hashed via Arrow's 64-bit hash, numeric
    keys via golden-ratio multiply), then rank inside the bucket with
    one vectorized pandas groupby-cumcount."""
    import pandas as pd
    import pyarrow.compute as pc

    if num_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_buckets = max(4, min(256, cpus * 2))
    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def _bucket(t: pa.Table) -> pa.Table:
        col = t[key]
        if pa.types.is_integer(col.type):
            kv = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            # stable string hash: blake2b over the batch's DISTINCT
            # values (vocab-bounded loop), mapped back vectorized
            import hashlib

            vals = col.to_numpy(zero_copy_only=False)
            uniq, inverse = np.unique(vals, return_inverse=True)
            hu = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(
                            str(v).encode(), digest_size=8
                        ).digest(),
                        "little",
                    )
                    for v in uniq
                ),
                dtype=np.uint64,
                count=len(uniq),
            )
            kv = hu[inverse]
        b = ((kv * _GOLD) >> np.uint64(33)) % np.uint64(num_buckets)
        return t.append_column("_bucket", pa.array(b.astype(np.int64)))

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order_col], kind="mergesort")
        df[out] = df.groupby(key, sort=False).cumcount() + 1
        return df.drop(columns=["_bucket"])

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(_rank, batch_format="pandas")
    )
