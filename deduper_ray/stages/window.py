"""Windowed aggregates over an event table (bounded batch semantics).

Ray Data has no event-time/watermark machinery; per the north design
(SURVEY.md §2.5 "Windows"), windows over a BOUNDED event log are
expressed as plain groupby aggregates on computed window-start keys:

- tumbling: one window key per row (integer division on epoch)
- sliding:  explode each row into size/step window memberships, then
            the same groupby (narrow rows: key + value only)
- session:  hash-bucket by key fingerprint, one vectorized pandas
            pass per bucket (key-change|gap mask + cumsum) — Python
            dispatch count is #buckets, not #distinct-keys; formerly
            per-key map_groups over ts-sorted events with a gap rule
            (per-group pandas; keys partition the shuffle)

All window results are ANSI-SQL-expressible (GROUP BY key,
date_trunc/floor arithmetic), which is what the DuckDB oracle checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum


def add_tumbling_window(
    batch: pa.Table,
    *,
    ts_column: str = "ts",
    window_sec: int = 3600,
    out: str = "window_start",
) -> pa.Table:
    """Append the window-start epoch-seconds key (floor(ts / w) * w)."""
    ts = batch[ts_column]
    epoch = pc.cast(ts, pa.int64())  # timestamp[us] → µs
    us = np.int64(window_sec) * 1_000_000
    start = pc.multiply(pc.floor(pc.divide(epoch, us)), us)
    return batch.append_column(
        out, pc.cast(pc.cast(start, pa.int64()), pa.int64())
    )


def tumbling_aggregate(
    events: rd.Dataset,
    *,
    keys: list[str],
    ts_column: str = "ts",
    window_sec: int = 3600,
    value_column: str = "value",
) -> rd.Dataset:
    """count + sum + mean of ``value_column`` per (keys..., window)."""
    windowed = events.map_batches(
        lambda t: add_tumbling_window(
            t, ts_column=ts_column, window_sec=window_sec
        ),
        batch_format="pyarrow",
    )
    narrow = windowed.map_batches(
        lambda t: t.select(keys + ["window_start", value_column]),
        batch_format="pyarrow",
    )
    return narrow.groupby(keys + ["window_start"]).aggregate(
        Count(alias_name="n_events"),
        Sum(value_column, alias_name="sum_value"),
        Mean(value_column, alias_name="avg_value"),
    )


def sliding_aggregate(
    events: rd.Dataset,
    *,
    keys: list[str],
    ts_column: str = "ts",
    window_sec: int = 3600,
    step_sec: int = 900,
    value_column: str = "value",
) -> rd.Dataset:
    """Sliding windows via membership explosion: each event lands in
    window_sec/step_sec windows; rows exploded are (key, window, value)
    narrow triples, then one native groupby."""
    n_windows = window_sec // step_sec

    def _explode(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t[ts_column], pa.int64()).to_numpy(zero_copy_only=False)
        step_us = np.int64(step_sec) * 1_000_000
        win_us = np.int64(window_sec) * 1_000_000
        last_start = (epoch // step_us) * step_us
        cols = {k: [] for k in keys}
        starts = []
        vals = []
        v = t[value_column].to_numpy(zero_copy_only=False)
        key_arrays = {k: t[k].to_numpy(zero_copy_only=False) for k in keys}
        for j in range(n_windows):
            s = last_start - j * step_us
            ok = epoch < s + win_us
            starts.append(s[ok])
            vals.append(v[ok])
            for k in keys:
                cols[k].append(key_arrays[k][ok])
        out = {k: pa.array(np.concatenate(cols[k])) for k in keys}
        out["window_start"] = pa.array(
            np.concatenate(starts), type=pa.int64()
        )
        out[value_column] = pa.array(np.concatenate(vals))
        return pa.table(out)

    return (
        events.map_batches(_explode, batch_format="pyarrow")
        .groupby(keys + ["window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_column, alias_name="sum_value"),
        )
    )


def window_dedupe(
    events: rd.Dataset,
    *,
    keys: list[str],
    ts_column: str = "ts",
    window_sec: int = 3600,
    id_column: str = "event_id",
) -> rd.Dataset:
    """Windowed deduplication: within each tumbling window, keep the
    FIRST row per key tuple (ordered by ts, then id for determinism).

    The streaming-dedup shape of the reference's first-occurrence-wins
    rule (Deduper.kt:207-240): instead of a global ordinal, the keeper
    rule applies per (keys..., window) — the standard at-least-once
    event-log compaction. One keyed all-to-all of full rows (the row
    must survive, so the payload has to move — same shape as
    ``stages.exact.dedupe_shuffle``), BUCKETED on the key tuple so the
    Python dispatch count is #buckets, not #(key × window) groups; one
    C-level pandas sort + drop_duplicates per bucket."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 4))
    num_partitions = max(4, min(128, cpus * 2))
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    windowed = events.map_batches(
        lambda t: add_tumbling_window(
            t, ts_column=ts_column, window_sec=window_sec
        ),
        batch_format="pyarrow",
    )

    def _tag(t: pa.Table) -> pa.Table:
        mix = np.zeros(t.num_rows, dtype=np.uint64)
        for k in keys:
            col = t[k]
            if pa.types.is_string(col.type) or pa.types.is_large_string(
                col.type
            ):
                from deduper_ray.functions.hashing import fingerprint64

                v = np.asarray(fingerprint64(pc.fill_null(col, "")))
            else:
                v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            mix = (mix ^ v) * GOLD
        bucket = ((mix >> np.uint64(33)) % np.uint64(num_partitions)).astype(
            np.int64
        )
        return t.append_column("_bucket", pa.array(bucket))

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            keys + ["window_start", ts_column, id_column]
        )
        out = df.drop_duplicates(subset=keys + ["window_start"], keep="first")
        return out.drop(columns=["_bucket", "window_start"])

    return (
        windowed.map_batches(_tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(_first, batch_format="pandas")
    )


def session_windows(
    events: rd.Dataset,
    *,
    key: str = "user_id",
    ts_column: str = "ts",
    gap_sec: int = 1800,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Gap-based sessionization: per key, a new session starts when the
    inter-event gap exceeds ``gap_sec``. Emits (key, session_start,
    session_end, n_events).

    Bucket backend (the grouped_row_number pattern,
    stages/relational.py): rows hash-bucket by the key fingerprint
    (every key wholly in one bucket), then ONE pandas pass per bucket
    sessionizes all its keys at once — sort by (key, ts), a new-session
    mask of key-change OR gap>gap_sec, cumsum for session ids, one
    C-level groupby-agg. Python dispatch count is #buckets, not #keys:
    a ``groupby(key).map_groups`` pays a Python/pandas call per
    distinct key — millions of users ⇒ millions of interpreter
    dispatches."""
    from deduper_ray.stages.relational import _auto_partitions, _group_buckets

    nparts = _auto_partitions(num_partitions)

    def _sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_column])
        k = df[key].to_numpy()
        ts = (df[ts_column].astype("int64") // 1_000_000).to_numpy()
        new = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            new[1:] = (k[1:] != k[:-1]) | ((ts[1:] - ts[:-1]) > gap_sec)
        sess = np.cumsum(new)  # globally unique per (key, session) run
        return (
            pd.DataFrame({key: k, "sess": sess, "ts": ts})
            .groupby([key, "sess"], sort=True)
            .agg(
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("ts", "size"),
            )
            .reset_index()
            .drop(columns=["sess"])
        )

    return (
        events.map_batches(
            lambda t: _group_buckets(t, [key], nparts),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(_sessions, batch_format="pandas")
    )
