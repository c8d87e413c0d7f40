"""Named query pipelines over the testdata tables — the ``queries()``
registry behind ``__ray_entry__.py``. Every SQL-expressible query has a
matching oracle in ``oracle_sql()`` with IDENTICAL column names; the
rest return rows-only-checked results.

Conventions:
- every callable takes ``sf_dir`` and returns a Dataset / DataFrame /
  Table;
- float aggregates are rounded to 6 decimals on BOTH sides (engine and
  oracle) so value hashes survive summation-order differences;
- reads prune columns at the source.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from deduper_ray.functions.hashing import add_hash_columns
from deduper_ray.functions.text import (
    LangIdScorer,
    add_fingerprint,
    add_quality_scores,
    add_token_count,
)
from deduper_ray.functions.util import dataset_to_table
from deduper_ray.stages.relational import broadcast_join, distinct, top_k
from deduper_ray.stages.window import session_windows, tumbling_aggregate

HASH_COL = "row_md5"


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _strip_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def _rp(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """``read_parquet`` + schema-metadata strip. The testdata parquet
    carries a ``pandas`` metadata dict, which makes ``pa.Schema``
    unhashable and trips Ray's per-aggregate schema-dedup warning
    ("Failed to hash the schemas", transform_pyarrow.py). Stripping it
    in a fused map keeps logs signal-only and re-enables Ray's
    early-exit schema hash."""
    return rd.read_parquet(path, columns=columns).map_batches(
        _strip_meta, batch_format="pyarrow"
    )


def _docs_hashed(sf_dir: str, hash_keys: tuple[str, ...]) -> rd.Dataset:
    """documents + reference row hash; doc_id is the ordinal."""
    ds = _rp(_t(sf_dir, "documents"))
    return ds.map_batches(
        lambda t: add_hash_columns(t, hash_keys, hash_col=HASH_COL),
        batch_format="pyarrow",
    )


def _round6(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].astype(float).round(6)
    return df


def _cents(arr, scale: int = 100) -> "np.ndarray":
    """Fixed-decimal doubles → exact integer units (half-away-from-zero,
    matching DuckDB round()). Summing ints is order-independent, so the
    engine and the SQL oracle agree bit-for-bit on aggregates."""
    x = arr.to_numpy(zero_copy_only=False) if hasattr(arr, "to_numpy") else arr
    x = np.asarray(x, dtype=np.float64) * scale
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


# ----------------------------------------------------------------- dedup

def dedup_target_docs(sf_dir: str) -> pd.DataFrame:
    """Exact dedup of documents on text (first-occurrence by doc_id):
    SURVEY O6/O7 over the testdata table.

    Scale shape: the broadcast side is the DUPED groups only (hash →
    keeper id), bounded by dupe volume — NOT the keeper set, which is
    O(corpus). A row is dropped iff its hash is duped AND it isn't the
    group's min-id keeper."""
    hashed = _docs_hashed(sf_dir, ("text",))
    stats = hashed.groupby(HASH_COL).aggregate(
        Min("doc_id", alias_name="keep_id"),
        Count(alias_name="n_rows"),
    )
    duped = dataset_to_table(
        stats.map_batches(
            lambda t: t.filter(pc.greater(t["n_rows"], 1)).select(
                [HASH_COL, "keep_id"]
            ),
            batch_format="pyarrow",
        )
    )
    # broadcast payload: duped hashes SORTED + their keeper ids aligned —
    # the batch probe is then one np.searchsorted + vectorized compare,
    # zero Python per row (VERDICT r2 item 3)
    order = pc.sort_indices(duped[HASH_COL])
    sorted_hashes = duped[HASH_COL].take(order).combine_chunks()
    sorted_keep = duped["keep_id"].take(order).combine_chunks()
    map_ref = ray.put(
        {
            "hashes": np.asarray(sorted_hashes),
            "keep_id": sorted_keep.to_numpy(zero_copy_only=False),
        }
    )

    def _filter(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        dh: np.ndarray = m["hashes"]
        keep = np.ones(t.num_rows, dtype=bool)
        if dh.size:
            batch_hashes = np.asarray(t[HASH_COL].combine_chunks())
            pos = np.searchsorted(dh, batch_hashes)
            pos_c = np.minimum(pos, dh.size - 1)
            is_duped = dh[pos_c] == batch_hashes
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            # duped rows survive only as their group's keeper
            keep[is_duped] = ids[is_duped] == m["keep_id"][pos_c[is_duped]]
        return t.filter(pa.array(keep)).drop_columns([HASH_COL])

    out = hashed.map_batches(_filter, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def dedup_dupes_langsrc(sf_dir: str) -> pd.DataFrame:
    """Dupe-group summary hashing (lang, source) — real multi-row groups
    at every SF (SURVEY O9 shape: hash, first_found, dupe_count)."""
    hashed = _docs_hashed(sf_dir, ("lang", "source"))
    stats = hashed.groupby(HASH_COL).aggregate(
        Min("doc_id", alias_name="first_found_row_number"),
        Count(alias_name="n_rows"),
    )
    df = dataset_to_table(stats).to_pandas()
    df = df[df["n_rows"] > 1].copy()
    df["dupe_count"] = df["n_rows"] - 1
    df = df.rename(columns={HASH_COL: "hash"})
    return (
        df[["hash", "first_found_row_number", "dupe_count"]]
        .sort_values("hash")
        .reset_index(drop=True)
    )


def dedup_hashes_docs(sf_dir: str) -> pd.DataFrame:
    """Hash-table output (SURVEY K4): distinct text-hash + occurrences."""
    hashed = _docs_hashed(sf_dir, ("text",))
    stats = hashed.groupby(HASH_COL).aggregate(Count(alias_name="n_rows"))
    df = dataset_to_table(stats).to_pandas().rename(columns={HASH_COL: "hash"})
    return df.sort_values("hash").reset_index(drop=True)


def seen_filter_docs(sf_dir: str) -> pd.DataFrame:
    """Incremental/seen-hash anti-filter (SURVEY S3/O8): the seen set is
    the hashes of doc_id % 10 == 0; surviving rows pass through."""
    hashed = _docs_hashed(sf_dir, ("text",))
    def _every_tenth(t: pa.Table) -> pa.Table:
        mask = t["doc_id"].to_numpy(zero_copy_only=False) % 10 == 0
        return t.filter(pa.array(mask)).select([HASH_COL])

    seen_tbl = dataset_to_table(
        hashed.map_batches(_every_tenth, batch_format="pyarrow")
    )
    seen_ref = ray.put(pc.unique(seen_tbl[HASH_COL]))

    def _anti(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(t[HASH_COL], value_set=ray.get(seen_ref)))
        return t.filter(mask).drop_columns([HASH_COL])

    out = hashed.map_batches(_anti, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def sample_hash_docs(sf_dir: str) -> pd.DataFrame:
    """First-row probe (SURVEY S4 getSampleHash)."""
    from deduper_ray.functions.hashing import md5_hex_array, stringify_columns

    first = dataset_to_table(
        _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        .sort("doc_id")
        .limit(1)
    )
    joined = stringify_columns(first, ("text",))
    return pd.DataFrame(
        {
            "sample_string": [joined[0].as_py()],
            "sample_hash": [md5_hex_array(joined)[0].as_py()],
        }
    )


# ----------------------------------------------------------- aggregates

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shaped grouped aggregate over lineitem (grouped
    aggregation coverage; gap table 'Grouped aggregations')."""
    ds = _rp(
        _t(sf_dir, "lineitem"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )

    def _derive(t: pa.Table) -> pa.Table:
        # integerize the fixed-2-decimal columns: exact int sums are
        # summation-order independent (bit-exact vs the SQL oracle)
        qty_c = _cents(t["l_quantity"])
        price_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": pa.array(qty_c, type=pa.int64()),
                "price_c": pa.array(price_c, type=pa.int64()),
                "disc_price_u": pa.array(
                    price_c * (100 - disc_c), type=pa.int64()
                ),
                "disc_c": pa.array(disc_c, type=pa.int64()),
            }
        )

    def _partial(t: pa.Table) -> pa.Table:
        # combiner: collapse each batch to ≤|groups| partial-sum rows
        # BEFORE any exchange — the driver-side final combine is then
        # bounded by #blocks × 6 rows, never by input volume
        return pa.TableGroupBy(
            _derive(t), ["l_returnflag", "l_linestatus"]
        ).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"),
             ("disc_price_u", "sum"), ("disc_c", "sum"),
             ("qty_c", "count")]
        )

    partials = dataset_to_table(
        ds.map_batches(_partial, batch_format="pyarrow")
    )
    df = (
        partials.to_pandas()
        .groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .sum()
        .rename(columns={
            "qty_c_sum": "s_qty", "price_c_sum": "s_price",
            "disc_price_u_sum": "s_disc_price", "disc_c_sum": "s_disc",
            "qty_c_count": "count_order",
        })
    )
    df["sum_qty"] = df["s_qty"] / 100.0
    df["sum_base_price"] = df["s_price"] / 100.0
    df["sum_disc_price"] = df["s_disc_price"] / 10000.0
    df["avg_disc"] = (df["s_disc"] / 100.0) / df["count_order"]
    return (
        df[
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
             "sum_disc_price", "avg_disc", "count_order"]
        ]
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )


def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer ⋈ nation via BROADCAST joins (dimension sides
    ride the object store once; no shuffle — gap table 'Joins')."""
    import pyarrow.parquet as pq

    customer = pq.read_table(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    orders = _rp(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "price_c": pa.array(_cents(t["o_totalprice"]), type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = broadcast_join(
        orders, customer.rename(columns={"c_custkey": "o_custkey"}), "o_custkey"
    )
    joined = broadcast_join(
        joined,
        nation.rename(columns={"n_nationkey": "c_nationkey"}),
        "c_nationkey",
    )
    out = joined.groupby("n_name").aggregate(
        Sum("price_c", alias_name="s_price"),
        Count(alias_name="n_orders"),
    )
    df = dataset_to_table(out).to_pandas()
    df["revenue"] = df["s_price"] / 100.0
    return (
        df[["n_name", "revenue", "n_orders"]]
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def topk_orders(sf_dir: str) -> pd.DataFrame:
    """Top-10 orders by totalprice (partial-top-k merge, no global
    sort; gap table 'Sort / top-k / limit')."""
    ds = _rp(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    )
    out = top_k(
        ds, 10, sort_keys=["o_totalprice", "o_orderkey"],
        descending=[True, False],
    ).to_pandas()
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "o_orderkey", "o_totalprice"]]


def topk_docs_per_lang(sf_dir: str) -> pd.DataFrame:
    """Top-3 longest docs per language (grouped top-k: per-block partial
    + driver merge; the per-language curation shape)."""
    from deduper_ray.stages.relational import grouped_top_k

    ds = _rp(
        _t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )
    out = grouped_top_k(
        ds, 3, group_keys=["lang"], sort_keys=["n_chars", "doc_id"],
        descending=[True, False],
    ).to_pandas()
    return (
        out[["lang", "doc_id", "n_chars"]]
        .sort_values(["lang", "n_chars", "doc_id"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )


def distinct_event_types(sf_dir: str) -> pd.DataFrame:
    ds = _rp(_t(sf_dir, "events"), columns=["event_type"])
    df = dataset_to_table(distinct(ds, ["event_type"])).to_pandas()
    return df.sort_values("event_type").reset_index(drop=True)


def union_high_low_value_events(sf_dir: str) -> pd.DataFrame:
    """Set-op coverage: union of two disjoint filtered streams equals a
    single-pass filter (gap table 'Set ops')."""
    ds = _rp(
        _t(sf_dir, "events"), columns=["event_id", "value"]
    )
    hi = ds.map_batches(
        lambda t: t.filter(pc.greater(t["value"], 100.0)),
        batch_format="pyarrow",
    )
    lo = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t["value"], 1.0)),
        batch_format="pyarrow",
    )
    out = hi.union(lo).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# ----------------------------------------------------------------- text

def token_count_docs(sf_dir: str) -> pd.DataFrame:
    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda t: add_token_count(t).drop_columns(["text"]),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def quality_docs(sf_dir: str) -> pd.DataFrame:
    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda t: add_quality_scores(t).drop_columns(["text"]),
        batch_format="pyarrow",
    ).to_pandas()
    # ratios stay unrounded: both sides divide identical int64 operands,
    # so the IEEE doubles are bit-equal (rounding would REINTRODUCE
    # half-even-vs-half-away mismatches at exact .5 boundaries)
    return out.sort_values("doc_id").reset_index(drop=True)


def lang_id_docs(sf_dir: str) -> pd.DataFrame:
    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(
        LangIdScorer,
        fn_constructor_kwargs={"text_column": "text"},
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()[["doc_id", "lang_pred"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def fingerprint_docs(sf_dir: str) -> pd.DataFrame:
    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda t: add_fingerprint(t).drop_columns(["text"]),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# -------------------------------------------------------------- windows

def window_tumbling_events(sf_dir: str) -> pd.DataFrame:
    ds = _rp(
        _t(sf_dir, "events"), columns=["ts", "event_type", "value"]
    ).map_batches(
        lambda t: t.append_column(
            "value_m", pa.array(_cents(t["value"], 1000), type=pa.int64())
        ),
        batch_format="pyarrow",
    )
    out = tumbling_aggregate(
        ds, keys=["event_type"], window_sec=3600, value_column="value_m"
    )
    df = dataset_to_table(out).to_pandas()
    df["window_start"] = (df["window_start"] // 1_000_000).astype(np.int64)
    df["sum_value"] = df["sum_value"] / 1000.0
    df["avg_value"] = df["sum_value"] / df["n_events"]
    return (
        df[["event_type", "window_start", "n_events", "sum_value", "avg_value"]]
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )


def window_sliding_events(sf_dir: str) -> pd.DataFrame:
    """Sliding 1h windows, 15min step, per event_type (membership
    explosion + native groupby; SURVEY §2.5 'Windows')."""
    from deduper_ray.stages.window import sliding_aggregate

    ds = _rp(
        _t(sf_dir, "events"), columns=["ts", "event_type", "value"]
    ).map_batches(
        lambda t: t.append_column(
            "value_m", pa.array(_cents(t["value"], 1000), type=pa.int64())
        ),
        batch_format="pyarrow",
    )
    out = sliding_aggregate(
        ds, keys=["event_type"], window_sec=3600, step_sec=900,
        value_column="value_m",
    )
    df = dataset_to_table(out).to_pandas()
    df["window_start"] = (df["window_start"] // 1_000_000).astype(np.int64)
    df["sum_value"] = df["sum_value"] / 1000.0
    return (
        df[["event_type", "window_start", "n_events", "sum_value"]]
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )


def asof_latest_order_per_event(sf_dir: str) -> pd.DataFrame:
    """As-of join: each event matched to the customer's latest order at
    or before the event time, via the BUCKETED two-large-sides path:
    orders pre-collapsed DISTRIBUTED to one row per (custkey,
    orderdate) with max orderkey (deterministic ties), then both sides
    hash-co-partitioned on the key — no broadcast, the realistic shape
    when both sides are event-scale. The broadcast fast path stays for
    dimension-sized right sides (covered by pytest equivalence)."""
    from deduper_ray.stages.relational import asof_join

    orders = (
        _rp(
            _t(sf_dir, "orders"),
            columns=["o_custkey", "o_orderdate", "o_orderkey"],
        )
        .groupby(["o_custkey", "o_orderdate"])
        .aggregate(Max("o_orderkey", alias_name="o_orderkey"))
        .map_batches(
            lambda t: t.rename_columns(
                ["user_id", "o_orderdate", "o_orderkey"]
            )
            if t.num_columns == 3
            else t,
            batch_format="pyarrow",
        )
    )
    events = _rp(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts"]
    )
    out = asof_join(
        events, orders, by="user_id", left_ts="ts", right_ts="o_orderdate"
    ).to_pandas()
    out = out[["event_id", "o_orderkey"]].sort_values("event_id")
    return out.reset_index(drop=True)


def intersect_click_buy_users(sf_dir: str) -> pd.DataFrame:
    """Set-op INTERSECT: users with both 'click' and 'purchase' events —
    distinct per side, small side broadcast as a semi-join filter
    (gap table 'Set ops': intersect = broadcast semi-join)."""
    ds = _rp(
        _t(sf_dir, "events"), columns=["user_id", "event_type"]
    )

    def _side(ev_type: str) -> pa.Table:
        from deduper_ray.stages.relational import distinct

        filtered = ds.map_batches(
            lambda t, e=ev_type: t.filter(
                pc.equal(t["event_type"], e)
            ).select(["user_id"]),
            batch_format="pyarrow",
        )
        return dataset_to_table(
            distinct(filtered, ["user_id"]),
            pa.schema([("user_id", pa.int64())]),
        )

    clicks, buys = _side("click"), _side("purchase")
    buy_set = pc.unique(buys["user_id"])
    out = clicks.filter(pc.is_in(clicks["user_id"], value_set=buy_set))
    return (
        out.to_pandas().sort_values("user_id").reset_index(drop=True)
    )


def approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """HLL approximate distinct user_id over events (mergeable sketch
    partials per batch; SURVEY §2.5 'Sketches'), ORACLE-CHECKED via a
    derived form: the exact distinct count (distributed distinct →
    count) plus a deterministic pass/fail flag asserting the HLL
    estimate lands within 5% (p=12 → σ≈1.6%, 5% ≈ 3σ; both the data
    and the sketch hashing are deterministic, so the flag is stable).
    The oracle computes the same exact count and expects TRUE."""
    from deduper_ray.functions.sketches import approx_distinct

    ds = _rp(_t(sf_dir, "events"), columns=["user_id"])
    est = approx_distinct(ds, "user_id", p=12)
    exact = distinct(ds, ["user_id"]).count()
    ok = abs(est - exact) / max(exact, 1) <= 0.05
    return pd.DataFrame(
        {
            "n_users_exact": pd.Series([int(exact)], dtype=np.int64),
            "hll_within_5pct": pd.Series([bool(ok)], dtype=bool),
        }
    )


def approx_quantiles_events(sf_dir: str) -> pd.DataFrame:
    """KLL approximate quantiles of events.value (mergeable per-block
    sketch partials — functions/sketches.py KLLSketch), ORACLE-CHECKED
    via the same derived form as approx_distinct_users: the exact row
    count plus a deterministic flag asserting each estimate's EXACT
    rank (computed distributedly: one vectorized count-below pass)
    lands within the sketch's eps rank-error bound. The oracle expects
    TRUE per quantile."""
    from deduper_ray.functions.sketches import approx_quantiles

    qs = [0.1, 0.5, 0.95]
    ds = _rp(_t(sf_dir, "events"), columns=["value"]).materialize()
    ests, sketch = approx_quantiles(ds, "value", qs, k=256, seed=7)
    ests_arr = np.asarray(ests)

    def _ranks(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        below = np.array(
            [(v <= e).sum() for e in ests_arr], dtype=np.int64
        )
        return pa.table(
            {
                "qi": pa.array(np.arange(len(ests_arr)), type=pa.int64()),
                "below": pa.array(below),
                "n": pa.array(
                    np.full(len(ests_arr), t.num_rows, dtype=np.int64)
                ),
            }
        )

    parts = dataset_to_table(
        ds.map_batches(_ranks, batch_format="pyarrow"),
        pa.schema([("qi", pa.int64()), ("below", pa.int64()), ("n", pa.int64())]),
    ).to_pandas()
    agg = parts.groupby("qi")[["below", "n"]].sum()
    # each block emits its row count once PER qi, so the per-qi sum is
    # already the total row count
    n_total = int(agg["n"].iloc[0]) if len(agg) else 0
    rows = []
    for qi, q in enumerate(qs):
        rank = int(agg.loc[qi, "below"])
        ok = abs(rank / n_total - q) <= sketch.eps + 1e-9
        rows.append(
            {
                "q_pct": int(round(q * 100)),
                "n_rows": n_total,
                "kll_within_eps": bool(ok),
            }
        )
    return pd.DataFrame(rows).sort_values("q_pct").reset_index(drop=True)


def sample_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic corpus down-sampling by row-id modulus (SURVEY
    §2.5 'Sampling': reproducible under any parallelism, unlike
    random_sample)."""
    ds = _rp(_t(sf_dir, "documents"))

    def _mod(t: pa.Table) -> pa.Table:
        keep = t["doc_id"].to_numpy(zero_copy_only=False) % 10 == 3
        return t.filter(pa.array(keep))

    out = ds.map_batches(_mod, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def sessionize_events(sf_dir: str) -> pd.DataFrame:
    ds = _rp(_t(sf_dir, "events"), columns=["user_id", "ts"])
    out = session_windows(ds, key="user_id", gap_sec=1800).to_pandas()
    return (
        out.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )


# -------------------------------------------- near-dup / similarity (rows-only)

def neardup_clusters_docs(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH near-dup clustering of documents (north-rule
    pipeline over the testdata table), ORACLE-CHECKED: verify_mode=
    "exact" re-scores candidates with the true 8-shingle Jaccard, so
    the verified edge set equals the exact-Jaccard≥0.7 pair set
    whenever LSH recall is 1 — and bands=32 (r=4) gives candidate
    recall 1−(1−J⁴)³² ≈ 0.9998 at J=0.7 and ≈1−10⁻¹⁰ at J=0.9 (the
    testdata dup pairs all sit ≥0.9). The DuckDB oracle recomputes
    the same edges from character 8-grams and clusters them with a
    recursive-CTE transitive closure."""
    import tempfile

    from deduper_ray.config import NearDupConfig
    from deduper_ray.pipelines.neardup import run_neardup

    cfg = NearDupConfig(
        text_column="text", shingle_k=8, num_perms=128, bands=32,
        threshold=0.7, verify_mode="exact",
    )
    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda t: t.append_column("row_id", pc.cast(t["doc_id"], pa.int64())),
        batch_format="pyarrow",
    )
    with tempfile.TemporaryDirectory() as tmp:
        res = run_neardup(ds, os.path.join(tmp, "nd"), cfg, resume=False)
        cl = res.clusters().to_pandas()
    return cl.sort_values("row_id").reset_index(drop=True)


def simhash_docs(sf_dir: str) -> pd.DataFrame:
    """Per-doc 64-bit SimHash fingerprint, ORACLE-CHECKED: the shingle
    hash is DuckDB's md5_number_lower (functions/text.py
    add_simhash_md5), so the SQL oracle reproduces every bit exactly —
    same distinct-8-gram sets, same majority vote. The production
    rolling-hash SimHash (stages/minhash.py:179) shares the vote math
    and is covered by pytest equivalence."""
    from deduper_ray.functions.text import add_simhash_md5

    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda t: add_simhash_md5(t, shingle_k=8).drop_columns(["text"]),
        batch_format="pyarrow",
    ).to_pandas()
    return (
        out[["doc_id", "simhash", "n_shingles"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def ngram_jaccard_pairs_docs(sf_dir: str) -> pd.DataFrame:
    """Exact n-gram (k=4 char-shingle) Jaccard for the 50×50 leading
    doc block, ORACLE-CHECKED: the SQL oracle rebuilds the same
    distinct-4-gram sets (docs are ASCII, so byte shingles == char
    substrings) and divides the same int operands — bit-identical
    IEEE doubles, no rounding on either side. k=4 so the
    shared-vocabulary documents produce a non-trivial overlap
    distribution."""
    import pyarrow.parquet as pq

    from deduper_ray.stages.minhash import exact_jaccard

    docs = (
        pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .head(50)
    )
    rows = []
    texts = docs["text"].tolist()
    ids = docs["doc_id"].tolist()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jac = exact_jaccard(texts[i], texts[j], 4)
            if jac >= 0.2:
                rows.append({"id_a": ids[i], "id_b": ids[j], "jaccard": jac})
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


def containment_pairs_docs(sf_dir: str) -> pd.DataFrame:
    """Directed n-gram containment C(a→b) = |sh(a) ∩ sh(b)| / |sh(a)|
    over the leading 50-doc block (k=4 shingles) — the ASYMMETRIC
    near-dup signal (quote/subset detection) that Jaccard misses when
    the containing doc is much larger. Same int-operand division as
    the Jaccard twin, bit-identical doubles on both sides."""
    import pyarrow.parquet as pq

    docs = (
        pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .head(50)
    )
    ids = docs["doc_id"].tolist()

    def _shingles(t: str) -> set:
        # raw distinct 4-char substrings — the oracle's substr() sets
        # (docs are ASCII, so byte shingles == character substrings)
        if len(t) <= 4:
            return {t} if t else set()
        return {t[j:j + 4] for j in range(len(t) - 3)}

    shingle_sets = [_shingles(t) for t in docs["text"]]
    rows = []
    for i in range(len(ids)):
        if not shingle_sets[i]:
            continue
        for j in range(len(ids)):
            if i == j or not shingle_sets[j]:
                continue
            inter = len(shingle_sets[i] & shingle_sets[j])
            c = inter / len(shingle_sets[i])
            if c >= 0.5:
                rows.append(
                    {"id_a": ids[i], "id_b": ids[j], "containment": c}
                )
    return pd.DataFrame(
        rows, columns=["id_a", "id_b", "containment"]
    ).sort_values(["id_a", "id_b"]).reset_index(drop=True)


def ann_topk_embeddings(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-5 for the first 5 vectors as queries
    (similarity-search baseline), ORACLE-CHECKED against DuckDB's
    list_cosine_similarity over DOUBLE lists: both sides rank by
    (-cosine, neighbor_id) and round the score to 6 decimals after
    ranking (float64 agreement to ~1e-15; the testdata has no
    near-1e-15 score ties)."""
    import pyarrow.parquet as pq

    from deduper_ray.stages.ann import brute_force_topk

    tbl = pq.read_table(_t(sf_dir, "embeddings"))
    q = np.stack(tbl["embedding"].to_pylist()[:5]).astype(np.float64)
    qids = tbl["vec_id"].to_numpy(zero_copy_only=False)[:5]
    ds = _rp(_t(sf_dir, "embeddings"))
    out = brute_force_topk(ds, qids, q, k=5).to_pandas()
    out["score"] = out["score"].round(6)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def ivf_topk_embeddings(sf_dir: str) -> pd.DataFrame:
    """IVF (spherical-kmeans cells + probe lists) approximate cosine
    top-5 for the first 5 vectors — the ANN SCALE path next to the
    brute-force baseline. ORACLE-CHECKED against the exact-SQL ranking
    with n_probe == n_cells: probing every cell makes IVF exact BY
    CONSTRUCTION, so the gate verifies the full machinery (sampled
    kmeans index, cell assignment, probe routing, partial-top-k merge)
    bit-for-bit. Partial-probe recall behavior is pinned by pytest
    (test_ivf_topk_matches_bruteforce_with_full_probes) — this
    testdata's clusters are too weakly separated (max cos ~0.5) for a
    deterministic partial-probe == exact guarantee."""
    import pyarrow.parquet as pq

    from deduper_ray.stages.ann import ivf_topk

    tbl = pq.read_table(_t(sf_dir, "embeddings"))
    q = np.stack(tbl["embedding"].to_pylist()[:5]).astype(np.float64)
    qids = tbl["vec_id"].to_numpy(zero_copy_only=False)[:5]
    ds = _rp(_t(sf_dir, "embeddings"))
    out = ivf_topk(
        ds, qids, q, k=5, n_cells=16, n_probe=16, sample_mod=2,
    ).to_pandas()
    out["score"] = out["score"].round(6)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def embedding_neardup_pairs(sf_dir: str) -> pd.DataFrame:
    """Hyperplane-LSH + exact-cosine related-vector pairs over
    embeddings, ORACLE-CHECKED against DuckDB all-pairs cosine:
    threshold 0.45 is tuned to the testdata's cluster structure (the
    max off-diagonal cosine is ~0.51, so the result is non-empty),
    and 64 bands of 4 sign bits each give per-pair candidate recall
    1−(1−p⁴)⁶⁴ ≈ 1−4·10⁻⁶ at cos 0.45 (p = 1−θ/π ≈ 0.65) —
    deterministic under the fixed hyperplane seed, and verified below
    to catch every brute-force pair at the test scales. The bucket
    cap is lifted to the table's all-pairs bound n(n−1)/2 (read from
    parquet metadata — 125k at 500 vecs, ~2M at sf0.1's 2000):
    clustered embeddings concentrate in few 4-bit band buckets, so a
    fixed cap silently truncates candidates as n grows (observed at
    sf0.1: 41/144 pairs with a 200k cap); at corpus scale, raise
    bands-bits selectivity instead of the cap."""
    import pyarrow.parquet as pq

    from deduper_ray.stages.ann import embedding_neardup

    path = _t(sf_dir, "embeddings")
    ds = _rp(path)
    d = len(pq.read_table(path, columns=["embedding"])["embedding"][0])
    n = pq.ParquetFile(path).metadata.num_rows
    out = embedding_neardup(
        ds, dim=d, cosine_threshold=0.45, bits=256, bands=64,
        max_pairs_per_bucket=max(200_000, n * (n - 1) // 2),
    ).to_pandas()
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------------- training-data curation ops

def pii_redact_docs(sf_dir: str) -> pd.DataFrame:
    """PII redaction (functions/text.py redact_pii): the testdata text
    is synthetic word salad with no PII, so the query APPENDS a
    deterministic PII suffix (email/phone/IP derived from doc_id) on
    BOTH sides before redacting — the oracle reproduces the suffix in
    SQL and the redaction via RE2 ``regexp_replace(...,'g')``."""
    from deduper_ray.functions.text import redact_pii

    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def _aug(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        suffix = pa.array(
            [
                f" mail u{i}@ex-a.io tel +1 555 010 {i % 10}{i % 10}"
                f" ip 10.0.{i % 256}.7"
                for i in ids
            ],
            type=pa.string(),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pc.binary_join_element_wise(t["text"], suffix, ""),
            }
        )

    out = (
        ds.map_batches(_aug, batch_format="pyarrow")
        .map_batches(lambda t: redact_pii(t), batch_format="pyarrow")
    )
    return (
        dataset_to_table(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def top_tokens_docs(sf_dir: str) -> pd.DataFrame:
    """Corpus heavy hitters: top-25 whitespace tokens by frequency
    (stages/relational.py token_heavy_hitters — per-batch vocabulary
    combiner, partial-top-k merge)."""
    from deduper_ray.stages.relational import token_heavy_hitters

    ds = _rp(_t(sf_dir, "documents"), columns=["text"])
    return token_heavy_hitters(ds, text_column="text", k=25).to_pandas()


def curate_docs(sf_dir: str) -> pd.DataFrame:
    """End-to-end curation composition — the pipeline a training-data
    user actually runs: quality gate (length / alpha-ratio / stopword
    floor) → exact dedup on text (first-occurrence by doc_id, broadcast
    keeper filter) → token-count annotation. Every stage streams; the
    only driver state is the duped-group keeper map (bounded by dupe
    volume). Output: (doc_id, lang, n_tokens) of surviving docs."""
    from deduper_ray.functions.text import add_quality_scores, add_token_count

    ds = _rp(
        _t(sf_dir, "documents"), columns=["doc_id", "text", "lang"]
    )

    def _gate(t: pa.Table) -> pa.Table:
        t = add_quality_scores(t)
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t["n_chars_q"], 50),
                pc.greater_equal(
                    pc.multiply(t["n_alpha"], 2), t["n_chars_q"]
                ),
            ),
            pc.greater_equal(t["n_stopwords"], 1),
        )
        return t.filter(keep).select(["doc_id", "text", "lang"])

    gated = ds.map_batches(_gate, batch_format="pyarrow").map_batches(
        lambda t: add_hash_columns(t, ("text",), hash_col=HASH_COL),
        batch_format="pyarrow",
    ).materialize()

    stats = gated.groupby(HASH_COL).aggregate(
        Min("doc_id", alias_name="keep_id"),
        Count(alias_name="n_rows"),
    )
    duped = dataset_to_table(
        stats.map_batches(
            lambda t: t.filter(pc.greater(t["n_rows"], 1)).select(
                [HASH_COL, "keep_id"]
            ),
            batch_format="pyarrow",
        )
    )
    order = pc.sort_indices(duped[HASH_COL])
    map_ref = ray.put(
        {
            "hashes": np.asarray(duped[HASH_COL].take(order).combine_chunks()),
            "keep_id": duped["keep_id"].take(order).combine_chunks()
            .to_numpy(zero_copy_only=False),
        }
    )

    def _keep_first(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        dh: np.ndarray = m["hashes"]
        keep = np.ones(t.num_rows, dtype=bool)
        if dh.size:
            bh = np.asarray(t[HASH_COL].combine_chunks())
            pos = np.minimum(np.searchsorted(dh, bh), dh.size - 1)
            is_duped = dh[pos] == bh
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep[is_duped] = ids[is_duped] == m["keep_id"][pos[is_duped]]
        t = t.filter(pa.array(keep))
        t = add_token_count(t)
        return t.select(["doc_id", "lang", "n_tokens"])

    out = gated.map_batches(_keep_first, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def unigram_logprob_docs(sf_dir: str) -> pd.DataFrame:
    """Corpus-trained unigram LM scoring — the perplexity-style quality
    signal without external models: pass 1 builds the corpus token
    distribution (per-batch vocabulary combiner → groupby-sum), the
    (token → count) table broadcasts once, pass 2 scores each doc with
    the MICRO-int sum of its tokens' log-probabilities.

    Float determinism: each token's log10 p is rounded to integer
    MICRO units (1e-6) BEFORE summing, so per-doc totals are exact
    int64 sums — order-independent and bit-comparable to the SQL
    oracle (same protocol as the fixed-decimal aggregates)."""
    from ray.data.aggregate import Sum as _Sum

    ds = _rp(
        _t(sf_dir, "documents"), columns=["doc_id", "text"]
    ).materialize()

    def _tok_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(t["text"], " ")
        )
        tbl = pa.table({"token": pc.drop_null(toks)})
        tbl = tbl.filter(pc.not_equal(tbl["token"], ""))
        return pa.TableGroupBy(tbl, "token").aggregate([("token", "count")])

    counts = dataset_to_table(
        ds.map_batches(_tok_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(_Sum("token_count", alias_name="cnt"))
    )
    tokens = np.asarray(counts["token"].combine_chunks())
    cnt = counts["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    total = cnt.sum()
    order = np.argsort(tokens)
    # integer micro-units of log10 p — the broadcast scoring table
    micro = np.round(np.log10(cnt / total) * 1_000_000).astype(np.int64)
    lm_ref = ray.put({"tokens": tokens[order], "micro": micro[order]})

    def _score(t: pa.Table) -> pa.Table:
        lm = ray.get(lm_ref)
        toks = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        sizes = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        nonempty = flat != ""
        pos = np.searchsorted(lm["tokens"], flat)
        pos = np.minimum(pos, lm["tokens"].size - 1)
        # every non-empty token is in the corpus vocabulary by
        # construction (the LM was trained on this corpus)
        vals = np.where(nonempty, lm["micro"][pos], 0)
        seg = np.zeros(len(sizes), dtype=np.int64)
        np.cumsum(sizes[:-1], out=seg[1:])
        doc_idx = np.repeat(np.arange(len(sizes)), sizes)
        sums = np.zeros(len(sizes), dtype=np.int64)
        np.add.at(sums, doc_idx, vals)
        n_tok = np.zeros(len(sizes), dtype=np.int64)
        np.add.at(n_tok, doc_idx, nonempty.astype(np.int64))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "logprob_micro": pa.array(sums, type=pa.int64()),
                "n_tokens_lm": pa.array(n_tok, type=pa.int64()),
            }
        )

    out = ds.map_batches(_score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def incremental_neardup_docs(sf_dir: str) -> pd.DataFrame:
    """Incremental near-dup (pipelines/incremental.py): even-doc_id
    docs form the PRIOR corpus (signatures persisted), odd-doc_id docs
    arrive as the NEW batch. Output: per new doc (doc_id, keep,
    reason) where reason ∈ {keep, dup_prior, dup_new} — semantics
    equal a full first-occurrence run over prior-then-new.
    verify_mode="exact" re-scores every candidate pair with the TRUE
    8-shingle Jaccard, so the edge set is exact-by-construction
    wherever LSH recall is 1 (bands=32, the neardup_clusters_docs
    regime). The DuckDB oracle recomputes the identical exact 8-gram
    Jaccard edges over the union, closes them transitively in the same
    prior-below-new id namespace, and derives the identical
    keep/reason rule."""
    import tempfile

    from deduper_ray.config import NearDupConfig
    from deduper_ray.pipelines.incremental import (
        run_neardup_incremental,
        sign_corpus,
    )

    cfg = NearDupConfig(
        text_column="text", shingle_k=8, num_perms=128, bands=32,
        threshold=0.7, simhash_bits=0, verify_mode="exact",
    )
    docs = _rp(
        _t(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(
        lambda t: t.append_column(
            "row_id", pc.cast(t["doc_id"], pa.int64())
        ),
        batch_format="pyarrow",
    )
    prior_ds = docs.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)),
        batch_format="pyarrow",
    )
    new_ds = docs.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1)),
        batch_format="pyarrow",
    )
    with tempfile.TemporaryDirectory() as tmp:
        sign_corpus(prior_ds, os.path.join(tmp, "prior_sigs"), cfg)
        inc = run_neardup_incremental(
            new_ds, os.path.join(tmp, "inc"), cfg,
            prior_signatures=os.path.join(tmp, "prior_sigs"),
            prior_source=prior_ds,
        )
        out = inc.decisions().to_pandas()
    out = out.rename(columns={"row_id": "doc_id"})
    return out.sort_values("doc_id").reset_index(drop=True)


def top_tokens_mg_docs(sf_dir: str) -> pd.DataFrame:
    """Corpus heavy hitters via the Misra-Gries bounded-state path
    (stages/relational.py token_heavy_hitters_mg): per-block MG
    summaries + exact candidate recount. Same answer as the exact
    combiner whenever the k-th count clears the n/capacity bound —
    true at every SF for this corpus, so the oracle is the same SQL."""
    from deduper_ray.stages.relational import token_heavy_hitters_mg

    ds = _rp(_t(sf_dir, "documents"), columns=["text"])
    return token_heavy_hitters_mg(
        ds, text_column="text", k=25, capacity=4096
    ).to_pandas()


def quantiles_float_events(sf_dir: str) -> pd.DataFrame:
    """Exact per-event-type quantiles over the REAL-VALUED ``value``
    column via iterative range refinement (stages/relational.py
    grouped_quantiles_binned) — the float-domain upgrade of the
    value-histogram combiner. max_enumeration is set low so the sf0.01
    oracle run exercises the refinement rounds, not just the final
    enumeration."""
    from deduper_ray.stages.relational import grouped_quantiles_binned

    ds = _rp(
        _t(sf_dir, "events"), columns=["event_type", "value"]
    )
    out = grouped_quantiles_binned(
        ds, key="event_type", value_col="value",
        quantiles=[0.5, 0.95, 0.99],
        num_bins=64, max_enumeration=50,
    )
    return out.sort_values("event_type").reset_index(drop=True)


def stratified_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-language stratified sample: every 7th doc per
    lang in doc_id order (stages/relational.py stratified_sample, built
    on the distributed grouped_row_number)."""
    from deduper_ray.stages.relational import stratified_sample

    ds = _rp(_t(sf_dir, "documents"))
    out = stratified_sample(ds, key="lang", order_col="doc_id", every_k=7)
    return (
        dataset_to_table(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[
            ["doc_id", "text", "lang", "source", "n_chars"]
        ]
    )


def quantiles_orders_priority(sf_dir: str) -> pd.DataFrame:
    """Exact per-priority price quantiles (percentile_disc semantics)
    via the distributed value-histogram combiner
    (stages/relational.py grouped_quantiles)."""
    from deduper_ray.stages.relational import grouped_quantiles

    ds = _rp(
        _t(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"]
    )

    def _c(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "price_c": pa.array(
                    _cents(t["o_totalprice"]), type=pa.int64()
                ),
            }
        )

    out = grouped_quantiles(
        ds.map_batches(_c, batch_format="pyarrow"),
        key="o_orderpriority", value_col="price_c",
        quantiles=[0.5, 0.95, 0.99],
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def decontaminate_docs(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (stages/decontam.py, substring mode):
    the 'benchmark set' is the first-5-word gram of every 97th doc —
    derived deterministically on BOTH sides — and any doc containing
    one of those grams as a substring is dropped."""
    from deduper_ray.stages.decontam import decontaminate

    bench_tbl = dataset_to_table(
        _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(
            lambda t: pa.table(
                {
                    "gram": pc.binary_join(
                        pc.list_slice(
                            pc.split_pattern(t["text"], " "), 0, 5
                        ),
                        " ",
                    )
                }
            ).filter(
                pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0
                )
            ),
            batch_format="pyarrow",
        )
    )
    grams = bench_tbl["gram"].to_pylist()
    ds = _rp(_t(sf_dir, "documents"))
    out = decontaminate(ds, grams, mode="substring")
    return (
        dataset_to_table(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[
            ["doc_id", "text", "lang", "source", "n_chars"]
        ]
    )


def chunk_dedupe_docs(sf_dir: str) -> pd.DataFrame:
    """Chunk-level exact dedup (stages/chunkdedup.py): 32-char blocks,
    global first-occurrence-wins, docs reassembled from surviving
    chunks (empty string when fully deduplicated)."""
    from deduper_ray.stages.chunkdedup import chunk_dedupe

    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = chunk_dedupe(ds, chunk_chars=32, num_partitions=8)
    return (
        dataset_to_table(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def join_orders_customers(sf_dir: str) -> pd.DataFrame:
    """Large×large hash-partitioned join (stages/relational.py
    partitioned_join — Ray's hash-shuffle Dataset.join), aggregated to
    per-market-segment order counts + exact cent totals."""
    from deduper_ray.stages.relational import partitioned_join

    orders = _rp(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "price_c": pa.array(
                    _cents(t["o_totalprice"]), type=pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    customer = _rp(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: pa.table(
            {"o_custkey": t["c_custkey"], "c_mktsegment": t["c_mktsegment"]}
        ),
        batch_format="pyarrow",
    )
    joined = partitioned_join(
        orders, customer, "o_custkey", num_partitions=8
    )

    def _partial(t: pa.Table) -> pa.Table:
        return pa.TableGroupBy(
            t.select(["c_mktsegment", "price_c"]), "c_mktsegment"
        ).aggregate([("price_c", "sum"), ("price_c", "count")])

    parts = dataset_to_table(
        joined.map_batches(_partial, batch_format="pyarrow")
    ).to_pandas()
    df = (
        parts.groupby("c_mktsegment", as_index=False)
        .sum()
        .rename(
            columns={
                "price_c_sum": "total_cents", "price_c_count": "n_orders"
            }
        )
    )
    df["n_orders"] = df["n_orders"].astype("int64")
    return (
        df[["c_mktsegment", "n_orders", "total_cents"]]
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )


def semantic_dedupe_embeddings(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-shaped semantic dedup (stages/ann.py semantic_dedupe):
    every vector mapped to its min-id semantic representative under
    cosine ≥ 0.45 components. ``n_cells=1`` makes the operator exact
    all-pairs at this scale, so the recursive-closure SQL oracle is
    exact-by-construction (the cells are the approximation knob at
    corpus scale)."""
    from deduper_ray.stages.ann import semantic_dedupe

    ds = _rp(_t(sf_dir, "embeddings"))
    out = semantic_dedupe(ds, threshold=0.45, n_cells=1)
    return (
        dataset_to_table(out)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def repetition_docs(sf_dir: str) -> pd.DataFrame:
    """Intra-doc repetition quality signals (functions/text.py
    add_repetition_stats): dup-word and top-word ratios per doc."""
    from deduper_ray.functions.text import add_repetition_stats

    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = (
        dataset_to_table(
            ds.map_batches(
                lambda t: add_repetition_stats(t), batch_format="pyarrow"
            )
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return _round6(out, ["dup_word_ratio", "top_word_ratio"])


def except_users_no_big_purchase(sf_dir: str) -> pd.DataFrame:
    """Set-op EXCEPT: all users minus users with a big (>200) purchase
    — distinct per side, the subtracted side broadcast as an ANTI-join
    filter (gap table 'Set ops': except = broadcast anti-join, the
    same shape as the seen-hash filter O8)."""
    from deduper_ray.stages.relational import distinct

    ds = _rp(
        _t(sf_dir, "events"), columns=["user_id", "event_type", "value"]
    )

    def _filtered(mask_fn) -> pa.Table:
        filtered = ds.map_batches(
            lambda t: t.filter(mask_fn(t)).select(["user_id"]),
            batch_format="pyarrow",
        )
        return dataset_to_table(
            distinct(filtered, ["user_id"]),
            pa.schema([("user_id", pa.int64())]),
        )

    # true tautology for the EXCEPT left side (ALL rows — the oracle is
    # an unconditional SELECT DISTINCT; a value predicate would silently
    # drop out-of-range ids)
    clicks = _filtered(
        lambda t: pa.array(np.ones(t.num_rows, dtype=bool))
    )
    buys = _filtered(
        lambda t: pc.and_(
            pc.equal(t["event_type"], "purchase"),
            pc.greater(t["value"], 200.0),
        )
    )
    buy_set = pc.unique(buys["user_id"])
    out = clicks.filter(
        pc.invert(pc.is_in(clicks["user_id"], value_set=buy_set))
    )
    return (
        out.to_pandas().sort_values("user_id").reset_index(drop=True)
    )


# ------------------------------------------------- round-3 extensions


def dedup_keep_best_docs(sf_dir: str) -> pd.DataFrame:
    """Policy-dedup: docs grouped by their 32-char text PREFIX (prefix
    blocking — the record-linkage blocking key family), keeper = the
    LONGEST variant, ties to the lowest doc_id (stages/exact.py
    dedupe_keep_best). Generalizes the reference's first-wins keeper
    rule (Deduper.kt:207-240) to a quality policy."""
    from deduper_ray.stages.exact import dedupe_keep_best

    ds = _rp(_t(sf_dir, "documents"))
    keyed = ds.map_batches(
        lambda t: t.append_column(
            "_pfx", pc.utf8_slice_codeunits(t["text"], 0, 32)
        ),
        batch_format="pyarrow",
    )
    best = dedupe_keep_best(
        keyed, group_col="_pfx", score_col="n_chars", id_col="doc_id"
    ).map_batches(lambda t: t.drop_columns(["_pfx"]), batch_format="pyarrow")
    out = best.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out[["doc_id", "text", "lang", "source", "n_chars"]]


def window_dedup_events(sf_dir: str) -> pd.DataFrame:
    """Windowed dedup: first event per (user_id, event_type) within
    each 1-hour tumbling window, ordered by (ts, event_id) — the
    event-log compaction form of first-occurrence-wins
    (stages/window.py window_dedupe)."""
    from deduper_ray.stages.window import window_dedupe

    ds = _rp(
        _t(sf_dir, "events"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = window_dedupe(
        ds, keys=["user_id", "event_type"], ts_column="ts",
        window_sec=3600, id_column="event_id",
    )
    df = dataset_to_table(out).to_pandas()
    df["tsec"] = (df["ts"].astype("int64") // 1_000_000).astype(np.int64)
    return (
        df[["event_id", "user_id", "event_type", "tsec", "value"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def simhash_neardup_docs(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup clustering: 64-bit MD5-shingle SimHash, 4×16-bit
    band blocking (pigeonhole recall 1 for Hamming ≤ 3), exact
    popcount(xor) verify, components (stages/simhash_nd.py). The SQL
    oracle recomputes the identical fingerprints (md5_number_lower) and
    clusters the bit_count(xor) ≤ 3 pairs with a recursive closure."""
    from deduper_ray.functions.text import add_simhash_md5
    from deduper_ray.stages.simhash_nd import simhash_neardup

    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    sims = ds.map_batches(
        lambda t: add_simhash_md5(t, shingle_k=8).select(
            ["doc_id", "simhash"]
        ),
        batch_format="pyarrow",
    )
    out = simhash_neardup(
        sims, id_column="doc_id", max_hamming=3, bands=4
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def range_join_orders_events(sf_dir: str) -> pd.DataFrame:
    """Interval join: per order, how many of the customer's events fall
    in the 7 days from the order date (stages/relational.py
    range_join_count — co-partitioned band join, vectorized
    lexicographic rank difference per bucket)."""
    from deduper_ray.stages.relational import range_join_count

    events = _rp(
        _t(sf_dir, "events"), columns=["user_id", "ts"]
    )
    orders = _rp(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "user_id", "o_orderdate"]),
        batch_format="pyarrow",
    )
    out = range_join_count(
        events, orders, by="user_id", point_ts="ts",
        interval_start="o_orderdate", window_sec=7 * 86400,
        interval_id="o_orderkey",
    )
    df = dataset_to_table(out).to_pandas()
    return df.sort_values("o_orderkey").reset_index(drop=True)


def events_above_p99(sf_dir: str) -> pd.DataFrame:
    """Grouped outlier filter: events whose value exceeds their
    event_type's exact p99 (percentile_disc). Thresholds come from the
    distributed range-refinement quantiles (grouped_quantiles_binned)
    and are broadcast; the filter is one vectorized pass — the
    two-phase shape of any 'compare to a group statistic' filter."""
    from deduper_ray.stages.relational import grouped_quantiles_binned

    ds = _rp(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )
    q = grouped_quantiles_binned(
        ds, key="event_type", value_col="value", quantiles=[0.99],
        num_bins=64, max_enumeration=50,
    )
    thresholds = dict(zip(q["event_type"], q["q99"]))
    thr_ref = ray.put(thresholds)

    def _flag(t: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        et = t["event_type"].to_pylist()
        lim = np.array([thr[e] for e in et], dtype=np.float64)
        v = t["value"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(v > lim))

    out = ds.map_batches(_flag, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def tfidf_top_terms_docs(sf_dir: str) -> pd.DataFrame:
    """Top-3 TF-IDF terms per document (space tokenization, idf =
    ln(N/df) in exact micro-units so engine and oracle agree
    bit-for-bit): per-(doc, token) tf via explode + native groupby,
    document frequencies via a second narrow groupby, idf map
    broadcast, grouped top-k selection (relational.grouped_top_k).
    Vocabulary-sized driver/broadcast state — same bound as the
    unigram LM; swap in token_heavy_hitters_mg for unbounded domains."""
    from ray.data.aggregate import Count

    from deduper_ray.stages.relational import grouped_top_k

    docs = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = docs.count()

    def _explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        out = pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, lens), type=pa.int64()),
                "token": flat,
            }
        )
        return out.filter(pc.not_equal(out["token"], ""))

    tf = (
        docs.map_batches(_explode, batch_format="pyarrow")
        .groupby(["doc_id", "token"])
        .aggregate(Count(alias_name="tf"))
        .materialize()
    )
    # document frequency: tf rows are distinct (doc, token) pairs
    df_tbl = dataset_to_table(
        tf.groupby("token").aggregate(Count(alias_name="df"))
    )
    dfs = df_tbl["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    # idf in exact micro-units (half-away-from-zero, like _cents)
    x = np.log(float(n_docs) / dfs) * 1e6
    idf_micro = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    idf_ref = ray.put(
        {
            "tokens": np.asarray(df_tbl["token"].combine_chunks()),
            "micro": idf_micro,
        }
    )

    def _score(t: pa.Table) -> pa.Table:
        m = ray.get(idf_ref)
        order = np.argsort(m["tokens"], kind="stable")
        toks_sorted, micro_sorted = m["tokens"][order], m["micro"][order]
        bt = np.asarray(t["token"].combine_chunks())
        pos = np.searchsorted(toks_sorted, bt)
        tfv = t["tf"].to_numpy(zero_copy_only=False)
        score = tfv * micro_sorted[pos]
        return t.append_column(
            "score_micro", pa.array(score, type=pa.int64())
        )

    scored = tf.map_batches(_score, batch_format="pyarrow")
    top = grouped_top_k(
        scored, 3, group_keys=["doc_id"],
        sort_keys=["score_micro", "token"], descending=[True, False],
    )
    out = top.to_pandas()[["doc_id", "token", "tf", "score_micro"]]
    return out.sort_values(
        ["doc_id", "score_micro", "token"],
        ascending=[True, False, True],
    ).reset_index(drop=True)


def fuzzy_match_parts(sf_dir: str) -> pd.DataFrame:
    """Fuzzy record linkage over the part table: block by p_brand,
    verify candidate pairs with exact Levenshtein over p_name ≤ 3
    (stages/linkage.py — blocking + pair-vectorized edit-distance DP).
    The fuzzy generalization of the reference's exact-hash record
    dedup; the oracle recomputes every within-brand pair with DuckDB's
    levenshtein (byte==codepoint on this ASCII column)."""
    from deduper_ray.stages.linkage import fuzzy_block_pairs

    ds = _rp(
        _t(sf_dir, "part"), columns=["p_partkey", "p_name", "p_brand"]
    )
    out = fuzzy_block_pairs(
        ds, block_col="p_brand", compare_col="p_name",
        id_col="p_partkey", max_distance=3,
    ).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def histogram_event_values(sf_dir: str) -> pd.DataFrame:
    """Fixed-width histogram of event values per event_type: bin =
    cents // 10000 (exact integer binning — no float boundary
    ambiguity), one narrow (type, bin) groupby-count. The distributed
    histogram primitive behind the exact grouped quantiles.
    Non-negative domain assumed (numpy floors negative //, SQL
    truncates; events.value ≥ 0 by schema)."""
    from ray.data.aggregate import Count

    ds = _rp(
        _t(sf_dir, "events"), columns=["event_type", "value"]
    )

    def _bin(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"], 100)
        return pa.table(
            {
                "event_type": t["event_type"],
                "bin": pa.array(cents // 10000, type=pa.int64()),
            }
        )

    out = dataset_to_table(
        ds.map_batches(_bin, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(Count(alias_name="n"))
    ).to_pandas()
    return out.sort_values(["event_type", "bin"]).reset_index(drop=True)


def corr_value_hour_by_type(sf_dir: str) -> pd.DataFrame:
    """Grouped Pearson correlation (value vs hour-of-day per
    event_type) from EXACT integer sufficient statistics: per-batch
    combiner sums (n, Σx, Σy, Σx², Σy², Σxy) in milli-units (all
    int64-exact), one tiny groupby merges them, the closed form runs
    on the driver — and the oracle computes the SAME closed form from
    the SAME integer sums, so both sides agree bit-for-bit before the
    6-dp rounding."""
    from ray.data.aggregate import Sum

    ds = _rp(
        _t(sf_dir, "events"), columns=["ts", "event_type", "value"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        x = pc.hour(t["ts"]).to_numpy(zero_copy_only=False).astype(np.int64)
        y = _cents(t["value"], 1000)
        uniq, inv = np.unique(et, return_inverse=True)
        cols = {"event_type": pa.array(uniq)}
        for name, arr in (
            ("n", np.ones_like(x)),
            ("sx", x),
            ("sy", y),
            ("sxx", x * x),
            ("syy", y * y),
            ("sxy", x * y),
        ):
            sums = np.zeros(uniq.size, dtype=np.int64)
            np.add.at(sums, inv, arr)
            cols[name] = pa.array(sums, type=pa.int64())
        return pa.table(cols)

    agg = dataset_to_table(
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            *[
                Sum(c, alias_name=c)
                for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
            ]
        )
    ).to_pandas()
    n = agg["n"].astype(float)
    sx, sy = agg["sx"].astype(float), agg["sy"].astype(float)
    sxx, syy, sxy = (
        agg["sxx"].astype(float),
        agg["syy"].astype(float),
        agg["sxy"].astype(float),
    )
    corr = (n * sxy - sx * sy) / np.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n": agg["n"].astype(np.int64),
            "corr_value_hour": corr.round(6),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def bottomk_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Bottom-k (hash-priority) sampling: the 20 docs with the
    smallest content-hash priority — the KMV-sketch selection rule, a
    deterministic distributed sample that needs NO global shuffle
    (per-block partial bottom-k via stages/relational.top_k, driver
    merges ≤ blocks × k rows). Stable under any partitioning and
    row-id assignment."""
    import hashlib

    from deduper_ray.functions.hashing import _utf8_slices
    from deduper_ray.stages.relational import top_k

    ds = _rp(_t(sf_dir, "documents"))

    def _prio(t: pa.Table) -> pa.Table:
        offsets, data = _utf8_slices(t["text"])
        md5 = hashlib.md5
        prio = np.fromiter(
            (
                int.from_bytes(md5(data[a:b]).digest()[8:16], "little")
                >> 1  # keep within int64
                for a, b in zip(offsets, offsets[1:])
            ),
            dtype=np.int64,
            count=t.num_rows,
        )
        return t.append_column("priority", pa.array(prio, type=pa.int64()))

    out = top_k(
        ds.map_batches(_prio, batch_format="pyarrow"),
        20, sort_keys=["priority", "doc_id"], descending=False,
    ).to_pandas()
    return out.sort_values(["priority", "doc_id"]).reset_index(drop=True)


def label_centroids_embeddings(sf_dir: str) -> pd.DataFrame:
    """Vector aggregation: per-label embedding centroid as EXACT
    micro-unit dimension sums (the kmeans/SemDeDup building block
    exposed as an operator). Per-batch combiner collapses each block
    to ≤ #labels × dim partial rows before one small groupby — the
    vector analogue of the q1 pre-aggregation."""
    from ray.data.aggregate import Sum

    ds = _rp(
        _t(sf_dir, "embeddings"), columns=["label", "embedding"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        labels = t["label"].to_numpy(zero_copy_only=False)
        emb = np.stack(
            t["embedding"].to_pandas().to_numpy()
        ).astype(np.float64)
        x = emb * 1e6
        micro = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        d = micro.shape[1]
        sums = np.zeros((uniq.size, d), dtype=np.int64)
        np.add.at(sums, inv, micro)
        counts = np.bincount(inv)
        return pa.table(
            {
                "label": pa.array(
                    np.repeat(uniq, d).astype(np.int64), type=pa.int64()
                ),
                "dim": pa.array(
                    np.tile(np.arange(1, d + 1, dtype=np.int64), uniq.size)
                ),
                "sum_micro": pa.array(sums.reshape(-1), type=pa.int64()),
                "n": pa.array(
                    np.repeat(counts, d).astype(np.int64), type=pa.int64()
                ),
            }
        )

    out = dataset_to_table(
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(
            Sum("sum_micro", alias_name="sum_micro"),
            Sum("n", alias_name="n"),
        )
    ).to_pandas()
    out["sum_micro"] = out["sum_micro"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["label", "dim"]).reset_index(drop=True)[
        ["label", "dim", "sum_micro", "n"]
    ]


def events_quartile_buckets(sf_dir: str) -> pd.DataFrame:
    """Value discretization: each event tagged with its event_type's
    quartile bucket (1-4) by comparison against EXACT percentile_disc
    thresholds (q25/q50/q75 from the distributed range-refinement
    quantiles, broadcast once) — equality goes to the lower bucket on
    both sides."""
    from deduper_ray.stages.relational import grouped_quantiles_binned

    ds = _rp(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )
    q = grouped_quantiles_binned(
        ds, key="event_type", value_col="value",
        quantiles=[0.25, 0.5, 0.75], num_bins=64, max_enumeration=50,
    )
    thr = {
        r["event_type"]: (r["q25"], r["q50"], r["q75"])
        for _, r in q.iterrows()
    }
    thr_ref = ray.put(thr)

    def _bucket(t: pa.Table) -> pa.Table:
        m = ray.get(thr_ref)
        et = t["event_type"].to_pylist()
        v = t["value"].to_numpy(zero_copy_only=False)
        t1 = np.array([m[e][0] for e in et])
        t2 = np.array([m[e][1] for e in et])
        t3 = np.array([m[e][2] for e in et])
        bucket = (
            1 + (v > t1).astype(np.int64) + (v > t2) + (v > t3)
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "bucket": pa.array(bucket, type=pa.int64()),
            }
        )

    out = ds.map_batches(_bucket, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def normalized_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Normalization-aware exact dedup: the dedup key is
    NFC-normalized, lowercased, whitespace-collapsed, trimmed text —
    the standard canonicalization step before exact text dedup (near-
    identical casing/spacing variants collapse). First occurrence by
    doc_id wins. All Arrow kernels (utf8_normalize / utf8_lower /
    replace_substring_regex); the key stays a narrow projection."""
    from ray.data.aggregate import Count, Min

    ds = _rp(_t(sf_dir, "documents"))

    def _norm(t: pa.Table) -> pa.Table:
        from deduper_ray.functions.hashing import md5_hex_array

        k = pc.utf8_normalize(t["text"], form="NFC")
        k = pc.utf8_lower(k)
        k = pc.replace_substring_regex(k, pattern=r"\s+", replacement=" ")
        k = pc.utf8_trim_whitespace(k)
        # group on the key's MD5 — the all-to-all moves 32-byte digests,
        # not canonicalized documents (pipelines/curate.py, same fix)
        return t.append_column("_norm", md5_hex_array(k))

    keyed = ds.map_batches(_norm, batch_format="pyarrow")
    stats = keyed.map_batches(
        lambda t: t.select(["_norm", "doc_id"]), batch_format="pyarrow"
    ).groupby("_norm").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="n")
    )
    keep_tbl = dataset_to_table(
        stats.map_batches(
            lambda t: t.select(["keep_id"]), batch_format="pyarrow"
        )
    )
    keep_ref = ray.put(
        np.sort(keep_tbl["keep_id"].to_numpy(zero_copy_only=False))
    )

    def _filter(t: pa.Table) -> pa.Table:
        keep = ray.get(keep_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(keep, ids), keep.size - 1)
        return t.filter(pa.array(keep[pos] == ids)).drop_columns(["_norm"])

    out = keyed.map_batches(_filter, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def funnel_click_to_purchase(sf_dir: str) -> pd.DataFrame:
    """Temporal sequence detection (funnel): per user, the FIRST
    purchase that follows a click within one hour
    (relational.funnel_first_conversion — co-partitioned buckets, two
    vectorized lexicographic rank differences per bucket, no per-user
    Python)."""
    from deduper_ray.stages.relational import funnel_first_conversion

    ds = _rp(
        _t(sf_dir, "events"), columns=["user_id", "event_type", "ts"]
    )
    clicks = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click")),
        batch_format="pyarrow",
    )
    buys = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
        batch_format="pyarrow",
    )
    out = funnel_first_conversion(
        clicks, buys, by="user_id", trigger_ts="ts",
        conversion_ts="ts", window_sec=3600,
    ).to_pandas()
    out["first_conv_tsec"] = (
        out["first_conv_ts_us"] // 1_000_000
    ).astype(np.int64)
    return (
        out[["user_id", "first_conv_tsec"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def hash_sample_docs(sf_dir: str) -> pd.DataFrame:
    """CONTENT-hash sampling: keep docs where md5_number_lower(text)
    % 10 == 3 — deterministic Bernoulli-style sampling that is stable
    under row-id reassignment / re-partitioning (unlike the id-modulus
    sample_docs). Same md5-low-8-bytes-little-endian convention as the
    simhash oracle (functions/text.py add_simhash_md5), so DuckDB
    reproduces the decision bit-for-bit."""
    import hashlib

    from deduper_ray.functions.hashing import _utf8_slices

    ds = _rp(_t(sf_dir, "documents"))

    def _keep(t: pa.Table) -> pa.Table:
        offsets, data = _utf8_slices(t["text"])
        md5 = hashlib.md5
        keep = np.fromiter(
            (
                int.from_bytes(md5(data[a:b]).digest()[8:16], "little") % 10
                == 3
                for a, b in zip(offsets, offsets[1:])
            ),
            dtype=bool,
            count=t.num_rows,
        )
        return t.filter(pa.array(keep))

    out = ds.map_batches(_keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def dup_rate_by_lang(sf_dir: str) -> pd.DataFrame:
    """Dedup observability: per-language doc count, distinct-text
    count, and dup ratio — the per-stratum report a curation run reads
    before choosing dedup strategy. One narrow (lang, hash) projection,
    distinct-per-group via the per-hash stats groupby, then a tiny
    per-lang aggregate."""
    from ray.data.aggregate import Count

    hashed = _docs_hashed(sf_dir, ("text",))
    narrow = hashed.map_batches(
        lambda t: t.select(["lang", HASH_COL]), batch_format="pyarrow"
    )
    per_hash = narrow.groupby(["lang", HASH_COL]).aggregate(
        Count(alias_name="n_rows")
    )
    per_lang = dataset_to_table(
        per_hash.groupby("lang").aggregate(
            Count(alias_name="n_distinct_texts"),
        )
    ).to_pandas()
    totals = dataset_to_table(
        narrow.groupby("lang").aggregate(Count(alias_name="n_docs"))
    ).to_pandas()
    out = totals.merge(per_lang, on="lang")
    out["dup_ratio"] = (
        1.0 - out["n_distinct_texts"] / out["n_docs"]
    ).round(6)
    return (
        out[["lang", "n_docs", "n_distinct_texts", "dup_ratio"]]
        .sort_values("lang")
        .reset_index(drop=True)
    )


def rollup_event_value(sf_dir: str) -> pd.DataFrame:
    """ROLLUP/GROUPING SETS coverage: event count + exact milli-unit
    value sum at three levels — (event_type, hour-of-day), (event_type),
    and the grand total — as a union of three independent groupbys
    (each one narrow pre-aggregated shuffle; the levels are disjoint
    output rows, so no cross-level exchange). NULL group columns mark
    the rolled-up levels, like SQL ROLLUP."""
    from ray.data.aggregate import Count, Sum

    ds = _rp(
        _t(sf_dir, "events"), columns=["ts", "event_type", "value"]
    ).map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.cast(
                    pc.hour(t["ts"]), pa.int64()
                ),
                "value_m": pa.array(
                    _cents(t["value"], 1000), type=pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def _level(keys: list[str]) -> pd.DataFrame:
        if keys:
            agg = ds.groupby(keys).aggregate(
                Count(alias_name="n"), Sum("value_m", alias_name="sum_m")
            )
            df = dataset_to_table(agg).to_pandas()
        else:
            df = pd.DataFrame(
                {"n": [ds.count()], "sum_m": [int(ds.sum("value_m") or 0)]}
            )
        for c in ("event_type", "hour"):
            if c not in df.columns:
                df[c] = None
        return df[["event_type", "hour", "n", "sum_m"]]

    out = pd.concat(
        [_level(["event_type", "hour"]), _level(["event_type"]), _level([])],
        ignore_index=True,
    )
    # float64 with NaN for rolled-up levels — the dtype a NULLABLE int
    # arrives as from SQL, so both sides render identically
    out["hour"] = out["hour"].astype("float64")
    out["sum_value"] = (out["sum_m"] / 1000.0).round(6)
    out = out.drop(columns=["sum_m"])
    return out.sort_values(
        ["event_type", "hour"], na_position="first"
    ).reset_index(drop=True)


def fuzzy_match_parts_jw(sf_dir: str) -> pd.DataFrame:
    """Record linkage with the Jaro-Winkler metric: same brand
    blocking as fuzzy_match_parts, verify sim ≥ 0.9 (stages/linkage.py
    jaro_winkler — DuckDB-parity variant, bit-equal on ASCII pairs,
    pinned by pytest). Rounded to 6 dp after filtering on the raw
    value, identically on both sides."""
    from deduper_ray.stages.linkage import fuzzy_block_pairs

    ds = _rp(
        _t(sf_dir, "part"), columns=["p_partkey", "p_name", "p_brand"]
    )
    out = fuzzy_block_pairs(
        ds, block_col="p_brand", compare_col="p_name",
        id_col="p_partkey", min_similarity=0.9,
    ).to_pandas()
    out["sim"] = out["sim"].round(6)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def user_event_sequences(sf_dir: str) -> pd.DataFrame:
    """Per-user ordered event-type sequence (string_agg ORDER BY ts,
    event_id) — grouped sequence assembly, the session-mining shape.
    Bucket backend (relational.grouped_ordered_concat): one keyed
    shuffle of narrow rows, Python dispatch count = #buckets not
    #users, C-level pandas agg inside each bucket task."""
    from deduper_ray.stages.relational import grouped_ordered_concat

    ds = _rp(
        _t(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"]
    )
    out = grouped_ordered_concat(
        ds, key="user_id", order_cols=["ts", "event_id"],
        value_col="event_type", sep=",",
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def pivot_user_event_counts(sf_dir: str) -> pd.DataFrame:
    """Pivot/crosstab: events per user × event_type as one wide row per
    user. Vectorized indicator columns inside map_batches + ONE native
    groupby-sum — the distributed conditional-aggregation form of
    PIVOT (no per-category shuffle)."""
    from ray.data.aggregate import Count, Sum

    ds = _rp(
        _t(sf_dir, "events"), columns=["user_id", "event_type"]
    )
    cats = ["click", "error", "purchase", "signup", "view"]

    def _indicators(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for c in cats:
            cols[f"n_{c}"] = pc.cast(
                pc.equal(t["event_type"], c), pa.int64()
            )
        return pa.table(cols)

    aggs = [Sum(f"n_{c}", alias_name=f"n_{c}") for c in cats]
    out = (
        ds.map_batches(_indicators, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Count(alias_name="n_total"), *aggs)
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)[
        ["user_id", "n_total"] + [f"n_{c}" for c in cats]
    ]


def entity_resolution_parts(sf_dir: str) -> pd.DataFrame:
    """End-to-end entity resolution: brand blocking → Levenshtein ≤ 2
    verify → connected components → canonical id (min member) per
    entity — the full record-linkage composition over the part table
    (blocking from stages/linkage.py, clustering from
    state/unionfind.py). Every part appears once; unmatched parts are
    their own canonical record."""
    from deduper_ray.stages.linkage import fuzzy_block_pairs
    from deduper_ray.state.unionfind import cluster_edges_table

    ds = _rp(
        _t(sf_dir, "part"), columns=["p_partkey", "p_name", "p_brand"]
    )
    pairs = fuzzy_block_pairs(
        ds, block_col="p_brand", compare_col="p_name",
        id_col="p_partkey", max_distance=2,
    )
    labels = cluster_edges_table(pairs, id_column="p_partkey")
    lab_sorted = labels.sort_by("p_partkey")
    lk = lab_sorted["p_partkey"].to_numpy()
    lv = lab_sorted["cluster_id"].to_numpy()
    lab_ref = ray.put({"keys": lk, "labels": lv})

    def _canon(t: pa.Table) -> pa.Table:
        m = ray.get(lab_ref)
        ids = t["p_partkey"].to_numpy(zero_copy_only=False)
        canon = ids.copy()
        if m["keys"].size:
            pos = np.minimum(
                np.searchsorted(m["keys"], ids), m["keys"].size - 1
            )
            hit = m["keys"][pos] == ids
            canon[hit] = m["labels"][pos[hit]]
        return pa.table(
            {
                "p_partkey": pa.array(ids, type=pa.int64()),
                "canonical_id": pa.array(canon, type=pa.int64()),
            }
        )

    out = ds.map_batches(_canon, batch_format="pyarrow").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


def snm_pairs_parts(sf_dir: str) -> pd.DataFrame:
    """Sorted-neighborhood record linkage over part names: rank window
    5 under ORDER BY (p_name, p_partkey), Levenshtein ≤ 3 verify
    (stages/linkage.py sorted_neighborhood_pairs — global sort +
    per-block offset scan + fringe stitching on the driver)."""
    from deduper_ray.stages.linkage import sorted_neighborhood_pairs

    ds = _rp(
        _t(sf_dir, "part"), columns=["p_partkey", "p_name"]
    )
    out = sorted_neighborhood_pairs(
        ds, sort_col="p_name", id_col="p_partkey", window=5,
        max_distance=3,
    ).to_pandas()
    return out.sort_values(["id_a", "id_b", "rank_dist"]).reset_index(
        drop=True
    )


def image_features_pnm(sf_dir: str) -> pd.DataFrame:
    """Multimodal decode → feature extraction over a REAL image format
    with no native deps: deterministic PPM (P6) payloads are rendered
    per document (gradient keyed on doc_id), then decoded/resized/
    featurized by the ImageFeatureExtractor ACTOR POOL running the
    numpy PNM codec (functions/imagecodec.py) — the dependency-free
    instantiation of the pillow path (stages/multimodal.py). Returns
    (media_id, f0, f1) rounded to 6 dp; no SQL oracle (decoded-pixel
    math), driver records the rows-only check."""
    from deduper_ray.functions.imagecodec import encode_pnm
    from deduper_ray.stages.multimodal import (
        DEFAULT_MEDIA_BATCH_SIZE,
        ImageFeatureExtractor,
    )

    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def _render(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n_chars = t["n_chars"].to_numpy(zero_copy_only=False)
        payloads = []
        for i, nc in zip(ids, n_chars):
            w, h = 8 + int(i) % 5, 6 + int(i) % 3
            x = np.arange(w, dtype=np.int64)
            y = np.arange(h, dtype=np.int64)[:, None]
            r = (x * 255 // max(w - 1, 1)) + np.zeros((h, 1), np.int64)
            g = (y * 255 // max(h - 1, 1)) + np.zeros((1, w), np.int64)
            b = np.full((h, w), int(nc) % 256, dtype=np.int64)
            img = np.stack([r, g, b], axis=2).astype(np.uint8)
            payloads.append(encode_pnm(img))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
                "mime": pa.array(
                    ["image/x-portable-pixmap"] * len(payloads)
                ),
            }
        )

    feats = (
        ds.map_batches(_render, batch_format="pyarrow")
        .map_batches(
            ImageFeatureExtractor,
            fn_constructor_kwargs={"dim": 16, "decoder": "pnm"},
            batch_format="pyarrow",
            batch_size=DEFAULT_MEDIA_BATCH_SIZE,
            concurrency=(1, 4),
        )
        .to_pandas()
    )
    f = np.stack(feats["feature"].to_numpy())
    out = pd.DataFrame(
        {
            "media_id": feats["media_id"],
            "f0": np.round(f[:, 0], 6),
            "f1": np.round(f[:, 1], 6),
        }
    )
    return out.sort_values("media_id").reset_index(drop=True)


def latest_event_per_user(sf_dir: str) -> pd.DataFrame:
    """Argmax-per-key window: each user's LATEST event (ORDER BY ts
    DESC, event_id ASC — deterministic tie-break), via
    relational.grouped_argmax (bucketed pandas sort+drop_duplicates;
    Python dispatch per bucket, not per user). SQL: row_number() OVER
    (PARTITION BY user_id ORDER BY ts DESC, event_id) = 1."""
    from deduper_ray.stages.relational import grouped_argmax

    ds = _rp(
        _t(sf_dir, "events"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = grouped_argmax(
        ds, group_cols=["user_id"],
        order_by=[("ts", False), ("event_id", True)],
    ).to_pandas()
    return (
        out[["user_id", "event_id", "ts", "event_type", "value"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def running_value_per_user(sf_dir: str) -> pd.DataFrame:
    """Cumulative-sum window function: running total of event value per
    user ordered by (ts, event_id), computed over exact integer cents
    (relational.grouped_running_sum — bucketed C-level groupby.cumsum,
    nothing per-row or per-user in Python)."""
    from deduper_ray.stages.relational import grouped_running_sum

    ds = _rp(
        _t(sf_dir, "events"),
        columns=["event_id", "ts", "user_id", "value"],
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "ts": t["ts"],
                "user_id": t["user_id"],
                "value_c": pa.array(_cents(t["value"]), type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = grouped_running_sum(
        ds, key="user_id", order_cols=["ts", "event_id"],
        value_col="value_c", out="rc",
    ).to_pandas()
    out["running_value"] = out["rc"] / 100.0
    return (
        out[["event_id", "user_id", "running_value"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def moving_avg_value_per_type(sf_dir: str) -> pd.DataFrame:
    """Bounded-frame moving average: 4-event trailing mean of value per
    event_type ordered by (ts, event_id) — relational.grouped_moving_avg
    (bucketed pandas rolling over exact cents; the division
    numerator/denominator match the oracle's bit-for-bit)."""
    from deduper_ray.stages.relational import grouped_moving_avg

    ds = _rp(
        _t(sf_dir, "events"),
        columns=["event_id", "ts", "event_type", "value"],
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "ts": t["ts"],
                "event_type": t["event_type"],
                "value_c": pa.array(_cents(t["value"]), type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = grouped_moving_avg(
        ds, key="event_type", order_cols=["ts", "event_id"],
        value_col="value_c", window=4, out="ma_c",
    ).to_pandas()
    out["moving_avg_value"] = out["ma_c"] / 100.0
    return (
        out[["event_id", "event_type", "moving_avg_value"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def mode_event_type_per_user(sf_dir: str) -> pd.DataFrame:
    """Grouped mode with a deterministic tie-break: each user's most
    frequent event_type (ties → alphabetically first) — pre-aggregated
    counts (one narrow groupby) + relational.grouped_argmax over
    (n DESC, event_type ASC). SQL: row_number over count(*)."""
    from deduper_ray.stages.relational import grouped_argmax

    ds = _rp(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    counts = ds.groupby(["user_id", "event_type"]).aggregate(
        Count(alias_name="n")
    )
    out = grouped_argmax(
        counts, group_cols=["user_id"],
        order_by=[("n", False), ("event_type", True)],
    ).to_pandas()
    return (
        out[["user_id", "event_type", "n"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def substring_overlap_docs(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide exact substring overlap: every doc pair sharing an
    exact 32-byte substring (stages/overlap.py — winnowing anchor
    fingerprints, window=1 = exact; the anchors reuse the LSH sort +
    run-scan + fragment-stitch machinery). The SQL oracle rebuilds the
    same pairs from a 32-char gram self-join (ASCII: bytes == chars)."""
    from deduper_ray.stages.overlap import substring_overlap_pairs

    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    pairs, _dropped = substring_overlap_pairs(
        ds, min_len=32, window=1, id_column="doc_id"
    )
    if _dropped:
        # this query registers an EXACT SQL oracle: a lossy bucket cap
        # (one hot 32-byte gram shared by > ~2·cap docs) would silently
        # diverge from it at larger scale factors — fail loud instead
        raise RuntimeError(
            f"substring_overlap_docs: bucket cap dropped {_dropped} "
            "pairs; raise max_pairs_per_bucket for oracle-checked runs"
        )
    out = pairs.to_pandas().drop_duplicates()
    return (
        out[["id_a", "id_b"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def customers_no_urgent_order(sf_dir: str) -> pd.DataFrame:
    """Cross-table ANTI-join: customers who never placed a 1-URGENT
    order (NOT EXISTS). The orders side is filtered at the read and
    projected to DISTINCT o_custkey (a narrow distinct, bounded by
    customer cardinality), broadcast as a sorted int array; the
    customer side anti-filters vectorized — the broadcast-anti-semi-
    join shape (SCALE.md small-side rule). For a corpus-scale right
    side, co-partition both on the key instead."""
    orders = _rp(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t["o_orderpriority"], "1-URGENT")
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    keys: list[np.ndarray] = []
    for b in distinct(orders, ["o_custkey"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        keys.append(b["o_custkey"].to_numpy(zero_copy_only=False))
    have = np.sort(np.concatenate(keys)) if keys else np.empty(0, np.int64)
    have_ref = ray.put(have)

    def _anti(t: pa.Table) -> pa.Table:
        h = ray.get(have_ref)
        if h.size == 0:
            return t
        ids = t["c_custkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(h, ids), h.size - 1)
        return t.filter(pa.array(h[pos] != ids))

    cust = _rp(
        _t(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_nationkey"],
    )
    out = cust.map_batches(_anti, batch_format="pyarrow").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def value_stats_by_type(sf_dir: str) -> pd.DataFrame:
    """Grouped mean + sample variance + stddev over exact integer
    cents: one narrow groupby of (n, Σc, Σc²) partials, then identical
    float expressions on both sides (the corr_value_hour protocol —
    int sums are order-independent, so the IEEE results match the
    oracle bit-for-bit before the final 6 dp round)."""
    ds = _rp(_t(sf_dir, "events"), columns=["event_type", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        c = _cents(t["value"])
        return pa.table(
            {
                "event_type": t["event_type"],
                "c": pa.array(c, type=pa.int64()),
                "cc": pa.array(c * c, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("c", alias_name="sc"),
            Sum("cc", alias_name="scc"),
        )
        .to_pandas()
    )
    n = agg["n"].astype(np.float64)
    sc = agg["sc"].astype(np.float64)
    scc = agg["scc"].astype(np.float64)
    mean = sc / n / 100.0
    var = (n * scc - sc * sc) / (n * (n - 1.0)) / 10000.0
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n": agg["n"].astype(np.int64),
            "mean_value": np.round(mean, 6),
            "var_value": np.round(var, 6),
            "std_value": np.round(np.sqrt(var), 6),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def deterministic_shuffle_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic global shuffle for training-data export: rank
    every doc by md5(doc_id || salt) — a reproducible pseudo-random
    permutation computed with ONE narrow sort (the hash is the sort
    key, so the order is independent of partitioning/parallelism).
    Returns (shuffle_rank, doc_id)."""
    from deduper_ray.functions.hashing import md5_hex_array
    from deduper_ray.stages.relational import global_running_sum

    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id"]).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "_h": md5_hex_array(
                    pc.binary_join_element_wise(
                        pc.cast(t["doc_id"], pa.string()),
                        "shuffle-salt-1",
                        "|",
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    # rank = global running COUNT ordered by the (unique) hash —
    # the distributed keyless scan: one sort + O(blocks) driver
    # metadata, ranks assigned per block from broadcast offsets
    withone = ds.map_batches(
        lambda t: t.append_column(
            "_one", pa.array(np.ones(t.num_rows, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    ranked = global_running_sum(
        withone, order_col="_h", value_col="_one", out="shuffle_rank"
    )
    df = ranked.to_pandas()
    return (
        df[["shuffle_rank", "doc_id"]]
        .sort_values("shuffle_rank")
        .reset_index(drop=True)
    )


def token_shard_assignment(sf_dir: str) -> pd.DataFrame:
    """Training-shard planning: assign docs (in doc_id order) to
    fixed-token-budget shards — shard = (running_token_sum − n_tokens)
    // budget, computed with the DISTRIBUTED global scan
    (relational.global_running_sum: one sort + per-block offsets, the
    driver holds one row per BLOCK). SQL: the same window expression."""
    from deduper_ray.functions.text import add_token_count
    from deduper_ray.stages.relational import global_running_sum

    budget = 10_000
    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(
        lambda t: add_token_count(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )
    scanned = global_running_sum(
        ds, order_col="doc_id", value_col="n_tokens", out="rt"
    )

    def _shard(t: pa.Table) -> pa.Table:
        rt = t["rt"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "shard": pa.array((rt - n) // budget, type=pa.int64()),
            }
        )

    out = scanned.map_batches(_shard, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def audio_features_wav(sf_dir: str) -> pd.DataFrame:
    """Multimodal audio decode → feature extraction over a REAL
    container with no native deps: deterministic PCM16 WAV payloads are
    synthesized per document (sine keyed on doc_id), then decoded and
    featurized by the AudioFeatureExtractor ACTOR POOL running the
    numpy RIFF/PCM codec (functions/audiocodec.py). Returns
    (media_id, rms0, zcr0) rounded to 6 dp; no SQL oracle (decoded
    sample math) — driver records the rows-only check."""
    from deduper_ray.functions.audiocodec import encode_wav
    from deduper_ray.stages.multimodal import AudioFeatureExtractor

    ds = _rp(_t(sf_dir, "documents"), columns=["doc_id"])

    def _render(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            freq = 100.0 + (int(i) % 40) * 10.0
            n = 800 + (int(i) % 7) * 100
            ts = np.arange(n, dtype=np.float64) / 8000.0
            mono = (np.sin(2 * np.pi * freq * ts) * 20000).astype(np.int16)
            payloads.append(encode_wav(mono[:, None], 8000))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "mime": pa.array(["audio/wav"] * len(payloads)),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    feats = (
        ds.map_batches(_render, batch_format="pyarrow")
        .map_batches(
            AudioFeatureExtractor,
            fn_constructor_kwargs={"num_frames": 8, "decoder": "wav"},
            batch_format="pyarrow",
            batch_size=64,
            concurrency=(1, 4),
        )
        .to_pandas()
    )
    f = np.stack(feats["feature"].to_numpy())
    out = pd.DataFrame(
        {
            "media_id": feats["media_id"],
            "rms0": np.round(f[:, 0].astype(np.float64), 6),
            "zcr0": np.round(f[:, 1].astype(np.float64), 6),
        }
    )
    return out.sort_values("media_id").reset_index(drop=True)
