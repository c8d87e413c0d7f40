"""Round-4 window/sequence operators: grouped_argmax,
grouped_running_sum, grouped_moving_avg — brute-force pandas
equivalence at several partitionings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from deduper_ray.stages.relational import (
    grouped_argmax,
    grouped_moving_avg,
    grouped_running_sum,
)


@pytest.fixture(scope="module")
def events_df():
    rng = np.random.default_rng(3)
    n = 4000
    return pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 60, n).astype(np.int64),
            "t": rng.integers(0, 500, n).astype(np.int64),
            "v": rng.integers(-50, 100, n).astype(np.int64),
            "s": rng.choice(list("abcde"), n),
        }
    )


@pytest.mark.parametrize("parts", [1, 7])
def test_grouped_argmax_matches_pandas(events_df, parts):
    ds = rd.from_pandas(events_df).repartition(parts)
    got = (
        grouped_argmax(
            ds, group_cols=["k"], order_by=[("t", False), ("eid", True)]
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        events_df.sort_values(["k", "t", "eid"], ascending=[True, False, True])
        .drop_duplicates(subset=["k"], keep="first")
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_grouped_argmax_string_tiebreak(events_df):
    # mode-style: order by (v desc, s asc) — string secondary key
    ds = rd.from_pandas(events_df)
    got = (
        grouped_argmax(
            ds, group_cols=["k"], order_by=[("v", False), ("s", True)]
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        events_df.sort_values(["k", "v", "s"], ascending=[True, False, True])
        .drop_duplicates(subset=["k"], keep="first")
        .sort_values("k")
        .reset_index(drop=True)
    )
    # argmax row identity can differ on full ties of (v, s); compare keys
    pd.testing.assert_frame_equal(got[["k", "v", "s"]], exp[["k", "v", "s"]])


@pytest.mark.parametrize("parts", [1, 7])
def test_grouped_running_sum_matches_pandas(events_df, parts):
    ds = rd.from_pandas(events_df).repartition(parts)
    got = (
        grouped_running_sum(
            ds, key="k", order_cols=["t", "eid"], value_col="v", out="rs"
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    exp = events_df.sort_values(["k", "t", "eid"]).copy()
    exp["rs"] = exp.groupby("k")["v"].cumsum()
    exp = exp.sort_values("eid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_grouped_moving_avg_matches_pandas(events_df):
    ds = rd.from_pandas(events_df).repartition(5)
    got = (
        grouped_moving_avg(
            ds, key="k", order_cols=["t", "eid"], value_col="v",
            window=4, out="ma",
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    exp = events_df.sort_values(["k", "t", "eid"]).copy()
    r = exp.groupby("k")["v"].rolling(4, min_periods=1)
    exp["ma"] = (r.sum().to_numpy() / r.count().to_numpy())
    exp = exp.sort_values("eid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


@pytest.mark.parametrize("parts", [1, 9])
def test_global_running_sum_matches_pandas(events_df, parts):
    from deduper_ray.stages.relational import global_running_sum

    ds = rd.from_pandas(events_df).repartition(parts)
    got = (
        global_running_sum(ds, order_col="eid", value_col="v", out="rs")
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    exp = events_df.sort_values("eid").copy()
    exp["rs"] = exp["v"].cumsum()
    exp = exp.reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_global_running_sum_string_order():
    from deduper_ray.stages.relational import global_running_sum

    df = pd.DataFrame(
        {"k": [f"h{i:03d}" for i in [5, 2, 9, 0, 7]], "v": [1] * 5}
    )
    got = (
        global_running_sum(
            rd.from_pandas(df).repartition(3),
            order_col="k", value_col="v", out="rank",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]
