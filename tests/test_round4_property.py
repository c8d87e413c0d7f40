"""Property-based checks (hypothesis) for the round-4 primitives:
policy_drop_ids and dupe_groups_ds vs pandas brute force, under
random corpora and partitionings."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from deduper_ray.stages.exact import (
    HASH_COL,
    ROW_ID,
    dupe_groups_ds,
    group_stats,
    policy_drop_ids,
)
from deduper_ray.stages.seen import SEEN_FLAG

corpus = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),   # key id
        st.integers(min_value=0, max_value=50),   # score
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None)
@given(rows=corpus, parts=st.integers(min_value=1, max_value=5))
def test_policy_drop_ids_matches_pandas(rows, parts):
    df = pd.DataFrame(
        {
            "k": [f"key{k:02d}" for k, _ in rows],
            "s": [float(s) for _, s in rows],
            ROW_ID: np.arange(1, len(rows) + 1, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(parts)
    drops, _ = policy_drop_ids(ds, key_col="k", score_col="s")
    exp_keep = (
        df.sort_values(["k", "s", ROW_ID], ascending=[True, False, True])
        .drop_duplicates(subset=["k"], keep="first")[ROW_ID]
        .to_numpy()
    )
    exp_drops = np.sort(np.setdiff1d(df[ROW_ID].to_numpy(), exp_keep))
    assert drops.tolist() == exp_drops.tolist()


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=8), min_size=1, max_size=40
    ),
    parts=st.integers(min_value=1, max_value=4),
)
def test_dupe_groups_ds_matches_bruteforce(keys, parts):
    n = len(keys)
    t = pa.table(
        {
            HASH_COL: pa.array([f"h{k}" for k in keys]),
            ROW_ID: pa.array(np.arange(1, n + 1, dtype=np.int64)),
            SEEN_FLAG: pa.array([False] * n),
            "x": pa.array([f"p{i}" for i in range(1, n + 1)]),
        }
    )
    hashed = rd.from_arrow(t).repartition(parts)
    stats = group_stats(hashed).materialize()
    got = dupe_groups_ds(hashed, stats, columns_for_json=["x"]).to_pandas()
    df = t.to_pandas()
    exp_rows = []
    for h, grp in df.groupby(HASH_COL, sort=True):
        ids = np.sort(grp[ROW_ID].to_numpy())
        if ids.size < 2:
            continue
        exp_rows.append(
            {
                "hash": h,
                "row_ids": json.dumps([int(i) for i in ids[1:]]),
                "first_found_row_number": int(ids[0]),
                "dupe_values": json.dumps({"x": f"p{ids[1]}"}),
            }
        )
    exp = pd.DataFrame(
        exp_rows,
        columns=["hash", "row_ids", "first_found_row_number", "dupe_values"],
    )
    if exp.empty:
        assert got.empty
        return
    got = got.sort_values("hash").reset_index(drop=True)
    exp["first_found_row_number"] = exp["first_found_row_number"].astype(
        np.int64
    )
    pd.testing.assert_frame_equal(got, exp)


def test_dupe_groups_frag_budget_distributed_stitch():
    """frag_driver_budget=0 forces the distributed groupby(hash)
    boundary stitch; output must equal the driver-stitch path on a
    corpus where one hot hash spans every block (the adversarial shape
    the budget exists for)."""
    n = 600
    keys = ["hot"] * 300 + [f"k{i % 60}" for i in range(300)]
    t = pa.table(
        {
            HASH_COL: pa.array(keys),
            ROW_ID: pa.array(np.arange(1, n + 1, dtype=np.int64)),
            SEEN_FLAG: pa.array([False] * n),
            "x": pa.array([f"p{i}" for i in range(1, n + 1)]),
        }
    )
    hashed = rd.from_arrow(t).repartition(8)
    stats = group_stats(hashed).materialize()
    base = (
        dupe_groups_ds(hashed, stats, columns_for_json=["x"])
        .to_pandas().sort_values("hash").reset_index(drop=True)
    )
    dist = (
        dupe_groups_ds(
            hashed, stats, columns_for_json=["x"], frag_driver_budget=0
        )
        .to_pandas().sort_values("hash").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, dist)
    hot = base[base["hash"] == "hot"]
    assert len(hot) == 1 and len(json.loads(hot["row_ids"].iloc[0])) == 299
