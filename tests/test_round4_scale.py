"""Round-4 scale fixes (VERDICT r3 findings #1-#3):

- policy_drop_ids: distributed keeper election over a narrow
  projection — drop set bounded by dupe volume, correct across
  block-spanning runs.
- dedupe_keep_best narrow path ≡ wide path (payload never shuffles).
- curate exact stage: driver residency = drop count, not distinct keys.
- dupes_detail='distributed': full K3 sink schema written as a
  Dataset on a dupe-heavy corpus (50%+ dupes), reconciled.
"""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from deduper_ray.stages.exact import (
    ROW_ID,
    dedupe_keep_best,
    policy_drop_ids,
)


def _narrow(keys, ids, scores=None):
    cols = {"k": pa.array(keys, type=pa.string()), ROW_ID: pa.array(ids, type=pa.int64())}
    if scores is not None:
        cols["s"] = pa.array(scores, type=pa.float64())
    return rd.from_arrow(pa.table(cols))


def test_policy_drop_ids_min_id_keeper():
    ds = _narrow(["a", "a", "b", "c", "c", "c"], [5, 2, 9, 4, 1, 7])
    drops, st = policy_drop_ids(ds, key_col="k")
    assert drops.tolist() == [4, 5, 7]
    assert st["n_drops"] == 3


def test_policy_drop_ids_score_keeper_ties_to_min_id():
    ds = _narrow(
        ["g", "g", "g", "h", "h"],
        [10, 11, 12, 3, 2],
        scores=[1.0, 9.0, 9.0, 5.0, 5.0],
    )
    drops, _ = policy_drop_ids(ds, key_col="k", score_col="s")
    # g: max score 9 tie ids 11/12 → keeper 11; h: tie → keeper 2
    assert drops.tolist() == [3, 10, 12]


def test_policy_drop_ids_spanning_blocks():
    # one hot key spread over many input blocks: after the key sort it
    # spans several sorted blocks; the stitch must elect exactly one
    # global keeper
    n = 20_000
    keys = ["hot"] * n + [f"u{i}" for i in range(500)]
    ids = list(range(1, n + 1)) + list(range(n + 1, n + 501))
    ds = _narrow(keys, ids).repartition(16)
    drops, _ = policy_drop_ids(ds, key_col="k")
    assert drops.size == n - 1
    assert 1 not in drops  # global keeper = min id of the hot run
    assert drops.min() == 2 and drops.max() == n


def test_keep_best_narrow_equals_wide():
    rng = np.random.default_rng(7)
    n = 5_000
    t = pa.table(
        {
            "g": [f"g{int(v)}" for v in rng.integers(0, 800, n)],
            "score": rng.integers(0, 50, n).astype("float64"),
            ROW_ID: np.arange(1, n + 1, dtype=np.int64),
            "payload": [f"p{i}" for i in range(n)],
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    kw = dict(group_col="g", score_col="score", id_col=ROW_ID)
    narrow = (
        dedupe_keep_best(ds, strategy="narrow", **kw)
        .to_pandas()
        .sort_values(ROW_ID)
        .reset_index(drop=True)
    )
    wide = (
        dedupe_keep_best(ds, strategy="wide", **kw)
        .to_pandas()
        .sort_values(ROW_ID)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(narrow[wide.columns], wide)


def test_keep_best_auto_routes_to_wide_when_dupe_heavy():
    t = pa.table(
        {
            "g": ["x"] * 100,
            "score": np.arange(100, dtype=np.float64),
            ROW_ID: np.arange(1, 101, dtype=np.int64),
        }
    )
    out = dedupe_keep_best(
        rd.from_arrow(t),
        group_col="g",
        score_col="score",
        id_col=ROW_ID,
        strategy="auto",
        max_broadcast_drops=10,  # force the wide fallback
    ).to_pandas()
    assert out[ROW_ID].tolist() == [100]  # max score wins either way


def test_curate_exact_drop_set_is_dupe_bounded(tmp_path):
    from deduper_ray.pipelines.curate import CurateConfig, run_curation

    # 1000 docs, 100 distinct texts → 900 drops ≪ 1000-row corpus; the
    # old keeper-broadcast held 100 keeper ids + O(distinct) driver
    # arrays, the fix holds exactly the 900-element drop set
    texts = [
        f"document body number {i % 100} with enough words to pass the "
        "quality gate and some stopwords like the and of"
        for i in range(1000)
    ]
    t = pa.table({"text": texts})
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(t, os.path.join(src, "part-0.parquet"))
    res = run_curation(
        src,
        str(tmp_path / "out"),
        CurateConfig(min_chars=10, min_stopwords=1),
        resume=False,
    )
    assert res.n_exact_unique == 100
    assert res.n_exact_drops == 900  # dupe-bounded driver residency


def test_dupes_detail_distributed_dupe_heavy(tmp_path):
    from deduper_ray.config import DedupeConfig
    from deduper_ray.pipelines.exact_dedupe import dedupe

    # 60% dupes: 10k rows, 4k distinct values
    n, k = 10_000, 4_000
    t = pa.table(
        {
            "val": pa.array([f"v{i % k}" for i in range(n)]),
            "tag": pa.array([f"t{i}" for i in range(n)]),
        }
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(t, os.path.join(src, "part-0.parquet"))
    dupes_dir = str(tmp_path / "dupes")
    target_dir = str(tmp_path / "target")
    report = dedupe(
        DedupeConfig(
            source=src,
            hash_keys=("val",),
            dupes_path=dupes_dir,
            target_path=target_dir,
            dupes_detail="distributed",
            dedupe_strategy="shuffle",
        )
    )
    assert report.success
    assert report.dupes == {}  # nothing dupe-sized on the driver
    sink = pq.read_table(
        [os.path.join(dupes_dir, f) for f in sorted(os.listdir(dupes_dir))]
    )
    # every distinct value appears ≥2 times (10k rows over 4k values)
    assert sink.num_rows == report.distinct_dupe_count == k
    assert set(sink.column_names) == {
        "hash",
        "row_ids",
        "first_found_row_number",
        "dupe_values",
    }
    # spot-check one group: row_ids json parses, first_found < min(dupe ids)
    row = sink.slice(0, 1).to_pylist()[0]
    ids = json.loads(row["row_ids"])
    assert len(ids) >= 1 and row["first_found_row_number"] < min(ids)
    assert json.loads(row["dupe_values"])  # valid row JSON
    # target written via shuffle strategy: one keeper per distinct value
    tgt = pq.read_table(
        [os.path.join(target_dir, f) for f in sorted(os.listdir(target_dir))]
    )
    assert tgt.num_rows == k
