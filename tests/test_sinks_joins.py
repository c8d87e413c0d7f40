"""CSV target sink (K1), include_json hash sink (K4), partitioned join."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from deduper_ray.config import DedupeConfig
from deduper_ray.pipelines.exact_dedupe import dedupe
from deduper_ray.stages.relational import partitioned_join
from tests.fixtures import RE_HASH_KEYS, make_real_estate


def test_csv_target_sink(tmp_path):
    # reference dedupeCsv (DeduperTest.kt:119-171): CSV target with
    # default ',' delimiter and 'txt' extension
    src = str(tmp_path / "re.parquet")
    make_real_estate(src)
    cfg = DedupeConfig(
        source=src, hash_keys=RE_HASH_KEYS,
        target_path=str(tmp_path / "t"), target_format="csv",
    )
    report = dedupe(cfg)
    assert report.dupe_count == 4
    files = [f for f in os.listdir(cfg.target_path) if f.endswith(".txt")]
    assert files
    header = open(os.path.join(cfg.target_path, files[0])).readline()
    assert "street" in header


def test_hash_sink_include_json(tmp_path):
    # reference hashPersistor (DeduperTest.kt:299-328): 982 hashes with
    # json_row per keeper; hashPersistorNoJson (:329-352): null json
    src = str(tmp_path / "re.parquet")
    table = make_real_estate(src)
    cfg = DedupeConfig(
        source=src, hash_keys=RE_HASH_KEYS,
        hashes_path=str(tmp_path / "h"), include_json=True,
    )
    dedupe(cfg)
    hashes = pq.read_table(cfg.hashes_path)
    assert hashes.num_rows == 982
    import json

    row = json.loads(hashes["json_row"][0].as_py())
    assert set(row) == set(table.column_names)

    cfg2 = DedupeConfig(
        source=src, hash_keys=RE_HASH_KEYS,
        hashes_path=str(tmp_path / "h2"), include_json=False,
    )
    dedupe(cfg2)
    h2 = pq.read_table(cfg2.hashes_path)
    assert h2.num_rows == 982
    assert h2["json_row"].null_count == 982


def test_partitioned_join_matches_pandas():
    left = rd.from_arrow(
        pa.table({"k": [1, 2, 3, 4, 2], "lv": [10, 20, 30, 40, 21]})
    )
    right = rd.from_arrow(
        pa.table({"k": [2, 3, 5], "rv": ["b", "c", "e"]})
    )
    out = (
        partitioned_join(left, right, "k", num_partitions=4)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [2, 2, 3]
    assert out["rv"].tolist() == ["b", "b", "c"]


def test_asof_broadcast_vs_bucketed_equivalence():
    """The broadcast (dimension-sized right) and bucketed (two large
    sides) as-of paths must agree row-for-row."""
    import numpy as np
    import pandas as pd

    from deduper_ray.stages.relational import asof_join

    rng = np.random.RandomState(5)
    n_left, n_right, n_keys = 2000, 600, 37
    left_df = pd.DataFrame(
        {
            "eid": np.arange(n_left, dtype=np.int64),
            "k": rng.randint(0, n_keys, n_left).astype(np.int64),
            "t": rng.randint(0, 100000, n_left).astype(np.int64),
        }
    )
    right_df = pd.DataFrame(
        {
            "k": rng.randint(0, n_keys, n_right).astype(np.int64),
            "rt": rng.randint(0, 100000, n_right).astype(np.int64),
            "val": np.arange(n_right, dtype=np.int64),
        }
    )
    # deterministic: one row per (k, rt)
    right_df = right_df.groupby(["k", "rt"], as_index=False)["val"].max()
    left = rd.from_arrow(pa.Table.from_pandas(left_df, preserve_index=False))
    right = rd.from_arrow(pa.Table.from_pandas(right_df, preserve_index=False))

    bc = (
        asof_join(left, right_df, by="k", left_ts="t", right_ts="rt")
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    bk = (
        asof_join(left, right, by="k", left_ts="t", right_ts="rt")
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        bc[["eid", "k", "t", "rt", "val"]], bk[["eid", "k", "t", "rt", "val"]]
    )


def test_csv_dupes_and_hashes_sinks(tmp_path):
    """target_format='csv' now covers ALL directory sinks (reference
    Csv{Target,Dupe,Hash}Persistor, Persistors.kt:147-233)."""
    import pyarrow.csv as pacsv

    src = os.path.join(tmp_path, "re.parquet")
    make_real_estate(src)
    tgt = os.path.join(tmp_path, "t")
    dup = os.path.join(tmp_path, "d")
    hsh = os.path.join(tmp_path, "h")
    cfg = DedupeConfig(
        source=src, hash_keys=tuple(RE_HASH_KEYS),
        target_path=tgt, dupes_path=dup, hashes_path=hsh,
        target_format="csv", csv_delimiter="|", csv_extension="psv",
    )
    report = dedupe(cfg)
    assert report.success
    popts = pacsv.ParseOptions(delimiter="|")
    dupes_files = [f for f in os.listdir(dup) if f.endswith(".psv")]
    assert dupes_files
    dtbl = pacsv.read_csv(
        os.path.join(dup, dupes_files[0]), parse_options=popts
    )
    assert dtbl.num_rows == 3
    assert dtbl.column_names == [
        "hash", "row_ids", "first_found_row_number", "dupe_values"
    ]
    total_h = sum(
        pacsv.read_csv(os.path.join(hsh, f), parse_options=popts).num_rows
        for f in os.listdir(hsh) if f.endswith(".psv")
    )
    assert total_h == 982


def test_fail_soft_keeps_success(tmp_path, monkeypatch):
    """fail_soft=True: a dying sink is logged, the job completes with
    success=True — the reference's semantics (DeduperTest.kt:482-497)."""
    src = os.path.join(tmp_path, "re.parquet")
    make_real_estate(src)
    # unwritable sqlite target path → sink raises
    bad = "sqlite:///nonexistent-dir/zzz/out.db?table=t"
    cfg_hard = DedupeConfig(
        source=src, hash_keys=tuple(RE_HASH_KEYS), target_path=bad,
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        dedupe(cfg_hard)

    cfg_soft = DedupeConfig(
        source=src, hash_keys=tuple(RE_HASH_KEYS), target_path=bad,
        fail_soft=True,
    )
    report = dedupe(cfg_soft)
    assert report.success
    assert report.record_count == 986


def test_execution_timeout(tmp_path):
    src = os.path.join(tmp_path, "re.parquet")
    make_real_estate(src)
    import pytest as _pytest

    cfg = DedupeConfig(
        source=src, hash_keys=tuple(RE_HASH_KEYS),
        target_path=os.path.join(tmp_path, "t"),
        execution_timeout_sec=0.0,
    )
    with _pytest.raises(TimeoutError, match="execution_timeout_sec"):
        dedupe(cfg)
