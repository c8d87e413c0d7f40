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
