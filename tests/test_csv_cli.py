"""CSV source/sink parity (reference S2/K1) + CLI smoke."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

from deduper_ray.config import DedupeConfig
from deduper_ray.pipelines.exact_dedupe import dedupe
from deduper_ray.sources.csv_io import write_csv_sink
from deduper_ray.sources.readers import read_table
from tests.fixtures import RE_HASH_KEYS, make_real_estate


def _write_csv_fixture(tmp_path):
    import pandas as pd

    table = make_real_estate(str(tmp_path / "re.parquet"))
    csv_path = str(tmp_path / "re.csv")
    table.to_pandas().to_csv(csv_path, index=False)
    return csv_path, table


def test_csv_source_all_string_with_row_ids(tmp_path):
    csv_path, table = _write_csv_fixture(tmp_path)
    ds = read_table(csv_path)
    schema = ds.schema()
    assert all(
        str(schema.types[i]) == "string"
        for i, name in enumerate(schema.names)
        if name != "row_id"
    )
    got = ds.to_pandas().sort_values("row_id")
    assert len(got) == 986
    assert got["row_id"].tolist() == list(range(986))
    assert got["street"].iloc[0] == table["street"][0].as_py()


def test_csv_source_dedupe_end_to_end(tmp_path):
    # reference dedupeCsv golden shape (DeduperTest.kt:119): CSV source,
    # same report as the parquet path
    csv_path, _ = _write_csv_fixture(tmp_path)
    report = dedupe(DedupeConfig(source=csv_path, hash_keys=RE_HASH_KEYS))
    assert (report.record_count, report.dupe_count,
            report.distinct_dupe_count, report.hash_count) == (986, 4, 3, 982)


def test_csv_sink_nulls_and_delimiter(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"a": ["x", None], "b": [1, 2]})
    )
    out = str(tmp_path / "csv_out")
    write_csv_sink(ds, out, delimiter="|", extension="psv")
    files = [f for f in os.listdir(out) if f.endswith(".psv")]
    assert files
    content = "".join(
        open(os.path.join(out, f)).read() for f in files
    )
    assert '"a"|"b"' in content
    assert '"x"|"1"' in content
    assert '""|"2"' in content  # null rendered as empty string


def test_cli_dedupe_and_sample(tmp_path):
    # drive python -m deduper_ray in a subprocess (own Ray session)
    make_real_estate(str(tmp_path / "re.parquet"))
    cfg = {
        "source": str(tmp_path / "re.parquet"),
        "hash_keys": list(RE_HASH_KEYS),
        "target_path": str(tmp_path / "target"),
    }
    cfg_path = str(tmp_path / "job.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="local")
    out = subprocess.run(
        [sys.executable, "-m", "deduper_ray", "--num-cpus", "2",
         "dedupe", "--config", cfg_path],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout[out.stdout.index("{"):])
    assert report["record_count"] == 986
    assert report["dupe_count"] == 4
    assert pq.read_table(cfg["target_path"]).num_rows == 982

    out2 = subprocess.run(
        [sys.executable, "-m", "deduper_ray", "--num-cpus", "2",
         "sample", "--config", cfg_path],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    sample = json.loads(out2.stdout[out2.stdout.index("{"):])
    assert len(sample["sample_hash"]) == 32


def test_cli_neardup_incr(tmp_path):
    """r3: neardup-incr subcommand end-to-end (own Ray session)."""
    import pyarrow as pa

    from deduper_ray.sources.synth import make_code_files

    prior_src = str(tmp_path / "prior.parquet")
    make_code_files(prior_src, n_rows=300, seed=3)
    new_src = str(tmp_path / "new.parquet")
    make_code_files(new_src, n_rows=100, seed=3)  # verbatim clones

    # sign prior in-process (session fixture Ray)
    from deduper_ray.config import NearDupConfig
    from deduper_ray.pipelines.incremental import sign_corpus

    cfg = NearDupConfig(
        text_column="content", num_perms=64, bands=16,
        threshold=0.65, simhash_bits=0,
    )
    sign_corpus(prior_src, str(tmp_path / "sigs"), cfg)
    cfg_path = str(tmp_path / "nd.json")
    with open(cfg_path, "w") as f:
        json.dump(
            {
                "text_column": "content", "num_perms": 64, "bands": 16,
                "threshold": 0.65, "simhash_bits": 0,
            },
            f,
        )
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="local")
    out = subprocess.run(
        [sys.executable, "-m", "deduper_ray", "--num-cpus", "2",
         "neardup-incr", "--source", new_src,
         "--out", str(tmp_path / "inc"),
         "--prior", str(tmp_path / "sigs"), "--config", cfg_path],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout[out.stdout.index("{"):])
    assert res["n_new_docs"] == 100
    assert res["n_dup_of_prior"] == 100
    assert res["n_kept"] == 0
