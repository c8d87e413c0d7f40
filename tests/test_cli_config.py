"""CLI neardup --config path (NearDupConfig fields from a JSON file)."""

import json
import os
import subprocess
import sys

from deduper_ray.sources.synth import make_code_files


def test_cli_neardup_with_config(tmp_path):
    src = str(tmp_path / "c.parquet")
    make_code_files(src, n_rows=600, seed=13)
    cfg_path = str(tmp_path / "nd.json")
    with open(cfg_path, "w") as f:
        json.dump(
            {"shingle_k": 8, "num_perms": 128, "bands": 21,
             "threshold": 0.6, "minhash_scheme": "oph"}, f
        )
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="local")
    out = subprocess.run(
        [sys.executable, "-m", "deduper_ray", "--num-cpus", "2",
         "neardup", "--source", src, "--out", str(tmp_path / "out"),
         "--config", cfg_path, "--no-resume"],
        capture_output=True, text=True, env=env, timeout=400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout[out.stdout.index("{"):])
    assert res["n_docs"] == 600
    assert res["n_clusters"] > 0
    assert os.path.exists(str(tmp_path / "out" / "clusters" / "_lineage.json"))
