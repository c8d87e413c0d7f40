"""Per-stage scaling harness (BASELINE.md §6): times the two NARROW
stages of the near-dup pipeline in isolation — (1) MinHash signatures
(content-touching compute, embarrassingly parallel) and (2) the LSH
band explode + band_key sort + run scan (the one all-to-all) — at
several CPU counts in FRESH Ray processes over the SAME cached input,
then reports per-stage throughput and pairwise N-vs-4N efficiency.

This complements the end-to-end 2-vs-8 headline measurement: on one
box all logical CPUs share a memory-bandwidth/object-store ceiling, and
per-stage numbers show WHICH stage hits it (the sort's exchange is
bandwidth-bound; the signature DP is compute-bound and scales closer
to ideal).

Usage:
  python tools/stage_scaling.py                # orchestrator (2,8,32)
  SCALE_STAGE_CPUS=8,32 python tools/stage_scaling.py
  STAGE=signatures CPUS=8 python tools/stage_scaling.py --one   # child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NDOCS = int(os.environ.get("NDOCS", "1000000"))
RUNS = int(os.environ.get("RUNS", "2"))
BANDS = 21
NUM_PERMS = 128
SHINGLE_K = 8


def _corpus_path() -> str:
    path = f"/tmp/graft_code_files_{NDOCS}_seed42.parquet"
    if not os.path.exists(path):
        from deduper_ray.sources.synth import make_code_files

        tmp = path + ".tmp"
        make_code_files(tmp, n_rows=NDOCS, seed=42)
        os.replace(tmp, path)
    return path


def _signatures_path() -> str:
    """Signature parquet cache, built ONCE (untimed) for the lshsort
    stage so every CPU level reads identical input."""
    d = f"/tmp/graft_sigs_{NDOCS}_k{SHINGLE_K}_p{NUM_PERMS}"
    if not os.path.exists(os.path.join(d, "_DONE")):
        import ray
        import ray.data as rd

        from deduper_ray.sources.readers import read_table
        from deduper_ray.stages.minhash import make_signer_fn

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        os.makedirs(d, exist_ok=True)
        ds = read_table(_corpus_path(), columns=["content"])
        signed = ds.map_batches(
            make_signer_fn(
                num_perms=NUM_PERMS, shingle_k=SHINGLE_K, seed=1,
                text_column="content", id_column="row_id",
            ),
            batch_format="pyarrow", batch_size=512,
        )
        signed.write_parquet(d)
        open(os.path.join(d, "_DONE"), "w").write("ok")
        ray.shutdown()
    return d


def run_one(stage: str, ncpu: int) -> dict:
    import ray
    import ray.data as rd
    from ray.data import DataContext

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    if stage == "signatures":
        from deduper_ray.sources.readers import read_table
        from deduper_ray.stages.minhash import make_signer_fn

        src = _corpus_path()
        t0 = time.time()
        ds = read_table(src, columns=["content"])
        n = ds.map_batches(
            make_signer_fn(
                num_perms=NUM_PERMS, shingle_k=SHINGLE_K, seed=1,
                text_column="content", id_column="row_id",
            ),
            batch_format="pyarrow", batch_size=512,
        ).count()
        dt = time.time() - t0
    elif stage == "lshsort":
        import pyarrow.compute as pc

        from deduper_ray.stages.lsh import candidate_pairs

        sig_dir = _signatures_path()
        t0 = time.time()
        sigs = rd.read_parquet(
            sig_dir, columns=["row_id", "minhash"]
        )
        scanned = candidate_pairs(
            sigs, bands=BANDS, id_column="row_id"
        )
        n = scanned.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], 0)),
            batch_format="pyarrow",
        ).count()
        dt = time.time() - t0
    else:
        raise SystemExit(f"unknown stage {stage!r}")
    ray.shutdown()
    return {"stage": stage, "cpus": ncpu, "sec": round(dt, 2),
            "rows": int(n), "rows_per_sec": round(NDOCS / dt, 1)}


def main() -> None:
    if "--one" in sys.argv:
        print(json.dumps(run_one(os.environ["STAGE"], int(os.environ["CPUS"]))))
        return
    cpu_levels = [
        int(x)
        for x in os.environ.get("SCALE_STAGE_CPUS", "2,8,32").split(",")
    ]
    _corpus_path()
    _signatures_path()
    results: dict[str, dict[int, dict]] = {}
    for stage in ("signatures", "lshsort"):
        results[stage] = {}
        for ncpu in cpu_levels:
            best = None
            for _ in range(RUNS):
                env = dict(os.environ, STAGE=stage, CPUS=str(ncpu))
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--one"],
                    env=env, capture_output=True, text=True, check=True,
                    cwd=REPO,
                ).stdout
                r = json.loads(out.strip().splitlines()[-1])
                if best is None or r["sec"] < best["sec"]:
                    best = r
            results[stage][ncpu] = best
            print(json.dumps(best), flush=True)
    report: dict = {"ndocs": NDOCS, "runs_per_point": RUNS, "stages": {}}
    for stage, per_cpu in results.items():
        st = {
            str(c): {"sec": r["sec"], "rows_per_sec": r["rows_per_sec"]}
            for c, r in per_cpu.items()
        }
        effs = {}
        levels = sorted(per_cpu)
        for lo, hi in zip(levels, levels[1:]):
            speedup = per_cpu[lo]["sec"] / per_cpu[hi]["sec"]
            effs[f"{lo}v{hi}"] = round(speedup / (hi / lo), 3)
        st["efficiency"] = effs
        report["stages"][stage] = st
    print(json.dumps(report))


if __name__ == "__main__":
    main()
