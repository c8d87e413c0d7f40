"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR
(default /root/testdata/sf0.1) at $RAY_GRAFT_CPUS CPUs (default 32).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "files_per_sec": ...}

``--scaling``: runs the headline near-dup pipeline twice in FRESH
processes (num_cpus=8 then 32) on the same input and reports both
throughputs + scaling efficiency (the sandbox substitute for the
N-vs-4N-node criterion, BASELINE.md §4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# north-rule corpus size (BASELINE.md §4: 10^5-10^6 rows, deterministic
# synthetic code_files per FIXTURES.md F1; cached across runs/processes)
BENCH_NDOCS = int(os.environ.get("BENCH_NDOCS", "100000"))
# runs per pipeline (min taken): 3 damps this VM's CPU-steal noise
# (measured 2x swings on identical code); BENCH_RUNS=1 for quick
# iterations
BENCH_RUNS = max(1, int(os.environ.get("BENCH_RUNS", "3")))


def _cpu_counters() -> list[int] | None:
    """Aggregate jiffy counters from /proc/stat (user nice system idle
    iowait irq softirq steal ...); None off-Linux."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except (OSError, ValueError):
        return None


def _cpu_pcts(a: list[int] | None, b: list[int] | None) -> dict:
    """Steal/idle/busy percentages over a [a, b] counter window — the
    self-labeling that makes a stolen-window bench run adjudicable
    from the JSON alone (VERDICT r4 next-item #8): a leg whose wall
    inflates while cpu_steal_pct or external busy load is high is
    contention, not regression."""
    if a is None or b is None:
        return {}
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    idle = d[3] + (d[4] if len(d) > 4 else 0)
    steal = d[7] if len(d) > 7 else 0
    return {
        "cpu_steal_pct": round(100.0 * steal / tot, 2),
        "cpu_idle_pct": round(100.0 * idle / tot, 2),
        "cpu_busy_pct": round(100.0 * (tot - idle - steal) / tot, 2),
    }


def _with_cpu_window(fn, *args) -> dict:
    """Run a bench leg and annotate its dict with the CPU window."""
    a = _cpu_counters()
    r = fn(*args)
    r.update(_cpu_pcts(a, _cpu_counters()))
    return r


def _code_files_path() -> str:
    """Deterministic synthetic code_files corpus, generated once and
    cached in /tmp (same seed → byte-identical across processes)."""
    path = f"/tmp/graft_code_files_{BENCH_NDOCS}_seed42.parquet"
    if not os.path.exists(path):
        from deduper_ray.sources.synth import make_code_files

        tmp = path + ".tmp"
        make_code_files(tmp, n_rows=BENCH_NDOCS, seed=42)
        os.replace(tmp, path)
    return path


def _headline_neardup(out_root: str) -> dict:
    """Near-dup clustering of the synthetic code_files corpus (the
    north-rule pipeline) — returns files/sec."""
    from deduper_ray.config import NearDupConfig
    from deduper_ray.pipelines.neardup import run_neardup

    cfg = NearDupConfig(
        text_column="content", shingle_k=8, num_perms=128, bands=21,
        threshold=0.7, batch_size=512,  # concurrency auto-sized from CPUs
    )
    src = _code_files_path()
    t0 = time.time()
    res = run_neardup(src, os.path.join(out_root, "neardup"), cfg,
                      resume=False)
    dt = time.time() - t0
    return {"sec": dt, "docs": res.n_docs, "docs_per_sec": res.n_docs / dt,
            "verified_pairs": res.n_verified_pairs,
            "clusters": res.n_clusters,
            # per-stage walls: lets an archived JSON show WHERE a leg's
            # time went (fixed sort floors vs parallel compute) without
            # re-running — used by the BASELINE scaling adjudications
            "stage_sec": dict(res.stage_sec)}


def _bench_exact_dedup(sf_dir: str, out_root: str) -> dict:
    """Exact dedup of lineitem on all columns (600k rows at sf0.1) —
    the reference-conformant flagship at volume; returns rows/sec."""
    from deduper_ray.config import DedupeConfig
    from deduper_ray.pipelines.exact_dedupe import dedupe

    cfg = DedupeConfig(
        source=os.path.join(sf_dir, "lineitem.parquet"),
        target_path=os.path.join(out_root, "dedup_target"),
        hashes_path=os.path.join(out_root, "dedup_hashes"),
    )
    t0 = time.time()
    report = dedupe(cfg)
    dt = time.time() - t0
    return {"sec": dt, "rows": report.record_count,
            "rows_per_sec": report.record_count / dt,
            "dupes": report.dupe_count}


def _bench_simhash_neardup(out_root: str) -> dict:
    """SimHash Hamming clustering of the same 100k code_files corpus
    (stages/simhash_nd.py) — the second near-dup family at volume."""
    import time as _t

    import ray.data as rd

    from deduper_ray.sources.readers import read_parquet_with_row_ids
    from deduper_ray.stages.minhash import make_signer_fn
    from deduper_ray.stages.simhash_nd import simhash_neardup

    src = _code_files_path()
    t0 = _t.time()
    ds = read_parquet_with_row_ids(src, columns=["content"])
    signed = ds.map_batches(
        make_signer_fn(num_perms=128, shingle_k=8, text_column="content",
                       emit_minhash=False),
        batch_size=512, batch_format="pyarrow",
    ).map_batches(
        lambda t: t.select(["row_id", "simhash"]), batch_format="pyarrow"
    )
    clusters = simhash_neardup(
        signed, id_column="row_id", max_hamming=3, bands=4
    )
    n = clusters.count()
    dt = _t.time() - t0
    return {"sec": dt, "docs": BENCH_NDOCS, "clustered_rows": n,
            "docs_per_sec": BENCH_NDOCS / dt}


def _bench_queries(sf_dir: str) -> dict:
    from deduper_ray.pipelines import queries as q

    out = {}
    for name, fn in (
        ("q1_pricing_summary", q.q1_pricing_summary),
        ("revenue_by_nation", q.revenue_by_nation),
        ("window_tumbling_events", q.window_tumbling_events),
        ("token_count_docs", q.token_count_docs),
    ):
        t0 = time.time()
        fn(sf_dir)
        out[name] = round(time.time() - t0, 3)
    return out


def run_bench() -> dict:
    import shutil
    import tempfile

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=NUM_CPUS, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    out_root = tempfile.mkdtemp(prefix="bench_", dir="/tmp")
    try:
        # warm the page cache so we measure compute+shuffle, not cold reads
        import pyarrow.parquet as pq

        for t in ("documents", "lineitem", "events"):
            pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))
        pq.read_table(_code_files_path())

        # warm the Ray worker pool: cold python workers each pay ~1.5s
        # of imports on first task; spawning them before the clock
        # starts measures the engine, not interpreter startup (a real
        # cluster amortizes worker startup across the job's lifetime)
        import ray.data as rd

        def _warm(batch):
            import deduper_ray.stages.verify  # noqa: F401
            import deduper_ray.stages.minhash  # noqa: F401
            return batch

        rd.range(NUM_CPUS * 2, override_num_blocks=NUM_CPUS * 2).map_batches(
            _warm, batch_size=None
        ).materialize()

        # best-of-2 per pipeline: this sandbox VM shows 1.5-2x
        # run-to-run CPU-steal noise (identical outputs, same code,
        # 11s vs 21s walls); min-of-2 approximates the noise-free
        # time. Both runs are recorded under "runs".
        nd_runs = [
            _with_cpu_window(_headline_neardup, os.path.join(out_root, f"nd{i}"))
            for i in range(BENCH_RUNS)
        ]
        nd = min(nd_runs, key=lambda r: r["sec"])
        ed_runs = [
            _with_cpu_window(
                _bench_exact_dedup, SF_DIR, os.path.join(out_root, f"ed{i}")
            )
            for i in range(BENCH_RUNS)
        ]
        ed = min(ed_runs, key=lambda r: r["sec"])
        sh_runs = [
            _with_cpu_window(
                _bench_simhash_neardup, os.path.join(out_root, f"sh{i}")
            )
            for i in range(BENCH_RUNS)
        ]
        sh = min(sh_runs, key=lambda r: r["sec"])
        qs_runs = [_bench_queries(SF_DIR) for _ in range(BENCH_RUNS)]
        qs = {k: min(r[k] for r in qs_runs) for k in qs_runs[0]}
        headline = nd["sec"] + ed["sec"]
        result = {
            "metric": "neardup+exact dedup wall time (sf docs+lineitem)",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {
                "neardup_documents": round(nd["sec"], 3),
                "exact_dedup_lineitem": round(ed["sec"], 3),
                "simhash_neardup_codefiles": round(sh["sec"], 3),
                **qs,
            },
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "files_per_sec": round(nd["docs_per_sec"], 1),
            "dedup_rows_per_sec": round(ed["rows_per_sec"], 1),
            "neardup": {k: round(v, 3) if isinstance(v, float) else v
                        for k, v in nd.items()},
            "simhash_neardup": {
                k: round(v, 3) if isinstance(v, float) else v
                for k, v in sh.items()
            },
            "runs": {
                "neardup_sec": [round(r["sec"], 3) for r in nd_runs],
                "exact_dedup_sec": [round(r["sec"], 3) for r in ed_runs],
                "simhash_sec": [round(r["sec"], 3) for r in sh_runs],
                # per-invocation CPU windows (steal/idle/busy %) —
                # adjudicate stolen-window runs from the JSON alone
                "neardup_cpu": [
                    {k: r[k] for k in r if k.startswith("cpu_")}
                    for r in nd_runs
                ],
                "exact_dedup_cpu": [
                    {k: r[k] for k in r if k.startswith("cpu_")}
                    for r in ed_runs
                ],
                "simhash_cpu": [
                    {k: r[k] for k in r if k.startswith("cpu_")}
                    for r in sh_runs
                ],
            },
        }
        return result
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
        ray.shutdown()


def run_headline_only() -> dict:
    """Just the north-rule near-dup pipeline (for --scaling timing)."""
    import shutil
    import tempfile

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=NUM_CPUS, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    out_root = tempfile.mkdtemp(prefix="benchsc_", dir="/tmp")
    try:
        import pyarrow.parquet as pq
        import ray.data as rd

        pq.read_table(_code_files_path())  # warm page cache

        def _warm(batch):
            import deduper_ray.stages.verify  # noqa: F401
            return batch

        rd.range(NUM_CPUS * 2, override_num_blocks=NUM_CPUS * 2).map_batches(
            _warm, batch_size=None
        ).materialize()
        # min-of-2 (same CPU-steal-noise rationale as run_bench)
        runs = [
            _with_cpu_window(_headline_neardup, os.path.join(out_root, f"nd{i}"))
            for i in range(BENCH_RUNS)
        ]
        nd = min(runs, key=lambda r: r["sec"])
        return {
            "value": round(nd["sec"], 3), "unit": "sec",
            "num_cpus": NUM_CPUS, "docs": nd["docs"],
            "files_per_sec": round(nd["docs_per_sec"], 1),
            "stage_sec": nd.get("stage_sec"),
            "runs_sec": [round(r["sec"], 3) for r in runs],
            "runs_cpu": [
                {k: r[k] for k in r if k.startswith("cpu_")} for r in runs
            ],
        }
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
        ray.shutdown()


def run_scaling() -> None:
    """The two-cluster-size criterion, sandbox form (BASELINE.md §4):
    same job, same input, N and 4N CPUs in fresh processes. Default
    2 vs 8 CPUs on a 2×10^6-file corpus — large enough that
    distributed compute dominates the fixed stage floor (each Ray sort
    costs ~6-8 s regardless of volume; at 10^6 rows that floor alone
    caps measurable efficiency ~0.75 after the round-2 per-stage
    speedups), and low enough CPU counts that one box's memory
    bandwidth isn't the limiter (BASELINE.md §5.1 caveat). Override
    with SCALE_CPUS / BENCH_NDOCS."""
    lo_n, hi_n = (
        int(x) for x in os.environ.get("SCALE_CPUS", "2,8").split(",")
    )
    ndocs = os.environ.get("BENCH_NDOCS", "2000000")

    def one(ncpu: int) -> dict:
        # min-of-2 per leg (not the default 3): the 2-CPU leg runs
        # ~6 min per sample, and the per-leg minimum over two samples
        # already bounds the noise (BASELINE.md §6.1 protocol)
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_NDOCS=ndocs,
            BENCH_RUNS=os.environ.get("BENCH_RUNS", "2"),
        )
        # one retry: a transient Ray-session failure in either leg
        # would otherwise throw away the whole ~20-min paired run —
        # and surface the child's stderr, which check=True swallows
        for attempt in (1, 2):
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--headline-only"],
                env=env, capture_output=True, text=True, cwd=REPO,
            )
            if proc.returncode == 0:
                return json.loads(proc.stdout.strip().splitlines()[-1])
            sys.stderr.write(
                f"[scaling] leg num_cpus={ncpu} attempt {attempt} "
                f"failed (exit {proc.returncode}); stderr tail:\n"
                + "\n".join(proc.stderr.splitlines()[-15:]) + "\n"
            )
        raise RuntimeError(f"scaling leg num_cpus={ncpu} failed twice")

    lo, hi = one(lo_n), one(hi_n)
    eff = (lo["value"] / hi["value"]) / (hi_n / lo_n)
    print(
        json.dumps(
            {
                "docs": lo["docs"],
                f"sec_{lo_n}": lo["value"], f"sec_{hi_n}": hi["value"],
                f"files_per_sec_{lo_n}": lo["files_per_sec"],
                f"files_per_sec_{hi_n}": hi["files_per_sec"],
                "cpus": [lo_n, hi_n],
                "scaling_efficiency": round(eff, 3),
                # per-leg sample walls + CPU windows (steal/idle/busy %)
                # so a stolen leg is machine-adjudicable from this JSON
                # alone — same rationale as run_bench's `runs` block
                "legs": {
                    f"cpus_{lo_n}": {
                        "runs_sec": lo.get("runs_sec"),
                        "runs_cpu": lo.get("runs_cpu"),
                        "stage_sec": lo.get("stage_sec"),
                    },
                    f"cpus_{hi_n}": {
                        "runs_sec": hi.get("runs_sec"),
                        "runs_cpu": hi.get("runs_cpu"),
                        "stage_sec": hi.get("stage_sec"),
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--headline-only" in sys.argv:
        print(json.dumps(run_headline_only()))
    else:
        print(json.dumps(run_bench()))
