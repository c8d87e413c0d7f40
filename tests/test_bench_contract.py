"""Contract test for bench.py's driver-facing JSON output.

The round driver records ``python bench.py`` / ``--scaling`` output
verbatim (BENCH_rN.json); a key rename or a non-JSON stray print would
silently break the per-round booking, so the shape is pinned here. Runs
``--scaling`` at toy scale (2,000 docs, 2-vs-4 CPUs, 1 sample per leg)
in fresh subprocesses exactly as the driver would — ~40 s, dominated by
two ray.init startups.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scaling_json_contract():
    env = dict(
        os.environ,
        BENCH_NDOCS="2000",
        SCALE_CPUS="2,4",
        BENCH_RUNS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
        timeout=300,
    ).stdout
    # single JSON line on stdout (the driver parses the last line)
    d = json.loads(out.strip().splitlines()[-1])

    assert d["docs"] == 2000
    assert d["cpus"] == [2, 4]
    for key in ("sec_2", "sec_4", "files_per_sec_2", "files_per_sec_4"):
        assert isinstance(d[key], (int, float)) and d[key] > 0, key
    # ratio definition: (sec_lo / sec_hi) / (hi/lo)
    expected_eff = (d["sec_2"] / d["sec_4"]) / 2.0
    assert abs(d["scaling_efficiency"] - expected_eff) < 0.01

    # per-leg self-adjudication labels (BASELINE.md §8.7): every leg
    # carries its sample walls and the CPU window for each sample
    for leg in ("cpus_2", "cpus_4"):
        runs_sec = d["legs"][leg]["runs_sec"]
        runs_cpu = d["legs"][leg]["runs_cpu"]
        assert len(runs_sec) == 1 and runs_sec[0] > 0
        assert len(runs_cpu) == 1
        window = runs_cpu[0]
        for k in ("cpu_steal_pct", "cpu_idle_pct", "cpu_busy_pct"):
            assert 0.0 <= window[k] <= 100.0, (leg, k, window)
    # the booked minimum is the min over the leg's samples
    assert d["sec_2"] == min(d["legs"]["cpus_2"]["runs_sec"])
