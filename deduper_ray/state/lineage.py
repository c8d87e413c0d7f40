"""Stage-boundary checkpointing with per-stage lineage + metrics.

The north rule requires "resumable from checkpoint with per-partition
lineage + metrics" (BASELINE.json:14). The reference's only resume
mechanism is re-consuming the hashes output as the next run's seen set
(Deduper.kt:135-158) — coarse and manual. Here every pipeline stage
materializes to its own parquet directory with:

  _lineage.json   {stage, config_hash, inputs, completed_at, rows}
  _metrics.json   {wall_sec, rows, ...}

A rerun validates config_hash + completeness and SKIPS finished
stages, reading their parquet instead of recomputing. Outputs are
written to a temp dir and renamed into place so a crash mid-write
never leaves a "complete-looking" stage (atomic-rename protocol,
replacing the reference's .LOCK_ file dance at Persistors.kt:109-142).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Any

import ray.data as rd

LINEAGE_FILE = "_lineage.json"
METRICS_FILE = "_metrics.json"


def config_hash(obj: Any) -> str:
    """Stable hash of a (nested) config structure."""
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def stage_is_complete(stage_dir: str, cfg_hash: str) -> bool:
    path = os.path.join(stage_dir, LINEAGE_FILE)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            lineage = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return lineage.get("config_hash") == cfg_hash and lineage.get("complete")


# Background checkpoint writers started by write_stage(async_write=True),
# keyed by stage_dir. flush_pending_checkpoints() joins them (and
# re-raises the first failure); pipelines call it before declaring a run
# complete and before READING any checkpoint directory back.
# drain_pending_checkpoints() is the error-path finalizer: join without
# raising, so a failed pipeline never leaks a live writer whose stale
# error would surface at an unrelated later flush.
_PENDING_WRITES: dict[str, tuple] = {}


def flush_pending_checkpoints() -> None:
    global _PENDING_WRITES
    pending, _PENDING_WRITES = _PENDING_WRITES, {}
    err = None
    for t, box in pending.values():
        t.join()
        if box and err is None:
            err = box[0]
    if err is not None:
        raise err


def drain_pending_checkpoints() -> None:
    """Join every in-flight checkpoint writer, discarding errors.

    For ``finally``/error paths: the run is already failing (or being
    abandoned), so writer errors are irrelevant — what matters is that
    no background thread outlives the run to fight a later run over the
    same ``.tmp`` directory."""
    global _PENDING_WRITES
    pending, _PENDING_WRITES = _PENDING_WRITES, {}
    for t, _box in pending.values():
        t.join()


def write_stage(
    ds: rd.Dataset,
    stage_dir: str,
    *,
    stage: str,
    cfg_hash: str,
    inputs: list[str],
    extra_metrics: dict | None = None,
    async_write: bool = False,
) -> rd.Dataset:
    """Checkpoint ``ds`` (atomic rename) and return the MATERIALIZED
    in-memory dataset: downstream stages consume object-store blocks
    (spilled to disk under pressure) instead of re-reading the parquet;
    the parquet copy exists for resume. A rerun that skips this stage
    reads the parquet via ``read_stage``.

    ``async_write=True`` overlaps the parquet persistence (disk-
    bandwidth-bound, CPU-count-independent — a pure serial term in the
    N-vs-4N scaling profile) with downstream compute: the materialized
    dataset returns immediately and a background thread writes the
    checkpoint. The atomic-rename protocol is unchanged — the stage
    directory appears only when the write completed — so a crash
    mid-overlap just means this stage re-runs on resume. Callers MUST
    ``flush_pending_checkpoints()`` before returning to the user or
    reading the checkpoint path back."""
    t0 = time.time()
    tmp = stage_dir.rstrip("/") + ".tmp"
    # join any in-flight async writer for THIS stage_dir before touching
    # its .tmp — otherwise rmtree yanks the directory out from under the
    # old thread and its later os.replace could publish a mixed partial
    # checkpoint marked complete. Its error (if any) is superseded by
    # this rewrite.
    prior = _PENDING_WRITES.pop(stage_dir, None)
    if prior is not None:
        prior[0].join()
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    mat = ds.materialize()
    # Guard downstream parallelism: a narrow stage can materialize as a
    # handful of jumbo blocks (map outputs coalesce toward
    # target_max_block_size) and every downstream map/sort then runs
    # that few tasks. Split with a STREAMING repartition (map-style —
    # it can split but NOT merge; the too-many-tiny-blocks direction is
    # handled at the source by the reader's task clamp).
    try:
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 4))
        n_rows = mat.count()
        n_blocks = mat.num_blocks()
        want = cpus * 4
        if n_blocks < want and n_rows > want * 1024:
            mat = mat.repartition(
                target_num_rows_per_block=max(1024, n_rows // want)
            ).materialize()
    except Exception:
        pass

    def _persist() -> None:
        mat.write_parquet(tmp)
        rows = _count_rows(tmp)
        wall = time.time() - t0
        with open(os.path.join(tmp, LINEAGE_FILE), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "config_hash": cfg_hash,
                    "inputs": inputs,
                    "rows": rows,
                    "complete": True,
                    "completed_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    ),
                },
                f,
                indent=2,
            )
        with open(os.path.join(tmp, METRICS_FILE), "w") as f:
            json.dump(
                {"wall_sec": wall, "rows": rows, **(extra_metrics or {})},
                f,
                indent=2,
            )
        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)
        os.replace(tmp, stage_dir)

    if not async_write:
        _persist()
        return mat

    import threading

    box: list = []

    def _runner() -> None:
        try:
            _persist()
        except BaseException as e:  # noqa: BLE001 — re-raised at flush
            box.append(e)

    t = threading.Thread(
        target=_runner, name=f"ckpt-{stage}", daemon=True
    )
    t.start()
    _PENDING_WRITES[stage_dir] = (t, box)
    return mat


def partitioned_map_stage(
    items: list,
    task_fn,
    stage_dir: str,
    *,
    stage: str,
    cfg_hash: str,
    num_cpus: float = 1.0,
) -> rd.Dataset:
    """WITHIN-stage partition-level resume: one Ray task per item
    writes ``stage_dir/part-{i:05d}.parquet`` atomically (tmp +
    rename); a rerun SKIPS items whose part file already exists under
    the same config hash. This is the 100-TB crash story for long
    map-shaped stages — whole-stage checkpoints (``write_stage``)
    re-run everything on a crash mid-stage, this re-runs only the
    missing shards.

    ``task_fn(item) -> pyarrow.Table`` must be deterministic per item
    (same item → same rows) so a resumed run is indistinguishable from
    an uninterrupted one. A config change (different ``cfg_hash``)
    wipes the directory. Completion stamps the usual stage lineage;
    consume with ``read_stage``.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    t0 = time.time()
    hash_file = os.path.join(stage_dir, "_config_hash")
    if os.path.exists(stage_dir):
        prior = None
        if os.path.exists(hash_file):
            with open(hash_file) as f:
                prior = f.read().strip()
        if prior != cfg_hash:
            shutil.rmtree(stage_dir)
    os.makedirs(stage_dir, exist_ok=True)
    if not os.path.exists(hash_file):
        with open(hash_file, "w") as f:
            f.write(cfg_hash)

    @ray.remote(num_cpus=num_cpus)
    def _run(i: int, item) -> int:
        out = os.path.join(stage_dir, f"part-{i:05d}.parquet")
        tmp = out + ".tmp"
        tbl = task_fn(item)
        pq.write_table(tbl, tmp)
        os.replace(tmp, out)
        return tbl.num_rows

    pending = [
        (i, item)
        for i, item in enumerate(items)
        if not os.path.exists(
            os.path.join(stage_dir, f"part-{i:05d}.parquet")
        )
    ]
    if pending:
        ray.get([_run.remote(i, item) for i, item in pending])
    rows = _count_rows(stage_dir)
    with open(os.path.join(stage_dir, LINEAGE_FILE), "w") as f:
        json.dump(
            {
                "stage": stage,
                "config_hash": cfg_hash,
                "inputs": [],
                "rows": rows,
                "complete": True,
                "partitions": len(items),
                "resumed_partitions": len(items) - len(pending),
                "completed_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
            },
            f,
            indent=2,
        )
    with open(os.path.join(stage_dir, METRICS_FILE), "w") as f:
        json.dump({"wall_sec": time.time() - t0, "rows": rows}, f, indent=2)
    return read_stage(stage_dir)


def read_stage(stage_dir: str) -> rd.Dataset:
    files = sorted(
        os.path.join(stage_dir, f)
        for f in os.listdir(stage_dir)
        if f.endswith(".parquet")
    )
    if not files:
        import pyarrow as pa

        return rd.from_arrow(pa.table({}))
    return rd.read_parquet(files)


def stage_metrics(stage_dir: str) -> dict:
    path = os.path.join(stage_dir, METRICS_FILE)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _count_rows(d: str) -> int:
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
