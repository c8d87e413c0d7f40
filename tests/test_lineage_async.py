"""Async stage checkpointing: write_stage(async_write=True) must keep
the atomic-rename protocol (stage dir appears complete only after the
background persist finished) and flush_pending_checkpoints() must be a
barrier that surfaces writer errors."""

import os

import pyarrow as pa
import ray.data as rd

from deduper_ray.state.lineage import (
    flush_pending_checkpoints,
    read_stage,
    stage_is_complete,
    write_stage,
)


def test_async_write_visible_after_flush(tmp_path):
    ds = rd.from_arrow(pa.table({"row_id": list(range(100)), "v": [1] * 100}))
    stage_dir = str(tmp_path / "stage_a")
    mat = write_stage(
        ds, stage_dir, stage="stage_a", cfg_hash="h1", inputs=["mem"],
        async_write=True,
    )
    # the returned dataset is usable immediately (in-memory blocks)
    assert mat.count() == 100
    flush_pending_checkpoints()
    assert stage_is_complete(stage_dir, "h1")
    assert not os.path.exists(stage_dir + ".tmp")
    assert read_stage(stage_dir).count() == 100


def test_flush_is_idempotent_and_propagates_errors(tmp_path):
    # happy path: double flush is a no-op
    flush_pending_checkpoints()
    flush_pending_checkpoints()

    # error path: a writer that fails must surface at flush, and the
    # stage dir must NOT look complete afterwards
    import deduper_ray.state.lineage as lin

    ds = rd.from_arrow(pa.table({"row_id": [1, 2], "v": [1, 2]}))
    stage_dir = str(tmp_path / "stage_b")
    orig = lin._count_rows
    lin._count_rows = lambda d: (_ for _ in ()).throw(RuntimeError("disk full"))
    try:
        write_stage(
            ds, stage_dir, stage="stage_b", cfg_hash="h2", inputs=["mem"],
            async_write=True,
        )
        raised = False
        try:
            flush_pending_checkpoints()
        except RuntimeError as e:
            raised = "disk full" in str(e)
        assert raised
        assert not stage_is_complete(stage_dir, "h2")
    finally:
        lin._count_rows = orig
