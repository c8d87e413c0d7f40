"""ORC source/sink with deterministic row ordinals.

Same ordinal contract as the parquet reader (sources/readers.py §docs):
a metadata-only driver pass reads each file's footer (``ORCFile.nrows``
— no data pages) to build (file, start_offset); one distributed task
per file decodes it with pyarrow's C++ ORC reader and appends
``row_id = start_offset + local_index``.

Parallelism is per FILE (ORC exposes per-stripe reads but not cheap
per-stripe row counts through pyarrow, so a stripe plan would need a
footer+index read per stripe; at 100 TB ORC datasets are many files,
which is the unit that matters). Column pruning pushes into the ORC
reader. Import-guarded: pyarrow is always present, but ORC support is
optional in some builds — callers get a clear error, and tests
skip-mark when absent.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

try:  # pyarrow.orc is an optional extension module
    import pyarrow.orc as paorc

    HAVE_ORC = True
except Exception:  # pragma: no cover
    paorc = None
    HAVE_ORC = False


def _require_orc() -> None:
    if not HAVE_ORC:
        raise ImportError(
            "pyarrow was built without ORC support; install a full "
            "pyarrow build to use the ORC source/sink"
        )


def _expand_orc_paths(source: str | list[str]) -> list[str]:
    import glob as _glob

    if isinstance(source, (list, tuple)):
        out: list[str] = []
        for s in source:
            out.extend(_expand_orc_paths(s))
        return sorted(out)
    if os.path.isdir(source):
        return sorted(
            os.path.join(source, f)
            for f in os.listdir(source)
            if f.endswith(".orc")
        )
    if any(c in source for c in "*?["):
        return sorted(_glob.glob(source))
    return [source]


def read_orc_with_row_ids(
    source: str | list[str],
    *,
    columns: list[str] | None = None,
    row_id_column: str = "row_id",
) -> rd.Dataset:
    """ORC → Dataset with a deterministic ``row_id`` ordinal."""
    _require_orc()
    files = _expand_orc_paths(source)
    if not files:
        raise FileNotFoundError(f"no orc files match {source!r}")
    offsets, total = [], 0
    for f in files:
        offsets.append(total)
        total += paorc.ORCFile(f).nrows  # footer-only
    if total == 0:
        schema = paorc.ORCFile(files[0]).schema
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        schema = schema.append(pa.field(row_id_column, pa.int64()))
        return rd.from_arrow(schema.empty_table())
    plan = [
        {"path": f, "offset": int(off)} for f, off in zip(files, offsets)
    ]
    cols = list(columns) if columns else None

    def _read(batch: pa.Table) -> pa.Table:
        tables = []
        for task in batch.to_pylist():
            t = paorc.ORCFile(task["path"]).read(columns=cols)
            rid = np.arange(
                task["offset"], task["offset"] + t.num_rows, dtype=np.int64
            )
            tables.append(t.append_column(row_id_column, pa.array(rid)))
        return pa.concat_tables(tables)

    plan_ds = rd.from_items(plan, override_num_blocks=len(plan))
    return plan_ds.map_batches(
        _read, batch_format="pyarrow", batch_size=None, num_cpus=0.99
    )


def write_orc_sink(ds: rd.Dataset, out_dir: str) -> int:
    """One .orc part per block, written distributed; returns rows."""
    _require_orc()
    os.makedirs(out_dir, exist_ok=True)

    def _write(t: pa.Table) -> pa.Table:
        import uuid

        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.orc")
        tmp = name + ".tmp"
        paorc.write_table(t, tmp)
        os.replace(tmp, name)
        return pa.table({"n": pa.array([t.num_rows], type=pa.int64())})

    written = (
        ds.map_batches(_write, batch_format="pyarrow", batch_size=None)
        .sum("n")
    )
    return int(written or 0)
