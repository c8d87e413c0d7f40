"""JSONL (NDJSON) source/sink with deterministic row ordinals.

The training-data interchange format the reference lacks (its sources
are JDBC/CSV, SURVEY §2.1); same ordinal contract as the parquet
reader (sources/readers.py): row_id is a pure function of (sorted file
list, byte position of the line), reproducible under any parallelism.

Scale shape:
- the driver touches only os.stat sizes + a small schema-inference
  sample — no data rows;
- each file is split into ``chunk_bytes`` byte ranges; a line belongs
  to the range containing its FIRST byte (the standard split-by-
  newline convention), so every line is owned by exactly one task;
- pass 1 counts newlines per range (C-speed bytes.count, distributed)
  → driver prefix-sums the per-range counts into ordinals (metadata-
  sized); pass 2 parses each range with pyarrow.json's C++ NDJSON
  reader and appends row ids. Two I/O passes over the bytes, zero
  driver data residency.

Assumes well-formed NDJSON: one JSON object per line, no blank lines
(the count pass counts every line). The sink writes canonical
key-order JSON, one part file per block, written distributed.
"""

from __future__ import annotations

import io
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.json as pajson
import ray.data as rd

# directory expansion deliberately EXCLUDES plain ".json": a
# pretty-printed multi-line JSON document is not NDJSON — it would trip
# the count-vs-parse guard (or a one-line array would parse as one
# bogus row). Explicit file paths still pass through untouched.
_EXTS = (".jsonl", ".ndjson")


def _expand_jsonl_paths(source: str | list[str]) -> list[str]:
    import glob as _glob

    if isinstance(source, (list, tuple)):
        out: list[str] = []
        for s in source:
            out.extend(_expand_jsonl_paths(s))
        return sorted(out)
    if os.path.isdir(source):
        return sorted(
            os.path.join(source, f)
            for f in os.listdir(source)
            if f.endswith(_EXTS)
        )
    if any(c in source for c in "*?["):
        return sorted(_glob.glob(source))
    return [source]


def _ranges(files: list[str], chunk_bytes: int) -> list[dict]:
    ranges = []
    for path in files:
        size = os.stat(path).st_size
        start = 0
        while start < size:
            end = min(start + chunk_bytes, size)
            ranges.append({"path": path, "start": start, "end": end})
            start = end
    return ranges


def _count_lines_in_range(path: str, start: int, end: int) -> int:
    """Number of lines whose first byte lies in [start, end).
    Line starts are byte 0 and every position after a '\\n' (except a
    trailing '\\n' at EOF, which opens no line)."""
    size = os.stat(path).st_size
    lo = max(start - 1, 0)
    hi = min(end - 1, size - 1)  # '\n' at size-1 opens no line
    n = 1 if start == 0 and size > 0 else 0
    if hi <= lo:
        return n
    with open(path, "rb") as f:
        f.seek(lo)
        n += f.read(hi - lo).count(b"\n")
    return n


def _read_range_bytes(path: str, start: int, end: int) -> bytes:
    """The complete lines owned by [start, end): from the first line
    boundary at-or-after start through the end of the line that begins
    before end."""
    size = os.stat(path).st_size
    with open(path, "rb") as f:
        if start == 0:
            line_start = 0
        else:
            f.seek(start - 1)
            probe = f.read(1)
            if probe == b"\n":
                line_start = start
            else:
                # scan forward to the first newline at-or-after start-1
                pos = start
                line_start = None
                while True:
                    chunk = f.read(1 << 20)
                    if not chunk:
                        return b""  # range begins inside the last line
                    idx = chunk.find(b"\n")
                    if idx >= 0:
                        line_start = pos + idx + 1
                        break
                    pos += len(chunk)
                if line_start >= end:
                    return b""  # no line starts inside this range
        f.seek(line_start)
        buf = f.read(end - line_start)
        # finish the partial last line (it began before end → ours)
        while not buf.endswith(b"\n") and f.tell() < size:
            extra = f.read(1 << 20)
            if not extra:
                break
            idx = extra.find(b"\n")
            if idx >= 0:
                buf += extra[: idx + 1]
                break
            buf += extra
        return buf


def infer_jsonl_schema(path: str, sample_bytes: int = 1 << 20) -> pa.Schema:
    """Schema from the leading sample of the first file (driver-side,
    bounded read)."""
    with open(path, "rb") as f:
        buf = f.read(sample_bytes)
    cut = buf.rfind(b"\n")
    if cut > 0:
        buf = buf[: cut + 1]
    return pajson.read_json(io.BytesIO(buf)).schema


def read_jsonl_with_row_ids(
    source: str | list[str],
    *,
    columns: list[str] | None = None,
    row_id_column: str = "row_id",
    schema: pa.Schema | None = None,
    chunk_bytes: int = 32 * 1024 * 1024,
) -> rd.Dataset:
    """NDJSON → Dataset with a deterministic ``row_id`` ordinal."""
    import ray

    files = _expand_jsonl_paths(source)
    if not files:
        raise FileNotFoundError(f"no jsonl files match {source!r}")
    if schema is None:
        schema = infer_jsonl_schema(files[0])
    ranges = _ranges(files, chunk_bytes)
    if not ranges:
        out_schema = schema.append(pa.field(row_id_column, pa.int64()))
        return rd.from_arrow(out_schema.empty_table())

    # pass 1: distributed newline counts → driver prefix sums
    count_task = ray.remote(num_cpus=0.5)(_count_lines_in_range)
    counts = ray.get(
        [count_task.remote(r["path"], r["start"], r["end"]) for r in ranges]
    )
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
    plan = [
        {**r, "offset": int(off), "n": int(c)}
        for r, off, c in zip(ranges, offsets, counts)
    ]
    parse_opts = pajson.ParseOptions(
        explicit_schema=schema, unexpected_field_behavior="ignore"
    )

    def _read(batch: pa.Table) -> pa.Table:
        tables = []
        for task in batch.to_pylist():
            buf = _read_range_bytes(task["path"], task["start"], task["end"])
            if not buf:
                t = schema.empty_table()
            else:
                t = pajson.read_json(
                    io.BytesIO(buf), parse_options=parse_opts
                )
            if t.num_rows != task["n"]:
                raise RuntimeError(
                    f"jsonl range {task['path']}[{task['start']}:"
                    f"{task['end']}] parsed {t.num_rows} rows, counted "
                    f"{task['n']} — blank line or unterminated record?"
                )
            rid = np.arange(
                task["offset"], task["offset"] + t.num_rows, dtype=np.int64
            )
            t = t.append_column(row_id_column, pa.array(rid))
            if columns:
                t = t.select(list(columns) + [row_id_column])
            tables.append(t)
        return pa.concat_tables(tables)

    plan_ds = rd.from_items(plan, override_num_blocks=len(plan))
    return plan_ds.map_batches(
        _read, batch_format="pyarrow", batch_size=None, num_cpus=0.99
    )


def write_jsonl_sink(ds: rd.Dataset, out_dir: str) -> int:
    """One .jsonl part per block, written distributed; canonical
    key-order JSON per row (the sink-boundary row→JSON rendering of
    SURVEY §2 O5). Returns rows written."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(t: pa.Table) -> pa.Table:
        import uuid

        rows = t.to_pylist()
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.jsonl")
        tmp = name + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for rec in rows:
                f.write(
                    json.dumps(rec, default=str, ensure_ascii=False) + "\n"
                )
        os.replace(tmp, name)
        return pa.table({"n": pa.array([len(rows)], type=pa.int64())})

    written = (
        ds.map_batches(_write, batch_format="pyarrow", batch_size=None)
        .sum("n")
    )
    return int(written or 0)
