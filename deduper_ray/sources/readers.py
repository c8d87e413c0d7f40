"""Parquet sources with DETERMINISTIC global row ordinals.

The reference's first-occurrence-wins semantics hinge on a global row
ordinal (reference: Deduper.kt:241 recordCount++; golden row numbers at
DeduperTest.kt:56-63). Ray Data block order is not deterministic, so the
ordinal cannot come from arrival order. Instead:

1. Driver does a METADATA-ONLY pass: sort the file list, read each
   footer's per-row-group row counts, and build a plan of
   (file, row_group, start_offset) — no data rows touch the driver.
2. One distributed task per row group reads that row group (with column
   pruning) and appends ``row_id = start_offset + local_index``.

The ordinal is then a pure function of (sorted file list, row position),
reproducible under any parallelism — the property SURVEY.md §4.2
"Determinism/order" requires. At 100 TB the plan is one small list per
~1 GiB row group, and every read is an independent task with no
shuffle.
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

ROW_ID = "row_id"


def _expand_paths(source: str | list[str]) -> list[str]:
    """Sorted file list for a file / directory / glob / list source."""
    if isinstance(source, (list, tuple)):
        files: list[str] = []
        for s in source:
            files.extend(_expand_paths(s))
        return sorted(files)
    if os.path.isdir(source):
        return sorted(
            os.path.join(source, f)
            for f in os.listdir(source)
            if f.endswith(
                (".parquet", ".csv", ".txt", ".tsv", ".jsonl", ".ndjson",
                 ".orc")
            )
        )
    if any(c in source for c in "*?["):
        return sorted(_glob.glob(source))
    return [source]


_FORMAT_FAMILIES = {
    ".jsonl": "jsonl", ".ndjson": "jsonl",
    ".orc": "orc",
    ".csv": "csv", ".txt": "csv", ".tsv": "csv",
    ".parquet": "parquet", ".pq": "parquet",
}


def _require_single_format(files: list[str], source) -> None:
    """read_table dispatches the WHOLE file list on one format; a mixed
    directory (.jsonl next to .parquet) would silently feed foreign
    files into the chosen reader — raise a clear error instead."""
    fams = set()
    for f in files:
        ext = os.path.splitext(f)[1].lower()
        fams.add(_FORMAT_FAMILIES.get(ext, "parquet"))
    if len(fams) > 1:
        raise ValueError(
            f"source {source!r} mixes file formats {sorted(fams)}; "
            "read_table reads one format per source — point it at a "
            "single-format directory or an explicit file list"
        )


@dataclass(frozen=True)
class _RowGroupPlan:
    path: str
    row_group: int
    offset: int
    num_rows: int


def _plan_row_groups(files: list[str]) -> list[_RowGroupPlan]:
    plan: list[_RowGroupPlan] = []
    offset = 0
    for path in files:
        meta = pq.ParquetFile(path).metadata
        for rg in range(meta.num_row_groups):
            n = meta.row_group(rg).num_rows
            if n:
                plan.append(_RowGroupPlan(path, rg, offset, n))
            offset += n
    return plan


def read_parquet_with_row_ids(
    source: str | list[str],
    *,
    columns: list[str] | None = None,
    row_id_column: str = ROW_ID,
) -> rd.Dataset:
    """Read parquet into a Dataset with a deterministic ``row_id`` column.

    Column pruning happens at the row-group read (``columns=``), so a
    2-column transform never lifts the other columns off storage.
    """
    files = _expand_paths(source)
    if not files:
        raise FileNotFoundError(f"no parquet files match {source!r}")
    plan = _plan_row_groups(files)
    if not plan:
        # empty source: preserve schema with zero rows
        schema = pq.ParquetFile(files[0]).schema_arrow
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        schema = schema.append(pa.field(row_id_column, pa.int64()))
        return rd.from_arrow(schema.empty_table())

    # Parallelism: row groups are the decode unit (each decoded EXACTLY
    # once), but the TASK count is clamped to a cluster-sized band —
    # one task per row group on a many-row-group input floods the
    # pipeline with tiny blocks (977 × 2048-row blocks at 2M rows
    # measured a 3× slowdown on the downstream sort), while a
    # few-row-group input would serialize everything behind 1-2 blocks.
    # Too many row groups → several groups per task (merged into one
    # block); too few → streaming block split after the decode
    # (StreamingRepartition is map-style: it splits, never merges).
    min_tasks = 64
    try:
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    max_tasks = max(min_tasks, cpus * 4)
    n_tasks = min(len(plan), max_tasks)
    tasks = [
        {"path": p.path, "row_group": p.row_group, "offset": p.offset}
        for p in plan
    ]
    cols = list(columns) if columns else None

    def _read(batch: pa.Table) -> pa.Table:
        tables = []
        for task in batch.to_pylist():
            pf = pq.ParquetFile(task["path"])
            part = pf.read_row_group(task["row_group"], columns=cols)
            rid = np.arange(
                task["offset"], task["offset"] + part.num_rows, dtype=np.int64
            )
            # drop file-level schema metadata (e.g. a pandas dict):
            # it makes pa.Schema unhashable and trips Ray's
            # schema-dedup warning at every downstream aggregate
            part = part.replace_schema_metadata(None)
            tables.append(part.append_column(row_id_column, pa.array(rid)))
        return pa.concat_tables(tables)

    plan_ds = rd.from_items(tasks, override_num_blocks=n_tasks)
    # batch_size=None → one read task per plan block (several row
    # groups each when clamped). The off-unit num_cpus blocks operator
    # FUSION with downstream map_batches: fused, a downstream row-based
    # batch_size would bundle the tiny PLAN blocks into a single task
    # and serialize the whole pipeline behind one reader. 0.99 (not
    # 1.01) so reader tasks can still squeeze in next to a full actor
    # pool on a small CPU budget.
    ds = plan_ds.map_batches(
        _read, batch_format="pyarrow", batch_size=None, num_cpus=0.99
    )
    if len(plan) < min_tasks:
        total = sum(p.num_rows for p in plan)
        chunk = max(1024, -(-total // min_tasks))
        ds = ds.repartition(target_num_rows_per_block=chunk)
    return ds


def read_table(
    source: str | list[str],
    *,
    columns: list[str] | None = None,
    order_by: str | None = None,
    row_id_column: str = ROW_ID,
) -> rd.Dataset:
    """Read a parquet/CSV/SQL table, guaranteeing a ``row_id`` ordinal.

    If ``order_by`` names an existing unique column (e.g. ``doc_id``),
    that column IS the ordinal: plain ``read_parquet`` (cheapest path,
    full predicate/column pushdown) plus a vectorized copy/cast. Else
    falls back to the deterministic row-group reader.
    """
    from deduper_ray.sources.sql_io import is_sqlite_url, read_sqlite

    if is_sqlite_url(source):
        # SQL source parity (reference S1 SourceJndi, Deduper.kt:160-186)
        ds = read_sqlite(
            source, columns=columns, row_id_column=row_id_column
        )
        if order_by and order_by != row_id_column:
            import pyarrow.compute as pc

            ds = ds.map_batches(
                lambda t: t.drop_columns([row_id_column]).append_column(
                    row_id_column, pc.cast(t[order_by], pa.int64())
                ),
                batch_format="pyarrow",
            )
        return ds
    files = _expand_paths(source)
    _require_single_format(files, source)
    if files and files[0].endswith((".jsonl", ".ndjson")):
        # NDJSON source (training-data interchange; sources/jsonl_io.py)
        from deduper_ray.sources.jsonl_io import read_jsonl_with_row_ids

        ds = read_jsonl_with_row_ids(
            files, columns=columns, row_id_column=row_id_column
        )
        if order_by and order_by != row_id_column:
            import pyarrow.compute as pc

            ds = ds.map_batches(
                lambda t: t.drop_columns([row_id_column]).append_column(
                    row_id_column, pc.cast(t[order_by], pa.int64())
                ),
                batch_format="pyarrow",
            )
        return ds
    if files and files[0].endswith(".orc"):
        from deduper_ray.sources.orc_io import read_orc_with_row_ids

        ds = read_orc_with_row_ids(
            files, columns=columns, row_id_column=row_id_column
        )
        if order_by and order_by != row_id_column:
            import pyarrow.compute as pc

            ds = ds.map_batches(
                lambda t: t.drop_columns([row_id_column]).append_column(
                    row_id_column, pc.cast(t[order_by], pa.int64())
                ),
                batch_format="pyarrow",
            )
        return ds
    if files and files[0].endswith((".csv", ".txt", ".tsv")):
        # CSV parity mode (reference S2): all-string columns
        from deduper_ray.sources.csv_io import read_csv_with_row_ids

        delim = "\t" if files[0].endswith(".tsv") else ","
        ds = read_csv_with_row_ids(
            files, delimiter=delim, row_id_column=row_id_column
        )
        if columns:
            ds = ds.select_columns(list(columns) + [row_id_column])
        return ds
    if order_by:
        cols = list(columns) if columns else None
        if cols is not None and order_by not in cols:
            cols = cols + [order_by]
        ds = rd.read_parquet(files, columns=cols)

        def _ordinal(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            batch = batch.replace_schema_metadata(None)  # unhashable-dict guard
            if order_by == row_id_column:
                return batch
            return batch.append_column(
                row_id_column, pc.cast(batch[order_by], pa.int64())
            )

        return ds.map_batches(_ordinal, batch_format="pyarrow")
    return read_parquet_with_row_ids(
        source, columns=columns, row_id_column=row_id_column
    )
