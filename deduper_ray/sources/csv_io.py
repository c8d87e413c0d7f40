"""CSV source/sink parity with the reference.

Source (reference S2: CSV files exposed as JDBC tables through the
csvjdbc driver, default_ds.properties / build.gradle.kts:73): CSV reads
produce ALL-STRING columns — the reference's CSV-source semantics
(README.md:292 "when the source is CSV all target columns are
strings") — plus the same deterministic row ordinal the parquet reader
provides.

Sink (reference K1: Persistors.kt:147-179): delimiter-configurable
text output, ``null → ""``, header from source schema. Per-partition
files replace the reference's .LOCK_ single-writer protocol
(Persistors.kt:109-142).

CSV is the parity/interchange path; parquet is the scale path — CSV
row counting requires one streaming decode pass on the driver, which
is fine at CSV-appropriate sizes and documented as such.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data as rd


def _csv_row_counts(files: list[str], parse_options) -> list[int]:
    counts = []
    for f in files:
        n = 0
        with pacsv.open_csv(f, parse_options=parse_options) as reader:
            for batch in reader:
                n += batch.num_rows
        counts.append(n)
    return counts


def read_csv_with_row_ids(
    source: str | list[str],
    *,
    delimiter: str = ",",
    row_id_column: str = "row_id",
) -> rd.Dataset:
    """CSV → Dataset with all-string columns + deterministic row_id.

    One read task per file; file offsets from a driver-side streaming
    count pass (row-accurate — handles quoted newlines).
    """
    from deduper_ray.sources.readers import _expand_paths

    files = [
        f
        for f in _expand_paths(source)
        if not f.endswith(".parquet")
    ] or _expand_paths(source)
    parse = pacsv.ParseOptions(delimiter=delimiter)
    counts = _csv_row_counts(files, parse)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    plan = [
        {"path": f, "offset": int(off)}
        for f, off in zip(files, offsets)
    ]

    def _read(batch: pa.Table) -> pa.Table:
        tables = []
        for task in batch.to_pylist():
            t = pacsv.read_csv(
                task["path"],
                parse_options=pacsv.ParseOptions(delimiter=delimiter),
                convert_options=pacsv.ConvertOptions(
                    column_types=None, strings_can_be_null=False
                ),
            )
            # all-string semantics (reference CSV sources)
            cols = {
                name: t[name].cast(pa.string())
                for name in t.column_names
            }
            cols[row_id_column] = pa.array(
                np.arange(task["offset"], task["offset"] + t.num_rows,
                          dtype=np.int64)
            )
            tables.append(pa.table(cols))
        return pa.concat_tables(tables)

    plan_ds = rd.from_items(plan, override_num_blocks=len(plan))
    return plan_ds.map_batches(
        _read, batch_format="pyarrow", batch_size=1, num_cpus=0.99
    )


def write_csv_sink(
    ds: rd.Dataset,
    out_dir: str,
    *,
    delimiter: str = ",",
    extension: str = "txt",
) -> None:
    """Reference-K1-shaped CSV sink: null → "", configurable delimiter
    and extension (csv/CsvConfigParser.kt:11-39 defaults: ',' + txt),
    one file per block written distributed."""
    os.makedirs(out_dir, exist_ok=True)

    def _stringify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {}
        for name in t.column_names:
            col = t[name]
            if not pa.types.is_string(col.type):
                col = col.cast(pa.string())
            cols[name] = pc.fill_null(col, "")
        return pa.table(cols)

    # arrow_csv_args_fn defers WriteOptions construction to the write
    # task (WriteOptions itself is not picklable). Values are quoted —
    # same as the reference's opencsv writer.
    ds.map_batches(_stringify, batch_format="pyarrow").write_csv(
        out_dir,
        arrow_csv_args_fn=lambda: {
            "write_options": pacsv.WriteOptions(delimiter=delimiter)
        },
    )
    # normalize extensions (write_csv emits .csv)
    if extension != "csv":
        for f in os.listdir(out_dir):
            if f.endswith(".csv"):
                os.rename(
                    os.path.join(out_dir, f),
                    os.path.join(out_dir, f[: -len(".csv")] + "." + extension),
                )
