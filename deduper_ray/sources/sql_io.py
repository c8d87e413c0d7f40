"""SQL (sqlite) source + sinks — the reference's native habitat.

The reference reads its source through a JDBC connection (a table name
or free-form query via ``SourceJndi``, Deduper.kt:160-186) and writes
target/dupes/hashes as auto-DDL'd SQL tables with batched INSERTs
(Persistors.kt:240-314, 325-385, 391-453). This module provides the
parity path over sqlite (the same engine the reference's own test
suite uses — DeduperTest.kt dedupeSql/hashPersistor):

Source URLs: ``sqlite:///abs/path.db?table=NAME`` or
``sqlite:///abs/path.db?query=SELECT ...``.

- ``read_sqlite``: a TABLE source reads in parallel row-range slices
  ordered by sqlite's stable ``rowid`` (metadata pass = one COUNT(*)),
  each slice an independent distributed task appending deterministic
  global ordinals — same plan shape as the parquet row-group reader
  (readers.py). A QUERY source has no storage-level order handle, so
  it reads as ONE task preserving the query's own result order
  (reference semantics: a forward-only cursor, Deduper.kt:164); give
  the query an ORDER BY for reproducible ordinals.
- Sinks: auto-DDL from the Arrow schema (the reference generates
  vendor DDL from ResultSet metadata), then batched INSERTs. sqlite
  permits exactly ONE writer per database file, so sinks drain the
  Dataset stream on the driver via ``iter_batches`` — the upstream
  compute stays distributed, only the final INSERT serializes.
  For cluster-scale SQL targets, partition the Dataset and give each
  partition its own database/connection (the standard JDBC fan-out);
  the parquet sinks remain the scale path.
"""

from __future__ import annotations

import os
import sqlite3
from urllib.parse import parse_qs, urlparse

import numpy as np
import pyarrow as pa
import ray.data as rd

ROW_ID = "row_id"

_SLICE_ROWS = 100_000


def is_sqlite_url(source: str | list[str]) -> bool:
    return isinstance(source, str) and source.startswith("sqlite://")


def parse_sqlite_url(url: str) -> tuple[str, str | None, str | None]:
    """→ (db_path, table, query). At most one of table/query; sinks
    with fixed table names (dupes/hashes) pass a bare db url."""
    parsed = urlparse(url)
    db_path = (parsed.netloc or "") + parsed.path
    qs = parse_qs(parsed.query)
    table = qs.get("table", [None])[0]
    query = qs.get("query", [None])[0]
    if table and query:
        raise ValueError(
            f"sqlite url takes at most one of ?table= / ?query=: {url!r}"
        )
    return db_path, table, query


def _connect_ro(db_path: str) -> sqlite3.Connection:
    return sqlite3.connect(
        f"file:{db_path}?mode=ro", uri=True, timeout=60.0
    )


def _rows_to_table(
    rows: list[tuple], cols: list[str], offset: int | None,
    row_id_column: str,
) -> pa.Table:
    arrays = {}
    for i, c in enumerate(cols):
        arrays[c] = pa.array([r[i] for r in rows])
    if offset is not None:
        arrays[row_id_column] = pa.array(
            np.arange(offset, offset + len(rows), dtype=np.int64)
        )
    return pa.table(arrays)


def read_sqlite(
    url: str,
    *,
    columns: list[str] | None = None,
    row_id_column: str | None = ROW_ID,
) -> rd.Dataset:
    """SQL source (reference S1) with deterministic global ordinals."""
    db_path, table, query = parse_sqlite_url(url)
    if not (table or query):
        raise ValueError(f"sqlite SOURCE needs ?table= or ?query=: {url!r}")
    if not os.path.exists(db_path):
        raise FileNotFoundError(db_path)
    proj = ", ".join(columns) if columns else "*"

    if query is not None:
        # free-form query: one forward scan, ordinals = result order
        def _read_query(_: pa.Table) -> pa.Table:
            with _connect_ro(db_path) as conn:
                cur = conn.execute(query)
                cols = [d[0] for d in cur.description]
                rows = cur.fetchall()
            if columns:
                keep = [cols.index(c) for c in columns]
                rows = [tuple(r[k] for k in keep) for r in rows]
                cols = list(columns)
            return _rows_to_table(
                rows, cols, 0 if row_id_column else None,
                row_id_column or ROW_ID,
            )

        plan = rd.from_items([{"task": 0}], override_num_blocks=1)
        return plan.map_batches(
            _read_query, batch_format="pyarrow", batch_size=1
        )

    with _connect_ro(db_path) as conn:
        n_rows = conn.execute(
            f"SELECT count(*) FROM {table}"
        ).fetchone()[0]
    slices = [
        {"offset": off, "limit": min(_SLICE_ROWS, n_rows - off)}
        for off in range(0, n_rows, _SLICE_ROWS)
    ] or [{"offset": 0, "limit": 0}]

    def _read_slice(batch: pa.Table) -> pa.Table:
        tables = []
        with _connect_ro(db_path) as conn:
            for task in batch.to_pylist():
                cur = conn.execute(
                    f"SELECT {proj} FROM {table} ORDER BY rowid "
                    f"LIMIT ? OFFSET ?",
                    (task["limit"], task["offset"]),
                )
                cols = [d[0] for d in cur.description]
                rows = cur.fetchall()
                tables.append(
                    _rows_to_table(
                        rows, cols,
                        task["offset"] if row_id_column else None,
                        row_id_column or ROW_ID,
                    )
                )
        return pa.concat_tables(tables)

    plan = rd.from_items(slices, override_num_blocks=len(slices))
    return plan.map_batches(
        _read_slice, batch_format="pyarrow", batch_size=1, num_cpus=0.99
    )


# --------------------------------------------------------------- sinks

_ARROW_TO_SQLITE = [
    (pa.types.is_boolean, "INTEGER"),
    (pa.types.is_integer, "INTEGER"),
    (pa.types.is_floating, "REAL"),
    (pa.types.is_binary, "BLOB"),
]


def _sqlite_type(t: pa.DataType) -> str:
    for pred, name in _ARROW_TO_SQLITE:
        if pred(t):
            return name
    return "TEXT"


def _ddl(table: str, schema: pa.Schema, *, primary_key: str | None = None,
         not_null: bool = False) -> str:
    cols = []
    for f in schema:
        null = " NOT NULL" if not_null and f.name != "json_row" else ""
        cols.append(f"{f.name} {_sqlite_type(f.type)}{null}")
    if primary_key:
        cols.append(f"PRIMARY KEY ({primary_key})")
    return f"CREATE TABLE {table} ({', '.join(cols)})"


def write_sqlite_table(
    ds: rd.Dataset | pa.Table,
    db_path: str,
    table: str,
    *,
    delete_if_exists: bool = True,
    primary_key: str | None = None,
    batch_size: int = 65536,
) -> int:
    """Auto-DDL + batched INSERT sink (reference SqlTargetPersistor
    semantics: createTarget then addBatch/executeBatch per block).
    Single-writer by sqlite's design — the Dataset stream drains on
    the driver; upstream stages stay distributed. Returns rows
    written."""
    schema = ds.schema if isinstance(ds, pa.Table) else ds.schema()
    names = schema.names
    arrow_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(names, schema.types)]
    ) if not isinstance(schema, pa.Schema) else schema
    placeholders = ", ".join("?" for _ in names)
    insert = (
        f"INSERT INTO {table} ({', '.join(names)}) VALUES ({placeholders})"
    )
    written = 0
    with sqlite3.connect(db_path, timeout=60.0) as conn:
        if delete_if_exists:
            conn.execute(f"DROP TABLE IF EXISTS {table}")
        conn.execute(_ddl(table, arrow_schema, primary_key=primary_key))
        if isinstance(ds, pa.Table):
            batches = ds.to_batches(max_chunksize=batch_size)
        else:
            batches = ds.iter_batches(
                batch_size=batch_size, batch_format="pyarrow"
            )
        for b in batches:
            tbl = pa.table(b) if isinstance(b, pa.RecordBatch) else b
            rows = [
                tuple(
                    v.as_py() if hasattr(v, "as_py") else v
                    for v in row
                )
                for row in zip(*(tbl[c] for c in names))
            ]
            conn.executemany(insert, rows)
            written += len(rows)
        conn.commit()
    return written


def write_sqlite_dupes(dupes: pa.Table | rd.Dataset, db_path: str,
                       *, delete_if_exists: bool = True) -> int:
    """The reference's fixed ``dupes`` table (Persistors.kt:325-340):
    (hash PK, row_ids json, first_found_row_number, dupe_values)."""
    return write_sqlite_table(
        dupes, db_path, "dupes",
        delete_if_exists=delete_if_exists, primary_key="hash",
    )


def write_sqlite_hashes(hashes: pa.Table | rd.Dataset, db_path: str,
                        *, delete_if_exists: bool = True) -> int:
    """The reference's fixed ``hashes`` table (Persistors.kt:391-410):
    (hash PK, json_row NULL)."""
    return write_sqlite_table(
        hashes, db_path, "hashes",
        delete_if_exists=delete_if_exists, primary_key="hash",
    )


def load_seen_hashes_sqlite(url: str, column: str = "hash"):
    """Seen-hash preload from a SQL table (reference S3 HashSourceJndi,
    Deduper.kt:135-158) — e.g. the previous run's ``hashes`` sink."""
    import pyarrow.compute as pc
    import ray

    db_path, table, query = parse_sqlite_url(url)
    sql = query or f"SELECT {column} FROM {table}"
    with _connect_ro(db_path) as conn:
        vals = [r[0] for r in conn.execute(sql).fetchall()]
    return ray.put(pc.unique(pa.array(vals, type=pa.string())))
