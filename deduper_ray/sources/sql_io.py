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
  permits exactly ONE writer per database file, so the single-db sink
  drains the Dataset stream on the driver via ``iter_batches`` — the
  upstream compute stays distributed, only the final INSERT
  serializes. ``write_sqlite_sharded`` is the cluster-scale form:
  one database per shard, written in parallel (the standard JDBC
  fan-out); the parquet sinks remain the scale path.

Beyond sqlite: ``read_sql`` takes any picklable DB-API 2.0 connection
factory (reference: any-JDBC via SourceJndi, config/Config.kt:19-24)
with the same deterministic-ordinal contract; free-form ``?query=``
sources with a trailing ``ORDER BY <unique col>`` read as parallel
keyset ranges instead of one task.
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


def is_sharded_sqlite_url(source: str | list[str]) -> bool:
    """``sqlite:///dir/part-{i}.db?table=T`` — the parallel fan-out
    sink form (``{i}`` marks the shard slot; one database per shard)."""
    return is_sqlite_url(source) and "{i}" in source


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
        ds = _read_query_keyset(
            db_path, query, columns=columns, row_id_column=row_id_column
        )
        if ds is not None:
            return ds

        # free-form query without a keyset handle: one forward scan,
        # ordinals = result order (reference semantics: forward-only
        # cursor, Deduper.kt:164)
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


def _read_query_keyset(
    db_path: str,
    query: str,
    *,
    columns: list[str] | None,
    row_id_column: str | None,
) -> rd.Dataset | None:
    """Parallel keyset-paginated read of a ``?query=`` source.

    Applies when the query's trailing clause is ``ORDER BY <col>``
    (ascending) on a UNIQUE column: one serial pass streams ONLY the
    key column to find a boundary key every ``_SLICE_ROWS`` rows (and
    the exact slice counts → exact global ordinals), then each slice
    reads its key range as an independent distributed task. Returns
    None (→ caller falls back to the single-task scan) when the query
    has no such handle, the key type isn't orderable-by-range, or
    duplicate keys straddle a boundary (uniqueness violated — range
    predicates would miscount).

    Same result + ordinals as the single-task path; the serial cost
    drops from a full-row scan to a key-column scan.
    """
    import re

    m = re.search(
        r"order\s+by\s+([A-Za-z_]\w*)\s*(?:asc)?\s*;?\s*$", query, re.I
    )
    if not m:
        return None
    key = m.group(1)
    q = query.rstrip().rstrip(";")

    boundaries: list = []  # last key of each slice
    counts: list[int] = []
    prev_last = None
    try:
        with _connect_ro(db_path) as conn:
            cur = conn.execute(f"SELECT {key} FROM ({q}) _q")
            while True:
                chunk = cur.fetchmany(_SLICE_ROWS)
                if not chunk:
                    break
                first, last = chunk[0][0], chunk[-1][0]
                if first is None or not isinstance(
                    first, (int, float, str)
                ):
                    return None
                if prev_last is not None and not (prev_last < first):
                    return None  # duplicate/non-increasing across boundary
                boundaries.append(last)
                counts.append(len(chunk))
                prev_last = last
    except sqlite3.Error:
        return None
    if len(boundaries) <= 1:
        return None  # one slice — single-task path is already optimal

    offsets = np.concatenate(([0], np.cumsum(counts[:-1]))).tolist()
    tasks = [
        {
            "lo": boundaries[i - 1] if i else None,
            "hi": boundaries[i],
            "offset": offsets[i],
        }
        for i in range(len(boundaries))
    ]

    def _read_range(batch: pa.Table) -> pa.Table:
        tables = []
        with _connect_ro(db_path) as conn:
            for task in batch.to_pylist():
                if task["lo"] is None:
                    cur = conn.execute(
                        f"SELECT * FROM ({q}) _q WHERE _q.{key} <= ? "
                        f"ORDER BY _q.{key}",
                        (task["hi"],),
                    )
                else:
                    cur = conn.execute(
                        f"SELECT * FROM ({q}) _q WHERE _q.{key} > ? "
                        f"AND _q.{key} <= ? ORDER BY _q.{key}",
                        (task["lo"], task["hi"]),
                    )
                cols = [d[0] for d in cur.description]
                rows = cur.fetchall()
                if columns:
                    keep = [cols.index(c) for c in columns]
                    rows = [tuple(r[k] for k in keep) for r in rows]
                    cols = list(columns)
                tables.append(
                    _rows_to_table(
                        rows, cols,
                        task["offset"] if row_id_column else None,
                        row_id_column or ROW_ID,
                    )
                )
        return pa.concat_tables(tables)

    plan = rd.from_items(tasks, override_num_blocks=len(tasks))
    return plan.map_batches(
        _read_range, batch_format="pyarrow", batch_size=1, num_cpus=0.99
    )


def read_sql(
    conn_factory,
    query: str,
    *,
    partition_column: str | None = None,
    bounds: tuple[int, int] | None = None,
    num_partitions: int = 16,
    row_id_column: str | None = ROW_ID,
) -> rd.Dataset:
    """Generic SQL source over any DB-API 2.0 connection factory.

    The reference accepts any JDBC driver through its JNDI indirection
    (config/Config.kt:19-24, Deduper.kt:160-166); this is the Ray-side
    equivalent: ``conn_factory`` is a PICKLABLE zero-arg callable (a
    top-level function or ``functools.partial``) returning a fresh
    DB-API connection — sqlite3, psycopg2, mysql-connector, duckdb…
    Each read task opens its own connection via the factory.

    Deterministic-ordinal contract (same as the parquet/sqlite
    readers): with ``partition_column`` (an integer-typed UNIQUE
    column) and ``bounds=(lo, hi)`` inclusive, the key space splits
    into ``num_partitions`` ranges; a driver metadata pass COUNTs each
    range once to fix exact global offsets, then every range reads in
    parallel ordered by the partition column. Without
    ``partition_column`` the query runs as ONE forward scan and
    ordinals follow result order (give the query an ORDER BY for
    reproducibility).
    """
    q = query.rstrip().rstrip(";")

    if partition_column is None:
        def _read_all(_: pa.Table) -> pa.Table:
            conn = conn_factory()
            try:
                cur = conn.cursor()
                cur.execute(q)
                cols = [d[0] for d in cur.description]
                rows = cur.fetchall()
            finally:
                conn.close()
            return _rows_to_table(
                rows, cols, 0 if row_id_column else None,
                row_id_column or ROW_ID,
            )

        plan = rd.from_items([{"task": 0}], override_num_blocks=1)
        return plan.map_batches(
            _read_all, batch_format="pyarrow", batch_size=1
        )

    if bounds is None:
        conn = conn_factory()
        try:
            cur = conn.cursor()
            cur.execute(
                f"SELECT min({partition_column}), max({partition_column}) "
                f"FROM ({q}) _q"
            )
            lo, hi = cur.fetchone()
        finally:
            conn.close()
        if lo is None:
            return rd.from_items([], override_num_blocks=1)
        bounds = (int(lo), int(hi))

    lo, hi = bounds
    span = hi - lo + 1
    n_parts = max(1, min(num_partitions, span))
    edges = [lo + (span * i) // n_parts for i in range(n_parts)] + [hi + 1]

    # metadata pass: exact per-range counts → exact global offsets
    # (bounds are integers inlined into the SQL — no paramstyle
    # dependence across DB-API drivers)
    conn = conn_factory()
    try:
        cur = conn.cursor()
        range_counts = []
        for i in range(n_parts):
            cur.execute(
                f"SELECT count(*) FROM ({q}) _q WHERE "
                f"_q.{partition_column} >= {edges[i]} AND "
                f"_q.{partition_column} < {edges[i + 1]}"
            )
            range_counts.append(int(cur.fetchone()[0]))
    finally:
        conn.close()
    offsets = np.concatenate(([0], np.cumsum(range_counts[:-1]))).tolist()
    tasks = [
        {"lo": edges[i], "hi": edges[i + 1], "offset": offsets[i]}
        for i in range(n_parts)
        if range_counts[i]
    ] or [{"lo": lo, "hi": lo, "offset": 0}]

    def _read_range(batch: pa.Table) -> pa.Table:
        tables = []
        conn = conn_factory()
        try:
            cur = conn.cursor()
            for task in batch.to_pylist():
                cur.execute(
                    f"SELECT * FROM ({q}) _q WHERE "
                    f"_q.{partition_column} >= {task['lo']} AND "
                    f"_q.{partition_column} < {task['hi']} "
                    f"ORDER BY _q.{partition_column}"
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
        finally:
            conn.close()
        return pa.concat_tables(tables)

    plan = rd.from_items(tasks, override_num_blocks=len(tasks))
    return plan.map_batches(
        _read_range, batch_format="pyarrow", batch_size=1, num_cpus=0.99
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
         not_null: bool = False, varchar_padding: int | None = None) -> str:
    """``varchar_padding`` mirrors the reference's JNDIType option
    (jndi/JNDIType.kt:39-44, Persistors.kt:277): string columns render
    as ``VARCHAR(n)`` instead of TEXT. sqlite ignores declared widths
    (type affinity), so this is DDL-cosmetic parity for engines that
    honor them."""
    cols = []
    for f in schema:
        null = " NOT NULL" if not_null and f.name != "json_row" else ""
        sq = _sqlite_type(f.type)
        if sq == "TEXT" and varchar_padding:
            sq = f"VARCHAR({varchar_padding})"
        cols.append(f"{f.name} {sq}{null}")
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
    varchar_padding: int | None = None,
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
        conn.execute(
            _ddl(
                table, arrow_schema, primary_key=primary_key,
                varchar_padding=varchar_padding,
            )
        )
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


def write_sqlite_sharded(
    ds: rd.Dataset,
    out_dir: str,
    table: str,
    *,
    num_shards: int | None = None,
) -> int:
    """Per-partition SQL sink fan-out: shard ``ds`` across
    ``part-{i:05d}.db`` sqlite files under ``out_dir``, written IN
    PARALLEL (one Ray task per shard, each owning its own database —
    the standard JDBC fan-out pattern; sqlite's one-writer-per-file
    rule holds per shard). Returns total rows written; shards carry
    the same auto-DDL ``table`` and reconcile to the input count.
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    mat = ds.materialize()
    refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
    ]
    if num_shards is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_shards = max(1, min(len(refs) or 1, cpus))
    num_shards = max(1, min(num_shards, len(refs) or 1))
    groups: list[list] = [[] for _ in range(num_shards)]
    for i, ref in enumerate(refs):
        groups[i % num_shards].append(ref)

    @ray.remote
    def _write_shard(idx: int, block_refs: list) -> int:
        blocks = [b for b in ray.get(list(block_refs)) if b.num_rows]
        path = os.path.join(out_dir, f"part-{idx:05d}.db")
        if os.path.exists(path):
            os.remove(path)
        if not blocks:
            return 0
        tbl = pa.concat_tables(blocks)
        return write_sqlite_table(tbl, path, table)

    totals = ray.get(
        [_write_shard.remote(i, g) for i, g in enumerate(groups)]
    )
    return int(sum(totals))


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
