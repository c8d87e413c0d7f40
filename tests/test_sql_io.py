"""SQL (sqlite) source/sink parity — mirrors the reference's
DeduperTest.dedupeSql (DeduperTest.kt:173-225) and hashPersistor
(DeduperTest.kt:299-328) over the synthetic real-estate fixture
(F2: 986 rows, dupe groups 341←{342,984}, 403←{404}, 600←{601})."""

import json
import os
import sqlite3

import pyarrow as pa
import pytest

from deduper_ray.config import DedupeConfig
from deduper_ray.pipelines.exact_dedupe import dedupe
from deduper_ray.sources.sql_io import (
    parse_sqlite_url,
    read_sqlite,
    write_sqlite_table,
)
from tests.fixtures import RE_COLUMNS, RE_HASH_KEYS, make_real_estate


@pytest.fixture()
def re_db(tmp_path):
    """Real-estate fixture loaded as a sqlite TABLE source."""
    pq_path = os.path.join(tmp_path, "re.parquet")
    tbl = make_real_estate(pq_path)
    db = os.path.join(tmp_path, "source.db")
    with sqlite3.connect(db) as conn:
        cols = ", ".join(f"{c} TEXT" for c in RE_COLUMNS)
        conn.execute(f"CREATE TABLE real_estate ({cols})")
        rows = list(zip(*(tbl[c].to_pylist() for c in RE_COLUMNS)))
        conn.executemany(
            f"INSERT INTO real_estate VALUES "
            f"({', '.join('?' for _ in RE_COLUMNS)})",
            rows,
        )
    return db


def test_read_sqlite_ordinals(re_db):
    ds = read_sqlite(f"sqlite://{re_db}?table=real_estate")
    df = ds.to_pandas()
    assert len(df) == 986
    assert list(df["row_id"]) == list(range(986))
    assert list(df.columns)[:-1] == RE_COLUMNS

    # query source: result order is the ordinal
    ds_q = read_sqlite(
        f"sqlite://{re_db}?query=SELECT street, city FROM real_estate "
        f"ORDER BY rowid LIMIT 10"
    )
    dfq = ds_q.to_pandas()
    assert len(dfq) == 10
    assert list(dfq.columns) == ["street", "city", "row_id"]


def test_dedupe_sql_source_and_sinks(re_db, tmp_path):
    """dedupeSql parity: SQL source → SQL target/dupes/hashes tables,
    re-read and assert counts + first rows (reference expected: 982
    target rows, 3 dupe groups, first_found 341 / members [342, 984])."""
    out_db = os.path.join(tmp_path, "out.db")
    cfg = DedupeConfig(
        source=f"sqlite://{re_db}?table=real_estate",
        hash_keys=tuple(RE_HASH_KEYS),
        target_path=f"sqlite://{out_db}?table=real_estate",
        dupes_path=f"sqlite://{out_db}",
        hashes_path=f"sqlite://{out_db}",
    )
    report = dedupe(cfg)
    assert report.success
    assert report.record_count == 986
    assert report.dupe_count == 4
    assert report.distinct_dupe_count == 3
    assert report.hash_count == 982

    with sqlite3.connect(out_db) as conn:
        n_target = conn.execute(
            "SELECT count(*) FROM real_estate"
        ).fetchone()[0]
        assert n_target == 982
        target_cols = [
            r[1] for r in conn.execute("PRAGMA table_info(real_estate)")
        ]
        # engine semantic: target carries the row_id ordinal alongside
        # the input schema (exact_dedupe.py module docstring)
        assert target_cols == RE_COLUMNS + ["row_id"]

        dupes = conn.execute(
            "SELECT hash, row_ids, first_found_row_number, dupe_values "
            "FROM dupes ORDER BY first_found_row_number"
        ).fetchall()
        assert len(dupes) == 3
        first = dupes[0]
        assert json.loads(first[1]) == [342, 984]
        assert first[2] == 341
        assert set(json.loads(first[3])) == set(RE_COLUMNS)

        hashes = conn.execute(
            "SELECT count(*), count(json_row) FROM hashes"
        ).fetchone()
        assert hashes == (982, 0)  # include_json=False → NULL json_row


def test_hash_persistor_include_json_and_seen_roundtrip(re_db, tmp_path):
    """hashPersistor parity (include_json=True) + incremental mode: the
    hashes table feeds the next run as its SQL seen-hash source."""
    out_db = os.path.join(tmp_path, "out.db")
    cfg = DedupeConfig(
        source=f"sqlite://{re_db}?table=real_estate",
        hash_keys=tuple(RE_HASH_KEYS),
        hashes_path=f"sqlite://{out_db}",
        include_json=True,
    )
    report = dedupe(cfg)
    assert report.hash_count == 982
    with sqlite3.connect(out_db) as conn:
        n, n_json = conn.execute(
            "SELECT count(*), count(json_row) FROM hashes"
        ).fetchone()
        assert (n, n_json) == (982, 982)
        row = conn.execute(
            "SELECT json_row FROM hashes LIMIT 1"
        ).fetchone()[0]
        assert set(json.loads(row)) == set(RE_COLUMNS)

    # incremental: every row now 'seen' → zero new hashes
    cfg2 = DedupeConfig(
        source=f"sqlite://{re_db}?table=real_estate",
        hash_keys=tuple(RE_HASH_KEYS),
        seen_hashes=f"sqlite://{out_db}?table=hashes",
    )
    rep2 = dedupe(cfg2)
    assert rep2.dupe_count == 986
    assert rep2.hash_count == 982  # preload-inclusive count


def test_write_sqlite_roundtrip_types(tmp_path):
    db = os.path.join(tmp_path, "t.db")
    tbl = pa.table(
        {
            "i": pa.array([1, 2], type=pa.int64()),
            "f": pa.array([1.5, 2.5], type=pa.float64()),
            "s": pa.array(["a", None], type=pa.string()),
            "b": pa.array([True, False]),
        }
    )
    n = write_sqlite_table(tbl, db, "t")
    assert n == 2
    with sqlite3.connect(db) as conn:
        assert conn.execute("SELECT * FROM t ORDER BY i").fetchall() == [
            (1, 1.5, "a", 1), (2, 2.5, None, 0)
        ]


def test_parse_sqlite_url():
    db, table, query = parse_sqlite_url("sqlite:///tmp/x.db?table=t")
    assert (db, table, query) == ("/tmp/x.db", "t", None)
    assert parse_sqlite_url("sqlite:///tmp/x.db") == ("/tmp/x.db", None, None)
    with pytest.raises(ValueError):
        parse_sqlite_url("sqlite:///tmp/x.db?table=t&query=SELECT 1")


def test_keyset_query_parallel_matches_single_task(re_db, monkeypatch):
    """r3: a ?query= source ending in ORDER BY <unique col> reads as
    parallel keyset ranges; ordinals + rows identical to the
    single-task scan."""
    import pandas as pd

    import deduper_ray.sources.sql_io as sio

    url = (
        f"sqlite://{re_db}?query=SELECT street, city, rowid AS rid "
        f"FROM real_estate ORDER BY rid"
    )
    # default slice size ≫ 986 rows → keyset declines → single task
    single = read_sqlite(url).to_pandas()
    assert len(single) == 986
    monkeypatch.setattr(sio, "_SLICE_ROWS", 100)
    keyset = read_sqlite(url).to_pandas()
    pd.testing.assert_frame_equal(
        single.sort_values("row_id").reset_index(drop=True),
        keyset.sort_values("row_id").reset_index(drop=True),
    )
    # non-unique ordering column straddling boundaries → safe fallback
    url_dup = (
        f"sqlite://{re_db}?query=SELECT street, city FROM real_estate "
        f"ORDER BY city"
    )
    dup = read_sqlite(url_dup).to_pandas()
    assert len(dup) == 986


def test_read_sql_factory_matches_url_path(re_db):
    """r3: generic DB-API connection-factory source (read_sql) produces
    the same rows+ordinals as the sqlite-url table path."""
    import functools

    import pandas as pd

    from deduper_ray.sources.sql_io import read_sql

    factory = functools.partial(sqlite3.connect, re_db)
    url_df = (
        read_sqlite(f"sqlite://{re_db}?table=real_estate")
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    fac_df = (
        read_sql(
            factory,
            "SELECT *, rowid AS _rid FROM real_estate",
            partition_column="_rid",
            num_partitions=7,
        )
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        url_df, fac_df.drop(columns=["_rid"]), check_dtype=False
    )
    # single-scan form (no partition column)
    one = read_sql(factory, "SELECT street FROM real_estate").to_pandas()
    assert len(one) == 986


def test_write_sqlite_sharded_reconciles(re_db, tmp_path):
    """r3: per-partition SQL sink fan-out — shard row counts sum to the
    input count and every shard carries the auto-DDL table."""
    from deduper_ray.sources.sql_io import write_sqlite_sharded

    ds = read_sqlite(f"sqlite://{re_db}?table=real_estate")
    out = os.path.join(tmp_path, "shards")
    total = write_sqlite_sharded(ds, out, "re", num_shards=4)
    assert total == 986
    shard_files = sorted(
        f for f in os.listdir(out) if f.endswith(".db")
    )
    assert 1 <= len(shard_files) <= 4
    acc = 0
    for f in shard_files:
        with sqlite3.connect(os.path.join(out, f)) as conn:
            acc += conn.execute("SELECT count(*) FROM re").fetchone()[0]
    assert acc == 986


def test_varchar_padding_ddl(tmp_path):
    """r3: varcharPadding DDL parity (jndi/JNDIType.kt:39-44) — string
    columns render as VARCHAR(n); sqlite stores/returns them fine."""
    db = os.path.join(tmp_path, "pad.db")
    tbl = pa.table({"name": ["a", "bb"], "n": [1, 2]})
    n = write_sqlite_table(tbl, db, "t", varchar_padding=25)
    assert n == 2
    with sqlite3.connect(db) as conn:
        ddl = conn.execute(
            "SELECT sql FROM sqlite_master WHERE name='t'"
        ).fetchone()[0]
        assert "VARCHAR(25)" in ddl
        assert conn.execute("SELECT count(*) FROM t").fetchone()[0] == 2


def test_dedupe_sharded_sql_target(re_db, tmp_path):
    """r3: dedupe() with a sqlite:///dir/part-{i}.db target fans the
    deduped rows out across shard databases; reconciliation (K5) sums
    across shards."""
    cfg = DedupeConfig(
        source=f"sqlite://{re_db}?table=real_estate",
        hash_keys=RE_HASH_KEYS,
        target_path=(
            f"sqlite://{tmp_path}/shards/part-{{i}}.db?table=target_data"
        ),
    )
    report = dedupe(cfg)
    assert report.record_count == 986 and report.dupe_count == 4
    shard_dir = os.path.join(tmp_path, "shards")
    files = [f for f in os.listdir(shard_dir) if f.endswith(".db")]
    assert files
    total = 0
    for f in files:
        with sqlite3.connect(os.path.join(shard_dir, f)) as conn:
            total += conn.execute(
                "SELECT count(*) FROM target_data"
            ).fetchone()[0]
    assert total == 982


def _duckdb_ro(path):
    import duckdb

    return duckdb.connect(path, read_only=True)


def test_read_sql_duckdb_backend(tmp_path):
    """r3: read_sql works over a SECOND DB-API engine (duckdb) — the
    any-driver claim of the connection-factory source, partitioned and
    single-scan forms."""
    import functools

    import duckdb
    import pandas as pd

    from deduper_ray.sources.sql_io import read_sql

    db = str(tmp_path / "d.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE t AS SELECT range AS id, "
        "'name-' || range AS name, range * 1.5 AS score "
        "FROM range(500)"
    )
    con.close()

    factory = functools.partial(_duckdb_ro, db)
    part = (
        read_sql(
            factory, "SELECT * FROM t", partition_column="id",
            num_partitions=5,
        )
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    assert len(part) == 500
    assert list(part["row_id"]) == list(range(500))
    assert part["name"].iloc[499] == "name-499"

    single = (
        read_sql(factory, "SELECT * FROM t ORDER BY id")
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        part[["id", "name", "score"]], single[["id", "name", "score"]]
    )
