"""Local replica of the driver's correctness gate: run every
``queries()`` entry at a given SF and compare with ``oracle_sql()``
via DuckDB (row count + column set + order-insensitive value hash).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols).reset_index(drop=True)
    except Exception:
        pass
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = _normalize(df)
    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            continue
        if not isinstance(res, pd.DataFrame):
            try:
                res = res.to_pandas()
            except AttributeError:
                res = pd.DataFrame(res)
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(res)} ({dt:.1f}s) [rows-only, no oracle]")
            continue
        odf = con.execute(oracles[name]).df()
        rh, oh = value_hash(res), value_hash(odf)
        status = "PASS" if (len(res) == len(odf) and rh == oh) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name}: rows {len(res)}/{len(odf)} "
            f"hash {rh}/{oh} cols {sorted(res.columns) == sorted(odf.columns)}"
            f" ({dt:.1f}s)"
        )
        if status == "FAIL" and len(res) and len(odf):
            a, b = _normalize(res), _normalize(odf)
            if sorted(res.columns) == sorted(odf.columns) and len(a) == len(b):
                for c in a.columns:
                    if not a[c].astype(str).equals(b[c].astype(str)):
                        bad = (a[c].astype(str) != b[c].astype(str)).idxmax()
                        print(
                            f"   first diff col={c} row={bad}: "
                            f"engine={a[c][bad]!r} oracle={b[c][bad]!r}"
                        )
                        break
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
