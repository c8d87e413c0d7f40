"""Driver-contract invariants: every queries() entry has an oracle,
and the registries import without a Ray session."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod  # noqa: E402


# queries whose result is not SQL-expressible (the driver records a
# rows-only check for these — keep the list EXPLICIT so a forgotten
# oracle still fails this test)
ROWS_ONLY = {
    "image_features_pnm",  # decoded-pixel math
    "audio_features_wav",  # decoded-sample math
}


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(qs) - ROWS_ONLY == set(osql), (
        (set(qs) - ROWS_ONLY) ^ set(osql)
    )
    assert len(qs) >= 75


def test_oracle_sql_mentions_only_registered_tables():
    tables = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    import re

    for name, sql in entrymod.oracle_sql().items():
        froms = re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", sql)
        for t in froms:
            # CTE names and derived aliases are allowed; real tables
            # must come from the registered views
            assert t in tables or t in sql.lower(), (name, t)
