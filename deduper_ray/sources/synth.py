"""Deterministic synthetic fixtures (FIXTURES.md F1-F4). Seeded — every
call reproduces byte-identical tables. No external data.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# ---------------------------------------------------------------------------
# F2: real_estate — reference-conformance table.
# 986 rows, 12 string columns; on hash columns (street, city, state, zip,
# price) exactly 3 duplicated keys → 4 dupe rows:
#   first 341 → dupes 342, 984;  first 403 → dupe 404;  first 600 → dupe 601
# matching the golden report recordCount=986, dupeCount=4,
# distinctDupeCount=3, hashCount=982 (reference DeduperTest.kt:47-55).
# ---------------------------------------------------------------------------

RE_COLUMNS = [
    "street", "city", "zip", "state", "beds", "baths", "sq__ft", "type",
    "sale_date", "price", "latitude", "longitude",
]
RE_HASH_KEYS = ("street", "city", "state", "zip", "price")


def make_real_estate(path: str) -> pa.Table:
    rng = random.Random(986)
    cities = ["SACRAMENTO", "ELK GROVE", "CITRUS HEIGHTS", "ROSEVILLE", "GALT"]
    types = ["Residential", "Condo", "Multi-Family"]
    rows = []
    for i in range(986):
        rows.append(
            {
                "street": f"{1000 + i * 7 % 8999} OAK ST UNIT {i}",
                "city": cities[i % len(cities)],
                "zip": str(95600 + i % 300),
                "state": "CA",
                "beds": str(rng.randint(1, 5)),
                "baths": str(rng.randint(1, 3)),
                "sq__ft": str(rng.randint(500, 4000)),
                "type": types[i % len(types)],
                "sale_date": f"Mon May {1 + i % 28:d} 00:00:00 EDT 2008",
                "price": str(rng.randint(40000, 900000)),
                "latitude": f"{38.4 + (i % 100) / 1000:.6f}",
                "longitude": f"{-121.4 - (i % 100) / 1000:.6f}",
            }
        )
    # plant dupes ON THE HASH KEYS (other columns may differ — only the
    # five hash columns define identity, like the golden fixture)
    for first, dupes in ((341, (342, 984)), (403, (404,)), (600, (601,))):
        for d in dupes:
            for k in RE_HASH_KEYS:
                rows[d][k] = rows[first][k]
    df = pd.DataFrame(rows, columns=RE_COLUMNS)
    table = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(table, path, row_group_size=2048)
    return table


# ---------------------------------------------------------------------------
# F1: code_files — north-rule input (repo, path, commit, lang, content)
# with planted exact dupes, near-dup clone families (sidecar
# truth_family), and containment clones.
# ---------------------------------------------------------------------------

_LANGS = ["python", "java", "kotlin", "js", "go", "c"]
_KEYWORDS = [
    "load", "parse", "merge", "flush", "index", "scan", "emit", "pack",
    "route", "split", "fold", "score", "batch", "token", "shard", "probe",
]


def _synth_function(rng: random.Random, ident_seed: int, n_lines: int) -> str:
    r = random.Random(ident_seed)
    name = f"{r.choice(_KEYWORDS)}_{r.choice(_KEYWORDS)}_{r.randint(0, 99)}"
    args = ", ".join(f"{r.choice(_KEYWORDS)}{i}" for i in range(r.randint(1, 4)))
    lines = [f"def {name}({args}):"]
    for i in range(n_lines):
        v = r.choice(_KEYWORDS)
        w = r.choice(_KEYWORDS)
        op = r.choice(["+", "-", "*", "%", "|"])
        lines.append(f"    {v}_{i} = {w}_{max(0, i - 1)} {op} {r.randint(1, 1000)}")
        if r.random() < 0.2:
            lines.append(f"    if {v}_{i} > {r.randint(10, 500)}:")
            lines.append(f"        return {v}_{i}")
    lines.append(f"    return {r.choice(_KEYWORDS)}_{max(0, n_lines - 1)}")
    return "\n".join(lines)


def _mutate(rng: random.Random, text: str) -> str:
    """Near-dup edit: comment insertions, identifier rename, small
    line edits — keeps Jaccard high."""
    lines = text.split("\n")
    r = rng
    # rename one identifier corpus-wide
    old = r.choice(_KEYWORDS)
    new = f"{old}x"
    lines = [ln.replace(f"{old}_", f"{new}_") for ln in lines]
    # insert a couple of comment lines
    for _ in range(r.randint(1, 3)):
        pos = r.randint(1, max(1, len(lines) - 1))
        lines.insert(pos, f"    # note {r.randint(0, 9999)}")
    # drop one interior line sometimes
    if r.random() < 0.5 and len(lines) > 6:
        del lines[r.randint(2, len(lines) - 2)]
    return "\n".join(lines)


def make_code_files(path: str, n_rows: int = 2000, seed: int = 42) -> pa.Table:
    rng = random.Random(seed)
    rows = []
    family_id = 0
    i = 0
    while len(rows) < n_rows:
        base = _synth_function(rng, rng.randint(0, 2**31), rng.randint(8, 40))
        kind = rng.random()
        repo = f"org{rng.randint(0, 20)}/repo{rng.randint(0, int(1 + 30 / (1 + i % 7)))}"
        common = dict(
            repo=repo,
            commit=hashlib.sha1(str(rng.random()).encode()).hexdigest(),
            lang=rng.choice(_LANGS),
        )
        if kind < 0.05 and rows:  # exact duplicate of an earlier row
            src = rows[rng.randrange(len(rows))]
            rows.append(
                {**common, "path": f"vendored/{len(rows)}.py",
                 "content": src["content"], "truth_family": src["truth_family"]}
            )
        elif kind < 0.15:  # near-dup clone family of 2-5 members
            family_id += 1
            fam = family_id
            members = rng.randint(2, 5)
            rows.append({**common, "path": f"src/f{len(rows)}.py",
                         "content": base, "truth_family": fam})
            cur = base
            for m in range(members - 1):
                if len(rows) >= n_rows:
                    break
                cur = _mutate(rng, cur)
                rows.append(
                    {**common, "path": f"src/f{len(rows)}_v{m}.py",
                     "content": cur, "truth_family": fam}
                )
        elif kind < 0.17 and rows:  # containment clone
            src = rows[rng.randrange(len(rows))]
            wrapper = base + "\n\n" + src["content"] + "\n"
            rows.append({**common, "path": f"bundle/b{len(rows)}.py",
                         "content": wrapper, "truth_family": 0})
        else:
            rows.append({**common, "path": f"src/m{len(rows)}.py",
                         "content": base, "truth_family": 0})
        i += 1
    df = pd.DataFrame(rows[:n_rows])
    table = pa.Table.from_pandas(
        df[["repo", "path", "commit", "lang", "content", "truth_family"]],
        preserve_index=False,
    )
    table = table.set_column(
        table.column_names.index("content"),
        pa.field("content", pa.large_string()),
        table["content"].cast(pa.large_string()),
    )
    pq.write_table(table, path, row_group_size=2048)
    return table


# ---------------------------------------------------------------------------
# F3: tracks_nullable — null-handling table (chinook tracks shape)
# ---------------------------------------------------------------------------

def make_tracks(path: str, n_rows: int = 500) -> pa.Table:
    rng = random.Random(7)
    df = pd.DataFrame(
        {
            "TrackId": np.arange(1, n_rows + 1, dtype=np.int64),
            "Name": [f"Track {i}" for i in range(n_rows)],
            "AlbumId": pd.array(
                [None if i % 11 == 0 else i % 40 for i in range(n_rows)],
                dtype="Int64",
            ),
            "MediaTypeId": np.int64(1) + np.arange(n_rows) % 3,
            "GenreId": pd.array(
                [None if i % 13 == 0 else i % 20 for i in range(n_rows)],
                dtype="Int64",
            ),
            "Composer": [
                None if i == 1 else f"Composer {i % 30}" for i in range(n_rows)
            ],
            "Milliseconds": np.array(
                [rng.randint(60000, 600000) for _ in range(n_rows)], dtype=np.int64
            ),
            "Bytes": np.array(
                [rng.randint(10**6, 10**7) for _ in range(n_rows)], dtype=np.int64
            ),
            "UnitPrice": np.full(n_rows, 0.99),
        }
    )
    table = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(table, path, row_group_size=2048)
    return table
