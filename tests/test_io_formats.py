"""JSONL and ORC source/sink tests: deterministic ordinals, byte-range
splitting correctness, round trips, and end-to-end dedupe over a JSONL
source through the read_table dispatch."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from deduper_ray.sources.jsonl_io import (
    read_jsonl_with_row_ids,
    write_jsonl_sink,
)
from deduper_ray.sources.orc_io import HAVE_ORC


def _write_jsonl(path: str, rows: list[dict], trailing_newline=True) -> None:
    with open(path, "w", encoding="utf-8") as f:
        payload = "\n".join(json.dumps(r) for r in rows)
        f.write(payload + ("\n" if trailing_newline else ""))


@pytest.fixture()
def jsonl_corpus(tmp_path):
    rows_a = [
        {"k": i, "txt": f"row {i} " + "x" * (i % 17)} for i in range(57)
    ]
    rows_b = [{"k": 100 + i, "txt": f"second file {i}"} for i in range(13)]
    pa_ = tmp_path / "a.jsonl"
    pb_ = tmp_path / "b.jsonl"
    _write_jsonl(str(pa_), rows_a)
    # second file WITHOUT trailing newline (last-line edge)
    _write_jsonl(str(pb_), rows_b, trailing_newline=False)
    return str(tmp_path), rows_a + rows_b


def test_jsonl_range_split_matches_single_chunk(jsonl_corpus):
    src, rows = jsonl_corpus
    tiny = (
        read_jsonl_with_row_ids(src, chunk_bytes=64)
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    big = (
        read_jsonl_with_row_ids(src, chunk_bytes=1 << 30)
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    assert tiny.equals(big)
    assert len(tiny) == len(rows)
    # ordinal = global line index over the sorted file list
    assert tiny["row_id"].tolist() == list(range(len(rows)))
    assert tiny["k"].tolist() == [r["k"] for r in rows]
    assert tiny["txt"].tolist() == [r["txt"] for r in rows]


def test_jsonl_column_pruning(jsonl_corpus):
    src, rows = jsonl_corpus
    ds = read_jsonl_with_row_ids(src, columns=["k"], chunk_bytes=128)
    assert set(ds.schema().names) == {"k", "row_id"}
    assert ds.count() == len(rows)


def test_jsonl_sink_roundtrip(tmp_path, jsonl_corpus):
    src, rows = jsonl_corpus
    ds = read_jsonl_with_row_ids(src)
    out = str(tmp_path / "out")
    n = write_jsonl_sink(ds.drop_columns(["row_id"]), out)
    assert n == len(rows)
    back = read_jsonl_with_row_ids(out).to_pandas()
    assert sorted(back["k"].tolist()) == sorted(r["k"] for r in rows)


def test_dedupe_over_jsonl_source(tmp_path):
    """read_table dispatches .jsonl → the full dedupe pipeline runs."""
    from deduper_ray.config import DedupeConfig
    from deduper_ray.pipelines.exact_dedupe import dedupe

    rows = [{"name": f"n{i % 7}", "city": f"c{i % 3}"} for i in range(21)]
    src = tmp_path / "recs.jsonl"
    _write_jsonl(str(src), rows)
    target = str(tmp_path / "target")
    report = dedupe(
        DedupeConfig(source=str(src), target_path=target)
    )
    # 21 rows, (name, city) has lcm(7,3)=21 → all distinct... use name only
    assert report.record_count == 21
    cfg2 = DedupeConfig(
        source=str(src), hash_keys=("name",),
        target_path=str(tmp_path / "t2"),
    )
    rep2 = dedupe(cfg2)
    assert rep2.record_count == 21
    assert rep2.hash_count == 7
    assert rep2.dupe_count == 14
    import pyarrow.parquet as pq

    files = [
        os.path.join(str(tmp_path / "t2"), f)
        for f in os.listdir(str(tmp_path / "t2"))
        if f.endswith(".parquet")
    ]
    kept = pa.concat_tables([pq.read_table(f) for f in files])
    # keepers are the first 7 rows (row_id 0..6)
    assert sorted(kept["row_id"].to_pylist()) == list(range(7))


def test_jsonl_malformed_blank_line_raises(tmp_path):
    """Blank lines violate the well-formed-NDJSON contract; the
    count-vs-parse reconciliation guard must fail loudly, not silently
    shift ordinals."""
    p = tmp_path / "bad.jsonl"
    p.write_text('{"k": 1}\n\n{"k": 2}\n')
    with pytest.raises((RuntimeError, Exception)) as ei:
        read_jsonl_with_row_ids(str(p)).materialize()
    assert "counted" in str(ei.value) or "Empty" in str(
        ei.value
    ) or "JSON" in str(ei.value)


@pytest.mark.skipif(not HAVE_ORC, reason="pyarrow built without ORC")
def test_orc_roundtrip_and_ordinals(tmp_path):
    import pyarrow.orc as paorc

    from deduper_ray.sources.orc_io import (
        read_orc_with_row_ids,
        write_orc_sink,
    )

    t1 = pa.table({"a": list(range(10)), "b": [f"s{i}" for i in range(10)]})
    t2 = pa.table({"a": list(range(10, 16)), "b": [f"s{i}" for i in range(10, 16)]})
    paorc.write_table(t1, str(tmp_path / "p1.orc"))
    paorc.write_table(t2, str(tmp_path / "p2.orc"))
    df = (
        read_orc_with_row_ids(str(tmp_path))
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    assert df["row_id"].tolist() == list(range(16))
    assert df["a"].tolist() == list(range(16))
    # pruning
    ds = read_orc_with_row_ids(str(tmp_path), columns=["b"])
    assert set(ds.schema().names) == {"b", "row_id"}
    # sink round trip
    out = str(tmp_path / "out")
    n = write_orc_sink(rd.from_arrow(t1), out)
    assert n == 10
    back = read_orc_with_row_ids(out).to_pandas()
    assert sorted(back["a"].tolist()) == list(range(10))


@pytest.mark.skipif(not HAVE_ORC, reason="pyarrow built without ORC")
def test_dedupe_over_orc_source(tmp_path):
    import pyarrow.orc as paorc

    from deduper_ray.config import DedupeConfig
    from deduper_ray.pipelines.exact_dedupe import dedupe

    t = pa.table(
        {
            "name": [f"n{i % 5}" for i in range(20)],
            "val": list(range(20)),
        }
    )
    paorc.write_table(t, str(tmp_path / "recs.orc"))
    rep = dedupe(
        DedupeConfig(
            source=str(tmp_path / "recs.orc"), hash_keys=("name",),
            target_path=str(tmp_path / "t"),
        )
    )
    assert rep.record_count == 20
    assert rep.hash_count == 5
    assert rep.dupe_count == 15
