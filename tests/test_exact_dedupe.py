"""Reference-conformance e2e tests for the exact-dedup pipeline —
pytest port of the reference golden suite (DeduperTest.kt:119-497;
strategy per SURVEY.md §5.2).
"""

import hashlib
import json
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from deduper_ray.config import DedupeConfig
from deduper_ray.pipelines.exact_dedupe import dedupe, sample_hash
from tests.fixtures import RE_HASH_KEYS, make_real_estate, make_tracks


@pytest.fixture(scope="module")
def real_estate(tmp_path_factory):
    d = tmp_path_factory.mktemp("re")
    path = str(d / "real_estate.parquet")
    table = make_real_estate(path)
    return path, table


def _md5_key(table, row, keys=RE_HASH_KEYS):
    s = ", ".join(table[k][row].as_py() for k in keys)
    return hashlib.md5(s.encode()).hexdigest().upper()


def test_golden_report(real_estate, tmp_path):
    # reference golden: recordCount=986, dupeCount=4, distinctDupeCount=3,
    # hashCount=982 (DeduperTest.kt:47-55)
    path, table = real_estate
    cfg = DedupeConfig(
        source=path,
        hash_keys=RE_HASH_KEYS,
        target_path=str(tmp_path / "target"),
        dupes_path=str(tmp_path / "dupes"),
        hashes_path=str(tmp_path / "hashes"),
    )
    report = dedupe(cfg)
    assert report.record_count == 986
    assert report.dupe_count == 4
    assert report.distinct_dupe_count == 3
    assert report.hash_count == 982
    assert report.success
    assert report.hash_columns == list(RE_HASH_KEYS)
    assert report.columns_found == table.column_names

    # group structure: first 341 → [342, 984]; 403 → [404]; 600 → [601]
    h341 = _md5_key(table, 341)
    assert report.dupes[h341].first_found_row_number == 341
    assert report.dupes[h341].row_ids == [342, 984]
    h403 = _md5_key(table, 403)
    assert report.dupes[h403].row_ids == [404]
    assert report.dupes[h403].first_found_row_number == 403
    h600 = _md5_key(table, 600)
    assert report.dupes[h600].row_ids == [601]

    # dupe_values = JSON of the FIRST duplicate occurrence (row 342 for
    # the 341-group; reference Deduper.kt:230)
    vals = json.loads(report.dupes[h341].dupe_values_json)
    assert vals["street"] == table["street"][342].as_py()

    # sink artifacts (reference output verification, DeduperTest.kt:140-171)
    target = pq.read_table(cfg.target_path)
    assert target.num_rows == 982
    kept_ids = set(target["row_id"].to_pylist())
    assert {342, 404, 601, 984}.isdisjoint(kept_ids)
    assert {341, 403, 600}.issubset(kept_ids)

    dupes = pq.read_table(cfg.dupes_path)
    assert dupes.num_rows == 3
    by_hash = {dupes["hash"][i].as_py(): i for i in range(3)}
    assert json.loads(dupes["row_ids"][by_hash[h341]].as_py()) == [342, 984]

    hashes = pq.read_table(cfg.hashes_path)
    assert hashes.num_rows == 982
    assert len(set(hashes["hash"].to_pylist())) == 982


def test_target_only(real_estate, tmp_path):
    # reference targetOnly test (DeduperTest.kt:264)
    path, _ = real_estate
    report = dedupe(
        DedupeConfig(source=path, hash_keys=RE_HASH_KEYS,
                     target_path=str(tmp_path / "t"))
    )
    assert report.dupe_count == 4
    assert pq.read_table(str(tmp_path / "t")).num_rows == 982


def test_no_sinks(real_estate):
    # reference withoutTargetAndDupe (DeduperTest.kt:282): report only
    path, _ = real_estate
    report = dedupe(DedupeConfig(source=path, hash_keys=RE_HASH_KEYS))
    assert report.record_count == 986
    assert report.hash_count == 982


def test_all_columns_hash_with_nulls(tmp_path):
    # reference nullsInSource (DeduperTest.kt:353-392): empty hash-key
    # set → all columns; nulls present; all rows unique
    path = str(tmp_path / "tracks.parquet")
    make_tracks(path, n_rows=500)
    report = dedupe(DedupeConfig(source=path))
    assert report.record_count == 500
    assert report.dupe_count == 0
    assert report.hash_count == 500
    assert report.columns_found[0] == "TrackId"


def test_seen_hashes_incremental(real_estate, tmp_path):
    # reference sourceHashTable (DeduperTest.kt:393-413): preloaded
    # hashes make EVERY row a dupe with first_found_row_number = 0
    path, _ = real_estate
    hashes_dir = str(tmp_path / "hashes")
    dedupe(
        DedupeConfig(source=path, hash_keys=RE_HASH_KEYS, hashes_path=hashes_dir)
    )
    report = dedupe(
        DedupeConfig(
            source=path,
            hash_keys=RE_HASH_KEYS,
            seen_hashes=hashes_dir,
            target_path=str(tmp_path / "t2"),
        )
    )
    assert report.record_count == 986
    assert report.dupe_count == 986  # every row is a dupe
    assert report.distinct_dupe_count == 982
    assert report.hash_count == 982  # preload-inclusive (DeduperTest.kt:408)
    assert all(
        g.first_found_row_number == 0 for g in report.dupes.values()
    )
    t2 = str(tmp_path / "t2")
    files = [f for f in os.listdir(t2) if f.endswith(".parquet")]
    assert sum(pq.read_table(os.path.join(t2, f)).num_rows for f in files) == 0


def test_sample_hash(real_estate):
    # reference getSampleHash (Deduper.kt:407-421)
    path, table = real_estate
    s, h = sample_hash(DedupeConfig(source=path, hash_keys=RE_HASH_KEYS))
    expect = ", ".join(table[k][0].as_py() for k in RE_HASH_KEYS)
    assert s == expect
    assert h == hashlib.md5(expect.encode()).hexdigest().upper()


def test_bad_source_raises():
    # reference failure test (DeduperTest.kt:466-481) — we raise rather
    # than return success=false (explicit improvement; documented)
    with pytest.raises(FileNotFoundError):
        dedupe(DedupeConfig(source="/tmp/definitely/not/here/*.parquet"))


def test_sha256_invariant(real_estate, tmp_path):
    # BASELINE.json input_hint: per-row content sha256 equality — the
    # target's surviving rows carry byte-identical payloads
    path, table = real_estate
    cfg = DedupeConfig(
        source=path, hash_keys=RE_HASH_KEYS, target_path=str(tmp_path / "t")
    )
    dedupe(cfg)
    out = pq.read_table(cfg.target_path).sort_by("row_id")
    for rid, street in zip(
        out["row_id"].to_pylist()[:25], out["street"].to_pylist()[:25]
    ):
        assert street == table["street"][rid].as_py()


def test_edge_empty_single_and_alldup(tmp_path):
    """r3 edge sweep: empty source, single row, and 100%-dup corpora
    through the full dedupe() with sinks + reconciliation."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduper_ray.config import DedupeConfig
    from deduper_ray.pipelines.exact_dedupe import dedupe

    # single row
    p1 = str(tmp_path / "one.parquet")
    pq.write_table(pa.table({"a": ["x"], "b": [1]}), p1)
    r = dedupe(DedupeConfig(source=p1, target_path=str(tmp_path / "t1"),
                            hashes_path=str(tmp_path / "h1")))
    assert (r.record_count, r.dupe_count, r.hash_count) == (1, 0, 1)

    # all rows identical: one keeper, n-1 dupes
    p2 = str(tmp_path / "same.parquet")
    pq.write_table(pa.table({"a": ["x"] * 50, "b": [7] * 50}), p2)
    r2 = dedupe(DedupeConfig(source=p2, target_path=str(tmp_path / "t2"),
                             dupes_path=str(tmp_path / "d2")))
    assert (r2.record_count, r2.dupe_count, r2.distinct_dupe_count,
            r2.hash_count) == (50, 49, 1, 1)
    tgt = pq.read_table(str(tmp_path / "t2"))
    assert tgt.num_rows == 1 and tgt["row_id"][0].as_py() == 0

    # empty source (schema preserved, zero rows everywhere)
    p3 = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.int64())}), p3)
    r3 = dedupe(DedupeConfig(source=p3, target_path=str(tmp_path / "t3"),
                             hashes_path=str(tmp_path / "h3")))
    assert (r3.record_count, r3.dupe_count, r3.hash_count) == (0, 0, 0)
