"""dupes_detail='summary': distributed dupes sink, no driver dupeMap;
plus checkpoint invalidation on minhash_scheme change."""

import pyarrow.parquet as pq
import pytest

from deduper_ray.config import DedupeConfig, NearDupConfig
from deduper_ray.pipelines.exact_dedupe import dedupe
from deduper_ray.pipelines.neardup import run_neardup
from tests.fixtures import RE_HASH_KEYS, make_code_files, make_real_estate


def test_summary_dupes_sink(tmp_path):
    src = str(tmp_path / "re.parquet")
    make_real_estate(src)
    cfg = DedupeConfig(
        source=src, hash_keys=RE_HASH_KEYS,
        target_path=str(tmp_path / "t"),
        dupes_path=str(tmp_path / "d"),
        dedupe_strategy="shuffle",
        dupes_detail="summary",
    )
    report = dedupe(cfg)
    assert report.dupe_count == 4
    assert report.distinct_dupe_count == 3
    assert report.dupes == {}  # summary mode: no driver dupe map
    d = pq.read_table(cfg.dupes_path).sort_by("first_found_row_number")
    assert d.num_rows == 3
    assert d["first_found_row_number"].to_pylist() == [341, 403, 600]
    assert d["dupe_count"].to_pylist() == [2, 1, 1]
    assert pq.read_table(cfg.target_path).num_rows == 982


def test_summary_requires_shuffle_for_target(tmp_path):
    src = str(tmp_path / "re.parquet")
    make_real_estate(src)
    with pytest.raises(ValueError, match="shuffle"):
        dedupe(
            DedupeConfig(
                source=src, hash_keys=RE_HASH_KEYS,
                target_path=str(tmp_path / "t"),
                dupes_detail="summary",
            )
        )


def test_scheme_change_invalidates_checkpoint(tmp_path):
    src = str(tmp_path / "c.parquet")
    make_code_files(src, n_rows=400, seed=9)
    out = str(tmp_path / "nd")
    r1 = run_neardup(src, out, NearDupConfig(minhash_scheme="oph"))
    assert r1.stages_skipped == []
    r2 = run_neardup(src, out, NearDupConfig(minhash_scheme="classic"))
    assert "signatures" not in r2.stages_skipped  # recomputed
    r3 = run_neardup(src, out, NearDupConfig(minhash_scheme="classic"))
    assert "signatures" in r3.stages_skipped  # now cached
