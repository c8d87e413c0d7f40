"""End-to-end curation pipeline (pipelines/curate.py): planted corpus
exercising every stage, stage counts, resume skip, and artifact reads."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deduper_ray.config import NearDupConfig
from deduper_ray.pipelines.curate import CurateConfig, run_curation

GOOD = (
    "The quick brown fox jumps over the lazy dog and then the dog "
    "naps in the warm afternoon sun for a while longer."
)
GOOD2 = (
    "A different document about the weather and the tides, written "
    "with enough words that the gate accepts it happily."
)
NEAR_A = (
    "Common prefix sentence shared by the near duplicate family with "
    "the same long tail of words repeated here exactly once ALPHA."
)
NEAR_B = (
    "Common prefix sentence shared by the near duplicate family with "
    "the same long tail of words repeated here exactly once BRAVO."
)


@pytest.fixture()
def corpus(tmp_path):
    rows = [
        GOOD,                      # 0 keeper
        GOOD,                      # 1 exact dup of 0
        # 2: normalized dup of 0 (case change on a non-stopword +
        # doubled whitespace + padding — survives the stopword gate)
        "  " + GOOD.replace("quick", "QUICK").replace(" ", "  ") + " ",
        GOOD2,                     # 3 keeper
        "short",                   # 4 gated: too short
        "x" * 80,                  # 5 gated: no stopwords
        GOOD2 + " CONTAMINATED_BENCHMARK_SNIPPET trailing",  # 6 decontam
        NEAR_A,                    # 7 near-dup keeper
        NEAR_B,                    # 8 near-dup of 7
    ]
    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({"text": rows}), str(src)
    )
    return str(src)


def _cfg() -> CurateConfig:
    return CurateConfig(
        min_chars=20,
        benchmark_grams=("CONTAMINATED_BENCHMARK_SNIPPET",),
        neardup=NearDupConfig(
            text_column="text", shingle_k=8, num_perms=128, bands=32,
            threshold=0.7, verify_mode="exact",
        ),
    )


def test_curation_end_to_end(tmp_path, corpus):
    out = str(tmp_path / "run")
    res = run_curation(corpus, out, _cfg(), resume=False)
    assert res.n_input == 9
    assert res.n_gated == 7       # drops 4 (short) and 5 (no stopwords)
    assert res.n_decontaminated == 6  # drops 6 (benchmark gram)
    assert res.n_exact_unique == 4    # 0 keeps; 1,2 collapse onto 0
    assert res.n_after_neardup == 3   # 8 collapses onto 7
    final = res.curated().to_pandas().sort_values("row_id")
    assert final["row_id"].tolist() == [0, 3, 7]
    assert "n_tokens" in final.columns and "fingerprint" in final.columns
    # checkpoints on disk
    for stage in ("gated", "decontaminated", "exact", "curated"):
        assert os.path.isdir(os.path.join(out, stage)), stage


def test_curation_resume_skips_stages(tmp_path, corpus):
    out = str(tmp_path / "run")
    first = run_curation(corpus, out, _cfg(), resume=True)
    again = run_curation(corpus, out, _cfg(), resume=True)
    assert "gated" in again.stages_skipped
    assert "decontaminated" in again.stages_skipped
    assert "exact" in again.stages_skipped
    assert again.n_after_neardup == first.n_after_neardup
    assert (
        again.curated().to_pandas().sort_values("row_id")["row_id"].tolist()
        == [0, 3, 7]
    )


def test_curation_minimal_config_skips_optional_stages(tmp_path, corpus):
    out = str(tmp_path / "run_min")
    res = run_curation(
        corpus, out, CurateConfig(min_chars=20), resume=False
    )
    # no decontam / no near-dup: 7 gated, exact collapses 1,2 → 5 rows
    assert res.n_gated == 7
    assert res.n_decontaminated == 7
    assert res.n_exact_unique == 5
    assert res.n_after_neardup == 5
