"""Full-pipeline equivalence of the scale backends: the no-broadcast
verify and the distributed clustering must reproduce the default
pipeline's clusters exactly."""

import pytest

from deduper_ray.config import NearDupConfig
from deduper_ray.pipelines.neardup import run_neardup
from tests.fixtures import make_code_files

N = 900


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("sb")
    path = str(d / "c.parquet")
    make_code_files(path, n_rows=N, seed=17)
    return path


def _clusters(path, tmp_path_factory, **overrides):
    cfg = NearDupConfig(
        shingle_k=8, num_perms=128, bands=21, threshold=0.65, **overrides
    )
    out = str(tmp_path_factory.mktemp("out"))
    r = run_neardup(path, out, cfg, resume=False)
    cl = r.clusters().to_pandas().sort_values("row_id")
    return dict(zip(cl["row_id"], cl["cluster_id"]))


def test_backends_reproduce_default_clusters(corpus, tmp_path_factory):
    base = _clusters(corpus, tmp_path_factory)
    assert len(base) > 100
    copart = _clusters(
        corpus, tmp_path_factory, verify_backend="copartition"
    )
    assert copart == base
    labelprop = _clusters(
        corpus, tmp_path_factory, cluster_backend="labelprop"
    )
    assert labelprop == base
    # auto-switch forced both ways: budget 0 → labelprop route,
    # huge budget → unionfind route; both must match the default
    auto_lp = _clusters(
        corpus, tmp_path_factory,
        cluster_backend="auto", cluster_edge_budget=0,
    )
    assert auto_lp == base
    auto_uf = _clusters(
        corpus, tmp_path_factory,
        cluster_backend="auto", cluster_edge_budget=1 << 40,
    )
    assert auto_uf == base


def test_late_dedup_path_matches_collect(tmp_path, monkeypatch):
    """Forcing the late-dedup resolution (raw pairs → verify →
    post-verify distinct) must produce the same verified pair set and
    clusters as the driver-collect path."""
    import pandas as pd

    import deduper_ray.pipelines.neardup as nd
    from deduper_ray.config import NearDupConfig
    from deduper_ray.sources.synth import make_code_files

    src = str(tmp_path / "files.parquet")
    make_code_files(src, n_rows=3000, seed=9)
    cfg = NearDupConfig(
        text_column="content", shingle_k=8, num_perms=64, bands=16,
        threshold=0.7, batch_size=256,
    )
    r1 = nd.run_neardup(src, str(tmp_path / "a"), cfg, resume=False)
    monkeypatch.setattr(nd, "LATE_DEDUP_THRESHOLD", 0)
    r2 = nd.run_neardup(src, str(tmp_path / "b"), cfg, resume=False)
    assert r1.n_verified_pairs == r2.n_verified_pairs
    assert r1.n_clusters == r2.n_clusters
    p1 = (
        r1.pairs().to_pandas()[["id_a", "id_b"]]
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    p2 = (
        r2.pairs().to_pandas()[["id_a", "id_b"]]
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(p1, p2)


def test_verify_auto_routes_on_store_budget(corpus, tmp_path_factory):
    """The DEFAULT verify_backend='auto' must route on the estimated
    signature-store footprint: an over-budget store goes copartition
    (no O(corpus) broadcast), an in-budget store goes broadcast —
    with identical pairs + clusters either way."""
    from deduper_ray.pipelines.neardup import run_neardup

    def _run(**overrides):
        cfg = NearDupConfig(
            shingle_k=8, num_perms=128, bands=21, threshold=0.65,
            **overrides,
        )
        out = str(tmp_path_factory.mktemp("auto"))
        return run_neardup(corpus, out, cfg, resume=False)

    lo = _run(verify_store_budget_bytes=0)
    assert lo.counters["verify_backend_resolved"] == "copartition"
    hi = _run(verify_store_budget_bytes=1 << 40)
    assert hi.counters["verify_backend_resolved"] == "broadcast"
    # the estimate uses the real store layout: K·4 + 24 bytes per doc
    assert hi.counters["verify_store_est_bytes"] == N * (128 * 4 + 24)

    def _pairs(r):
        return sorted(
            map(tuple, r.pairs().to_pandas()[["id_a", "id_b"]].values)
        )

    assert _pairs(lo) == _pairs(hi)
    lo_cl = lo.clusters().to_pandas().sort_values("row_id")
    hi_cl = hi.clusters().to_pandas().sort_values("row_id")
    assert dict(zip(lo_cl["row_id"], lo_cl["cluster_id"])) == dict(
        zip(hi_cl["row_id"], hi_cl["cluster_id"])
    )


def test_verify_backend_typo_raises(corpus, tmp_path_factory):
    from deduper_ray.pipelines.neardup import run_neardup

    cfg = NearDupConfig(verify_backend="brodcast")
    with pytest.raises(ValueError, match="verify_backend"):
        run_neardup(
            corpus, str(tmp_path_factory.mktemp("bad")), cfg, resume=False
        )
