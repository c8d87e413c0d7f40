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
