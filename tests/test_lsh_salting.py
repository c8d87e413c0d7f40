"""Count-then-salt hot-LSH-bucket guard (stages/lsh.py
salt_hot_buckets): bounded sorted-run sizes, clustering unchanged."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from deduper_ray.stages.lsh import (
    candidate_pairs,
    collect_candidate_pairs,
    salt_hot_buckets,
)
from deduper_ray.stages.minhash import MinHashSigner
from deduper_ray.state.unionfind import UnionFind


def _boilerplate_corpus(n: int = 4000):
    """One shared boilerplate prefix × n docs with tiny unique tails —
    most band keys collide across the WHOLE corpus (the adversarial
    skew case), while full signatures differ."""
    base = (
        "def main():\n    parser = argparse.ArgumentParser()\n"
        "    parser.add_argument('--input')\n    args = parser.parse_args()\n"
        * 4
    )
    texts = [base + f"# unique tail {i}\n" for i in range(n)]
    return rd.from_arrow(
        pa.table(
            {
                "row_id": pa.array(range(n), type=pa.int64()),
                "content": texts,
            }
        )
    )


def _signatures(ds):
    return ds.map_batches(
        MinHashSigner,
        fn_constructor_kwargs={
            "num_perms": 64, "shingle_k": 8, "id_column": "row_id",
        },
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).materialize()


def _bucket_sizes(exploded) -> np.ndarray:
    from ray.data.aggregate import Count

    out = (
        exploded.groupby("band_key")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return out["n"].to_numpy()


def _clusters_from_pairs(tbl) -> dict[int, int]:
    uf = UnionFind()
    uf.union_arrays(
        tbl["id_a"].to_numpy(zero_copy_only=False),
        tbl["id_b"].to_numpy(zero_copy_only=False),
    )
    return uf.components()


def test_salting_bounds_buckets_and_preserves_clusters():
    n, threshold = 4000, 256
    sigs = _signatures(_boilerplate_corpus(n))
    from deduper_ray.stages.lsh import BandExploder

    exploded = sigs.map_batches(
        BandExploder(bands=16, id_column="row_id"), batch_format="pyarrow"
    ).materialize()
    raw_max = _bucket_sizes(exploded).max()
    assert raw_max > threshold  # the corpus IS adversarial

    salted, n_hot = salt_hot_buckets(exploded, hot_threshold=threshold)
    assert n_hot > 0
    salted_max = _bucket_sizes(salted).max()
    # sub-bucket = 2 salt classes of ≤ ceil(g/S) rows each (+ slack for
    # modulo imbalance)
    assert salted_max <= 3 * threshold
    assert salted_max < raw_max

    # clustering equivalence: same connected components either way
    unsalted_pairs, _ = collect_candidate_pairs(
        candidate_pairs(
            sigs, bands=16, max_pairs_per_bucket=500,
            hot_bucket_threshold=None,
        ),
        max_pairs_per_bucket=500,
    )
    salted_pairs, _ = collect_candidate_pairs(
        candidate_pairs(
            sigs, bands=16, max_pairs_per_bucket=500,
            hot_bucket_threshold=threshold,
        ),
        max_pairs_per_bucket=500,
    )
    cu = _clusters_from_pairs(unsalted_pairs)
    cs = _clusters_from_pairs(salted_pairs)
    # salted: every doc lands in a bounded sub-bucket, the chain copies
    # keep sub-buckets connected → ONE full cluster of all n docs
    assert set(cs) == set(range(n))
    assert len(set(cs.values())) == 1
    # unsalted: the pair cap's chain budget (500) cannot even touch a
    # 4000-doc bucket's tail — salting strictly improves coverage
    assert set(cu) <= set(cs)
    assert len(cu) < n


def test_default_pipeline_salts_boilerplate(tmp_path):
    """The DEFAULT NearDupConfig (hot_bucket_threshold on) keeps the
    one-boilerplate-string corpus fully connected through run_neardup:
    salting (not the lossy pair cap) is the active guard, so all docs
    land in ONE cluster even though the cap alone could never chain a
    corpus-sized bucket."""
    import pyarrow.parquet as pq

    from deduper_ray.config import NearDupConfig
    from deduper_ray.pipelines.neardup import run_neardup

    n = 4000
    base = (
        "def main():\n    parser = argparse.ArgumentParser()\n"
        "    parser.add_argument('--input')\n    args = parser.parse_args()\n"
        * 4
    )
    src = str(tmp_path / "boiler.parquet")
    pq.write_table(
        pa.table(
            {
                "row_id": pa.array(range(n), type=pa.int64()),
                "content": [base + f"# unique tail {i}\n" for i in range(n)],
            }
        ),
        src,
    )
    cfg = NearDupConfig(
        num_perms=64, bands=16, threshold=0.7,
        max_pairs_per_bucket=500, hot_bucket_threshold=256,
    )
    assert NearDupConfig().hot_bucket_threshold is not None  # default ON
    r = run_neardup(src, str(tmp_path / "out"), cfg, resume=False)
    assert r.n_clusters == 1
    assert r.n_clustered_docs == n
    # same cfg with the guard disabled loses docs to the pair cap
    off = NearDupConfig(
        num_perms=64, bands=16, threshold=0.7,
        max_pairs_per_bucket=500, hot_bucket_threshold=None,
    )
    r_off = run_neardup(src, str(tmp_path / "out_off"), off, resume=False)
    assert r_off.n_clustered_docs < n


def test_salting_noop_without_hot_buckets():
    import random

    rnd = random.Random(3)
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    texts = [
        "".join(rnd.choice(alphabet) for _ in range(300)) for _ in range(200)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "row_id": pa.array(range(200), type=pa.int64()),
                "content": texts,
            }
        )
    )
    sigs = _signatures(ds)
    from deduper_ray.stages.lsh import BandExploder

    exploded = sigs.map_batches(
        BandExploder(bands=16, id_column="row_id"), batch_format="pyarrow"
    ).materialize()
    salted, n_hot = salt_hot_buckets(exploded, hot_threshold=1024)
    assert n_hot == 0
    assert salted.count() == exploded.count()
