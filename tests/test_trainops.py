"""Training-data curation operators (round 2): PII redaction, token
heavy hitters, distributed grouped row_number / stratified sampling,
exact grouped quantiles."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from deduper_ray.functions.text import redact_pii
from deduper_ray.stages.relational import (
    grouped_quantiles,
    grouped_row_number,
    stratified_sample,
    token_heavy_hitters,
)


def test_redact_pii_patterns():
    t = pa.table(
        {
            "text": [
                "write to bob.smith+x@mail.example.org today",
                "server at 192.168.0.1 responded",
                "call +1 (555) 010-1234 now",
                "no pii here",
                "a@b.co and 10.0.0.7 and 555 123 4567",
            ]
        }
    )
    out = redact_pii(t)["clean_text"].to_pylist()
    assert out[0] == "write to [EMAIL] today"
    assert out[1] == "server at [IP] responded"
    assert out[2] == "call [PHONE] now"
    assert out[3] == "no pii here"
    assert out[4] == "[EMAIL] and [IP] and [PHONE]"


def test_token_heavy_hitters_ties_and_counts():
    docs = ["b a a", "c b a", "d c b a", ""]
    ds = rd.from_arrow(pa.table({"text": docs})).repartition(3)
    out = token_heavy_hitters(ds, text_column="text", k=3).to_pandas()
    # counts: a=4 b=3 c=2 d=1; tie-break is lexicographic
    assert out["token"].tolist() == ["a", "b", "c"]
    assert out["cnt"].tolist() == [4, 3, 2]


def test_grouped_row_number_matches_pandas_across_blocks():
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.choice(list("abcde"), n),
            "o": rng.permutation(n),
            "payload": np.arange(n),
        }
    )
    ds = rd.from_pandas(df).repartition(13)
    got = (
        grouped_row_number(ds, key="k", order_col="o")
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    expect = df.sort_values(["k", "o"]).reset_index(drop=True)
    expect["rn"] = expect.groupby("k").cumcount() + 1
    pd.testing.assert_frame_equal(got[["k", "o", "payload", "rn"]], expect)


def test_stratified_sample_every_k_per_group():
    df = pd.DataFrame(
        {"lang": ["en"] * 20 + ["de"] * 7 + ["fr"] * 1,
         "doc_id": list(range(20)) + list(range(100, 107)) + [200]}
    )
    ds = rd.from_pandas(df).repartition(5)
    out = (
        stratified_sample(ds, key="lang", order_col="doc_id", every_k=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # en: ranks 1,6,11,16 → doc_ids 0,5,10,15; de: 100,105; fr: 200
    assert out["doc_id"].tolist() == [0, 5, 10, 15, 100, 105, 200]


def test_grouped_quantiles_percentile_disc_semantics():
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["p", "q", "r"], 4000),
            "v": rng.integers(0, 500, 4000),
        }
    )
    ds = rd.from_pandas(df).repartition(9)
    out = grouped_quantiles(
        ds, key="g", value_col="v", quantiles=[0.5, 0.95, 0.99]
    ).set_index("g")
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["v"].to_numpy())
        n = len(vals)
        assert out.loc[g, "n"] == n
        for q, col in [(0.5, "q50"), (0.95, "q95"), (0.99, "q99")]:
            assert out.loc[g, col] == vals[int(np.ceil(q * n)) - 1]


def test_chunk_dedupe_first_occurrence_wins():
    from deduper_ray.stages.chunkdedup import chunk_dedupe

    # 4-char chunks; doc 2 repeats doc 1's first chunk; doc 3 is doc 1
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["AAAABBBB", "AAAACCCC", "AAAABBBB"],
        }
    )
    ds = rd.from_pandas(docs).repartition(2)
    out = (
        chunk_dedupe(ds, chunk_chars=4, num_partitions=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["clean_text"].tolist() == ["AAAABBBB", "CCCC", ""]


def test_chunk_dedupe_tail_chunks_and_empty():
    from deduper_ray.stages.chunkdedup import chunk_dedupe

    docs = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["abcdefg", "efg", ""]}
    )
    out = (
        chunk_dedupe(
            rd.from_pandas(docs), chunk_chars=4, num_partitions=2
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc0 chunks: 'abcd','efg'; doc1 'efg' is a dupe of doc0's tail
    assert out["clean_text"].tolist() == ["abcdefg", "", ""]


def test_decontaminate_substring_and_flag():
    from deduper_ray.stages.decontam import decontaminate

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["the quick brown fox", "lazy dog sleeps", "quick brown"],
        }
    )
    ds = rd.from_pandas(docs)
    out = decontaminate(ds, ["quick brown"], mode="substring").to_pandas()
    assert sorted(out["doc_id"]) == [1]
    flagged = (
        decontaminate(ds, ["quick brown"], mode="substring", keep_flag="ok")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert flagged["ok"].tolist() == [False, True, False]


def test_decontaminate_ngram_hash_token_semantics():
    from deduper_ray.stages.decontam import decontaminate

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a b c d e f",      # contains gram 'b c d'
                "x b c dy e",       # 'b c dy' ≠ 'b c d' token-wise
                "b c",              # short doc, no 3-gram
                "q r s t",
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(2)
    out = decontaminate(
        ds, ["b c d"], mode="ngram_hash", ngram_n=3
    ).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]
    # short benchmark gram matches only whole short docs (documented)
    out2 = decontaminate(
        ds, ["b c"], mode="ngram_hash", ngram_n=3
    ).to_pandas()
    assert sorted(out2["doc_id"]) == [0, 1, 3]


def test_semantic_dedupe_matches_bruteforce_components():
    from deduper_ray.stages.ann import semantic_dedupe

    rng = np.random.default_rng(3)
    # 5 well-separated direction clusters of 8 near-identical vectors
    base = rng.normal(size=(5, 16))
    vecs, ids = [], []
    for c in range(5):
        for j in range(8):
            v = base[c] + rng.normal(scale=0.01, size=16)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            ids.append(c * 100 + j)
    df = pd.DataFrame({"vec_id": ids, "embedding": [list(v) for v in vecs]})
    ds = rd.from_pandas(df).repartition(4)
    out = (
        semantic_dedupe(ds, threshold=0.95, n_cells=1)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == 40
    # every member of cluster c maps to its min id c*100
    assert (out["rep_id"] == (out["vec_id"] // 100) * 100).all()
    # approximate mode (cells) still returns every id exactly once and
    # never maps across true clusters
    out2 = semantic_dedupe(ds, threshold=0.95, n_cells=4, sample_mod=1)
    got = out2.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert got["vec_id"].tolist() == sorted(ids)
    assert (got["rep_id"] // 100 == got["vec_id"] // 100).all()


def test_repetition_stats():
    from deduper_ray.functions.text import add_repetition_stats

    t = pa.table({"text": ["a a a b", "x y z", "", "q  q"]})
    out = add_repetition_stats(t)
    assert out["n_words"].to_pylist() == [4, 3, 0, 2]
    assert out["n_distinct_words"].to_pylist() == [2, 3, 0, 1]
    assert out["dup_word_ratio"].to_pylist() == [0.5, 0.0, 1.0, 0.5]
    assert out["top_word_ratio"].to_pylist() == [0.75, 1 / 3, 0.0, 1.0]


def test_grouped_row_number_bucket_backend_equivalence():
    rng = np.random.default_rng(17)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 200, n),      # high-cardinality int key
            "o": rng.permutation(n),
            "p": np.arange(n),
        }
    )
    ds = rd.from_pandas(df).repartition(7)
    a = (
        grouped_row_number(ds, key="k", order_col="o", backend="runscan")
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    b = (
        grouped_row_number(ds, key="k", order_col="o", backend="bucket")
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[["k", "o", "p", "rn"]],
                                  b[["k", "o", "p", "rn"]])
    # string keys route through the blake2b path
    df2 = df.assign(k=df["k"].map(lambda v: f"user-{v}"))
    ds2 = rd.from_pandas(df2).repartition(7)
    c = (
        grouped_row_number(ds2, key="k", order_col="o", backend="bucket")
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    expect = df2.sort_values(["k", "o"]).reset_index(drop=True)
    expect["rn"] = expect.groupby("k").cumcount() + 1
    pd.testing.assert_frame_equal(c[["k", "o", "p", "rn"]], expect)


def test_misra_gries_matches_exact_heavy_hitters():
    """r3: MG bounded-state path equals the exact combiner on a skewed
    corpus, including under a small capacity (heavy tokens clear the
    n/capacity bound; recount makes returned counts exact)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduper_ray.stages.relational import (
        token_heavy_hitters,
        token_heavy_hitters_mg,
    )

    rng = np.random.RandomState(5)
    # zipf-ish: heavy tokens h0..h9, long tail t0..t9999
    texts = []
    for i in range(2000):
        toks = [f"h{j}" for j in range(10) for _ in range(10 - j)] + [
            f"t{rng.randint(10000)}" for _ in range(20)
        ]
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(8)
    exact = token_heavy_hitters(ds, text_column="text", k=10).to_pylist()
    mg = token_heavy_hitters_mg(
        ds, text_column="text", k=10, capacity=256
    ).to_pylist()
    assert mg == exact


def test_grouped_quantiles_binned_exact_floats():
    """r3: iterative-binning quantiles equal a local percentile_disc
    over float values, with max_enumeration small enough to force
    several refinement rounds."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from deduper_ray.stages.relational import grouped_quantiles_binned

    rng = np.random.RandomState(11)
    n = 30000
    keys = rng.choice(["a", "b", "c"], n)
    vals = np.where(
        keys == "a", rng.standard_normal(n) * 10,
        rng.exponential(5.0, n),
    )
    # duplicates + an all-identical group exercise degenerate intervals
    keys = np.concatenate([keys, np.full(500, "d")])
    vals = np.concatenate([vals, np.full(500, 3.25)])
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ).repartition(6)
    out = grouped_quantiles_binned(
        ds, key="k", value_col="v", quantiles=[0.5, 0.9],
        num_bins=16, max_enumeration=40, max_rounds=32,
    ).set_index("k")
    df = pd.DataFrame({"k": keys, "v": vals})
    for kk, g in df.groupby("k"):
        v = np.sort(g["v"].to_numpy())
        nn = len(v)
        assert out.loc[kk, "n"] == nn
        for q, col in ((0.5, "q50"), (0.9, "q90")):
            expect = v[max(1, int(np.ceil(q * nn))) - 1]
            assert out.loc[kk, col] == expect, (kk, col)


def test_cdc_chunk_dedupe_shift_robust():
    """r3: content-defined chunking — reconstruction is exact, and a
    PREFIX INSERTION still dedupes the shared tail (the property fixed
    grids lack: one inserted char realigns every fixed chunk)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduper_ray.stages.chunkdedup import cdc_cut_points, chunk_dedupe

    rng = np.random.RandomState(2)
    base = "".join(
        rng.choice(list("abcdefgh ijklmnop qrstuv wxyz.\n"), 4000)
    )
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": [base, "PREFIX-INSERTED-" + base],
        }
    )
    ds = rd.from_arrow(docs)

    # no dupes within doc 0 alone → reconstruction must be exact
    solo = chunk_dedupe(
        rd.from_arrow(docs.slice(0, 1)), chunker="cdc"
    ).to_pandas()
    assert solo["clean_text"].iloc[0] == base

    both = chunk_dedupe(ds, chunker="cdc").to_pandas().set_index("doc_id")
    assert both.loc[0, "clean_text"] == base  # first occurrence keeps all
    # doc 1 keeps its novel prefix region but loses most of the shared
    # tail to dedup — CDC boundaries resync after the insertion
    survived = len(both.loc[1, "clean_text"])
    assert survived < len(base) * 0.25, survived

    # fixed chunking on the same input dedupes almost nothing of doc 1
    fixed = chunk_dedupe(ds, chunker="fixed").to_pandas().set_index("doc_id")
    assert len(fixed.loc[1, "clean_text"]) > len(base) * 0.9

    # cut-point invariants incl. multi-byte safety
    text = ("héllo wörld → " * 300).encode("utf-8")
    data = np.frombuffer(text, dtype=np.uint8)
    cuts = cdc_cut_points(data, min_size=32, avg_size=64, max_size=256)
    assert cuts[-1] == len(text)
    assert all(b2 - b1 <= 256 + 3 for b1, b2 in zip([0] + cuts, cuts))
    pieces = [text[a:b].decode("utf-8") for a, b in zip([0] + cuts, cuts)]
    assert "".join(pieces) == text.decode("utf-8")
