"""Corpus-wide substring overlap (stages/overlap.py): planted-pair
exactness at window=1 and the winnowing recall guarantee at window>1."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from deduper_ray.stages.overlap import (
    gram_hashes,
    substring_overlap_pairs,
    winnow,
)


def _corpus():
    rng = np.random.default_rng(5)

    def rand_text(n):
        return "".join(
            rng.choice(list("abcdefghijklmnopqrstuvwxyz "), n)
        )

    shared = rand_text(40)  # 40 > 32: guaranteed shared 32-gram
    docs = {
        1: rand_text(200) + shared + rand_text(100),
        2: rand_text(150) + shared,
        3: rand_text(300),
        4: rand_text(20),            # shorter than min_len
        5: shared + rand_text(50),
    }
    return docs


def _pairs(docs, **kw):
    t = pa.table(
        {
            "doc_id": pa.array(sorted(docs), type=pa.int64()),
            "text": [docs[k] for k in sorted(docs)],
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    pairs, dropped = substring_overlap_pairs(ds, id_column="doc_id", **kw)
    got = {
        (r["id_a"], r["id_b"])
        for r in pairs.to_pandas().drop_duplicates().to_dict("records")
    }
    return got, dropped


def test_window1_exact_planted_pairs():
    got, dropped = _pairs(_corpus(), min_len=32, window=1)
    assert got == {(1, 2), (1, 5), (2, 5)}
    assert dropped == 0


def test_winnowing_guarantee_window8():
    # shared substring length 40 ≥ min_len(32) + window(8) − 1 = 39 →
    # the winnowing guarantee applies: every planted pair MUST survive
    got, _ = _pairs(_corpus(), min_len=32, window=8)
    assert {(1, 2), (1, 5), (2, 5)} <= got


def test_gram_hashes_and_winnow_edges():
    assert gram_hashes(b"abc", 5).size == 0
    h = gram_hashes(b"abcdefgh", 3)
    assert h.size == 6  # 8 − 3 + 1
    assert np.array_equal(winnow(h, 1), np.unique(h))
    w = winnow(h, 4)
    assert w.size <= h.size and np.isin(w, h).all()


def test_identical_docs_pair_regardless_of_window():
    text = "x" * 10 + "the quick brown fox jumps over the lazy dog" * 3
    docs = {10: text, 20: text}
    got, _ = _pairs(docs, min_len=32, window=16)
    assert (10, 20) in got
