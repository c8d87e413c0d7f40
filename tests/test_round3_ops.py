"""Unit tests for the round-3 session-2 operators: SimHash Hamming
clustering, keep-best dedup policy, windowed event dedup, and the
interval (range) join. Oracle parity at sf0.01 is covered by
tools/check_oracles.py; these pin stage-level semantics against
brute-force references on adversarial mini-corpora."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from deduper_ray.stages.exact import dedupe_keep_best
from deduper_ray.stages.linkage import fuzzy_block_pairs, levenshtein_batch
from deduper_ray.stages.relational import _lex_insert_left, range_join_count
from deduper_ray.stages.simhash_nd import hamming64, simhash_neardup
from deduper_ray.stages.window import window_dedupe


# ------------------------------------------------------------ simhash


def test_hamming64_matches_python_popcount():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 2**63, size=200, dtype=np.int64)
    b = rng.randint(0, 2**63, size=200, dtype=np.int64)
    got = hamming64(a, b)
    want = np.array(
        [bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b)],
        dtype=np.int64,
    )
    assert np.array_equal(got, want)
    # sign bit exercised via the uint64 view
    assert hamming64(np.array([-1], dtype=np.int64),
                     np.array([0], dtype=np.int64))[0] == 64


def _brute_clusters(sims: np.ndarray, max_hamming: int) -> dict[int, int]:
    """All-pairs Hamming edges + union-find (min-member labels)."""
    n = sims.size
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = 0
    for i in range(n):
        for j in range(i + 1, n):
            if bin(int(sims[i]) ^ int(sims[j])).count("1") <= max_hamming:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
                edges += 1
    labels = {}
    for i in range(n):
        root = find(i)
        labels.setdefault(root, []).append(i)
    out = {}
    for members in labels.values():
        if len(members) > 1:
            m = min(members)
            for i in members:
                out[i] = m
    return out


def test_simhash_neardup_matches_bruteforce():
    rng = np.random.RandomState(42)
    base = rng.randint(0, 2**63, size=40, dtype=np.int64)
    rows = [int(b) for b in base]
    # plant near-dups: flip 1-3 bits of some fingerprints
    for i in range(0, 40, 5):
        v = int(base[i])
        for nbits in (1, 2, 3):
            flipped = v
            for b in rng.choice(64, size=nbits, replace=False):
                flipped ^= 1 << int(b)
            rows.append(flipped)
    sims = np.array(rows, dtype=np.uint64).view(np.int64)
    ids = np.arange(sims.size, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"row_id": pa.array(ids), "simhash": pa.array(sims)})
    )
    got = (
        simhash_neardup(ds, max_hamming=3, bands=4)
        .to_pandas()
        .set_index("row_id")["cluster_id"]
        .to_dict()
    )
    want = _brute_clusters(sims, 3)
    assert got == want
    assert len(want) > 0  # the planted dups actually clustered


def test_simhash_neardup_hot_window_exact():
    """Adversarial skew: 2,000 distinct fingerprints sharing one
    16-bit band window (one bucket far above the recursion threshold)
    — the recursive pigeonhole refinement must stay EXACT vs the
    vectorized all-pairs brute force."""
    rng = np.random.RandomState(3)
    n = 2000
    # band 0 window (bits 0-15) constant; the rest random
    high = rng.randint(0, 2**47, size=n, dtype=np.int64) << 16
    sims = np.unique(high | 0x1234)
    # plant near pairs: flip 1-3 bits of the high parts of some rows
    planted = []
    for i in range(0, sims.size, 97):
        v = int(sims[i])
        f = v
        for b in rng.choice(np.arange(16, 63), size=3, replace=False):
            f ^= 1 << int(b)  # bits 16-62: stays a valid int64
        planted.append(f)
    sims = np.unique(np.concatenate([sims, np.array(planted, np.int64)]))
    ids = np.arange(sims.size, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"row_id": pa.array(ids), "simhash": pa.array(sims)})
    )
    got = (
        simhash_neardup(ds, max_hamming=3, bands=4)
        .to_pandas()
        .set_index("row_id")["cluster_id"]
        .to_dict()
    )
    # numpy brute force
    ia, ib = np.triu_indices(sims.size, k=1)
    keep = hamming64(sims[ia], sims[ib]) <= 3
    from deduper_ray.state.unionfind import connected_components_arrays

    nodes, labels = connected_components_arrays(
        ids[ia[keep]].astype(np.int64), ids[ib[keep]].astype(np.int64)
    )
    want = dict(zip(nodes.tolist(), labels.tolist()))
    assert got == want
    assert len(want) >= len(planted)  # planted pairs actually clustered


def test_simhash_neardup_empty_and_single_and_identical():
    empty = rd.from_arrow(
        pa.table(
            {
                "row_id": pa.array([], type=pa.int64()),
                "simhash": pa.array([], type=pa.int64()),
            }
        )
    )
    assert simhash_neardup(empty).count() == 0
    single = rd.from_arrow(
        pa.table({"row_id": pa.array([7]), "simhash": pa.array([123])})
    )
    assert simhash_neardup(single).count() == 0
    # identical fingerprints cluster (Hamming 0) through the collapse
    same = rd.from_arrow(
        pa.table(
            {
                "row_id": pa.array([5, 9, 2], type=pa.int64()),
                "simhash": pa.array([42, 42, 42], type=pa.int64()),
            }
        )
    )
    out = simhash_neardup(same).to_pandas().sort_values("row_id")
    assert out["row_id"].tolist() == [2, 5, 9]
    assert out["cluster_id"].tolist() == [2, 2, 2]


def test_simhash_neardup_validates_bands():
    ds = rd.from_arrow(
        pa.table({"row_id": pa.array([0]), "simhash": pa.array([0])})
    )
    with pytest.raises(ValueError):
        simhash_neardup(ds, max_hamming=4, bands=4)
    with pytest.raises(ValueError):
        simhash_neardup(ds, max_hamming=2, bands=3)


# ---------------------------------------------------------- keep-best


def test_dedupe_keep_best_max_score_then_min_id():
    t = pa.table(
        {
            "g": ["a", "a", "a", "b", "b", "c"],
            "score": [1, 9, 9, 5, 5, 2],
            "row_id": [10, 12, 11, 3, 2, 7],
            "payload": ["p10", "p12", "p11", "p3", "p2", "p7"],
        }
    )
    out = (
        dedupe_keep_best(
            rd.from_arrow(t), group_col="g", score_col="score",
            id_col="row_id",
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # a: max score 9, tie between ids 12/11 → 11; b: tie 3/2 → 2; c: 7
    assert out["row_id"].tolist() == [11, 2, 7]
    assert out["payload"].tolist() == ["p11", "p2", "p7"]


def test_dedupe_keep_best_constant_score_is_first_wins():
    t = pa.table(
        {
            "g": ["x"] * 4,
            "score": [1, 1, 1, 1],
            "row_id": [40, 20, 30, 25],
        }
    )
    out = dedupe_keep_best(
        rd.from_arrow(t), group_col="g", score_col="score", id_col="row_id"
    ).to_pandas()
    assert out["row_id"].tolist() == [20]


# ------------------------------------------------------ window dedupe


def test_window_dedupe_first_per_window():
    us = 1_000_000
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "ts": pa.array(
                # windows of 10s: [0,10) and [10,20)
                np.array([5, 3, 3, 12, 11, 5], dtype=np.int64) * us,
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1, 1, 1, 2], type=pa.int64()),
            "event_type": ["c", "c", "c", "c", "c", "c"],
        }
    )
    out = (
        window_dedupe(
            rd.from_arrow(t), keys=["user_id", "event_type"],
            ts_column="ts", window_sec=10, id_column="event_id",
        )
        .to_pandas()
        .sort_values("event_id")
    )
    # user 1 window [0,10): ts=3 ties → min event_id 2
    # user 1 window [10,20): ts=11 → event 5; user 2: event 6
    assert out["event_id"].tolist() == [2, 5, 6]


# -------------------------------------------------------- range join


def test_lex_insert_left_matches_per_key_searchsorted():
    rng = np.random.RandomState(3)
    pk = rng.randint(0, 5, size=300).astype(np.int64)
    pt = rng.randint(0, 100, size=300).astype(np.int64)
    qk = rng.randint(-1, 7, size=80).astype(np.int64)
    qt = rng.randint(-5, 110, size=80).astype(np.int64)
    got = _lex_insert_left(pk, pt, qk, qt)
    want = np.array(
        [
            np.sum((pk < k) | ((pk == k) & (pt < t)))
            for k, t in zip(qk, qt)
        ],
        dtype=np.int64,
    )
    assert np.array_equal(got, want)


def test_range_join_count_matches_bruteforce():
    rng = np.random.RandomState(11)
    us = 1_000_000
    n_pts, n_iv = 500, 120
    pk = rng.randint(0, 20, size=n_pts).astype(np.int64)
    pt = rng.randint(0, 10_000, size=n_pts).astype(np.int64)
    ik = rng.randint(0, 25, size=n_iv).astype(np.int64)  # some keys empty
    istart = rng.randint(0, 10_000, size=n_iv).astype(np.int64)
    iid = np.arange(n_iv, dtype=np.int64)
    w = 500  # seconds

    points = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(pk),
                "ts": pa.array(pt * us, type=pa.timestamp("us")),
            }
        )
    )
    intervals = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(ik),
                "start": pa.array(istart * us, type=pa.timestamp("us")),
                "iid": pa.array(iid),
            }
        )
    )
    out = (
        range_join_count(
            points, intervals, by="k", point_ts="ts",
            interval_start="start", window_sec=w, interval_id="iid",
        )
        .to_pandas()
        .sort_values("iid")
        .reset_index(drop=True)
    )
    want = np.array(
        [
            np.sum((pk == k) & (pt >= s) & (pt < s + w))
            for k, s in zip(ik, istart)
        ],
        dtype=np.int64,
    )
    assert out["iid"].tolist() == iid.tolist()  # every interval present
    assert np.array_equal(out["n_points"].to_numpy(), want)
    assert (want == 0).any()  # zero-match intervals exercised


# ----------------------------------------------------- fuzzy linkage


def _ref_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(
                prev[j - 1] + (a[i - 1] != b[j - 1]),
                prev[j] + 1,
                cur[j - 1] + 1,
            )
        prev = cur
    return prev[len(b)]


def test_levenshtein_batch_matches_reference_and_duckdb_ascii():
    import random

    import duckdb

    rng = random.Random(5)
    alpha = "abcdef gh"
    pairs = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 15))),
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 15))),
        )
        for _ in range(200)
    ] + [("", ""), ("abc", ""), ("", "xyz"), ("kitten", "sitting")]
    got = levenshtein_batch([a for a, _ in pairs], [b for _, b in pairs])
    assert list(got) == [_ref_levenshtein(a, b) for a, b in pairs]
    con = duckdb.connect()
    db = [
        con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        for a, b in pairs
    ]
    assert list(got) == db  # ASCII parity with the oracle function


def test_levenshtein_batch_codepoint_semantics_unicode():
    pairs = [("日本", "日木"), ("café", "cafe"), ("é", ""), ("ab日", "ab")]
    got = levenshtein_batch([a for a, _ in pairs], [b for _, b in pairs])
    assert list(got) == [_ref_levenshtein(a, b) for a, b in pairs]
    assert list(got) == [1, 1, 1, 1]  # character edits, not byte edits


def test_fuzzy_block_pairs_matches_bruteforce():
    rows = [
        # block X: names within small edit distances
        (1, "X", "cold widget"),
        (2, "X", "bold widget"),
        (3, "X", "cold widgets"),
        (4, "X", "completely different"),
        # block Y: a pair and a singleton far away
        (5, "Y", "blue rod"),
        (6, "Y", "glue rod"),
        (7, "Y", "zzzzzzzzzzzzzz"),
        # block Z: single row → no pairs
        (8, "Z", "alone"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], type=pa.int64()),
                "blk": [r[1] for r in rows],
                "name": [r[2] for r in rows],
            }
        )
    )
    out = (
        fuzzy_block_pairs(
            ds, block_col="blk", compare_col="name", id_col="id",
            max_distance=2,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if rows[i][1] != rows[j][1]:
                continue
            d = _ref_levenshtein(rows[i][2], rows[j][2])
            if d <= 2:
                want.append((rows[i][0], rows[j][0], d))
    got = list(
        zip(out["id_a"].tolist(), out["id_b"].tolist(), out["dist"].tolist())
    )
    assert got == sorted(want)
    assert (1, 2, 1) in got and (5, 6, 1) in got


def test_normalized_dedup_collapses_case_and_whitespace(tmp_path):
    """The sf testdata has no normalization-dupes (oracle run keeps all
    rows), so exercise the collapse on planted variants here."""
    import pyarrow.parquet as pq

    from deduper_ray.pipelines.queries import normalized_dedup_docs

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "text": [
                "Hello   World",
                "hello world",  # case+space variant of 0
                " HELLO WORLD ",  # trim+case variant of 0
                "éclair recipe",  # NFD é
                "éclair recipe",  # NFC é — same after normalize
            ],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": pa.array([13, 11, 13, 14, 13], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = normalized_dedup_docs(str(tmp_path))
    assert out["doc_id"].tolist() == [0, 3]  # first of each norm group


def test_add_compression_ratio_bounds_and_monotonicity():
    import zlib

    from deduper_ray.functions.text import add_compression_ratio

    repetitive = "spam and eggs " * 200
    prose = (
        "A different observation appears in every clause of this text, "
        "so deflate finds few long repeats beyond common English bigrams "
        "and the dictionary stays cold throughout the paragraph window."
    )
    t = pa.table(
        {
            "text": [repetitive, prose, "", "x"],
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        }
    )
    out = add_compression_ratio(t)
    r = out["compression_ratio"].to_pylist()
    assert r[0] < 0.1 < r[1]  # repetition compresses far better
    assert r[2] == 1.0  # empty → neutral
    assert r[3] == len(zlib.compress(b"x", 6)) / 1  # exact per-doc value
    assert all(v > 0 for v in r)


def test_jaro_winkler_matches_duckdb():
    import random

    import duckdb

    from deduper_ray.stages.linkage import jaro_winkler

    rng = random.Random(1)
    con = duckdb.connect()
    pairs = [
        (
            "".join(rng.choice("abcd ef") for _ in range(rng.randint(0, 10))),
            "".join(rng.choice("abcd ef") for _ in range(rng.randint(0, 10))),
        )
        for _ in range(400)
    ] + [("", ""), ("a", ""), ("martha", "marhta"), ("dixon", "dicksonx")]
    for a, b in pairs:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(jaro_winkler(a, b) - want) < 1e-12, (a, b)


def test_fuzzy_block_pairs_jw_mode():
    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3], type=pa.int64()),
                "blk": ["X", "X", "X"],
                "name": ["martha stone", "marhta stone", "zzzz"],
            }
        )
    )
    out = fuzzy_block_pairs(
        ds, block_col="blk", compare_col="name", id_col="id",
        min_similarity=0.9,
    ).to_pandas()
    assert out["id_a"].tolist() == [1] and out["id_b"].tolist() == [2]
    assert out["sim"].iloc[0] > 0.9
    with pytest.raises(ValueError):
        fuzzy_block_pairs(
            ds, block_col="blk", compare_col="name", id_col="id"
        )


@pytest.mark.parametrize("nparts", [1, 3, 13])
def test_sorted_neighborhood_pairs_matches_bruteforce(nparts):
    """Window pairs under the global (name, id) order equal the brute
    force at EVERY partitioning — nparts=13 puts ~15 rows per block
    (window 4), exercising the cross-block fringe stitch heavily."""
    import random

    from deduper_ray.stages.linkage import sorted_neighborhood_pairs

    rng = random.Random(9)
    names = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(3, 8)))
        for _ in range(200)
    ]
    ids = list(range(1000, 1200))
    rng.shuffle(ids)
    ds = rd.from_arrow(
        pa.table({"name": names, "pid": pa.array(ids, type=pa.int64())})
    ).repartition(nparts)
    W, D = 4, 3
    out = sorted_neighborhood_pairs(
        ds, sort_col="name", id_col="pid", window=W, max_distance=D
    ).to_pandas()
    got = sorted(
        zip(out["id_a"], out["id_b"], out["rank_dist"], out["dist"])
    )
    order = sorted(range(200), key=lambda i: (names[i], ids[i]))
    want = []
    for r in range(200):
        for s in range(r + 1, min(r + W + 1, 200)):
            i, j = order[r], order[s]
            d = _ref_levenshtein(names[i], names[j])
            if d <= D:
                want.append((ids[i], ids[j], s - r, d))
    assert got == sorted(want)
