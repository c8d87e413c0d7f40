"""Union-find, label propagation, suffix array unit tests."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from deduper_ray.functions.suffix import SuffixArray, containment_check
from deduper_ray.state.unionfind import (
    UnionFind,
    cluster_edges,
    label_propagation,
)


def test_union_find_components():
    uf = UnionFind()
    uf.union(1, 2)
    uf.union(2, 3)
    uf.union(10, 11)
    comp = uf.components()
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert 5 not in comp  # untouched nodes are not stored


def test_cluster_edges_dataset():
    edges = rd.from_items(
        [
            {"id_a": 0, "id_b": 5},
            {"id_a": 5, "id_b": 9},
            {"id_a": 100, "id_b": 200},
        ]
    )
    comp = cluster_edges(edges)
    assert comp[0] == comp[5] == comp[9] == 0
    assert comp[100] == comp[200] == 100


def test_label_propagation_matches_union_find():
    rng = np.random.RandomState(0)
    # two chains + one star
    edges = (
        [(i, i + 1) for i in range(0, 8)]
        + [(20 + i, 20 + i + 1) for i in range(0, 5)]
        + [(50, 50 + i) for i in range(1, 6)]
    )
    ds = rd.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    lp = label_propagation(ds).to_pandas()
    got = dict(zip(lp["row_id"], lp["cluster_id"]))
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    expect = uf.components()
    assert got == expect


def test_suffix_array_contains():
    sa = SuffixArray(b"the quick brown fox jumps over the lazy dog")
    assert sa.contains(b"quick brown")
    assert sa.contains(b"the lazy dog")
    assert sa.contains(b"t")
    assert not sa.contains(b"quick browns")
    assert not sa.contains(b"zebra")
    assert sa.contains(b"")


def test_suffix_array_edge_cases():
    assert not SuffixArray(b"").contains(b"x")
    assert SuffixArray(b"aaaa").contains(b"aaa")
    assert not SuffixArray(b"ab").contains(b"abc")  # pattern longer


def test_containment_check():
    contents = {1: "def f():\n    return 1\n", 2: "# header\ndef f():\n    return 1\n\nprint(f())"}
    out = containment_check(contents, [(1, 2)])
    assert out[(1, 2)] is True
    contents[3] = "completely different"
    out = containment_check(contents, [(1, 3)])
    assert out[(1, 3)] is False


def test_label_propagation_long_chain_pointer_doubling():
    """A 150-node path graph has diameter 149 — one-hop propagation
    would need ~149 rounds and previously fell through max_rounds=10
    returning SPLIT clusters silently. Pointer doubling converges in
    O(log diameter) (~8 doubling rounds) and non-convergence now
    raises instead of returning wrong clusters."""
    n = 150
    ds = rd.from_items([{"id_a": i, "id_b": i + 1} for i in range(n - 1)])
    lp = label_propagation(ds, max_rounds=12, num_partitions=4).to_pandas()
    assert len(lp) == n
    assert set(lp["cluster_id"]) == {0}

    # insufficient rounds → loud failure, not silent splits
    import pytest as _pytest

    ds2 = rd.from_items([{"id_a": i, "id_b": i + 1} for i in range(n - 1)])
    with _pytest.raises(RuntimeError, match="did not converge"):
        label_propagation(ds2, max_rounds=2, num_partitions=4)


def test_vectorized_components_match_unionfind():
    """connected_components_arrays must equal the hash-map union-find
    on an adversarial mix: chains (worst case for label hops), stars,
    cliques, self-loops, duplicate edges, non-contiguous ids."""
    import numpy as np

    from deduper_ray.state.unionfind import (
        UnionFind,
        connected_components_arrays,
    )

    rng = np.random.RandomState(7)
    edges = []
    base = 0
    for _ in range(20):  # chains of random length
        ln = rng.randint(2, 40)
        ids = base + np.arange(ln) * 3 + 1000  # stride → sparse ids
        edges += list(zip(ids[:-1], ids[1:]))
        base += ln * 3 + 10
    hub = 10_000_000
    edges += [(hub, hub + i * 7) for i in range(1, 50)]  # star
    cl = 20_000_000 + np.arange(6)
    edges += [(int(a), int(b)) for i, a in enumerate(cl) for b in cl[i + 1:]]
    edges += [(5, 5), (1000, 1000)]  # self-loops
    edges += edges[:15]  # duplicates
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    perm = rng.permutation(a.size)
    a, b = a[perm], b[perm]

    nodes, labels = connected_components_arrays(a, b)
    uf = UnionFind()
    uf.union_arrays(a, b)
    expect = uf.components()
    got = dict(zip(nodes.tolist(), labels.tolist()))
    assert got == expect
