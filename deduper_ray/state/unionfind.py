"""Union-find clustering state.

The shared-mutable-index case the Dataset API genuinely can't express
(SURVEY.md §7.2): verified candidate edges stream into one union-find
structure; connected components become duplicate clusters.

Two implementations:

- ``UnionFind``: path-compressed, union-by-size; driven from the
  driver or inside ``UnionFindActor``. Memory O(touched nodes) — only
  ids that appear in an edge are stored (hash map, not a dense array),
  so the bound is the verified-edge endpoint count, NOT corpus size.
  Verification-before-union keeps that small (SURVEY.md §7.4).
- ``label_propagation``: fully distributed alternative — iterative
  min-label exchange via native groupby aggregates, no single-actor
  state; rounds = graph diameter (dupe clusters are near-cliques out
  of LSH, so it converges in 2-3 rounds). The scale path for
  pathological edge volumes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


class UnionFind:
    __slots__ = ("parent", "size")

    def __init__(self):
        self.parent: dict[int, int] = {}
        self.size: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        if x not in p:
            p[x] = x
            self.size[x] = 1
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def union_arrays(self, a: np.ndarray, b: np.ndarray) -> None:
        for x, y in zip(a.tolist(), b.tolist()):
            self.union(x, y)

    def components(self) -> dict[int, int]:
        """node → min-member-id of its component (stable cluster id)."""
        roots: dict[int, int] = {}
        for x in list(self.parent):
            r = self.find(x)
            m = roots.get(r)
            if m is None or x < m:
                roots[r] = x
        return {x: roots[self.find(x)] for x in self.parent}


@ray.remote
class UnionFindActor:
    """Dedicated actor holding the union-find graph; edge batches are
    streamed in (e.g. from ``iter_batches`` or remote tasks), the
    cluster map is pulled once at the end. Rebuildable from the
    persisted edge parquet (SURVEY.md §7.2 fault-tolerance note)."""

    def __init__(self):
        self.uf = UnionFind()

    def add_edges(self, id_a: np.ndarray, id_b: np.ndarray) -> int:
        self.uf.union_arrays(id_a, id_b)
        return len(self.uf.parent)

    def components(self) -> dict[int, int]:
        return self.uf.components()


def cluster_edges(edges: rd.Dataset) -> dict[int, int]:
    """Stream verified edges into a UnionFindActor; return
    {row_id → cluster_id(min member)} for every clustered row."""
    actor = UnionFindActor.remote()
    refs = []
    for batch in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        refs.append(
            actor.add_edges.remote(
                batch["id_a"].to_numpy(zero_copy_only=False),
                batch["id_b"].to_numpy(zero_copy_only=False),
            )
        )
    if refs:
        ray.get(refs)
    out = ray.get(actor.components.remote())
    ray.kill(actor)
    return out


def label_propagation(
    edges: rd.Dataset, *, max_rounds: int = 10
) -> rd.Dataset:
    """Distributed connected components by iterative min-label
    propagation — no driver/actor state, two native aggregates per
    round. Returns a Dataset (row_id, cluster_id)."""
    from ray.data.aggregate import Min

    # node → current label (init: own id); edges kept symmetric
    def _sym(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()
    labels = sym.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))
    labels = labels.map_batches(
        lambda t: pa.table(
            {
                "node": t["src"],
                "label": pa.array(
                    np.minimum(
                        t["src"].to_numpy(zero_copy_only=False),
                        t["nbr_min"].to_numpy(zero_copy_only=False),
                    ),
                    type=pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_rounds):
        # push labels across edges: node's label reaches its neighbors
        lab_map = {
            r["node"]: r["label"] for r in labels.take_all()
        }  # small: clustered nodes only
        ref = ray.put(lab_map)

        def _push(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            lab = np.fromiter(
                (m.get(int(s), int(s)) for s in src), dtype=np.int64,
                count=src.size,
            )
            return pa.table(
                {"node": pa.array(dst, type=pa.int64()),
                 "label": pa.array(lab, type=pa.int64())}
            )

        pushed = sym.map_batches(_push, batch_format="pyarrow")
        new_labels = (
            pushed.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        old = {r["node"]: r["label"] for r in labels.take_all()}
        new = {r["node"]: r["label"] for r in new_labels.take_all()}
        labels = new_labels
        if old == new:
            break
    return labels.map_batches(
        lambda t: pa.table(
            {"row_id": t["node"], "cluster_id": t["label"]}
        ),
        batch_format="pyarrow",
    )
