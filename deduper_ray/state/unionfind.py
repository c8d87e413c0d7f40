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


def connected_components_arrays(
    a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components over an edge list
    (Shiloach-Vishkin style hook + pointer-doubling, all numpy —
    no per-edge Python). Returns (nodes, labels): ``nodes`` are the
    distinct endpoint ids ascending, ``labels[i]`` is the MIN MEMBER ID
    of node i's component (the same stable cluster id the hash-map
    union-find emits). ~20× faster than per-edge union at 10^6 edges;
    memory O(V + E) in flat int64 arrays."""
    if a.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: a.size], inv[a.size :]
    parent = np.arange(nodes.size, dtype=np.int64)
    while True:
        ra, rb = parent[ea], parent[eb]
        lo = np.minimum(ra, rb)
        hi = np.maximum(ra, rb)
        before = parent.copy()
        np.minimum.at(parent, hi, lo)  # hook: bigger root adopts smaller
        while True:  # pointer doubling until fixpoint
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        if np.array_equal(parent, before):
            break
    # node indices sort ascending with ids, so min root index = min id
    return nodes, nodes[parent]


def cluster_edges_table(
    edges: rd.Dataset, *, id_column: str = "row_id"
) -> pa.Table:
    """Edge dataset → (id_column, cluster_id) Arrow table via the
    vectorized components — no Python dict, no per-row loop. Driver
    memory is O(edges); for edge sets beyond driver heap use
    ``label_propagation``."""
    parts_a, parts_b = [], []
    for batch in edges.iter_batches(batch_size=262144, batch_format="pyarrow"):
        parts_a.append(batch["id_a"].to_numpy(zero_copy_only=False))
        parts_b.append(batch["id_b"].to_numpy(zero_copy_only=False))
    if not parts_a:
        return pa.table(
            {
                id_column: pa.array([], type=pa.int64()),
                "cluster_id": pa.array([], type=pa.int64()),
            }
        )
    nodes, labels = connected_components_arrays(
        np.concatenate(parts_a).astype(np.int64),
        np.concatenate(parts_b).astype(np.int64),
    )
    return pa.table(
        {
            id_column: pa.array(nodes, type=pa.int64()),
            "cluster_id": pa.array(labels, type=pa.int64()),
        }
    )


def cluster_edges(edges: rd.Dataset) -> dict[int, int]:
    """Stream verified edges into the vectorized components; return
    {row_id → cluster_id(min member)} for every clustered row.
    (Dict form kept for callers that probe per-id; pipelines should
    prefer ``cluster_edges_table`` — no Python dict materialization.)"""
    tbl = cluster_edges_table(edges)
    return dict(
        zip(tbl["row_id"].to_pylist(), tbl["cluster_id"].to_pylist())
    )


def label_propagation(
    edges: rd.Dataset,
    *,
    max_rounds: int = 16,
    num_partitions: int | None = None,
    on_nonconverged: str = "raise",
) -> rd.Dataset:
    """Distributed connected components by min-label propagation WITH
    pointer doubling — no driver-resident label map, no per-row Python.
    Returns a Dataset (row_id, cluster_id).

    Per round, three fully distributed steps:
      1. edge push: labels ⋈ edges on the source endpoint (hash-
         partitioned join) — each node offers its label to neighbors;
      2. pointer doubling: labels ⋈ labels on label==node — each node
         also adopts its LABEL's label (label-of-label), so convergence
         is O(log diameter) instead of O(diameter);
      3. ``groupby(node).min(label)`` merge.

    Convergence is detected WITHOUT materializing label maps on the
    driver: labels only ever decrease, so a per-round scalar
    ``sum(label)`` (one tiny aggregate) is stationary iff no label
    changed. Chains out of the LSH bucket cap (chain+stride emission,
    stages/lsh.py) are the adversarial diameter case this handles:
    a 10^5-long chain converges in ~17 doubling rounds, where one-hop
    propagation would silently return split clusters after
    ``max_rounds``. If the graph still hasn't converged,
    ``on_nonconverged`` = "raise" (default) or "warn"."""
    from ray.data.aggregate import Min, Sum

    from deduper_ray.stages.relational import partitioned_join

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(4, min(64, cpus * 2))

    # node → current label (init: min(self, neighbors)); edges symmetric
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

    if labels.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "row_id": pa.array([], type=pa.int64()),
                    "cluster_id": pa.array([], type=pa.int64()),
                }
            )
        )

    def _drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
        # Ray's hash aggregate emits one block per partition INCLUDING
        # empty zero-column blocks when partitions outnumber distinct
        # keys (exactly the near-converged state here), and map_batches
        # passes empty blocks through without invoking the UDF — so the
        # downstream hash join sees a schema-less block and dies.
        # Metadata-only filter: no block data touches the driver.
        ds = ds.materialize()
        refs = [
            ref
            for bundle in ds.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks
            if meta.num_rows
        ]
        if not refs:
            return rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], type=pa.int64()),
                        "label": pa.array([], type=pa.int64()),
                    }
                )
            )
        return rd.from_arrow_refs(refs)

    def _project(*mapping: tuple[str, str]):
        # (src_col, out_col) projection, empty-schema-safe
        def _f(t: pa.Table) -> pa.Table:
            if all(src in t.column_names for src, _ in mapping):
                return pa.table({out: t[src] for src, out in mapping})
            return pa.table(
                {out: pa.array([], type=pa.int64()) for _, out in mapping}
            )

        return _f

    def _as(names: list[str]):
        # schema-stable rename: degenerate EMPTY blocks can arrive with
        # no columns at all — emit the correct empty schema so the
        # hash-join operators see one consistent schema per side
        def _f(t: pa.Table) -> pa.Table:
            if t.num_columns == len(names):
                return t.rename_columns(names)
            return pa.table(
                {n: pa.array([], type=pa.int64()) for n in names}
            )

        return _f

    def _sum(ds: rd.Dataset) -> int:
        out = ds.aggregate(Sum("label", alias_name="s"))
        return int(out["s"] or 0)

    labels = _drop_empty_blocks(labels)
    prev_sum = _sum(labels)
    converged = False
    for _ in range(max_rounds):
        # 1. push across edges: (src,dst) ⋈ (node=src → label)
        as_src = labels.map_batches(_as(["src", "label"]),
                                    batch_format="pyarrow")
        pushed = partitioned_join(
            sym, as_src, "src", num_partitions=num_partitions
        ).map_batches(
            _project(("dst", "node"), ("label", "label")),
            batch_format="pyarrow",
        )
        # 2. pointer doubling: (node, key=label) ⋈ (key=node → label)
        by_label = labels.map_batches(_as(["node", "key"]),
                                      batch_format="pyarrow")
        as_key = labels.map_batches(_as(["key", "label"]),
                                    batch_format="pyarrow")
        shortcut = partitioned_join(
            by_label, as_key, "key", num_partitions=num_partitions
        ).map_batches(
            _project(("node", "node"), ("label", "label")),
            batch_format="pyarrow",
        )
        # 3. min-merge
        labels = _drop_empty_blocks(
            pushed.union(shortcut).union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(_as(["node", "label"]), batch_format="pyarrow")
        )
        new_sum = _sum(labels)
        if new_sum == prev_sum:  # labels are monotone non-increasing
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        msg = (
            f"label_propagation did not converge in {max_rounds} rounds "
            "— clusters may be split; raise max_rounds"
        )
        if on_nonconverged == "warn":
            import logging

            logging.getLogger(__name__).warning(msg)
        else:
            raise RuntimeError(msg)
    return labels.map_batches(
        lambda t: pa.table(
            {"row_id": t["node"], "cluster_id": t["label"]}
        ),
        batch_format="pyarrow",
    )
