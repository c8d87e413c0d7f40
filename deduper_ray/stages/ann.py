"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k. The query matrix is
  broadcast ONCE (``ray.put``); each batch does one numpy matmul
  against it and emits only its local top-k per query (partial top-k
  combiner), so the driver merges #blocks × k rows — not the corpus.
- ``embedding_neardup``: all-pairs cosine near-duplicate detection at
  scale via random-hyperplane (SimHash) signatures + the SAME LSH
  banding machinery as text near-dup — sign bits band into buckets,
  candidates verified with exact cosine.

Embeddings are small per row (d floats); the brute-force path is the
correctness baseline and stays viable to ~10^8 rows × 64 dims on a
cluster; the LSH path is the scale route for pairwise search.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, d)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    d = int(offsets[1] - offsets[0])
    return flat.reshape(-1, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


class _TopKPartial:
    """Actor-pool stage: per-batch partial cosine top-k vs the
    broadcast query matrix."""

    def __init__(self, queries_ref: ray.ObjectRef, k: int,
                 id_column: str, vec_column: str):
        q = ray.get(queries_ref)
        self.qids: np.ndarray = q["ids"]
        self.qmat: np.ndarray = _normalize(q["matrix"])
        self.k = k
        self.id_column = id_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        mat = _normalize(_to_matrix(batch[self.vec_column]))
        sims = self.qmat @ mat.T  # (Q, B)
        # k+1 locally: the self row may occupy one slot and is excluded
        # only at the driver merge
        k = min(self.k + 1, sims.shape[1])
        # per query: local top-k (argpartition → sort)
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = {
            "query_id": [], "neighbor_id": [], "score": [],
        }
        for qi in range(sims.shape[0]):
            cols = part[qi]
            rows["query_id"].extend([int(self.qids[qi])] * k)
            rows["neighbor_id"].extend(ids[cols].tolist())
            rows["score"].extend(sims[qi, cols].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                "score": pa.array(rows["score"], type=pa.float64()),
            }
        )


def brute_force_topk(
    embeddings: rd.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    exclude_self: bool = True,
) -> pa.Table:
    """Exact cosine top-k: returns (query_id, neighbor_id, rank, score),
    rank 1-based by (-score, neighbor_id) — deterministic under ties."""
    queries_ref = ray.put({"ids": query_ids, "matrix": query_matrix})
    partial = embeddings.map_batches(
        _TopKPartial,
        fn_constructor_kwargs={
            "queries_ref": queries_ref, "k": k,
            "id_column": id_column, "vec_column": vec_column,
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    # driver-side merge: #blocks × Q × k candidate rows only
    from deduper_ray.functions.util import dataset_to_table

    cand = dataset_to_table(partial)
    return _merge_topk(cand, query_ids, k, exclude_self)


def _merge_topk(
    cand: pa.Table, query_ids: np.ndarray, k: int, exclude_self: bool
) -> pa.Table:
    """Merge per-block partial top-k rows into the final ranked table:
    rank 1-based by (-score, neighbor_id) — deterministic under ties."""
    qcol = cand["query_id"].to_numpy(zero_copy_only=False)
    ncol = cand["neighbor_id"].to_numpy(zero_copy_only=False)
    scol = cand["score"].to_numpy(zero_copy_only=False)
    out = {"query_id": [], "neighbor_id": [], "rank": [], "score": []}
    for qid in query_ids:
        mask = qcol == qid
        n, s = ncol[mask], scol[mask]
        if exclude_self:
            keep = n != qid
            n, s = n[keep], s[keep]
        order = np.lexsort((n, -s))[:k]
        for r, j in enumerate(order, 1):
            out["query_id"].append(int(qid))
            out["neighbor_id"].append(int(n[j]))
            out["rank"].append(r)
            out["score"].append(float(s[j]))
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "score": pa.array(out["score"], type=pa.float64()),
        }
    )


def spherical_kmeans(
    sample: np.ndarray, k: int, *, iters: int = 12, seed: int = 42
) -> np.ndarray:
    """Lloyd iterations on L2-normalized vectors (cosine geometry).
    Deterministic under the seed; k × d output centroids, normalized.
    Pure numpy — meant for a bounded SAMPLE, not the corpus."""
    rng = np.random.RandomState(seed)
    x = _normalize(sample)
    k = min(k, len(x))
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cent[c] = members.sum(axis=0)
        cent = _normalize(cent)
    return cent


class _IvfTopKPartial:
    """Actor-pool stage: per batch, assign each vector to its nearest
    centroid and score it ONLY against queries probing that cell —
    then emit the local top-k per query. The centroid matrix and the
    per-query probe lists ride the object store once."""

    def __init__(self, state_ref: ray.ObjectRef, k: int,
                 id_column: str, vec_column: str):
        s = ray.get(state_ref)
        self.qids: np.ndarray = s["qids"]
        self.qmat: np.ndarray = s["qmat"]          # (Q, d) normalized
        self.centroids: np.ndarray = s["centroids"]  # (C, d) normalized
        self.probes: np.ndarray = s["probes"]      # (Q, n_probe) cell ids
        self.k = k
        self.id_column = id_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        mat = _normalize(_to_matrix(batch[self.vec_column]))
        cells = np.argmax(mat @ self.centroids.T, axis=1)  # (B,)
        out = {"query_id": [], "neighbor_id": [], "score": []}
        for qi in range(len(self.qids)):
            mask = np.isin(cells, self.probes[qi])
            if not mask.any():
                continue
            sub_ids = ids[mask]
            sims = mat[mask] @ self.qmat[qi]
            k = min(self.k + 1, sims.size)
            part = np.argpartition(-sims, k - 1)[:k]
            out["query_id"].extend([int(self.qids[qi])] * k)
            out["neighbor_id"].extend(sub_ids[part].tolist())
            out["score"].extend(sims[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
                "score": pa.array(out["score"], type=pa.float64()),
            }
        )


def ivf_topk(
    embeddings: rd.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    n_cells: int = 64,
    n_probe: int = 8,
    sample_mod: int = 8,
    seed: int = 42,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    exclude_self: bool = True,
) -> pa.Table:
    """IVF approximate cosine top-k — the SCALE path next to
    ``brute_force_topk``: per-batch work drops from O(B·Q·d) to
    O(B·C·d + probed·d) because each vector scores only against the
    queries probing its cell. Recall is governed by n_probe/n_cells
    (probing all cells degenerates to exact brute force).

    Index build: a DETERMINISTIC sample (row id mod ``sample_mod``)
    collects to the driver — bounded, corpus-independent — and
    spherical k-means picks the cells; centroids broadcast once. At
    10^9+ rows, persist the centroids + per-cell partition layout and
    reuse across queries (the classic IVF file layout)."""
    import pyarrow.compute as pc

    from deduper_ray.functions.util import dataset_to_table

    def _sample(t: pa.Table) -> pa.Table:
        ids = t[id_column].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % sample_mod == 0)).select(
            [vec_column]
        )

    sample_tbl = dataset_to_table(
        embeddings.map_batches(_sample, batch_format="pyarrow")
    )
    sample = _to_matrix(sample_tbl[vec_column])
    centroids = spherical_kmeans(sample, n_cells, seed=seed)
    qmat = _normalize(query_matrix)
    n_probe = min(n_probe, len(centroids))
    probes = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]
    state_ref = ray.put(
        {
            "qids": np.asarray(query_ids),
            "qmat": qmat,
            "centroids": centroids,
            "probes": probes,
        }
    )
    partial = embeddings.map_batches(
        _IvfTopKPartial,
        fn_constructor_kwargs={
            "state_ref": state_ref, "k": k,
            "id_column": id_column, "vec_column": vec_column,
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    cand = dataset_to_table(
        partial,
        pa.schema(
            [
                ("query_id", pa.int64()),
                ("neighbor_id", pa.int64()),
                ("score", pa.float64()),
            ]
        ),
    )
    return _merge_topk(cand, query_ids, k, exclude_self)


class HyperplaneSigner:
    """Actor-pool stage: embedding → ``bits``-bit random-hyperplane sign
    signature (cosine-LSH); the signature is exposed as ``bands`` chunks
    of ``bits // bands`` sign bits each so the text LSH banding applies
    downstream (one chunk = one band, r=1 in BandExploder terms).

    P(bucket match per band) = (1 − θ/π)^(bits/bands) — fewer bits per
    band + more bands = higher recall at lower cosine thresholds."""

    def __init__(self, *, dim: int, bits: int = 64, bands: int = 8,
                 seed: int = 42,
                 id_column: str = "vec_id", vec_column: str = "embedding"):
        if bits % bands:
            raise ValueError("bits must be divisible by bands")
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((bits, dim))
        self.bits = bits
        self.bands = bands
        self.band_bits = bits // bands
        self.id_column = id_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch[self.vec_column]).astype(np.float64)
        proj = mat @ self.planes.T  # (B, bits)
        bitvals = (proj > 0).astype(np.uint64)
        sig = np.zeros(len(bitvals), dtype=np.uint64)
        for i in range(min(self.bits, 64)):
            sig |= bitvals[:, i] << np.uint64(i)
        mask = np.uint64((1 << self.band_bits) - 1)
        chunks = np.stack(
            [
                (
                    bitvals[:, i * self.band_bits:(i + 1) * self.band_bits]
                    << np.arange(self.band_bits, dtype=np.uint64)
                ).sum(axis=1)
                & mask
                for i in range(self.bands)
            ],
            axis=1,
        )
        return pa.table(
            {
                "row_id": pa.array(
                    batch[self.id_column].to_numpy(zero_copy_only=False),
                    type=pa.int64(),
                ),
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(chunks.reshape(-1), type=pa.uint64()), self.bands
                ),
                "simhash": pa.array(sig, type=pa.uint64()),
                "n_shingles": pa.array(
                    np.full(len(sig), 1, dtype=np.int64)
                ),
            }
        )


def _empty_pairs() -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        }
    )


class _CosineScorer:
    """Stateless-task scorer: per pair batch, gather the two endpoint
    vectors from the broadcast normalized sub-matrix and emit exact
    cosine ≥ threshold survivors."""

    def __init__(self, store_ref: ray.ObjectRef, threshold: float):
        self.store_ref = store_ref
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from deduper_ray.stages.relational import _fetch_broadcast

        store = _fetch_broadcast(self.store_ref)
        sorted_ids, mat = store["ids"], store["mat"]
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        ia = np.searchsorted(sorted_ids, a)
        ib = np.searchsorted(sorted_ids, b)
        cos = (mat[ia] * mat[ib]).sum(axis=1)
        keep = cos >= self.threshold
        return pa.table(
            {
                "id_a": pa.array(a[keep], type=pa.int64()),
                "id_b": pa.array(b[keep], type=pa.int64()),
                "cosine": pa.array(cos[keep], type=pa.float64()),
            }
        )


def embedding_neardup(
    embeddings: rd.Dataset,
    *,
    dim: int,
    cosine_threshold: float = 0.9,
    seed: int = 42,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    bits: int = 64,
    bands: int = 8,
    max_pairs_per_bucket: int = 2000,
    collect_threshold: int = 5_000_000,
) -> pa.Table:
    """Near-duplicate embedding pairs: hyperplane-LSH candidates →
    exact cosine verify. Returns (id_a, id_b, cosine), id_a < id_b.

    Adaptive candidate resolution (same switch as the text pipeline,
    pipelines/neardup.py): below ``collect_threshold`` raw pair rows
    the driver collect + packed np.unique beats a second distributed
    sort; above it the pairs stay a Dataset end-to-end and scoring
    fans out as stateless tasks over the broadcast vector store
    (bounded by candidate ENDPOINTS, not pairs). Tune
    ``bands``/``bits`` per threshold: recall per band is
    (1 − θ/π)^(bits/bands)."""
    import pyarrow.compute as pc

    from deduper_ray.functions.util import dataset_to_table
    from deduper_ray.stages.lsh import (
        candidate_pair_dataset,
        candidate_pairs,
        collect_candidate_pairs,
    )

    signed = embeddings.map_batches(
        HyperplaneSigner,
        fn_constructor_kwargs={
            "dim": dim, "bits": bits, "bands": bands, "seed": seed,
            "id_column": id_column, "vec_column": vec_column,
        },
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).materialize()
    scanned = candidate_pairs(
        signed, bands=bands, max_pairs_per_bucket=max_pairs_per_bucket
    ).materialize()
    n_scanned = scanned.count()
    if n_scanned <= collect_threshold:
        ctbl, n_dropped = collect_candidate_pairs(
            scanned, max_pairs_per_bucket=max_pairs_per_bucket
        )
        cands = rd.from_arrow(ctbl) if ctbl.num_rows else None
        n_cands = ctbl.num_rows
    else:
        cands, n_dropped = candidate_pair_dataset(
            scanned, max_pairs_per_bucket=max_pairs_per_bucket
        )
        cands = cands.materialize()
        n_cands = cands.count()
    if n_dropped:
        import logging

        logging.getLogger(__name__).warning(
            "hyperplane-LSH bucket cap dropped %d candidate pairs "
            "(max_pairs_per_bucket=%d)", n_dropped, max_pairs_per_bucket,
        )
    if not n_cands:
        return _empty_pairs()

    # endpoint id set: per-block local unique, tiny driver union —
    # bounded by candidate DOCS (≪ pairs)
    id_blocks = dataset_to_table(
        cands.map_batches(
            lambda t: pa.table(
                {
                    "id": pa.array(
                        np.unique(
                            np.concatenate(
                                [
                                    t["id_a"].to_numpy(zero_copy_only=False),
                                    t["id_b"].to_numpy(zero_copy_only=False),
                                ]
                            )
                        ),
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        pa.schema([("id", pa.int64())]),
    )
    ids = np.unique(id_blocks["id"].to_numpy(zero_copy_only=False))
    ids_ref = ray.put(pa.array(ids, type=pa.int64()))
    sub = dataset_to_table(
        embeddings.map_batches(
            lambda t: t.filter(
                pc.is_in(t[id_column], value_set=ray.get(ids_ref))
            ),
            batch_format="pyarrow",
        )
    )
    sub_ids = sub[id_column].to_numpy(zero_copy_only=False)
    order = np.argsort(sub_ids)
    store_ref = ray.put(
        {
            "ids": sub_ids[order],
            "mat": _normalize(_to_matrix(sub[vec_column]))[order],
        }
    )
    verified = dataset_to_table(
        cands.map_batches(
            _CosineScorer(store_ref, cosine_threshold),
            batch_format="pyarrow",
        ),
        _empty_pairs().schema,
    )
    order = np.lexsort(
        (
            verified["id_b"].to_numpy(zero_copy_only=False),
            verified["id_a"].to_numpy(zero_copy_only=False),
        )
    )
    return verified.take(pa.array(order, type=pa.int64()))


def semantic_dedupe(
    embeddings: rd.Dataset,
    *,
    threshold: float,
    n_cells: int = 16,
    sample_mod: int = 8,
    seed: int = 42,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> rd.Dataset:
    """SemDeDup-shaped semantic dedup: k-means cells over a
    deterministic sample (same index build as ``ivf_topk``), each
    vector assigned to its nearest cell (broadcast centroids, one
    matmul per batch), then WITHIN each cell an exact cosine graph at
    ``threshold`` whose connected components collapse to the min-id
    representative.

    Returns (id_column, rep_id): every vector maps to its semantic
    representative (itself when unclustered). Keep rows with
    ``id == rep_id`` to materialize the deduped corpus.

    Partitioning assumptions: cells are the unit of pairwise work —
    size ``n_cells`` ~ sqrt(corpus) (the SemDeDup regime) so a cell's
    member matrix fits one worker; cross-cell near-dups are missed by
    construction (raise n_cells accuracy via ``n_cells=1`` only at
    toy scale, where the operator degenerates to exact all-pairs —
    the oracle-checkable configuration).
    """
    import pandas as pd

    from deduper_ray.functions.util import dataset_to_table

    def _sample(t: pa.Table) -> pa.Table:
        ids = t[id_column].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % sample_mod == 0)).select([vec_column])

    sample_tbl = dataset_to_table(
        embeddings.map_batches(_sample, batch_format="pyarrow")
    )
    centroids = spherical_kmeans(
        _to_matrix(sample_tbl[vec_column]), n_cells, seed=seed
    )
    cent_ref = ray.put(centroids)

    def _assign(t: pa.Table) -> pa.Table:
        from deduper_ray.stages.relational import _fetch_broadcast

        cent = _fetch_broadcast(cent_ref)
        x = _normalize(_to_matrix(t[vec_column]))
        cell = np.argmax(x @ cent.T, axis=1).astype(np.int64)
        return pa.table(
            {
                id_column: t[id_column],
                "_cell": pa.array(cell),
                vec_column: t[vec_column],
            }
        )

    assigned = embeddings.select_columns(
        [id_column, vec_column]
    ).map_batches(_assign, batch_format="pyarrow")

    def _collapse(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_column].to_numpy()
        x = _normalize(np.stack(df[vec_column].to_numpy()))
        n = len(ids)
        order = np.argsort(ids)
        ids, x = ids[order], x[order]
        # min-id representative via one pass over the upper triangle:
        # processing ids ascending, each vector joins the earliest
        # neighbor's component (path-compressed union-find)
        parent = np.arange(n)

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        sims = x @ x.T
        a_idx, b_idx = np.nonzero(np.triu(sims >= threshold, k=1))
        for i, j in zip(a_idx, b_idx):
            ri, rj = find(int(i)), find(int(j))
            if ri != rj:
                if ri < rj:
                    parent[rj] = ri
                else:
                    parent[ri] = rj
        rep = np.array([ids[find(i)] for i in range(n)])
        return pd.DataFrame({id_column: ids, "rep_id": rep})

    return assigned.groupby("_cell").map_groups(
        _collapse, batch_format="pandas"
    )


# ------------------------------------------------------------ IVF index
#
# Persisted form of the IVF path (the "classic IVF file layout" the
# ivf_topk docstring points to): build ONCE — centroids + vectors
# partitioned into one parquet file-set per cell — then every query
# reads ONLY its probed cells. At 10^9+ vectors this turns per-query
# cost from a full corpus scan into n_probe/n_cells of it, with the
# same deterministic centroids as ivf_topk (same sample, same seed).

def build_ivf_index(
    embeddings: rd.Dataset,
    index_dir: str,
    *,
    n_cells: int = 64,
    sample_mod: int = 8,
    seed: int = 42,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> dict:
    """Partition ``embeddings`` into an on-disk IVF index.

    Layout:
      index_dir/meta.json                 {n_cells, dim, columns, seed}
      index_dir/centroids.npy             (C, d) float64, normalized
      index_dir/cell=<c>/part-*.parquet   (id, embedding, cell) rows

    The cell files are written IN PARALLEL by the map tasks (each task
    writes its batch's slice of each cell under a unique name derived
    from the batch's min id — no coordination, no shuffle); a cell's
    rows may span several files, which the query path reads together.
    """
    import json as _json
    import os

    import pyarrow.parquet as _pq

    from deduper_ray.functions.util import dataset_to_table

    def _sample(t: pa.Table) -> pa.Table:
        ids = t[id_column].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % sample_mod == 0)).select([vec_column])

    sample_tbl = dataset_to_table(
        embeddings.map_batches(_sample, batch_format="pyarrow")
    )
    sample = _to_matrix(sample_tbl[vec_column])
    centroids = spherical_kmeans(sample, n_cells, seed=seed)
    n_cells = len(centroids)

    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    for c in range(n_cells):
        os.makedirs(os.path.join(index_dir, f"cell={c}"), exist_ok=True)
    cent_ref = ray.put(centroids)

    def _write_cells(t: pa.Table) -> pa.Table:
        cent: np.ndarray = ray.get(cent_ref)
        ids = t[id_column].to_numpy(zero_copy_only=False)
        mat = _normalize(_to_matrix(t[vec_column]))
        cells = np.argmax(mat @ cent.T, axis=1)
        tag = int(ids.min()) if ids.size else 0
        written = 0
        for c in np.unique(cells):
            sub = t.filter(pa.array(cells == c)).append_column(
                "cell", pa.array(np.full(int((cells == c).sum()), c,
                                         dtype=np.int64))
            )
            tmp = os.path.join(
                index_dir, f"cell={int(c)}", f"part-{tag:012d}.parquet.tmp"
            )
            _pq.write_table(sub, tmp)
            os.replace(tmp, tmp[: -len(".tmp")])
            written += sub.num_rows
        return pa.table({"written": pa.array([written], type=pa.int64())})

    counts = dataset_to_table(
        embeddings.map_batches(_write_cells, batch_format="pyarrow"),
        pa.schema([("written", pa.int64())]),
    )
    total = int(np.sum(counts["written"].to_numpy(zero_copy_only=False))) if counts.num_rows else 0
    dim = centroids.shape[1]
    meta = {
        "n_cells": int(n_cells), "dim": int(dim), "rows": total,
        "id_column": id_column, "vec_column": vec_column, "seed": seed,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        _json.dump(meta, f, indent=2)
    return meta


def ivf_index_topk(
    index_dir: str,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    n_probe: int = 8,
    exclude_self: bool = True,
) -> pa.Table:
    """Top-k over a persisted IVF index: read ONLY the probed cells.

    Same scoring semantics as ``ivf_topk`` (each query scores vectors
    in its probed cells); the read itself is the pruning — unprobed
    cell directories never leave storage.
    """
    import glob as _glob
    import json as _json
    import os

    from deduper_ray.functions.util import dataset_to_table

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = _json.load(f)
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    n_probe = min(n_probe, len(centroids))
    probes = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]

    needed = sorted(set(int(c) for row in probes for c in row))
    files = [
        f
        for c in needed
        for f in sorted(
            _glob.glob(os.path.join(index_dir, f"cell={c}", "part-*.parquet"))
        )
    ]
    if not files:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    ds = rd.read_parquet(files)
    state_ref = ray.put(
        {
            "qids": np.asarray(query_ids),
            "qmat": qmat,
            "probes": probes,
        }
    )
    id_col, vec_col = meta["id_column"], meta["vec_column"]
    topk = k

    def _score(t: pa.Table) -> pa.Table:
        s = ray.get(state_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cells = t["cell"].to_numpy(zero_copy_only=False)
        mat = _normalize(_to_matrix(t[vec_col]))
        out = {"query_id": [], "neighbor_id": [], "score": []}
        for qi in range(len(s["qids"])):
            mask = np.isin(cells, s["probes"][qi])
            if not mask.any():
                continue
            sims = mat[mask] @ s["qmat"][qi]
            kk = min(topk + 1, sims.size)
            part = np.argpartition(-sims, kk - 1)[:kk]
            out["query_id"].extend([int(s["qids"][qi])] * kk)
            out["neighbor_id"].extend(ids[mask][part].tolist())
            out["score"].extend(sims[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
                "score": pa.array(out["score"], type=pa.float64()),
            }
        )

    cand = dataset_to_table(
        ds.map_batches(_score, batch_format="pyarrow"),
        pa.schema(
            [
                ("query_id", pa.int64()),
                ("neighbor_id", pa.int64()),
                ("score", pa.float64()),
            ]
        ),
    )
    return _merge_topk(cand, query_ids, k, exclude_self)
