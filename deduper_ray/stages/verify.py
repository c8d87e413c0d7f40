"""Candidate-pair verification: MinHash-estimate Jaccard + SimHash
Hamming agreement (+ optional exact re-shingled Jaccard).

Candidates out of LSH are pre-filtered but noisy; verification kills
plausible-but-wrong pairs before clustering (keeping the union-find
edge set small — SURVEY.md §7.4).

Scale shape: the verifier is an actor pool holding the (narrow)
signature/simhash arrays for the CANDIDATE docs only, broadcast once
via ``ray.put``. Candidate docs ≪ corpus docs, and each entry is
K·8 + 8 bytes, so the broadcast stays small even at large corpus
sizes. For candidate sets too large to broadcast, the same
verification can be expressed as two co-partitioned groupby joins
(pair → endpoint signatures); documented, not needed at current scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


# pair count above which scoring fans out as stateless tasks over the
# broadcast store instead of running inline on the (single-threaded)
# driver — patchable for tests
INLINE_SCORING_MAX = 131_072


def build_signature_store(
    signatures: rd.Dataset,
    candidate_ids: np.ndarray | None,
    *,
    id_column: str = "row_id",
) -> dict:
    """Gather (minhash, simhash, n_shingles) for candidate ids into a
    dense driver-side lookup (sorted ids + matrix). ``candidate_ids``
    None → the FULL table (used when the candidate set is most of the
    corpus and filtering would save nothing)."""
    import pyarrow.compute as pc

    from deduper_ray.functions.util import dataset_to_table

    if candidate_ids is None:
        tbl = dataset_to_table(
            signatures.map_batches(
                lambda t: t.select(
                    [id_column, "minhash", "simhash", "n_shingles"]
                ),
                batch_format="pyarrow",
            )
        )
    else:
        ids_ref = ray.put(pa.array(candidate_ids, type=pa.int64()))

        def _filter(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.is_in(t[id_column], value_set=ray.get(ids_ref))
            )

        tbl = dataset_to_table(
            signatures.map_batches(_filter, batch_format="pyarrow")
        )
    return _store_from_table(tbl, id_column)


def _store_from_table(tbl: pa.Table, id_column: str) -> dict:
    ids = tbl[id_column].to_numpy(zero_copy_only=False)
    K = tbl["minhash"].type.list_size
    flat = (
        tbl["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .reshape(-1, K)
    )  # dtype preserved (uint32) — the verify gather is bandwidth-bound
    simhash = tbl["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    n_sh = tbl["n_shingles"].to_numpy(zero_copy_only=False)
    n = ids.size
    if n:
        mn, mx = int(ids.min()), int(ids.max())
        span = mx - mn + 1
        if span <= max(16, int(1.25 * n)):
            # dense ids (the deterministic reader emits 0..n-1): build a
            # direct-index store by one scatter — no argsort at build,
            # no searchsorted at query (both matter when every scoring
            # worker builds its own store)
            sigs_d = np.zeros((span, K), dtype=flat.dtype)
            sim_d = np.zeros(span, dtype=np.uint64)
            nsh_d = np.zeros(span, dtype=n_sh.dtype)
            pos = ids - mn
            sigs_d[pos] = flat
            sim_d[pos] = simhash
            nsh_d[pos] = n_sh
            return {
                "base": mn, "ids": None, "sigs": sigs_d,
                "simhash": sim_d, "n_shingles": nsh_d,
            }
    order = np.argsort(ids)
    return {
        "base": None,
        "ids": ids[order],
        "sigs": flat[order],
        "simhash": simhash[order],
        "n_shingles": n_sh[order],
    }


def collect_signature_store(
    signatures: rd.Dataset,
    candidate_ids: np.ndarray,
    *,
    id_column: str = "row_id",
) -> ray.ObjectRef:
    """build_signature_store + one object-store put (broadcast form)."""
    return ray.put(
        build_signature_store(signatures, candidate_ids, id_column=id_column)
    )


class AsyncStoreBuilder:
    """Full-corpus broadcast signature store built on a driver
    BACKGROUND thread, overlapped with the LSH candidate stage.

    The store depends only on the signatures stage output, so its
    driver-side assembly (concat + dense scatter of corpus × K × 4 B —
    a CPU-count-independent serial term, ~4-8 s at 2×10^6 docs) can run
    while the cluster executes the band-explode sort. ``verify_pairs``
    joins via ``ref()`` when scoring starts; errors re-raise there.
    ``signatures`` should be materialized (blocks already in the object
    store) — the thread only fetches refs and scatters."""

    def __init__(self, signatures: rd.Dataset, *, id_column: str = "row_id"):
        import threading

        self._box: list = []
        self._ref: ray.ObjectRef | None = None

        def _build() -> None:
            try:
                tbls = [
                    t
                    for t in ray.get(
                        signatures.materialize().to_arrow_refs()
                    )
                    if t.num_columns > 0
                ]
                if not tbls:  # empty corpus → trivially-empty store
                    self._ref = ray.put(
                        {
                            "base": None,
                            "ids": np.empty(0, dtype=np.int64),
                            "sigs": np.empty((0, 1), dtype=np.uint32),
                            "simhash": np.empty(0, dtype=np.uint64),
                            "n_shingles": np.empty(0, dtype=np.int64),
                        }
                    )
                    return
                self._ref = ray.put(
                    _store_from_table(pa.concat_tables(tbls), id_column)
                )
            except BaseException as e:  # noqa: BLE001 — re-raised in ref()
                self._box.append(e)

        self._t = threading.Thread(target=_build, name="sig-store", daemon=True)
        self._t.start()

    def ref(self) -> ray.ObjectRef:
        self._t.join()
        if self._box:
            raise self._box[0]
        return self._ref


class PairVerifier:
    """map_batches over candidate pairs → verified pairs with scores.

    Emits per pair: est_jaccard (MinHash agreement fraction),
    hamming (SimHash bit distance), est_containment (est of
    |A∩B| / min(|A|,|B|) from Jaccard + set sizes).

    Accepts the store dict directly (driver-inline scoring) or an
    ObjectRef (actor-pool broadcast).
    """

    def __init__(self, store_ref: ray.ObjectRef | dict):
        s = ray.get(store_ref) if isinstance(store_ref, ray.ObjectRef) else store_ref
        self.base = s.get("base")
        self.ids: np.ndarray | None = s["ids"]
        self.sigs: np.ndarray = s["sigs"]
        self.simhash: np.ndarray = s["simhash"]
        self.n_shingles: np.ndarray = s["n_shingles"]

    def _index(self, ids: np.ndarray) -> np.ndarray:
        if self.base is not None:
            return ids - self.base  # dense store: direct indexing
        return np.searchsorted(self.ids, ids)

    _CHUNK = 1_000_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows > self._CHUNK:
            # chunked: the (rows × K) gathers allocate rows·K·itemsize
            # twice — monolithic gathers at ~10M rows thrash the
            # allocator (measured 8× slower than 1M chunks)
            return pa.concat_tables(
                [
                    self(batch.slice(i, self._CHUNK))
                    for i in range(0, batch.num_rows, self._CHUNK)
                ]
            )
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        ia, ib = self._index(a), self._index(b)
        est_j = (self.sigs[ia] == self.sigs[ib]).mean(axis=1)
        x = self.simhash[ia] ^ self.simhash[ib]
        # vectorized popcount over the 8 bytes of each uint64
        hamming = (
            np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        na = self.n_shingles[ia].astype(np.float64)
        nb = self.n_shingles[ib].astype(np.float64)
        mn = np.minimum(na, nb)
        # |A∩B| = j·(|A|+|B|)/(1+j); containment = that / min(|A|,|B|)
        inter = est_j * (na + nb) / (1.0 + est_j)
        est_c = np.where(mn > 0, np.minimum(inter / np.maximum(mn, 1.0), 1.0), 0.0)
        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "est_jaccard": pa.array(est_j, type=pa.float64()),
                "hamming": pa.array(hamming, type=pa.int64()),
                "est_containment": pa.array(est_c, type=pa.float64()),
            }
        )


def dedup_pairs_arrays(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unique (a, b) pairs. Fast path packs both ids into one uint64
    (single-key np.unique, several× faster than a 2-key lexsort) when
    ids fit in 32 bits; falls back to lexsort otherwise (ids at
    10^12-row scale exceed 2^32)."""
    if a.size == 0:
        return a, b
    if a.max() < (1 << 32) and b.max() < (1 << 32) and a.min() >= 0:
        packed = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        packed = np.unique(packed)
        return (
            (packed >> np.uint64(32)).astype(np.int64),
            (packed & np.uint64(0xFFFFFFFF)).astype(np.int64),
        )
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.ones(a.size, dtype=bool)
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[keep], b[keep]


def dedup_pair_table(pair_tbl: pa.Table) -> pa.Table:
    """Driver-side pair dedup — replaces a full shuffle."""
    if pair_tbl.num_rows == 0:
        return pair_tbl
    a, b = dedup_pairs_arrays(
        pair_tbl["id_a"].to_numpy(zero_copy_only=False),
        pair_tbl["id_b"].to_numpy(zero_copy_only=False),
    )
    return pa.table(
        {
            "id_a": pa.array(a, type=pa.int64()),
            "id_b": pa.array(b, type=pa.int64()),
        }
    )


def verify_pairs(
    pairs: rd.Dataset | pa.Table,
    signatures: rd.Dataset,
    *,
    threshold: float = 0.7,
    simhash_max_hamming: int | None = None,
    id_column: str = "row_id",
    prebuilt_store: "AsyncStoreBuilder | ray.ObjectRef | None" = None,
) -> rd.Dataset:
    """Score candidate pairs and keep those passing EITHER the
    estimated-Jaccard threshold or (when enabled) the SimHash Hamming
    bound — the two verifiers catch different failure modes (Jaccard:
    set overlap; SimHash: weighted bit agreement).

    ``prebuilt_store``: a full-corpus broadcast store assembled ahead
    of time (``AsyncStoreBuilder`` — overlapped with the candidate
    stage — or a raw ``ray.put`` ref); skips the driver-side store
    assembly that is otherwise this stage's serial floor."""
    import pyarrow.compute as pc

    from deduper_ray.functions.util import dataset_to_table

    def _keep(t: pa.Table) -> pa.Table:
        ok = pc.greater_equal(t["est_jaccard"], threshold)
        if simhash_max_hamming is not None:
            ok = pc.or_(
                ok, pc.less_equal(t["hamming"], simhash_max_hamming)
            )
        return t.filter(ok)

    pre_ref: ray.ObjectRef | None = None
    if prebuilt_store is not None:
        # join the background assembly (it ran during the candidate
        # stage; by scoring time it is usually already done)
        pre_ref = (
            prebuilt_store.ref()
            if isinstance(prebuilt_store, AsyncStoreBuilder)
            else prebuilt_store
        )

    if isinstance(pairs, rd.Dataset) and "kind" not in pairs.schema().names:
        # Dataset-native large-pair path: pairs NEVER collect on the
        # driver. The store covers the full corpus (the candidate set
        # is typically most of it at this volume); scoring fans out as
        # capped stateless tasks; only the (small) verified survivors
        # are ever materialized downstream.
        pairs = pairs.materialize()
        n_pairs = pairs.count()
        if n_pairs > 1_000_000:
            # store assembled ONCE on the driver and broadcast:
            # measured 0.8 s at 10^6 docs (block fetch is zero-copy on
            # the owning node, ray.put of the numpy store is zero-copy
            # into plasma, workers map it zero-copy back out). The
            # per-WORKER assembly this replaces cost ~13 s of
            # CPU-count-independent wall (N workers each concatenating
            # + scattering the 0.5 GB store saturates memory
            # bandwidth) — it was the verify stage's serial floor.
            if pre_ref is not None:
                store_ref = pre_ref
            else:
                tbls = [
                    t
                    for t in ray.get(signatures.materialize().to_arrow_refs())
                    if t.num_columns > 0
                ]
                store_ref = ray.put(
                    _store_from_table(pa.concat_tables(tbls), id_column)
                )

            def _score_ds(batch: pa.Table) -> pa.Table:
                key = store_ref.binary()
                verifier = _VERIFIER_CACHE.get(key)
                if verifier is None:
                    verifier = _cache_verifier(key, PairVerifier(store_ref))
                return _keep(verifier(batch))

            cap = _scoring_cap()
            return pairs.map_batches(
                _score_ds, batch_format="pyarrow", batch_size=262_144,
                concurrency=cap,
            )
        pair_tbl = dataset_to_table(
            pairs, pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
        )
    elif isinstance(pairs, pa.Table):
        pair_tbl = pairs
    else:
        pair_tbl = dataset_to_table(
            pairs,
            pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
        )
    if "kind" in pair_tbl.column_names:
        # raw candidate_pairs() scan output: resolve fragments/sentinels
        from deduper_ray.stages.lsh import collect_candidate_pairs as _ccp
        import ray.data as _rd

        pair_tbl, _ = _ccp(_rd.from_arrow(pair_tbl))
    pair_tbl = dedup_pair_table(pair_tbl)
    if pair_tbl.num_rows == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "est_jaccard": pa.array([], type=pa.float64()),
                    "hamming": pa.array([], type=pa.int64()),
                    "est_containment": pa.array([], type=pa.float64()),
                }
            )
        )
    if pre_ref is None:
        cand_ids = np.unique(
            np.concatenate(
                [
                    pair_tbl["id_a"].to_numpy(zero_copy_only=False),
                    pair_tbl["id_b"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        store = build_signature_store(
            signatures, cand_ids, id_column=id_column
        )
    else:
        store = None  # full-corpus broadcast store already assembled

    # Small pair sets: score inline on the driver (one numpy op beats a
    # Ray dispatch). Large sets: the signature gather is
    # memory-bandwidth bound (pairs × K × 8 bytes twice), so fan it out
    # as STATELESS tasks over the broadcast store — elastic CPU use,
    # store deserialized once per worker process via the cache.
    # Threshold at 2^17 pairs: the driver gather is SINGLE-threaded
    # (measured ~26 µs/pair on this box → 17 s inline at 670k pairs,
    # the old 1M cutoff's worst case vs ~2-3 s fanned out), while the
    # dispatch+store-put overhead is well under a second.
    if pair_tbl.num_rows <= INLINE_SCORING_MAX:
        scored = PairVerifier(pre_ref if store is None else store)(pair_tbl)
        return rd.from_arrow(_keep(scored))
    store_ref = pre_ref if store is None else ray.put(store)

    def _score(batch: pa.Table) -> pa.Table:
        key = store_ref.binary()
        verifier = _VERIFIER_CACHE.get(key)
        if verifier is None:
            verifier = _cache_verifier(key, PairVerifier(store_ref))
        return _keep(verifier(batch))

    # one block per slice (no repartition shuffle): from_arrow over a
    # list of table slices makes each slice its own task input. The
    # task pool is CAPPED at 8: scoring is a memory-bandwidth-bound
    # gather, and concurrency beyond ~8 on one memory subsystem
    # reverse-scales (measured 22s at 30 tasks vs 7s at 6); on a
    # multi-node cluster the cap applies per job, with per-node
    # bandwidth restoring scaling.
    # slice so ALL scoring-cap slots fill even just past the inline
    # threshold (a 262k floor left a 670k-pair set on 3 tasks ≈ 7 s;
    # the gather is latency- not bandwidth-bound on virtualized hosts,
    # so concurrency up to the cap is a straight win)
    chunk = max(65_536, -(-pair_tbl.num_rows // _scoring_cap()))
    slices = [
        pair_tbl.slice(i, chunk) for i in range(0, pair_tbl.num_rows, chunk)
    ]
    return rd.from_arrow(slices).map_batches(
        _score, batch_format="pyarrow", batch_size=None,
        concurrency=_scoring_cap(),
    )


class ShingleSetBuilder:
    """Actor-pool stage: (id, text) rows → (id, shingles list<uint64>)
    with each doc's SORTED unique shingle-hash array — the exact-verify
    analogue of MinHashSigner (same rolling-hash shingling, so exact
    and estimated Jaccard agree on the same shingle universe)."""

    def __init__(self, *, shingle_k: int, text_column: str,
                 id_column: str, use_token_shingles: bool = False):
        from deduper_ray.stages.minhash import (
            shingle_hashes,
            token_shingle_hashes,
        )

        self.k = shingle_k
        self.text_column = text_column
        self.id_column = id_column
        self._shingle = shingle_hashes
        self._token_shingle = token_shingle_hashes
        if use_token_shingles:
            import re

            self.token_pattern = re.compile(rb"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")
        else:
            self.token_pattern = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from deduper_ray.functions.hashing import _utf8_slices

        # zero-copy doc bytes off the Arrow value buffer (same trick as
        # MinHashSigner — no per-doc str/encode round-trip)
        offs, buf = _utf8_slices(batch[self.text_column])
        arrays = []
        for a, b in zip(offs, offs[1:]):
            data = buf[a:b]
            if self.token_pattern is not None:
                sh = self._token_shingle(
                    bytes(data), self.k, self.token_pattern
                )
            else:
                sh = self._shingle(data, self.k)
            arrays.append(np.sort(sh))
        sizes = np.array([a.size for a in arrays], dtype=np.int32)
        flat = (
            np.concatenate(arrays) if arrays else np.empty(0, dtype=np.uint64)
        )
        offsets = np.zeros(len(arrays) + 1, dtype=np.int32)
        np.cumsum(sizes, out=offsets[1:])
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "shingles": pa.ListArray.from_arrays(
                    pa.array(offsets), pa.array(flat, type=pa.uint64())
                ),
            }
        )


class _ExactJaccardScorer:
    """Stateless-task scorer over candidate pairs: per pair, exact
    |A∩B| via np.intersect1d on the two sorted shingle arrays from the
    broadcast store. Emits exact jaccard + exact containment."""

    def __init__(self, store_ref: ray.ObjectRef, threshold: float):
        self.store_ref = store_ref
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from deduper_ray.stages.relational import _fetch_broadcast

        store = _fetch_broadcast(self.store_ref)
        ids, offsets, flat = store["ids"], store["offsets"], store["flat"]
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        ia = np.searchsorted(ids, a)
        ib = np.searchsorted(ids, b)
        n = a.size
        jac = np.empty(n, dtype=np.float64)
        cont = np.empty(n, dtype=np.float64)
        for i in range(n):  # per-pair C-speed set intersection
            sa = flat[offsets[ia[i]]:offsets[ia[i] + 1]]
            sb = flat[offsets[ib[i]]:offsets[ib[i] + 1]]
            if sa.size == 0 and sb.size == 0:
                jac[i] = 1.0
                cont[i] = 1.0
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            jac[i] = inter / (sa.size + sb.size - inter)
            mn = min(sa.size, sb.size)
            cont[i] = inter / mn if mn else 0.0
        keep = jac >= self.threshold
        return pa.table(
            {
                "id_a": pa.array(a[keep], type=pa.int64()),
                "id_b": pa.array(b[keep], type=pa.int64()),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
                "containment": pa.array(cont[keep], type=pa.float64()),
            }
        )


def verify_pairs_exact(
    pairs: rd.Dataset | pa.Table,
    text_ds: rd.Dataset,
    *,
    threshold: float = 0.7,
    shingle_k: int = 8,
    text_column: str = "content",
    id_column: str = "row_id",
    use_token_shingles: bool = False,
) -> rd.Dataset:
    """EXACT-text verification: candidate pairs are re-scored with the
    true k-shingle Jaccard (not the MinHash estimate) and kept iff
    jaccard ≥ threshold. Output: (id_a, id_b, jaccard, containment).

    Scale shape: shingle arrays are computed DISTRIBUTED for the
    candidate-ENDPOINT docs only (broadcast id filter — no shuffle),
    then broadcast once as one flat uint64 buffer + offsets; scoring
    fans out as stateless tasks over the pair set (Dataset or Table).
    The broadcast is bounded by Σ|shingles| over endpoint docs — for
    candidate sets beyond worker heap, co-partition pairs with the
    shingle table on the endpoint id instead (same decomposition as
    verify_pairs_copartitioned)."""
    import pyarrow.compute as pc

    from deduper_ray.functions.util import dataset_to_table

    if isinstance(pairs, pa.Table):
        pair_src: rd.Dataset = rd.from_arrow(pairs) if pairs.num_rows else None
        if pair_src is None:
            return rd.from_arrow(_empty_exact())
    else:
        pair_src = pairs.materialize()
        if pair_src.count() == 0:
            return rd.from_arrow(_empty_exact())

    id_blocks = dataset_to_table(
        pair_src.map_batches(
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
    shingled = dataset_to_table(
        text_ds.map_batches(
            lambda t: t.filter(
                pc.is_in(t[id_column], value_set=ray.get(ids_ref))
            ),
            batch_format="pyarrow",
        ).map_batches(
            ShingleSetBuilder,
            fn_constructor_kwargs={
                "shingle_k": shingle_k,
                "text_column": text_column,
                "id_column": id_column,
                "use_token_shingles": use_token_shingles,
            },
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )
    sids = shingled[id_column].to_numpy(zero_copy_only=False)
    order = np.argsort(sids)
    sh_col = shingled["shingles"].combine_chunks()
    raw_offsets = sh_col.offsets.to_numpy(zero_copy_only=False)
    flat_all = sh_col.flatten().to_numpy(zero_copy_only=False)
    # re-pack in sorted-id order
    sizes = (raw_offsets[1:] - raw_offsets[:-1])[order]
    offsets = np.zeros(sids.size + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    flat = np.empty(flat_all.size, dtype=np.uint64)
    for j, oi in enumerate(order):
        flat[offsets[j]:offsets[j + 1]] = flat_all[
            raw_offsets[oi]:raw_offsets[oi + 1]
        ]
    store_ref = ray.put(
        {"ids": sids[order], "offsets": offsets, "flat": flat}
    )
    return pair_src.map_batches(
        _ExactJaccardScorer(store_ref, threshold),
        batch_format="pyarrow",
        concurrency=_scoring_cap(),
    )


def _empty_exact() -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
            "containment": pa.array([], type=pa.float64()),
        }
    )


def verify_pairs_copartitioned(
    pairs: rd.Dataset,
    signatures: rd.Dataset,
    *,
    threshold: float = 0.7,
    simhash_max_hamming: int | None = None,
    id_column: str = "row_id",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """The NO-BROADCAST verification path for corpora whose signature
    store exceeds the per-node object store budget (10^8-10^9+ docs —
    SCALE.md "Driver-resident state" item 2):

      pairs → two endpoint rows each → SORT-MERGE attach of the
      signature table on the doc id (one union + range sort; spills,
      never actor-buffered) → sort by pair key → per-block vectorized
      adjacent-row scoring (block-edge rows stitched on the driver,
      ≤2 runs per block).

    Everything moves through range-sort exchanges; nothing is
    broadcast and the driver holds only block-edge rows. Scores match
    PairVerifier bit-for-bit (same arithmetic on the same arrays).

    ``num_partitions`` is retained for API compatibility and ignored
    (the former Dataset.join path sized its hash-shuffle aggregators
    with it; the sort path lets Ray size the exchange).
    """
    import pyarrow.compute as pc

    from deduper_ray.functions.util import dataset_to_table

    def _endpoints(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_column: pa.array(np.concatenate([a, b]), type=pa.int64()),
                "id_a": pa.array(np.concatenate([a, a]), type=pa.int64()),
                "id_b": pa.array(np.concatenate([b, b]), type=pa.int64()),
            }
        )

    endpoints = pairs.map_batches(_endpoints, batch_format="pyarrow")

    def _pack_sigs(t: pa.Table) -> pa.Table:
        # carry the signature as fixed-size binary built zero-copy from
        # the matrix buffer (a per-row tobytes() loop paid 10^7 Python
        # iterations at 10^7 docs)
        K = t["minhash"].type.list_size
        mat = (
            t["minhash"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).reshape(-1, K)
        )
        width = mat.dtype.itemsize * K
        blob = pa.Array.from_buffers(
            pa.binary(width), mat.shape[0],
            [None, pa.py_buffer(np.ascontiguousarray(mat))],
        )
        return pa.table(
            {
                id_column: t[id_column],
                "sig_bin": blob,
                "simhash": t["simhash"],
                "n_shingles": t["n_shingles"],
            }
        )

    packed = signatures.map_batches(_pack_sigs, batch_format="pyarrow")
    # SORT-MERGE attach instead of Dataset.join: Ray's hash-shuffle
    # join buffers both sides in per-partition aggregator ACTORS —
    # measured ~3 GB heap × num_partitions actors at 10^7 docs on one
    # box (global OOM; BASELINE.md §10.4), while the range sort's
    # pull-based exchange spills per-block and is ~9× faster on this
    # row shape anyway (SCALE.md round-5 session-4 measurement).
    joined = _attach_endpoint_signatures(endpoints, packed, id_column)
    srt = joined.sort(["id_a", "id_b", id_column])

    def _score_block(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return _empty_scored(with_blob=True), _edge_rows(t, [])
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        ep = t[id_column].to_numpy(zero_copy_only=False)
        same = np.zeros(n, dtype=bool)
        # endpoint-differs guard: duplicated pair rows (same endpoint
        # twice, possible from the ≤1-per-block-boundary candidate dup)
        # must not self-compare
        same[:-1] = (
            (a[:-1] == a[1:]) & (b[:-1] == b[1:]) & (ep[:-1] != ep[1:])
        )
        first_idx = np.nonzero(same)[0]
        # interior complete pairs: rows i, i+1; exclude block-edge rows
        interior = first_idx[(first_idx > 0) & (first_idx + 1 < n - 1)]
        edge_positions = [0, n - 1] if n > 1 else [0]
        # rows 0 and n-1 may belong to pairs split across blocks; also a
        # pair fully at the edge (rows 0-1 or n-2..n-1) is deferred
        deferred = sorted(
            {0, n - 1}
            | set(first_idx[(first_idx == 0) | (first_idx + 1 == n - 1)])
            | set(first_idx[(first_idx == 0) | (first_idx + 1 == n - 1)] + 1)
        )
        sigs = _unpack_sig_bin(t["sig_bin"])
        simhash = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nsh = t["n_shingles"].to_numpy(zero_copy_only=False)
        i = interior
        est_j = (sigs[i] == sigs[i + 1]).mean(axis=1)
        x = simhash[i] ^ simhash[i + 1]
        hamming = (
            np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
            .sum(axis=1).astype(np.int64)
        )
        na = nsh[i].astype(np.float64)
        nb = nsh[i + 1].astype(np.float64)
        mn = np.minimum(na, nb)
        inter = est_j * (na + nb) / (1.0 + est_j)
        est_c = np.where(
            mn > 0, np.minimum(inter / np.maximum(mn, 1.0), 1.0), 0.0
        )
        scored = pa.table(
            {
                "id_a": pa.array(a[i], type=pa.int64()),
                "id_b": pa.array(b[i], type=pa.int64()),
                "est_jaccard": pa.array(est_j, type=pa.float64()),
                "hamming": pa.array(hamming, type=pa.int64()),
                "est_containment": pa.array(est_c, type=pa.float64()),
                "sig_blob": pa.nulls(i.size, type=pa.binary()),
            }
        )
        return scored, _edge_rows(t, deferred)

    def _map(t: pa.Table) -> pa.Table:
        scored, edges = _score_block(t)
        # edges tagged with hamming = -1 so the driver can split them out
        return pa.concat_tables([scored, edges])

    out = srt.map_batches(_map, batch_format="pyarrow", batch_size=None)
    out = out.materialize()
    interior = out.map_batches(
        lambda t: t.filter(pc.greater_equal(t["hamming"], 0)).drop_columns(
            ["sig_blob"]
        ),
        batch_format="pyarrow",
    )
    # stitch deferred edge rows on the driver (≤ ~4 per block)
    edge_tbl = dataset_to_table(
        out.map_batches(
            lambda t: t.filter(pc.less(t["hamming"], 0)),
            batch_format="pyarrow",
        ),
        _empty_scored(with_blob=True).schema,
    )
    extra = _score_edge_rows(edge_tbl)

    def _keep(t: pa.Table) -> pa.Table:
        ok = pc.greater_equal(t["est_jaccard"], threshold)
        if simhash_max_hamming is not None:
            ok = pc.or_(ok, pc.less_equal(t["hamming"], simhash_max_hamming))
        return t.filter(ok)

    result = interior.map_batches(_keep, batch_format="pyarrow")
    if extra.num_rows:
        result = result.union(rd.from_arrow(_keep(extra)))
    return result


def _attach_endpoint_signatures(
    endpoints: rd.Dataset, packed: rd.Dataset, id_column: str
) -> rd.Dataset:
    """Sort-merge replacement for the former hash join in
    ``verify_pairs_copartitioned``: attach each endpoint row's
    signature record without broadcasting the store and without
    buffering either side in actor heaps.

      union(sig rows side=0, endpoint rows side=1)
        → range sort by (id, side)            [the one exchange]
        → per-block run scan: every id run is [sig row, endpoint
          rows...]; interior runs attach vectorized (two Table.take
          calls); runs touching a block edge are deferred whole
        → driver stitch of the deferred edge runs (≤2 runs per block;
          a run is one doc's endpoint rows — bounded by the per-bucket
          pair caps, not by corpus size)

    Inner-join semantics: an endpoint whose id has no signature row
    (impossible for LSH-derived candidates, possible for caller-
    supplied pairs) is dropped, matching the Dataset.join behavior.
    Output columns: (id_a, id_b, id_column, sig_bin, simhash,
    n_shingles) — exactly the former join schema.
    """
    import pyarrow.compute as pc

    from deduper_ray.functions.util import dataset_to_table

    # null-column types for the endpoint side, straight from the packed
    # schema (metadata-only on a materialized/read dataset)
    pk_schema = packed.schema()
    pk_types = dict(zip(pk_schema.names, pk_schema.types))
    sig_bin_t = pk_types["sig_bin"]
    simhash_t = pk_types["simhash"]
    nsh_t = pk_types["n_shingles"]

    # the union carries sig_bin as VARIABLE binary: a fixed_size_binary
    # null still allocates its full width, so typed nulls on the
    # endpoint side cost width bytes/row — 8 GB of null padding at
    # 10^7 docs (2 endpoint rows per pair, K=128) that the sort then
    # moves twice. Variable-binary nulls cost one offset; the real
    # blobs re-fix at the output cast.
    def _sig_side(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        n = t.num_rows
        return pa.table(
            {
                id_column: t[id_column],
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "id_a": pa.nulls(n, type=pa.int64()),
                "id_b": pa.nulls(n, type=pa.int64()),
                "sig_bin": _pc.cast(t["sig_bin"], pa.binary()),
                "simhash": t["simhash"],
                "n_shingles": t["n_shingles"],
            }
        )

    def _ep_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                id_column: t[id_column],
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "id_a": t["id_a"],
                "id_b": t["id_b"],
                "sig_bin": pa.nulls(n, type=pa.binary()),
                "simhash": pa.nulls(n, type=simhash_t),
                "n_shingles": pa.nulls(n, type=nsh_t),
            }
        )

    uni = packed.map_batches(_sig_side, batch_format="pyarrow").union(
        endpoints.map_batches(_ep_side, batch_format="pyarrow")
    )
    # materialize the union before the sort: feeding
    # Union -> AllToAll[Sort] directly into one streaming plan left the
    # executor spinning without launching sort tasks at 10^7 docs
    # (driver 93% CPU, workers idle, "UnionOperator has no outputs"),
    # while a materialized input sorts immediately — one extra pass
    # over narrow+blob rows buys a working exchange
    uni = uni.materialize()
    srt = uni.sort([id_column, "side"])

    out_cols = ["id_a", "id_b", id_column, "sig_bin", "simhash",
                "n_shingles"]

    def _attach_block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("_edge", pa.array([], type=pa.int8()))
        ids = t[id_column].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        change = ids[1:] != ids[:-1]
        run_id = np.concatenate(([0], np.cumsum(change)))
        n_runs = int(run_id[-1]) + 1
        run_starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        # edge runs (first/last of the block) may continue in a
        # neighboring block — defer them whole
        is_edge = (run_id == 0) | (run_id == n_runs - 1)
        sig_src = run_starts[run_id]
        valid = (~is_edge) & (side == 1) & (side[sig_src] == 0)
        idx = np.flatnonzero(valid)
        ep = t.take(pa.array(idx, type=pa.int64()))
        sg = t.take(pa.array(sig_src[idx], type=pa.int64()))
        attached = pa.table(
            {
                "id_a": ep["id_a"],
                "id_b": ep["id_b"],
                id_column: ep[id_column],
                "sig_bin": sg["sig_bin"],
                "simhash": sg["simhash"],
                "n_shingles": sg["n_shingles"],
                "side": pa.array(np.ones(idx.size, dtype=np.int8)),
                "_edge": pa.array(np.zeros(idx.size, dtype=np.int8)),
            }
        )
        edge = t.filter(pa.array(is_edge)).append_column(
            "_edge", pa.array(np.ones(int(is_edge.sum()), dtype=np.int8))
        )
        return pa.concat_tables(
            [attached.select(edge.column_names), edge], promote_options="none"
        )

    marked = srt.map_batches(
        _attach_block, batch_format="pyarrow", batch_size=None
    ).materialize()
    # release the materialized union's plasma blocks: marked is the
    # only consumer and it just materialized (peak-store relief — the
    # attach output carries the blobs now)
    del uni, srt
    def _interior(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["_edge"], 0)).select(out_cols)
        # restore the fixed-width blob type downstream scoring expects
        return t.set_column(
            t.schema.get_field_index("sig_bin"), "sig_bin",
            pc.cast(t["sig_bin"], sig_bin_t),
        )

    interior = marked.map_batches(_interior, batch_format="pyarrow")
    # driver stitch: the deferred edge runs, re-attached with the same
    # run-scan logic over the (tiny) globally re-sorted fragment table
    frag = dataset_to_table(
        marked.map_batches(
            lambda t: t.filter(pc.equal(t["_edge"], 1)),
            batch_format="pyarrow",
        )
    )
    if frag.num_rows:
        order = pc.sort_indices(
            frag, sort_keys=[(id_column, "ascending"), ("side", "ascending")]
        )
        frag = frag.take(order)
        ids = frag[id_column].to_numpy(zero_copy_only=False)
        side = frag["side"].to_numpy(zero_copy_only=False)
        change = ids[1:] != ids[:-1]
        run_id = np.concatenate(([0], np.cumsum(change)))
        run_starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        sig_src = run_starts[run_id]
        valid = (side == 1) & (side[sig_src] == 0)
        idx = np.flatnonzero(valid)
        ep = frag.take(pa.array(idx, type=pa.int64()))
        sg = frag.take(pa.array(sig_src[idx], type=pa.int64()))
        stitched = pa.table(
            {
                "id_a": ep["id_a"],
                "id_b": ep["id_b"],
                id_column: ep[id_column],
                "sig_bin": pc.cast(sg["sig_bin"], sig_bin_t),
                "simhash": sg["simhash"],
                "n_shingles": sg["n_shingles"],
            }
        )
        if stitched.num_rows:
            interior = interior.union(rd.from_arrow(stitched))
    # materialize before returning: the caller feeds this straight into
    # the pair-key sort, and a Union streaming directly into an
    # AllToAll[Sort] stalls the executor at ≥4×10^6 docs (workers idle,
    # scheduler spinning — same pathology as the first union above)
    return interior.materialize()


def _unpack_sig_bin(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """fixed_size_binary signature column → (n, K) uint32 matrix,
    zero-copy from the Arrow data buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    width = col.type.byte_width
    n = len(col)
    if n == 0:
        return np.empty((0, width // 4), dtype=np.uint32)
    buf = col.buffers()[1]
    off = col.offset * width
    raw = np.frombuffer(buf, dtype=np.uint8, count=n * width, offset=off)
    return raw.reshape(n, width).view(np.uint32)


def _empty_scored(with_blob: bool = False) -> pa.Table:
    cols = {
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "est_jaccard": pa.array([], type=pa.float64()),
        "hamming": pa.array([], type=pa.int64()),
        "est_containment": pa.array([], type=pa.float64()),
    }
    if with_blob:
        cols["sig_blob"] = pa.array([], type=pa.binary())
    return pa.table(cols)


def _edge_rows(t: pa.Table, positions: list[int]) -> pa.Table:
    """Deferred block-edge rows, smuggled in the scored schema:
    hamming=-1 tag, est_jaccard=packed signature row index is not
    possible — instead the full signature payload rides in a sidecar
    via est_containment... Simpler: edge rows re-encode (id_a, id_b,
    endpoint signature) as JSON-free columns: we store the row's
    simhash in est_jaccard's bits and n_shingles in est_containment.
    To stay honest and simple we instead store the raw values needed
    for scoring: minhash is re-derived by the driver from these rows'
    (id_a, id_b) via a tiny targeted fetch — but that would re-read.
    Here we pack the complete signature as bytes in a binary column."""
    if not positions:
        return pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "est_jaccard": pa.array([], type=pa.float64()),
                "hamming": pa.array([], type=pa.int64()),
                "est_containment": pa.array([], type=pa.float64()),
                "sig_blob": pa.array([], type=pa.binary()),
            }
        )
    sub = t.take(pa.array(positions, type=pa.int64()))
    sigs = _unpack_sig_bin(sub["sig_bin"])
    sim = sub["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    nsh = sub["n_shingles"].to_numpy(zero_copy_only=False).astype(np.int64)
    ep_col = [c for c in sub.column_names if c not in (
        "id_a", "id_b", "sig_bin", "simhash", "n_shingles")][0]
    eps = sub[ep_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # blob layout: [8B endpoint id][K·4B sigs][8B simhash][8B n_shingles]
    blobs = [
        eps[i].tobytes() + sigs[i].tobytes() + sim[i].tobytes()
        + nsh[i].tobytes()
        for i in range(len(positions))
    ]
    return pa.table(
        {
            "id_a": sub["id_a"],
            "id_b": sub["id_b"],
            "est_jaccard": pa.array([0.0] * len(positions), type=pa.float64()),
            "hamming": pa.array([-1] * len(positions), type=pa.int64()),
            "est_containment": pa.array(
                [0.0] * len(positions), type=pa.float64()
            ),
            "sig_blob": pa.array(blobs, type=pa.binary()),
        }
    )


def _score_edge_rows(edge_tbl: pa.Table) -> pa.Table:
    """Driver-side scoring of deferred block-edge rows: group by
    (id_a, id_b); a complete pair has two rows (duplicates collapse)."""
    if edge_tbl.num_rows == 0:
        return _empty_scored()
    import collections

    groups: dict[tuple[int, int], list[bytes]] = collections.defaultdict(list)
    for rec in edge_tbl.to_pylist():
        groups[(rec["id_a"], rec["id_b"])].append(rec["sig_blob"])
    rows = {"id_a": [], "id_b": [], "est_jaccard": [], "hamming": [],
            "est_containment": []}
    for (a, b), blob_list in groups.items():
        # match blobs to pair sides by the embedded endpoint id; a pair
        # scores only when BOTH sides are present among the edge rows
        side_a = side_b = None
        for blob in blob_list:
            ep = int(np.frombuffer(blob[:8], dtype=np.int64)[0])
            if ep == a and side_a is None:
                side_a = blob
            elif ep == b and side_b is None:
                side_b = blob
        if side_a is None or side_b is None:
            continue  # partner row was interior — scored in its block
        s1, s2 = side_a[8:], side_b[8:]
        sig1 = np.frombuffer(s1[:-16], dtype=np.uint32)
        sig2 = np.frombuffer(s2[:-16], dtype=np.uint32)
        sim1 = np.frombuffer(s1[-16:-8], dtype=np.uint64)[0]
        sim2 = np.frombuffer(s2[-16:-8], dtype=np.uint64)[0]
        n1 = int(np.frombuffer(s1[-8:], dtype=np.int64)[0])
        n2 = int(np.frombuffer(s2[-8:], dtype=np.int64)[0])
        est_j = float((sig1 == sig2).mean())
        ham = int(bin(int(sim1) ^ int(sim2)).count("1"))
        mn = min(n1, n2)
        inter = est_j * (n1 + n2) / (1.0 + est_j)
        est_c = min(inter / max(mn, 1), 1.0) if mn > 0 else 0.0
        rows["id_a"].append(a)
        rows["id_b"].append(b)
        rows["est_jaccard"].append(est_j)
        rows["hamming"].append(ham)
        rows["est_containment"].append(est_c)
    return pa.table(
        {
            "id_a": pa.array(rows["id_a"], type=pa.int64()),
            "id_b": pa.array(rows["id_b"], type=pa.int64()),
            "est_jaccard": pa.array(rows["est_jaccard"], type=pa.float64()),
            "hamming": pa.array(rows["hamming"], type=pa.int64()),
            "est_containment": pa.array(
                rows["est_containment"], type=pa.float64()
            ),
        }
    )


def _scoring_cap() -> int:
    """Concurrency cap for the bandwidth-bound signature-gather scoring:
    proportional to the cluster up to 16 — beyond that, concurrent
    gathers on one memory subsystem reverse-scale (measured 22s at 30
    tasks vs 7s at 6-8); a multi-node cluster brings bandwidth per node
    and should raise the ceiling per node."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(4, min(16, cpus - 2))


# Capped at 2 entries: only the current job's store is ever reused;
# unbounded growth (~0.5 GB per 10^6-doc store) leaks worker heap on
# long-lived clusters running repeated verification jobs.
_VERIFIER_CACHE: dict[bytes, "PairVerifier"] = {}


def _cache_verifier(key: bytes, verifier: "PairVerifier") -> "PairVerifier":
    if len(_VERIFIER_CACHE) >= 2 and key not in _VERIFIER_CACHE:
        _VERIFIER_CACHE.pop(next(iter(_VERIFIER_CACHE)))
    _VERIFIER_CACHE[key] = verifier
    return verifier
