"""Near-duplicate detection + clustering pipeline (the north-rule job).

    read(code_files) ──► signer (task pool, per-proc state) ─► signatures/ ckpt
    signatures ──► band explode ─► groupby(band_key) ─► candidates
    candidates ──► MinHash/SimHash verify            ─► pairs/        ckpt
    pairs ──► containment (suffix-array substring)   ─► (flag column)
    pairs ──► union-find                             ─► clusters/     ckpt
    clusters ⋈ rows (broadcast map)                  ─► row → cluster_id

Every ckpt directory carries _lineage.json/_metrics.json and reruns
skip validated stages (state/lineage.py). The wide ``content`` column
exists ONLY in stage 1 (signing) and the tiny containment probe —
every shuffle moves ≤ ~1 KB/row narrow records regardless of document
size.

Replaces the reference's exact-MD5-only identity (Deduper.kt:201)
with LSH near-dup identity; exact duplicates fall out as Jaccard-1.0
clusters, so dup-pair recall vs the reference's duplicate groups is
measured on the same output (tests/test_neardup.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from deduper_ray.config import NearDupConfig
from deduper_ray.sources.readers import read_table
from deduper_ray.stages.lsh import candidate_pairs
from deduper_ray.stages.minhash import MinHashSigner, make_signer_fn
from deduper_ray.stages.verify import verify_pairs
from deduper_ray.state.lineage import (
    config_hash,
    flush_pending_checkpoints,
    read_stage,
    stage_is_complete,
    write_stage,
)

# raw-pair-row count above which candidate resolution switches from the
# driver collect to LATE DEDUP (patchable for tests)
LATE_DEDUP_THRESHOLD = 5_000_000


@dataclass
class NearDupResult:
    out_dir: str
    n_docs: int
    n_candidate_pairs: int
    n_verified_pairs: int
    n_clusters: int
    n_clustered_docs: int
    stages_skipped: list[str] = field(default_factory=list)
    wall_sec: float = 0.0
    stage_sec: dict = field(default_factory=dict)
    # non-timing counters (edge counts etc.) — kept OUT of stage_sec so
    # the timing dict stays single-unit (seconds)
    counters: dict = field(default_factory=dict)

    def clusters(self) -> rd.Dataset:
        return read_stage(os.path.join(self.out_dir, "clusters"))

    def pairs(self) -> rd.Dataset:
        return read_stage(os.path.join(self.out_dir, "pairs"))

    def signatures(self) -> rd.Dataset:
        return read_stage(os.path.join(self.out_dir, "signatures"))


def run_neardup(
    source: str | rd.Dataset,
    out_dir: str,
    cfg: NearDupConfig = NearDupConfig(),
    *,
    resume: bool = True,
    containment: bool = False,
) -> NearDupResult:
    # error-path finalizer: if the pipeline raises between an async
    # write_stage and its flush, join the background writers NOW (errors
    # discarded — the run is already failing) so no thread outlives the
    # run to collide with a later run's .tmp or surface a stale error
    # at an unrelated flush (state/lineage.py)
    try:
        return _run_neardup(
            source, out_dir, cfg, resume=resume, containment=containment
        )
    except BaseException:
        from deduper_ray.state.lineage import drain_pending_checkpoints

        drain_pending_checkpoints()
        raise


def _run_neardup(
    source: str | rd.Dataset,
    out_dir: str,
    cfg: NearDupConfig,
    *,
    resume: bool,
    containment: bool,
) -> NearDupResult:
    t_start = time.time()
    stage_sec: dict[str, float] = {}
    counters: dict = {}
    os.makedirs(out_dir, exist_ok=True)
    chash = config_hash(asdict(cfg))
    skipped: list[str] = []
    src_desc = source if isinstance(source, str) else "<dataset>"

    # ---- stage 1: signatures (the only stage that touches content) --
    sig_dir = os.path.join(out_dir, "signatures")
    if resume and stage_is_complete(sig_dir, chash):
        signatures = read_stage(sig_dir)
        skipped.append("signatures")
    else:
        if isinstance(source, str):
            ds = read_table(
                source,
                columns=[cfg.text_column],
                row_id_column=cfg.id_column,
            )
        else:
            ds = source
        signer_kwargs = dict(
            num_perms=cfg.num_perms,
            shingle_k=cfg.shingle_k,
            seed=cfg.seed,
            text_column=cfg.text_column,
            id_column=cfg.id_column,
            use_token_shingles=cfg.use_token_shingles,
            scheme=cfg.minhash_scheme,
        )
        if cfg.concurrency is not None:
            # explicit sizing → dedicated actor pool (reserves CPUs)
            signed = ds.map_batches(
                MinHashSigner,
                fn_constructor_kwargs=signer_kwargs,
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                concurrency=cfg.concurrency,
            )
        else:
            # default: task pool + per-process signer cache
            # (stages/minhash.py make_signer_fn). Same build-once-per-
            # process state as an actor pool, but tasks reuse Ray's
            # warm worker processes — no per-job actor spawn, and no
            # CPUs reserved away from the read/write stages.
            signed = ds.map_batches(
                make_signer_fn(**signer_kwargs),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
            )
        # async: the parquet persistence (disk-bound, CPU-count-
        # independent serial term) overlaps the LSH/verify compute;
        # flushed before any read-back and before the run returns
        signatures = write_stage(
            signed, sig_dir, stage="signatures", cfg_hash=chash,
            inputs=[src_desc], async_write=True,
        )
    stage_sec["signatures"] = round(time.time() - t_start, 2)
    n_docs = signatures.count()
    t_mark = time.time()

    # resolve "auto" verify routing on the ACTUAL store footprint
    # (stages/verify.py layout: uint32 sigs = K·4 B/doc, plus
    # ids/simhash/n_shingles int64/uint64 = 24 B/doc) — same shape as
    # cluster_backend="auto"/cluster_edge_budget. Broadcast is the
    # cheap path (no extra shuffle) while the store fits the budget;
    # copartition above it so the default config never materializes an
    # O(corpus) signature store in the object store.
    verify_backend = cfg.verify_backend
    if verify_backend == "auto":
        est_store_bytes = n_docs * (cfg.num_perms * 4 + 24)
        budget = cfg.verify_store_budget_bytes
        if budget is None:
            # auto: 25% of the cluster's object store. The broadcast
            # store is plasma-backed numpy read zero-copy by every
            # scoring task on a node — one copy per NODE — so budget
            # against node store capacity (config.py rationale).
            obj_mem = ray.cluster_resources().get("object_store_memory", 0)
            budget = int(0.25 * obj_mem) if obj_mem else (2 << 30)
            counters["verify_store_budget_auto"] = budget
        verify_backend = (
            "copartition" if est_store_bytes > budget else "broadcast"
        )
        counters["verify_store_est_bytes"] = est_store_bytes
    elif verify_backend not in ("broadcast", "copartition"):
        raise ValueError(
            f"verify_backend must be 'auto', 'broadcast' or 'copartition', "
            f"got {cfg.verify_backend!r}"
        )
    counters["verify_backend_resolved"] = verify_backend

    # ---- stage 2: LSH candidates + verification ---------------------
    pairs_dir = os.path.join(out_dir, "pairs")
    if resume and stage_is_complete(pairs_dir, chash):
        verified = read_stage(pairs_dir)
        skipped.append("pairs")
        n_cand = -1
    else:
        from deduper_ray.stages.lsh import collect_candidate_pairs

        store_builder = None
        if cfg.verify_mode != "exact" and verify_backend != "copartition":
            # start the broadcast-store assembly NOW (driver background
            # thread): it depends only on signatures, so its serial
            # cost hides behind the candidate stage's cluster work
            from deduper_ray.stages.verify import AsyncStoreBuilder

            store_builder = AsyncStoreBuilder(
                signatures, id_column=cfg.id_column
            )

        lsh_input = signatures
        ident_edges: pa.Table | None = None
        if cfg.collapse_identical:
            from deduper_ray.stages.collapse import collapse_identical

            lsh_input, ident_edges = collapse_identical(
                signatures, id_column=cfg.id_column
            )
            if ident_edges.num_rows:
                counters["collapsed_identical_edges"] = ident_edges.num_rows
            # NOT materialized: the rep filter is consumed exactly once
            # (by the band explode) and fuses into that streaming pass
        from deduper_ray.stages.lsh import candidate_pair_dataset

        scanned = candidate_pairs(
            lsh_input,
            bands=cfg.bands,
            max_pairs_per_bucket=cfg.max_pairs_per_bucket,
            id_column=cfg.id_column,
            hot_bucket_threshold=cfg.hot_bucket_threshold,
        )
        # adaptive resolution: below ~5M raw pair rows the driver
        # collect + packed np.unique is cheapest; above it, LATE DEDUP
        # (stages/lsh.py candidate_pair_rows) — raw pairs stay a
        # Dataset and go straight to verification, and the distinct
        # runs on the much smaller verified set. (The old distributed
        # pre-verify distinct re-sorted every candidate row on
        # (id_a, id_b): 65 s of all-to-all at 2M docs / 8 CPUs and the
        # main scaling-efficiency sink.)
        scanned = scanned.materialize()
        n_scanned = scanned.count()
        late_dedup = n_scanned > LATE_DEDUP_THRESHOLD
        if late_dedup and verify_backend == "copartition":
            # copartition scoring fattens EVERY pair row to two
            # endpoint rows carrying K·4 B signature blobs through two
            # sorts — cross-band duplicate pairs are cheap to keep for
            # broadcast scoring (late dedup) but 2-3× the dominant
            # exchange volume here. Dedup while rows are still 16 B:
            # candidate_pair_dataset's distributed sort + adjacent
            # collapse (≤1 surviving dup per block boundary, removed
            # with the verified set as usual).
            from deduper_ray.stages.lsh import candidate_pair_dataset

            cands, n_dropped = candidate_pair_dataset(
                scanned, max_pairs_per_bucket=cfg.max_pairs_per_bucket
            )
        elif late_dedup:
            from deduper_ray.stages.lsh import candidate_pair_rows

            cands, n_dropped = candidate_pair_rows(
                scanned, max_pairs_per_bucket=cfg.max_pairs_per_bucket
            )
        else:
            from deduper_ray.stages.lsh import collect_candidate_pairs

            ctbl, n_dropped = collect_candidate_pairs(
                scanned, max_pairs_per_bucket=cfg.max_pairs_per_bucket
            )
            cands = rd.from_arrow(ctbl)
        cands = cands.materialize()
        # raw scanned pair/fragment rows have no further consumer once
        # the resolved candidate set is materialized — release their
        # plasma blocks before the blob-carrying verify stage
        del scanned
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "LSH bucket cap dropped %d candidate pairs "
                "(max_pairs_per_bucket=%d)", n_dropped,
                cfg.max_pairs_per_bucket,
            )
        n_cand = cands.count()
        stage_sec["candidates"] = round(time.time() - t_mark, 2)
        t_mark = time.time()
        if cfg.verify_mode == "exact":
            # exact-text re-score: re-read content for candidate
            # ENDPOINT docs only (broadcast id filter, no shuffle)
            from deduper_ray.stages.verify import verify_pairs_exact

            if isinstance(source, str):
                text_ds = read_table(
                    source,
                    columns=[cfg.text_column],
                    row_id_column=cfg.id_column,
                )
            else:
                text_ds = source
            scored = verify_pairs_exact(
                cands,
                text_ds,
                threshold=cfg.threshold,
                shingle_k=cfg.shingle_k,
                text_column=cfg.text_column,
                id_column=cfg.id_column,
                use_token_shingles=cfg.use_token_shingles,
            )
        elif verify_backend == "copartition":
            from deduper_ray.stages.verify import verify_pairs_copartitioned

            scored = verify_pairs_copartitioned(
                cands,
                signatures,
                threshold=cfg.threshold,
                simhash_max_hamming=(
                    cfg.simhash_max_hamming if cfg.simhash_bits else None
                ),
                id_column=cfg.id_column,
            )
        else:
            scored = verify_pairs(
                cands,
                signatures,
                threshold=cfg.threshold,
                simhash_max_hamming=(
                    cfg.simhash_max_hamming if cfg.simhash_bits else None
                ),
                id_column=cfg.id_column,
                prebuilt_store=store_builder,
            )
        if late_dedup:
            # cross-band duplicate pairs survived to scoring; a pair's
            # scores are a pure function of its signatures, so a
            # distinct over the VERIFIED set (~15% of raw pairs)
            # removes them exactly. Adaptive like the candidate
            # resolution: small → driver drop_duplicates (seconds);
            # large → sort + per-block adjacent dedup (NOT a Ray
            # groupby-aggregate, which measured 250 s on 6.5M rows).
            scored = scored.materialize()
            n_scored = scored.count()
            if n_scored <= LATE_DEDUP_THRESHOLD:
                sdf = scored.to_pandas().drop_duplicates(["id_a", "id_b"])
                scored = rd.from_arrow(
                    pa.Table.from_pandas(sdf, preserve_index=False)
                )
            else:
                def _block_dedup(t: pa.Table) -> pa.Table:
                    if t.num_rows == 0:
                        return t.append_column(
                            "_edge", pa.array([], type=pa.int8())
                        )
                    a = t["id_a"].to_numpy(zero_copy_only=False)
                    b = t["id_b"].to_numpy(zero_copy_only=False)
                    keep = np.ones(a.size, dtype=bool)
                    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
                    t = t.filter(pa.array(keep))
                    # flag the block's first+last surviving rows: a run
                    # spanning a block boundary leaves one representative
                    # on each side, both flagged here
                    edge = np.zeros(t.num_rows, dtype=np.int8)
                    edge[0] = 1
                    edge[-1] = 1
                    return t.append_column("_edge", pa.array(edge))

                # sorted + per-block adjacent dedup, then driver-stitched
                # block-boundary rows (≤2 per block) so the persisted
                # pair set is EXACTLY distinct — same invariant as the
                # ≤threshold collect path (stitch pattern of group_stats)
                marked = scored.sort(["id_a", "id_b"]).map_batches(
                    _block_dedup, batch_format="pyarrow", batch_size=None
                ).materialize()
                interior = marked.map_batches(
                    lambda t: t.filter(pc.equal(t["_edge"], 0))
                    .drop_columns(["_edge"]),
                    batch_format="pyarrow",
                )
                edge_df = marked.map_batches(
                    lambda t: t.filter(pc.equal(t["_edge"], 1))
                    .drop_columns(["_edge"]),
                    batch_format="pyarrow",
                ).to_pandas().drop_duplicates(["id_a", "id_b"])
                scored = interior.union(
                    rd.from_arrow(
                        pa.Table.from_pandas(edge_df, preserve_index=False)
                    )
                )
        if ident_edges is not None and ident_edges.num_rows:
            # collapsed exact-dup members rejoin as Jaccard-1.0 edges
            n_id = ident_edges.num_rows
            if cfg.verify_mode == "exact":
                ident_scored = pa.table(
                    {
                        "id_a": ident_edges["id_a"],
                        "id_b": ident_edges["id_b"],
                        "jaccard": pa.array([1.0] * n_id, type=pa.float64()),
                        "containment": pa.array(
                            [1.0] * n_id, type=pa.float64()
                        ),
                    }
                )
            else:
                ident_scored = pa.table(
                    {
                        "id_a": ident_edges["id_a"],
                        "id_b": ident_edges["id_b"],
                        "est_jaccard": pa.array([1.0] * n_id, type=pa.float64()),
                        "hamming": pa.array([0] * n_id, type=pa.int64()),
                        "est_containment": pa.array([1.0] * n_id, type=pa.float64()),
                    }
                )
            scored = scored.union(rd.from_arrow(ident_scored))
        verified = write_stage(
            scored, pairs_dir, stage="pairs", cfg_hash=chash,
            inputs=[sig_dir], extra_metrics={"candidate_pairs": n_cand},
            async_write=True,
        )
    stage_sec["verify"] = round(time.time() - t_mark, 2)
    n_verified = verified.count()
    t_mark = time.time()

    # ---- optional: suffix-array containment flag --------------------
    if containment and isinstance(source, str) and n_verified:
        flush_pending_checkpoints()  # reads + rewrites pairs_dir
        _flag_containment(source, pairs_dir, cfg)
        verified = read_stage(pairs_dir)

    # ---- stage 3: union-find clustering -----------------------------
    # "auto" routes on the measured edge volume: the driver O(edges)
    # vectorized components below budget, distributed labelprop above —
    # the default config never collects an over-budget edge set
    # (VERDICT r2 item 2; same pattern as LATE_DEDUP_THRESHOLD)
    cluster_backend = cfg.cluster_backend
    if cluster_backend == "auto":
        cluster_backend = (
            "labelprop" if n_verified > cfg.cluster_edge_budget else "unionfind"
        )
    clusters_dir = os.path.join(out_dir, "clusters")
    if resume and stage_is_complete(clusters_dir, chash):
        clusters_ds = read_stage(clusters_dir)
        skipped.append("clusters")
    else:
        if cluster_backend == "labelprop":
            from deduper_ray.state.unionfind import label_propagation

            lp = label_propagation(verified)
            if cfg.id_column != "row_id":
                lp = lp.map_batches(
                    lambda t: t.rename_columns([cfg.id_column, "cluster_id"]),
                    batch_format="pyarrow",
                )
            clusters_ds = write_stage(
                lp, clusters_dir, stage="clusters",
                cfg_hash=chash, inputs=[pairs_dir],
            )
        else:
            from deduper_ray.state.unionfind import cluster_edges_table

            tbl = cluster_edges_table(verified, id_column=cfg.id_column)
            clusters_ds = write_stage(
                rd.from_arrow(tbl), clusters_dir, stage="clusters",
                cfg_hash=chash, inputs=[pairs_dir],
            )

    flush_pending_checkpoints()
    stage_sec["cluster"] = round(time.time() - t_mark, 2)
    # distributed cluster counts (no driver materialization): both
    # backends label a cluster with its MIN member id, so exactly one
    # row per cluster has id == cluster_id — a vectorized per-block
    # count + scalar sum replaces the former to_pandas() collect
    id_col = cfg.id_column

    def _count_roots(t: pa.Table) -> pa.Table:
        roots = pc.sum(
            pc.cast(pc.equal(t[id_col], t["cluster_id"]), pa.int64())
        ).as_py() or 0
        return pa.table(
            {
                "roots": pa.array([roots], type=pa.int64()),
                "rows": pa.array([t.num_rows], type=pa.int64()),
            }
        )

    counts = clusters_ds.map_batches(
        _count_roots, batch_format="pyarrow"
    ).to_pandas()
    n_clusters = int(counts["roots"].sum()) if len(counts) else 0
    n_clustered_docs = int(counts["rows"].sum()) if len(counts) else 0
    result = NearDupResult(
        out_dir=out_dir,
        n_docs=n_docs,
        n_candidate_pairs=n_cand,
        n_verified_pairs=n_verified,
        n_clusters=n_clusters,
        n_clustered_docs=n_clustered_docs,
        stages_skipped=skipped,
        wall_sec=time.time() - t_start,
        stage_sec=stage_sec,
        counters=counters,
    )
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(asdict(result), f, indent=2)
    return result


def _flag_containment(source: str, pairs_dir: str, cfg: NearDupConfig) -> None:
    """Add an ``is_containment`` column to the pairs checkpoint: for
    high-estimated-containment pairs, suffix-array-check whether the
    smaller doc is a verbatim substring of the larger
    (functions/suffix.py).

    Fully distributed over pair volume: the pairs checkpoint stays a
    Dataset end to end (flag + rewrite via map_batches/write_parquet).
    Driver/object-store residency is bounded by the SUSPECT-ENDPOINT
    set only — per-block unique suspect ids (cont ≥ 0.8) union to a
    small id set, content is fetched for exactly those ids (broadcast
    id-set filter, no shuffle) and broadcast once; each pairs block
    flags its own suspects against the per-process-cached dict."""
    import shutil

    from deduper_ray.functions.suffix import containment_check
    from deduper_ray.functions.util import dataset_to_table
    from deduper_ray.stages.relational import _fetch_broadcast

    pairs = read_stage(pairs_dir)
    cols = pairs.schema().names
    cont_col = "containment" if "containment" in cols else "est_containment"

    # pass 1: suspect-endpoint ids, pre-uniqued per block → tiny union
    def _suspect_ids(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.greater_equal(t[cont_col], 0.8))
        ids = np.union1d(
            sub["id_a"].to_numpy(zero_copy_only=False),
            sub["id_b"].to_numpy(zero_copy_only=False),
        )
        return pa.table({"id": pa.array(ids, type=pa.int64())})

    id_tbl = dataset_to_table(
        pairs.map_batches(_suspect_ids, batch_format="pyarrow")
    )
    contents_ref = None
    if id_tbl.num_rows:
        ids = np.unique(id_tbl["id"].to_numpy(zero_copy_only=False))
        ids_ref = ray.put(pa.array(ids, type=pa.int64()))
        ds = read_table(source, columns=[cfg.text_column],
                        row_id_column=cfg.id_column)

        def _fetch(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.is_in(t[cfg.id_column], value_set=ray.get(ids_ref))
            )

        sub = dataset_to_table(ds.map_batches(_fetch, batch_format="pyarrow"))
        contents_ref = ray.put(
            dict(
                zip(
                    sub[cfg.id_column].to_pylist(),
                    sub[cfg.text_column].to_pylist(),
                )
            )
        )

    # pass 2: flag each block's suspects (vectorized mask, no per-row
    # index lookups); non-suspects keep flag False
    def _flag(t: pa.Table) -> pa.Table:
        flags = np.zeros(t.num_rows, dtype=bool)
        if contents_ref is not None and t.num_rows:
            m = t[cont_col].to_numpy(zero_copy_only=False) >= 0.8
            hit = np.flatnonzero(m)
            if hit.size:
                contents = _fetch_broadcast(contents_ref)
                a = t["id_a"].to_numpy(zero_copy_only=False)[hit].tolist()
                b = t["id_b"].to_numpy(zero_copy_only=False)[hit].tolist()
                res = containment_check(contents, list(zip(a, b)))
                flags[hit] = [res[p] for p in zip(a, b)]
        return t.append_column("is_containment", pa.array(flags))

    flagged = pairs.map_batches(_flag, batch_format="pyarrow")
    # atomic-ish swap: flagged files land in a sibling tmp dir first —
    # the lazy `pairs` Dataset still reads the originals while writing
    tmp_dir = pairs_dir + ".flag_tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)
    flagged.write_parquet(tmp_dir)
    for f in os.listdir(pairs_dir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(pairs_dir, f))
    for f in os.listdir(tmp_dir):
        os.replace(os.path.join(tmp_dir, f), os.path.join(pairs_dir, f))
    os.rmdir(tmp_dir)
