"""Incremental near-dup: new documents vs an EXISTING corpus.

The reference's incremental mode preloads seen hashes and drops exact
re-occurrences (Deduper.kt:135-158, S3). This module generalizes that
to NEAR-duplicate identity: a batch of new docs is checked against a
prior run's persisted MinHash signatures WITHOUT re-banding or
re-sorting the prior corpus — the per-increment cost is

  sign(new) + 2 narrow scans of the prior signature store + verify,

never an all-to-all over the prior corpus:

  1. sign the new docs (same signer config as the prior run — the
     config hash is checked against the prior stage's lineage);
  2. collect the DISTINCT band keys of the new docs (driver state
     O(new_docs × bands) — the increment is assumed small relative to
     the corpus, which is the point of incremental mode);
  3. scan 1 over prior signatures: vectorized band-key recompute per
     block + searchsorted against the broadcast new-key set → matched
     (band_key, prior_id) collisions, capped per (block, key);
  4. scan 2: gather the signature ROWS of matched prior ids
     (broadcast id filter) so verification has both endpoints;
  5. cross candidates (new × matched-prior per colliding bucket,
     capped) + regular new × new candidates (LSH sort over the NEW
     docs only);
  6. MinHash/SimHash verification of both pair sets;
  7. decision per new doc, equal to what a FULL run over
     prior ∪ new would decide: connected components over all verified
     pairs; a new doc survives iff its component contains NO prior doc
     and it is the component's min new id (first-occurrence-wins).
     Prior ids are required to sort below new ids — enforced by an
     internal id offset, reported back in original ids.

Scale notes: steps 3-4 are embarrassingly parallel map passes
(no shuffle, no sort) over the prior store; only the NEW docs pay the
LSH sort. The broadcast new-key array is the one per-increment
driver-resident artifact; for very large increments fall back to a
full `run_neardup` over the union. Cost scales with the COLLISION
volume, not the prior size: a typical low-dup increment costs
sign(new) + ONE prior scan (the scan emits matched prior signature
rows inline, so the verify store assembles without a second pass).
Round-5 worst-case work: the new×new LSH runs on a background thread
overlapped with the prior scan, the verify store is an
AsyncStoreBuilder overlapped with cross-candidate numpy, and scoring
fans out past 2^17 pairs — a fully-adversarial 100k all-clone
increment against a 10^6-doc prior dropped 46 s → 23.4 s at 32 CPUs
(full union rerun ~40 s); per-stage walls in IncrementalResult
.stage_sec.
"""

from __future__ import annotations

import logging
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
from deduper_ray.stages.lsh import (
    BandExploder,
    band_keys,
    candidate_pairs,
    collect_candidate_pairs,
)
from deduper_ray.stages.minhash import make_signer_fn
from deduper_ray.stages.verify import dedup_pairs_arrays, verify_pairs
from deduper_ray.state.lineage import read_stage, write_stage, config_hash
from deduper_ray.state.unionfind import connected_components_arrays

logger = logging.getLogger(__name__)


@dataclass
class IncrementalResult:
    out_dir: str
    n_new_docs: int
    n_band_collisions: int
    n_cross_candidates: int
    n_new_candidates: int
    n_dup_of_prior: int
    n_dup_within_new: int
    n_kept: int
    wall_sec: float = 0.0
    counters: dict = field(default_factory=dict)
    stage_sec: dict = field(default_factory=dict)

    def decisions(self) -> rd.Dataset:
        return read_stage(os.path.join(self.out_dir, "decisions"))


def _sign_new(source, cfg: NearDupConfig) -> rd.Dataset:
    if isinstance(source, str):
        ds = read_table(
            source, columns=[cfg.text_column], row_id_column=cfg.id_column
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
    return ds.map_batches(
        make_signer_fn(**signer_kwargs),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    ).materialize()


def _sig_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["minhash"].combine_chunks()
    K = col.type.list_size
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(batch.num_rows, K).astype(np.uint64)


def sign_corpus(
    source: str | rd.Dataset, stage_dir: str, cfg: NearDupConfig
) -> rd.Dataset:
    """Sign a corpus and checkpoint ONLY the signatures stage — the
    minimal prior-state producer for ``run_neardup_incremental`` when
    the full pipeline output isn't needed."""
    sigs = _sign_new(source, cfg)
    return write_stage(
        sigs, stage_dir, stage="signatures",
        cfg_hash=config_hash(asdict(cfg)), inputs=[],
    )


def sign_corpus_resumable(
    source: str,
    stage_dir: str,
    cfg: NearDupConfig,
    *,
    rows_per_shard: int = 262_144,
) -> rd.Dataset:
    """Crash-resumable signing: the parquet row-group plan is grouped
    into deterministic shards and each shard signs + persists as its
    own part file (state/lineage.py partitioned_map_stage). A run
    killed mid-stage re-runs ONLY the missing shards — at 10^12 files
    the signatures stage is hours of work, and whole-stage atomicity
    (write_stage) would discard all of it on a crash.

    Output is bit-identical to ``sign_corpus`` (same ordinals, same
    signer config) and readable by everything that consumes a
    signatures stage, including ``run_neardup_incremental``.
    """
    from deduper_ray.sources.readers import _expand_paths, _plan_row_groups
    from deduper_ray.state.lineage import partitioned_map_stage

    files = _expand_paths(source)
    plan = _plan_row_groups(files)
    shards: list[list] = []
    cur: list = []
    acc = 0
    for p in plan:
        cur.append((p.path, p.row_group, p.offset))
        acc += p.num_rows
        if acc >= rows_per_shard:
            shards.append(cur)
            cur, acc = [], 0
    if cur:
        shards.append(cur)

    signer_kwargs = dict(
        num_perms=cfg.num_perms,
        shingle_k=cfg.shingle_k,
        seed=cfg.seed,
        text_column=cfg.text_column,
        id_column=cfg.id_column,
        use_token_shingles=cfg.use_token_shingles,
        scheme=cfg.minhash_scheme,
    )

    def _sign_shard(shard: list) -> pa.Table:
        import pyarrow.parquet as pq

        from deduper_ray.stages.minhash import MinHashSigner

        signer = MinHashSigner(**signer_kwargs)
        out = []
        for path, rg, offset in shard:
            part = pq.ParquetFile(path).read_row_group(
                rg, columns=[cfg.text_column]
            )
            rid = np.arange(
                offset, offset + part.num_rows, dtype=np.int64
            )
            part = part.append_column(cfg.id_column, pa.array(rid))
            out.append(signer(part))
        return pa.concat_tables(out)

    return partitioned_map_stage(
        shards,
        _sign_shard,
        stage_dir,
        stage="signatures",
        cfg_hash=config_hash(asdict(cfg)),
    )


def run_neardup_incremental(
    new_source: str | rd.Dataset,
    out_dir: str,
    cfg: NearDupConfig = NearDupConfig(),
    *,
    prior_signatures: str | rd.Dataset,
    prior_source: str | rd.Dataset | None = None,
) -> IncrementalResult:
    """See module docstring. ``cfg.verify_mode="exact"`` re-scores the
    candidate pairs with the TRUE k-shingle Jaccard (content re-read
    for pair-endpoint docs only) — requires ``prior_source`` so prior
    endpoints' content is reachable; the estimate mode needs only the
    signature store."""
    t_start = time.time()
    os.makedirs(out_dir, exist_ok=True)
    id_col = cfg.id_column

    prior = (
        read_stage(prior_signatures)
        if isinstance(prior_signatures, str)
        else prior_signatures
    )

    stage_sec: dict[str, float] = {}
    _t = time.time()

    # ---- 1. sign new docs ------------------------------------------
    new_sigs = _sign_new(new_source, cfg)
    n_new = new_sigs.count()
    chash = config_hash(asdict(cfg))
    if n_new == 0:
        # empty increment: empty decisions, nothing else to do
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "keep": pa.array([], type=pa.bool_()),
                "reason": pa.array([], type=pa.string()),
            }
        )
        write_stage(
            rd.from_arrow(empty), os.path.join(out_dir, "decisions"),
            stage="decisions", cfg_hash=chash, inputs=[],
        )
        result = IncrementalResult(
            out_dir=out_dir, n_new_docs=0, n_band_collisions=0,
            n_cross_candidates=0, n_new_candidates=0, n_dup_of_prior=0,
            n_dup_within_new=0, n_kept=0,
            wall_sec=time.time() - t_start,
        )
        import json as _json

        with open(os.path.join(out_dir, "report.json"), "w") as f:
            _json.dump(asdict(result), f, indent=2)
        return result

    # id namespaces: every prior id must sort BELOW every new id so
    # min-id-wins equals a full run over the union. Offset internally.
    prior_max = prior.max(id_col) if prior.count() else -1
    new_min = new_sigs.min(id_col) if n_new else 0
    id_offset = int(prior_max) + 1 - int(new_min)
    if id_offset > 0:

        def _shift(t: pa.Table) -> pa.Table:
            return t.set_column(
                t.column_names.index(id_col),
                id_col,
                pc.add(t[id_col], pa.scalar(id_offset, pa.int64())),
            )

        new_sigs = new_sigs.map_batches(
            _shift, batch_format="pyarrow"
        ).materialize()
    else:
        id_offset = 0

    stage_sec["sign_new"] = round(time.time() - _t, 2); _t = time.time()

    # ---- 5 (early, background): new × new candidates ----------------
    # Depends ONLY on the signed new docs, so it runs on a driver
    # background thread OVERLAPPED with the prior scan + cross-candidate
    # stages (the AsyncStoreBuilder pattern, stages/verify.py) — the
    # adversarial worst case is a serial chain of cluster jobs
    # otherwise. Joined at step 5's original position.
    import threading

    _nn_box: dict = {}

    def _nn_job() -> None:
        try:
            scanned = candidate_pairs(
                new_sigs,
                bands=cfg.bands,
                max_pairs_per_bucket=cfg.max_pairs_per_bucket,
                id_column=id_col,
                hot_bucket_threshold=cfg.hot_bucket_threshold,
            )
            _nn_box["res"] = collect_candidate_pairs(
                scanned, max_pairs_per_bucket=cfg.max_pairs_per_bucket
            )
        except BaseException as e:  # noqa: BLE001 — re-raised at join
            _nn_box["err"] = e

    _nn_thread = threading.Thread(
        target=_nn_job, name="nn-cands", daemon=True
    )
    _nn_thread.start()

    # ---- 2. distinct new band keys (broadcast) ---------------------
    new_expl = (
        new_sigs.map_batches(
            BandExploder(bands=cfg.bands, id_column=id_col),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    new_keys = new_expl["band_key"].to_numpy()
    new_ids_by_key = new_expl["row_id" if "row_id" in new_expl else id_col].to_numpy()
    uniq_keys = np.unique(new_keys)
    keys_ref = ray.put(uniq_keys)
    bands = cfg.bands
    cap = cfg.max_pairs_per_bucket

    stage_sec["new_band_keys"] = round(time.time() - _t, 2); _t = time.time()

    # ---- 3. scan prior signatures for band collisions --------------
    # The scan ALSO emits the signature rows of its block's matched
    # prior ids (kind=1, one row per distinct matched id — prior ids
    # partition the blocks, so no cross-block dups): the verify store
    # then assembles without a SECOND full prior scan, which was the
    # adversarial worst case's single largest cost (the prior parquet
    # list<uint32,K> decode paid twice).
    def _collide(t: pa.Table) -> pa.Table:
        ks: np.ndarray = ray.get(keys_ref)
        sigs = _sig_matrix(t)
        keys = band_keys(sigs, bands).reshape(-1).view(np.int64)
        tids = t[id_col].to_numpy(zero_copy_only=False)
        ids = np.repeat(tids, bands)
        pos = np.minimum(np.searchsorted(ks, keys), ks.size - 1)
        hit = ks[pos] == keys
        hk, hi = keys[hit], ids[hit]
        if hk.size:
            # per-(block, key) cap: a boilerplate key matching the
            # whole prior corpus must not flood the driver
            order = np.lexsort((hi, hk))
            hk, hi = hk[order], hi[order]
            starts = np.concatenate(
                ([0], np.nonzero(hk[1:] != hk[:-1])[0] + 1)
            )
            lens = np.diff(np.concatenate((starts, [hk.size])))
            rank = np.arange(hk.size) - np.repeat(starts, lens)
            keep = rank < cap
            hk, hi = hk[keep], hi[keep]
        mh_type = t["minhash"].type
        kind0 = pa.table(
            {
                "kind": pa.array(np.zeros(hk.size, dtype=np.int8)),
                "band_key": pa.array(hk, type=pa.int64()),
                id_col: pa.array(hi, type=pa.int64()),
                "minhash": pa.nulls(hk.size, type=mh_type),
                "simhash": pa.nulls(hk.size, type=pa.uint64()),
                "n_shingles": pa.nulls(hk.size, type=pa.int64()),
            }
        )
        if not hk.size:
            return kind0
        uniq = np.unique(hi)
        sel = t.filter(
            pc.is_in(
                t[id_col], value_set=pa.array(uniq, type=pa.int64())
            )
        )
        kind1 = pa.table(
            {
                "kind": pa.array(np.ones(sel.num_rows, dtype=np.int8)),
                "band_key": pa.nulls(sel.num_rows, type=pa.int64()),
                id_col: pc.cast(sel[id_col], pa.int64()),
                "minhash": sel["minhash"],
                "simhash": sel["simhash"],
                "n_shingles": sel["n_shingles"],
            }
        )
        return pa.concat_tables([kind0, kind1])

    scanned_prior = prior.map_batches(
        _collide, batch_format="pyarrow"
    ).materialize()
    matched_sigs = scanned_prior.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)).select(
            [id_col, "minhash", "simhash", "n_shingles"]
        ),
        batch_format="pyarrow",
    )
    matched = (
        scanned_prior.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], 0)).select(
                ["band_key", id_col]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .rename(columns={id_col: "prior_id"})
    )
    if len(matched):
        # global per-key cap (the in-scan cap is per BLOCK; a key hot
        # across many blocks re-concentrates here): keep the first
        # ``cap`` prior ids per band key, deterministic by id order
        matched = (
            matched.sort_values(["band_key", "prior_id"], kind="mergesort")
            .groupby("band_key", sort=False)
            .head(cap)
        )
    n_collisions = len(matched)

    stage_sec["prior_scan"] = round(time.time() - _t, 2); _t = time.time()

    # verify store (new sigs + matched prior sig rows, i.e. every
    # possible pair endpoint by construction) assembled on a background
    # thread NOW — it depends only on the two materialized scans above,
    # so its driver-serial concat/scatter overlaps the cross-candidate
    # numpy and the new×new collection
    store_sigs = (
        new_sigs.union(matched_sigs) if n_collisions else new_sigs
    )
    store_builder = None
    if cfg.verify_mode != "exact":
        from deduper_ray.stages.verify import AsyncStoreBuilder

        store_builder = AsyncStoreBuilder(store_sigs, id_column=id_col)

    # ---- 4. cross candidates (new × matched prior per bucket) ------
    cross_a = np.empty(0, dtype=np.int64)
    cross_b = np.empty(0, dtype=np.int64)
    matched_ids = np.unique(matched["prior_id"].to_numpy()) if n_collisions else (
        np.empty(0, dtype=np.int64)
    )
    if n_collisions:
        order = np.argsort(new_keys, kind="stable")
        sk, si = new_keys[order], new_ids_by_key[order]
        mk = matched["band_key"].to_numpy()
        mi = matched["prior_id"].to_numpy()
        lo = np.searchsorted(sk, mk, side="left")
        hi_ = np.searchsorted(sk, mk, side="right")
        reps = np.minimum(hi_ - lo, cap)  # cap new side per collision
        nz = np.nonzero(reps)[0]
        if nz.size:
            # fully vectorized expansion (a per-collision Python loop
            # measured 40+ s at 2.4M collisions): prior side repeats,
            # new side gathers si[start_j .. start_j + reps_j)
            r = reps[nz]
            starts = lo[nz]
            total = int(r.sum())
            offs = np.concatenate(([0], np.cumsum(r[:-1])))
            pos = (
                np.arange(total, dtype=np.int64)
                - np.repeat(offs, r)
                + np.repeat(starts, r)
            )
            cross_a = np.repeat(mi[nz], r)
            cross_b = si[pos]
            cross_a, cross_b = dedup_pairs_arrays(
                np.minimum(cross_a, cross_b), np.maximum(cross_a, cross_b)
            )
    n_cross = cross_a.size

    stage_sec["cross_candidates"] = round(time.time() - _t, 2); _t = time.time()

    # ---- 5. new × new candidates: join the background thread -------
    _nn_thread.join()
    if "err" in _nn_box:
        raise _nn_box["err"]
    nn_pairs, nn_dropped = _nn_box["res"]
    n_new_cand = nn_pairs.num_rows

    all_a = np.concatenate(
        [cross_a, nn_pairs["id_a"].to_numpy(zero_copy_only=False)]
    )
    all_b = np.concatenate(
        [cross_b, nn_pairs["id_b"].to_numpy(zero_copy_only=False)]
    )
    all_a, all_b = dedup_pairs_arrays(all_a, all_b)
    cand_tbl = pa.table(
        {"id_a": pa.array(all_a), "id_b": pa.array(all_b)}
    )

    stage_sec["new_candidates"] = round(time.time() - _t, 2); _t = time.time()

    # ---- 6. verify -------------------------------------------------
    # store_sigs (new sigs + step-3 kind=1 matched prior sig rows — no
    # second prior scan) was kicked off as an AsyncStoreBuilder right
    # after the prior scan; by now its assembly has overlapped the
    # cross/new-candidate stages. The kind-1 rows are a SUPERSET of the
    # post-global-cap matched ids (the cap only trims pair endpoints;
    # extra store rows are harmless).
    if cfg.verify_mode == "exact":
        # exact-text re-score (oracle-grade): endpoint content only.
        # New side re-reads new_source with the internal id offset;
        # prior side reads prior_source filtered to matched ids.
        if prior_source is None:
            raise ValueError(
                "verify_mode='exact' requires prior_source (content "
                "for prior pair endpoints)"
            )
        from deduper_ray.stages.verify import verify_pairs_exact

        if isinstance(new_source, str):
            new_text = read_table(
                new_source, columns=[cfg.text_column],
                row_id_column=id_col,
            )
        else:
            new_text = new_source
        if id_offset:
            off = id_offset

            def _shift_text(t: pa.Table) -> pa.Table:
                return t.set_column(
                    t.column_names.index(id_col), id_col,
                    pc.add(t[id_col], pa.scalar(off, pa.int64())),
                )

            new_text = new_text.map_batches(
                _shift_text, batch_format="pyarrow"
            )
        if isinstance(prior_source, str):
            prior_text = read_table(
                prior_source, columns=[cfg.text_column],
                row_id_column=id_col,
            )
        else:
            prior_text = prior_source
        if matched_ids.size:
            pids_ref = ray.put(matched_ids)

            def _prior_filter(t: pa.Table) -> pa.Table:
                want: np.ndarray = ray.get(pids_ref)
                ids = t[id_col].to_numpy(zero_copy_only=False)
                pos = np.minimum(
                    np.searchsorted(want, ids), want.size - 1
                )
                return t.filter(pa.array(want[pos] == ids))

            prior_text = prior_text.map_batches(
                _prior_filter, batch_format="pyarrow"
            )
            text_ds = new_text.union(prior_text)
        else:
            text_ds = new_text
        text_ds = text_ds.map_batches(
            lambda t: t.select([id_col, cfg.text_column]),
            batch_format="pyarrow",
        )
        verified = verify_pairs_exact(
            cand_tbl,
            text_ds,
            threshold=cfg.threshold,
            shingle_k=cfg.shingle_k,
            text_column=cfg.text_column,
            id_column=id_col,
            use_token_shingles=cfg.use_token_shingles,
        )
    else:
        verified = verify_pairs(
            cand_tbl,
            store_sigs,
            threshold=cfg.threshold,
            simhash_max_hamming=(
                cfg.simhash_max_hamming if cfg.simhash_bits else None
            ),
            id_column=id_col,
            prebuilt_store=store_builder,
        )
    vt = verified.to_pandas()
    if len(vt) and "id_a" in vt.columns:
        va = vt["id_a"].to_numpy()
        vb = vt["id_b"].to_numpy()
    else:  # no verified pairs at all (e.g. empty prior + unique new)
        va = np.empty(0, dtype=np.int64)
        vb = np.empty(0, dtype=np.int64)

    stage_sec["verify"] = round(time.time() - _t, 2); _t = time.time()

    # ---- 7. decision: components over ALL verified pairs -----------
    new_id_floor = int(prior_max) + 1
    nodes, labels = connected_components_arrays(
        va.astype(np.int64), vb.astype(np.int64)
    )
    # a component touching any prior id gets a label < new_id_floor
    # (labels are MIN member ids), so the test is one vector compare
    is_new_node = nodes >= new_id_floor
    comp_label = labels
    dup_prior = is_new_node & (comp_label < new_id_floor)
    dup_new = is_new_node & (comp_label >= new_id_floor) & (
        nodes != comp_label
    )

    all_new_ids = np.sort(
        pc.cast(
            pa.concat_tables(
                [
                    pa.table({id_col: b[id_col]})
                    for b in new_sigs.iter_batches(
                        batch_size=65536, batch_format="pyarrow"
                    )
                ]
            )[id_col].combine_chunks(),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
    )
    keep = np.ones(all_new_ids.size, dtype=bool)
    reason = np.zeros(all_new_ids.size, dtype=np.int8)  # 0 keep
    for mask, code in ((dup_prior, 1), (dup_new, 2)):
        ids = nodes[mask]
        pos = np.minimum(
            np.searchsorted(all_new_ids, ids), all_new_ids.size - 1
        )
        sel = all_new_ids[pos] == ids
        keep[pos[sel]] = False
        reason[pos[sel]] = code

    decisions = pa.table(
        {
            id_col: pa.array(all_new_ids - id_offset, type=pa.int64()),
            "keep": pa.array(keep),
            "reason": pa.array(
                np.array(["keep", "dup_prior", "dup_new"])[reason]
            ),
        }
    )
    chash = config_hash(asdict(cfg))
    write_stage(
        rd.from_arrow(decisions),
        os.path.join(out_dir, "decisions"),
        stage="decisions",
        cfg_hash=chash,
        inputs=[],
        extra_metrics={
            "n_dup_of_prior": int((~keep & (reason == 1)).sum()),
            "dropped_pairs_capped": int(nn_dropped),
        },
    )
    result = IncrementalResult(
        out_dir=out_dir,
        n_new_docs=int(n_new),
        n_band_collisions=int(n_collisions),
        n_cross_candidates=int(n_cross),
        n_new_candidates=int(n_new_cand),
        n_dup_of_prior=int((reason == 1).sum()),
        n_dup_within_new=int((reason == 2).sum()),
        n_kept=int(keep.sum()),
        wall_sec=time.time() - t_start,
        counters={"nn_dropped": int(nn_dropped)},
        stage_sec={**stage_sec, "decide": round(time.time() - _t, 2)},
    )
    import json

    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(asdict(result), f, indent=2)
    return result
