"""End-to-end training-data curation: quality gate → decontaminate →
exact dedup → near-dup dedup → annotate, checkpointed per stage.

The one-command composition a training-data user runs daily — every
stage is an operator this engine already ships (functions/text.py
quality kernels, stages/decontam.py, the narrow-groupby exact-dedup
shape, pipelines/neardup.py, token/fingerprint annotations), glued
with the same lineage protocol as run_neardup: each stage writes an
atomic parquet checkpoint keyed by the config hash, so a crashed or
re-run job skips finished stages (`resume=True`).

Scale shape: the quality gate and annotations are stateless vectorized
map stages; decontamination broadcasts the (small) benchmark set;
exact dedup shuffles only (key, id); near-dup is the checkpointed LSH
pipeline; the final annotated corpus streams to partitioned parquet.
The driver holds per-stage COUNTS only, plus two DUPE-BOUNDED id
sets: the exact stage's drop set (non-keeper row ids, elected
distributed via stages/exact.py policy_drop_ids — never one id per
distinct key) and the near-dup stage's clustered-doc drops.
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
from deduper_ray.state.lineage import (
    config_hash,
    drain_pending_checkpoints,
    flush_pending_checkpoints,
    read_stage,
    stage_is_complete,
    write_stage,
)


@dataclass(frozen=True)
class CurateConfig:
    """Knobs for the curation composition. ``neardup=None`` skips the
    near-dup stage; ``benchmark_grams=None`` skips decontamination."""

    text_column: str = "text"
    # quality gate (functions/text.py signal conventions)
    min_chars: int = 50
    min_alpha_ratio: float = 0.5
    min_stopwords: int = 1
    max_compression_ratio: float | None = None  # None → skip zlib pass
    # exact dedup key: normalize (NFC+lower+ws-collapse+trim) or raw
    normalize_key: bool = True
    # optional stages
    benchmark_grams: tuple[str, ...] | None = None
    decontam_mode: str = "substring"
    neardup: NearDupConfig | None = None


@dataclass
class CurationResult:
    out_dir: str
    n_input: int = 0
    n_gated: int = 0
    n_decontaminated: int = 0
    n_exact_unique: int = 0
    n_exact_drops: int = -1  # driver-resident drop-set size (dupe-bounded)
    n_after_neardup: int = 0
    stages_skipped: list[str] = field(default_factory=list)
    wall_sec: float = 0.0
    stage_sec: dict = field(default_factory=dict)

    def curated(self) -> rd.Dataset:
        return read_stage(os.path.join(self.out_dir, "curated"))


def run_curation(
    source: str | rd.Dataset,
    out_dir: str,
    cfg: CurateConfig = CurateConfig(),
    *,
    resume: bool = True,
) -> CurationResult:
    try:
        return _run_curation(source, out_dir, cfg, resume=resume)
    except BaseException:
        drain_pending_checkpoints()
        raise


def _norm_key(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    k = pc.utf8_normalize(col, form="NFC")
    k = pc.utf8_lower(k)
    k = pc.replace_substring_regex(k, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(k)


def _run_curation(
    source: str | rd.Dataset,
    out_dir: str,
    cfg: CurateConfig,
    *,
    resume: bool,
) -> CurationResult:
    from deduper_ray.functions.text import (
        add_compression_ratio,
        add_fingerprint,
        add_quality_scores,
        add_token_count,
    )

    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    chash = config_hash(asdict(cfg))
    res = CurationResult(out_dir=out_dir)
    tcol = cfg.text_column

    # ---- stage 1: quality gate --------------------------------------
    t = time.time()
    gate_dir = os.path.join(out_dir, "gated")
    if resume and stage_is_complete(gate_dir, chash):
        gated = read_stage(gate_dir)
        res.stages_skipped.append("gated")
        res.n_input = -1  # unknown on resume (input not re-read)
    else:
        ds = read_table(source) if isinstance(source, str) else source
        res.n_input = ds.count()

        def _gate(b: pa.Table) -> pa.Table:
            scored = add_quality_scores(b, text_column=tcol)
            keep = pc.and_(
                pc.and_(
                    pc.greater_equal(
                        scored["n_chars_q"], pa.scalar(cfg.min_chars)
                    ),
                    pc.greater_equal(
                        scored["alpha_ratio"],
                        pa.scalar(cfg.min_alpha_ratio),
                    ),
                ),
                pc.greater_equal(
                    scored["n_stopwords"], pa.scalar(cfg.min_stopwords)
                ),
            )
            out = scored.filter(keep).select(b.column_names)
            if cfg.max_compression_ratio is not None:
                out = add_compression_ratio(out, text_column=tcol)
                out = out.filter(
                    pc.less_equal(
                        out["compression_ratio"],
                        pa.scalar(cfg.max_compression_ratio),
                    )
                ).drop_columns(["compression_ratio"])
            return out

        gated = write_stage(
            ds.map_batches(_gate, batch_format="pyarrow"),
            gate_dir, stage="gated", cfg_hash=chash,
            inputs=[source if isinstance(source, str) else "<dataset>"],
        )
    res.n_gated = gated.count()
    res.stage_sec["gated"] = round(time.time() - t, 3)

    # ---- stage 2: decontaminate (optional) --------------------------
    t = time.time()
    current = gated
    prev_dir = gate_dir
    if cfg.benchmark_grams:
        dec_dir = os.path.join(out_dir, "decontaminated")
        if resume and stage_is_complete(dec_dir, chash):
            current = read_stage(dec_dir)
            res.stages_skipped.append("decontaminated")
        else:
            from deduper_ray.stages.decontam import decontaminate

            clean = decontaminate(
                current,
                list(cfg.benchmark_grams),
                text_column=tcol,
                mode=cfg.decontam_mode,
            )
            current = write_stage(
                clean, dec_dir, stage="decontaminated", cfg_hash=chash,
                inputs=[gate_dir],
            )
        prev_dir = dec_dir
    res.n_decontaminated = current.count()
    res.stage_sec["decontaminated"] = round(time.time() - t, 3)

    # ---- stage 3: exact dedup (normalized or raw key) ---------------
    t = time.time()
    ex_dir = os.path.join(out_dir, "exact")
    if resume and stage_is_complete(ex_dir, chash):
        current = read_stage(ex_dir)
        res.stages_skipped.append("exact")
    else:
        from deduper_ray.functions.hashing import md5_hex_array
        from deduper_ray.stages.exact import make_drop_filter, policy_drop_ids

        def _key(b: pa.Table) -> pa.Table:
            col = b[tcol]
            key = _norm_key(col) if cfg.normalize_key else col
            # group on the MD5 of the key, not the key itself — the
            # sort all-to-all then moves 32-byte hashes instead of
            # whole documents (measured 30.8 s → narrow at 100k code
            # files; same crypto-key rationale as stages/exact.py)
            # null → a sentinel no real document can contain (NUL
            # bytes), so null-text and empty-string docs stay DISTINCT
            # dedup groups instead of silently identifying
            return pa.table(
                {
                    "_k": md5_hex_array(
                        pc.fill_null(key, "\x00__null_text__\x00")
                    ),
                    "row_id": b["row_id"],
                }
            )

        # Keeper election is distributed (stages/exact.py
        # policy_drop_ids): the driver holds only the DROP set — row
        # ids of non-keeper rows, bounded by dupe volume — never one
        # id per distinct key (O(corpus) for mostly-unique corpora;
        # VERDICT r3 finding #1).
        drops, dstats = policy_drop_ids(
            current.map_batches(_key, batch_format="pyarrow"),
            key_col="_k",
            id_col="row_id",
        )
        res.n_exact_drops = int(drops.size)
        logging.getLogger(__name__).info(
            "curate exact stage: driver-resident drop set = %d ids "
            "(%.2f MB) — bounded by dupe volume, not corpus size",
            drops.size, drops.nbytes / 1e6,
        )
        drop_ref = ray.put(drops)
        current = write_stage(
            current.map_batches(
                make_drop_filter(drop_ref, id_col="row_id"),
                batch_format="pyarrow",
            ),
            ex_dir, stage="exact", cfg_hash=chash, inputs=[prev_dir],
        )
    res.n_exact_unique = current.count()
    res.stage_sec["exact"] = round(time.time() - t, 3)

    # ---- stage 4: near-dup dedup (optional) -------------------------
    t = time.time()
    if cfg.neardup is not None:
        from dataclasses import replace

        from deduper_ray.pipelines.neardup import run_neardup

        nd_cfg = replace(
            cfg.neardup, text_column=tcol, id_column="row_id"
        )
        nd = run_neardup(
            current, os.path.join(out_dir, "neardup"), nd_cfg,
            resume=resume,
        )
        # drop every clustered doc except its min-id representative
        drops: list[np.ndarray] = []
        for batch in nd.clusters().iter_batches(
            batch_size=262144, batch_format="pyarrow"
        ):
            rid = batch["row_id"].to_numpy(zero_copy_only=False)
            cid = batch["cluster_id"].to_numpy(zero_copy_only=False)
            drops.append(rid[rid != cid])
        drop_ref = ray.put(
            np.sort(np.concatenate(drops)) if drops else np.empty(0, np.int64)
        )

        def _drop(b: pa.Table) -> pa.Table:
            d = ray.get(drop_ref)
            if d.size == 0:
                return b
            ids = b["row_id"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(d, ids), d.size - 1)
            return b.filter(pa.array(d[pos] != ids))

        current = current.map_batches(_drop, batch_format="pyarrow")
    res.stage_sec["neardup"] = round(time.time() - t, 3)

    # ---- stage 5: annotate + final checkpoint -----------------------
    t = time.time()
    cur_dir = os.path.join(out_dir, "curated")
    if resume and stage_is_complete(cur_dir, chash) and cfg.neardup is None:
        current = read_stage(cur_dir)
        res.stages_skipped.append("curated")
    else:
        annotated = current.map_batches(
            lambda b: add_fingerprint(
                add_token_count(b, text_column=tcol), text_column=tcol
            ),
            batch_format="pyarrow",
        )
        current = write_stage(
            annotated, cur_dir, stage="curated", cfg_hash=chash,
            inputs=[ex_dir],
        )
    res.n_after_neardup = current.count()
    res.stage_sec["curated"] = round(time.time() - t, 3)

    flush_pending_checkpoints()
    res.wall_sec = round(time.time() - t0, 3)
    return res
