"""Chunk-level exact dedup — the paragraph/段 dedup shape from
large-scale training-data curation ("remove repeated boilerplate
blocks, keep each block's first occurrence"), expressed over
fixed-width character chunks so every step is a vectorized Arrow
kernel (the testdata corpus has no paragraph separators; at 100 TB the
chunker swaps for a '\\n\\n' splitter with identical downstream
machinery).

Pipeline (all streaming, one shuffle pair):
  1. chunk: per batch, one vectorized ``utf8_slice_codeunits`` per
     chunk index (≤ ceil(max_len/width) slices) → rows
     (id, chunk_idx, seg) + one always-kept SENTINEL row per doc (so
     fully-deduplicated docs still reassemble to an empty string —
     no outer join needed).
  2. first-wins: global keeper per distinct seg = min composite
     ordinal (id·2²⁰ + idx) via groupby-aggregate; kept rows selected
     with a hash-partitioned join on seg (both sides corpus-scale —
     no driver set, no broadcast).
  3. reassemble: hash-repartition kept rows by id (co-locates each
     doc's chunks in one block), then per-block ordered concat.

Partitioning assumptions: ``id`` < 2^43 and < 2^20 chunks per doc
(the composite ordinal); seg-key skew is bounded because equal chunks
collapse to ONE keeper row before the join's build side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min

_IDX_BITS = 20
_SENTINEL = -1

# deterministic Gear table for content-defined chunking (CDC)
_GEAR = np.random.RandomState(0x5EED).randint(
    0, 2**63, 256
).astype(np.uint64)


def cdc_cut_points(
    data: np.ndarray,
    *,
    min_size: int,
    avg_size: int,
    max_size: int,
    window: int = 32,
) -> list[int]:
    """Content-defined cut points over a UTF-8 byte array (Gear-hash
    CDC, the FastCDC family): a boundary lands where the rolling Gear
    hash of the trailing ``window`` bytes has its low log2(avg_size)
    bits zero, subject to [min_size, max_size] chunk bounds. Boundaries
    move WITH the content, so inserting bytes near the front re-chunks
    only the neighborhood — the shift-robustness fixed-width chunking
    lacks. Cut points are snapped forward to UTF-8 character starts so
    every chunk remains a valid string.

    The hash is fully vectorized (``window`` shifted adds over the
    byte array — same shape as the shingle hasher); the boundary walk
    is O(#chunks + #candidates), not O(bytes). ``avg_size`` must be a
    power of two."""
    n = int(data.size)
    if n == 0:
        return []
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    g = _GEAR[data]
    h = np.zeros(n, dtype=np.uint64)
    for k in range(window):
        h[k:] += g[: n - k] << np.uint64(k)  # mod 2^64 wraps naturally
    mask = np.uint64(avg_size - 1)
    cand = np.nonzero((h & mask) == 0)[0] + 1  # cut AFTER position i
    cuts: list[int] = []
    last = 0
    ci = 0
    while last < n:
        lo_t = last + min_size
        hi_t = last + max_size
        while ci < cand.size and cand[ci] < lo_t:
            ci += 1
        if ci < cand.size and cand[ci] <= hi_t:
            cut = int(cand[ci])
        else:
            cut = min(hi_t, n)
        if cut >= n:
            cuts.append(n)
            break
        while cut < n and (data[cut] & 0xC0) == 0x80:
            cut += 1  # snap to the next UTF-8 char start
        cuts.append(cut)
        last = cut
    return cuts


def chunk_dedupe(
    ds: rd.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    chunk_chars: int = 64,
    num_partitions: int | None = None,
    out: str = "clean_text",
    chunker: str = "fixed",
    cdc_min: int = 32,
    cdc_avg: int = 64,
    cdc_max: int = 256,
) -> rd.Dataset:
    """Returns a Dataset (id_column, out) with every repeated chunk
    (beyond its first occurrence in (id, chunk_idx) order) removed.

    ``chunker="fixed"`` (default): fixed-width character chunks, fully
    Arrow-vectorized — the oracle-checkable mode. ``chunker="cdc"``:
    content-defined boundaries (``cdc_cut_points``) — chunks survive
    INSERTIONS near-unchanged, so near-identical files dedupe at the
    chunk level where fixed grids realign everything downstream of the
    edit. Downstream machinery (first-wins groupby + hash join +
    bucketed reassembly) is identical for both.

    ``num_partitions`` sizes the join's hash-shuffle aggregator pool;
    each aggregator is an actor with real startup cost, so default to
    ~half the cluster CPUs (more partitions only pay off once a
    partition's build side outgrows a worker's heap)."""
    if num_partitions is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(32, cpus // 2))

    def _chunk(t: pa.Table) -> pa.Table:
        ids = t[id_column]
        txt = t[text_column]
        lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        max_chunks = int(np.ceil(lens.max() / chunk_chars)) if len(lens) else 0
        parts = [
            pa.table(
                {
                    id_column: ids,
                    "chunk_idx": pa.array(
                        np.full(t.num_rows, _SENTINEL, dtype=np.int64)
                    ),
                    "seg": pa.array([""] * t.num_rows, type=pa.string()),
                }
            )
        ]
        for i in range(max_chunks):
            seg = pc.utf8_slice_codeunits(
                txt, i * chunk_chars, (i + 1) * chunk_chars
            )
            keep = lens > i * chunk_chars
            parts.append(
                pa.table(
                    {
                        id_column: ids,
                        "chunk_idx": pa.array(
                            np.full(t.num_rows, i, dtype=np.int64)
                        ),
                        "seg": seg,
                    }
                ).filter(pa.array(keep))
            )
        return pa.concat_tables(parts)

    def _chunk_cdc(t: pa.Table) -> pa.Table:
        from deduper_ray.functions.hashing import _utf8_slices

        offs, buf = _utf8_slices(t[text_column])
        ids = t[id_column].to_numpy(zero_copy_only=False)
        out_ids = [ids]  # sentinel rows first (always-kept, seg "")
        out_idx = [np.full(t.num_rows, _SENTINEL, dtype=np.int64)]
        segs: list[bytes] = [b""] * t.num_rows
        for r, (a, b) in enumerate(zip(offs, offs[1:])):
            data = np.frombuffer(buf, dtype=np.uint8, count=b - a, offset=a)
            cuts = cdc_cut_points(
                data, min_size=cdc_min, avg_size=cdc_avg, max_size=cdc_max
            )
            last = 0
            for i, c in enumerate(cuts):
                segs.append(bytes(data[last:c]))
                last = c
            if cuts:
                out_ids.append(np.full(len(cuts), ids[r], dtype=np.int64))
                out_idx.append(np.arange(len(cuts), dtype=np.int64))
        seg_arr = pc.cast(  # valid UTF-8 by construction (char-snapped)
            pa.array(segs, type=pa.large_binary()), pa.string()
        )
        return pa.table(
            {
                id_column: pa.array(np.concatenate(out_ids)),
                "chunk_idx": pa.array(np.concatenate(out_idx)),
                "seg": seg_arr,
            }
        )

    chunk_fn = {"fixed": _chunk, "cdc": _chunk_cdc}.get(chunker)
    if chunk_fn is None:
        raise ValueError(f"unknown chunker {chunker!r}")
    chunks = ds.select_columns([id_column, text_column]).map_batches(
        chunk_fn, batch_format="pyarrow"
    )

    def _ordinal(t: pa.Table) -> pa.Table:
        ids = t[id_column].to_numpy(zero_copy_only=False)
        idx = t["chunk_idx"].to_numpy(zero_copy_only=False)
        # composite-ordinal domain guard: outside these bounds the packed
        # int64 aliases and first-occurrence picks WRONG keepers — raise
        # instead of silently corrupting (docstring assumptions enforced)
        if ids.size:
            if ids.min() < 0 or ids.max() >= (1 << (63 - _IDX_BITS)):
                raise ValueError(
                    f"chunk dedup requires 0 <= {id_column} < 2^{63 - _IDX_BITS} "
                    f"(got range [{ids.min()}, {ids.max()}])"
                )
            real_idx = idx[idx != _SENTINEL]
            if real_idx.size and real_idx.max() >= (1 << _IDX_BITS):
                raise ValueError(
                    f"chunk dedup supports < 2^{_IDX_BITS} chunks per doc "
                    f"(got chunk_idx {real_idx.max()})"
                )
        return t.append_column(
            "_ord", pa.array((ids << _IDX_BITS) | (idx & ((1 << _IDX_BITS) - 1)))
        )

    with_ord = chunks.map_batches(_ordinal, batch_format="pyarrow")

    # keeper ordinal per distinct seg (sentinels excluded: their seg ''
    # must never dedupe real chunks or each other)
    real = with_ord.map_batches(
        lambda t: t.filter(pc.not_equal(t["chunk_idx"], _SENTINEL)),
        batch_format="pyarrow",
    )
    keepers = real.groupby("seg").aggregate(Min("_ord", alias_name="_keep"))

    joined = real.join(
        keepers,
        join_type="inner",
        num_partitions=num_partitions,
        on=("seg",),
    )
    kept_real = joined.map_batches(
        lambda t: t.filter(pc.equal(t["_ord"], t["_keep"])).select(
            [id_column, "chunk_idx", "seg"]
        ),
        batch_format="pyarrow",
    )
    sentinels = with_ord.map_batches(
        lambda t: t.filter(pc.equal(t["chunk_idx"], _SENTINEL)).select(
            [id_column, "chunk_idx", "seg"]
        ),
        batch_format="pyarrow",
    )
    kept = kept_real.union(sentinels)

    # co-locate each doc's kept chunks (hash-bucket + bounded-
    # cardinality groupby — same co-partitioning shape as
    # relational.asof_join_partitioned), then ordered concat per bucket
    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def _bucket(t: pa.Table) -> pa.Table:
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((ids * _GOLD) >> np.uint64(33)) % np.uint64(num_partitions)
        return t.append_column("_bucket", pa.array(b.astype(np.int64)))

    def _reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_column, "chunk_idx"], kind="mergesort")
        agg = df.groupby(id_column, sort=False)["seg"].agg("".join)
        return pd.DataFrame(
            {id_column: agg.index.to_numpy(), out: agg.to_numpy()}
        )

    return (
        kept.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(_reassemble, batch_format="pandas")
    )
