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


def chunk_dedupe(
    ds: rd.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    chunk_chars: int = 64,
    num_partitions: int | None = None,
    out: str = "clean_text",
) -> rd.Dataset:
    """Returns a Dataset (id_column, out) with every repeated chunk
    (beyond its first occurrence in (id, chunk_idx) order) removed.

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

    chunks = ds.select_columns([id_column, text_column]).map_batches(
        _chunk, batch_format="pyarrow"
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
