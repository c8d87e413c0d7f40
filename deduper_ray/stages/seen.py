"""Seen-hash broadcast anti-filter (reference S3/O8).

The reference preloads the whole hash table into an in-memory map before
the scan and treats any row whose hash is in it as a dupe with
``first_found_row_number = 0`` (reference: Deduper.kt:135-158, preload
value 0 at :152; behavior pinned by the sourceHashTable golden test,
DeduperTest.kt:393-413).

Ray-native shape: the seen set is put in the object store ONCE
(``ray.put``) and each actor in the marking pool fetches it ONCE in
``__init__`` (a local, zero-copy object-store read on every node) —
a broadcast semi-join, not a shuffle and not a per-batch re-ship.
For seen sets too large to broadcast, the same marking can be done as a
co-partitioned groupby join on the hash column (SURVEY.md §2 O8) — not
needed at current scales since the seen set is one hash per distinct
row ever seen, orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

SEEN_FLAG = "is_seen"


def load_seen_hashes(path: str, column: str = "hash") -> ray.ObjectRef:
    """Driver-side: read the seen-hash parquet (hash column only) and put
    the distinct values into the object store once."""
    import pyarrow.parquet as pq

    from deduper_ray.sources.readers import _expand_paths

    files = _expand_paths(path)
    tables = [pq.read_table(f, columns=[column]) for f in files]
    values = pc.unique(pa.concat_tables(tables)[column].combine_chunks())
    return ray.put(values)


class SeenHashMarker:
    """Actor-pool map_batches stage: append a bool ``is_seen`` column.

    State (the hash value-set or Bloom filter) is materialized once per
    actor in ``__init__`` — the canonical stateful-stage pattern.

    mode="exact" (default): pyarrow is_in against the full value set —
    the reference's semantics exactly.
    mode="bloom": Bloom-filter membership (functions/bloom.py) for seen
    sets too large to broadcast raw — APPROXIMATE: false positives drop
    never-seen rows as dupes at the configured FP rate. Opt-in only.
    """

    def __init__(self, seen_ref: ray.ObjectRef, hash_col: str = "row_md5",
                 mode: str = "exact"):
        self.mode = mode
        self.hash_col = hash_col
        if mode == "bloom":
            from deduper_ray.functions.bloom import BloomFilter

            values: pa.Array = ray.get(seen_ref)
            bf = BloomFilter(capacity=max(1, len(values)), fp_rate=0.001)
            bf.add_hex(values.to_pylist())
            self.bloom = bf
        else:
            self.values: pa.Array = ray.get(seen_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "bloom":
            mask = self.bloom.contains_arrow(batch[self.hash_col])
            return batch.append_column(SEEN_FLAG, mask)
        mask = pc.is_in(batch[self.hash_col], value_set=self.values)
        return batch.append_column(SEEN_FLAG, pc.fill_null(mask, False))


def mark_not_seen(batch: pa.Table, hash_col: str = "row_md5") -> pa.Table:
    """No-seen-set fast path: constant false column, zero lookup cost."""
    return batch.append_column(
        SEEN_FLAG, pa.array([False] * batch.num_rows, type=pa.bool_())
    )
