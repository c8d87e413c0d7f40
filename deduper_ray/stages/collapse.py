"""Identical-signature collapse — exact dedup BEFORE near-dup banding.

Exact-duplicate groups (identical shingle sets → identical MinHash
signature + SimHash) are the densest LSH buckets: a group of g
identical docs lands together in EVERY band and contributes O(g²)
candidate pairs × bands. Collapsing each identical-signature group to
one representative before banding removes that quadratic term — the
standard production layout (exact dedup, then near-dup on distinct
content) — while keeping the SAME final clusters: the collapsed
members are re-attached as (rep, member) edges with Jaccard 1.0, and
union-find transitivity restores full groups.

Same sort + run-scan + boundary-stitch machinery as the LSH and
group-stats stages; the sort key is the 128-bit MD5 of the signature
bytes ⊕ simhash (collision probability negligible at any corpus size).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _add_sig_key(batch: pa.Table, id_column: str) -> pa.Table:
    n = batch.num_rows
    K = batch["minhash"].type.list_size
    flat = batch["minhash"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    sigs = flat.reshape(n, K)
    simhash = batch["simhash"].to_numpy(zero_copy_only=False)
    keys = [
        hashlib.md5(
            sigs[i].tobytes() + simhash[i].tobytes()
        ).hexdigest()
        for i in range(n)
    ]
    return pa.table(
        {
            "sig_key": pa.array(keys, type=pa.string()),
            id_column: batch[id_column],
        }
    )


def _scan_key_block(t: pa.Table, id_column: str) -> pa.Table:
    """Runs of equal sig_key → (rep=min id, member) edges; first/last
    runs → fragments (kind=1: sig_key + row_id) for driver stitching."""
    n = t.num_rows
    empty = pa.table(
        {
            "kind": pa.array([], type=pa.int8()),
            "sig_key": pa.array([], type=pa.string()),
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
        }
    )
    if n == 0:
        return empty
    keys = t["sig_key"].combine_chunks()
    ids = t[id_column].to_numpy(zero_copy_only=False)
    neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
    change = np.nonzero(neq.to_numpy(zero_copy_only=False))[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    ea, eb = [], []
    fkeys: list = []
    fids: list = []
    for i, (s, e) in enumerate(zip(starts, ends)):
        if i == 0 or i == len(starts) - 1:
            fkeys.extend([keys[j].as_py() for j in range(s, e)])
            fids.extend(ids[s:e].tolist())
            continue
        if e - s < 2:
            continue
        grp = np.sort(ids[s:e])
        ea.extend([int(grp[0])] * (grp.size - 1))
        eb.extend(grp[1:].tolist())
    kind = np.concatenate(
        [np.zeros(len(ea), dtype=np.int8), np.ones(len(fkeys), dtype=np.int8)]
    )
    return pa.table(
        {
            "kind": pa.array(kind),
            "sig_key": pa.array(
                [""] * len(ea) + fkeys, type=pa.string()
            ),
            "id_a": pa.array(ea + [0] * len(fkeys), type=pa.int64()),
            "id_b": pa.array(eb + fids, type=pa.int64()),
        }
    )


def collapse_identical(
    signatures: rd.Dataset, *, id_column: str = "row_id"
) -> tuple[rd.Dataset, pa.Table]:
    """Returns (representative-only signatures, identity edges).

    Identity edges are (id_a=rep, id_b=member) rows for every collapsed
    duplicate — Jaccard-1.0 by construction; feed them to union-find
    alongside verified near-dup pairs.
    """
    import ray

    keyed = signatures.map_batches(
        lambda t: _add_sig_key(t, id_column), batch_format="pyarrow"
    )
    scanned = (
        keyed.sort("sig_key")
        .map_batches(
            lambda t: _scan_key_block(t, id_column),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
    )
    from deduper_ray.functions.util import dataset_to_table

    tbl = dataset_to_table(
        scanned,
        pa.schema(
            [
                ("kind", pa.int8()),
                ("sig_key", pa.string()),
                ("id_a", pa.int64()),
                ("id_b", pa.int64()),
            ]
        ),
    )
    kind = tbl["kind"].to_numpy(zero_copy_only=False)
    ea = [tbl["id_a"].to_numpy(zero_copy_only=False)[kind == 0]]
    eb = [tbl["id_b"].to_numpy(zero_copy_only=False)[kind == 0]]
    # stitch boundary fragments (≤2 runs per block)
    frag = tbl.filter(pa.array(kind == 1))
    if frag.num_rows:
        fkeys = np.asarray(frag["sig_key"].to_pylist(), dtype=object)
        fids = frag["id_b"].to_numpy(zero_copy_only=False)
        order = np.argsort(fkeys, kind="stable")
        fkeys, fids = fkeys[order], fids[order]
        change = np.nonzero(fkeys[1:] != fkeys[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [fkeys.size]))
        for s, e in zip(starts, ends):
            grp = np.unique(fids[s:e])
            if grp.size < 2:
                continue
            ea.append(np.full(grp.size - 1, grp[0], dtype=np.int64))
            eb.append(grp[1:])
    edges = pa.table(
        {
            "id_a": pa.array(np.concatenate(ea), type=pa.int64()),
            "id_b": pa.array(np.concatenate(eb), type=pa.int64()),
        }
    )
    # representative filter: drop collapsed members (broadcast anti-set;
    # bound = exact-dup count, the same bound exact dedup accepts)
    drop_ref = ray.put(pa.array(np.sort(edges["id_b"].to_numpy(zero_copy_only=False)), type=pa.int64()))

    def _reps(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(pc.is_in(t[id_column], value_set=ray.get(drop_ref)))
        )

    reps = signatures.map_batches(_reps, batch_format="pyarrow")
    return reps, edges
