"""Shingling + MinHash signatures + SimHash fingerprints.

The reference engine's identity notion is exact MD5 equality
(Deduper.kt:201); the north rule generalizes it to NEAR-duplicate
identity. This stage turns each document into three narrow artifacts:

  minhash   fixed_size_list<uint64, K>  — K-permutation MinHash of the
                                          doc's k-shingle set
  simhash   uint64                      — 64-bit SimHash fingerprint
  n_shingles int64                      — |shingle set| (containment est)

Design notes (scale):
- Runs as an ACTOR POOL ``map_batches`` stage: the permutation
  coefficients (K×2 random 31-bit ints) and byte-power tables are
  built once per actor in ``__init__``, never per batch.
- All inner math is numpy over uint64 with wraparound — no Python
  loop over shingles; the only per-doc loop is the O(docs-per-batch)
  outer loop, each iteration fully vectorized.
- The wide ``content`` column is DROPPED here: everything downstream
  (banding, grouping, verification) moves ≤ ~1 KB/row no matter how
  large the documents are (SURVEY.md §4.2 "project narrow early").
- MinHash math: shingles are folded to 31 bits so that
  (a·x + b) mod p with p = 2^31-1 stays inside uint64 — the classic
  Broder-style construction (see PAPERS.md MinHash/LSH references).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MERSENNE31 = np.uint64((1 << 31) - 1)
_ROLL_MULT = np.uint64(1099511628211)  # FNV-ish odd multiplier


def shingle_hashes(data: bytes | memoryview, k: int) -> np.ndarray:
    """Unique 64-bit rolling hashes of all k-byte shingles, vectorized:
    k shifted multiply-adds over the byte array (no per-shingle loop).
    Accepts any buffer (bytes / memoryview) — zero-copy in."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = b.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n <= k:
        # wraparound multiply is intended; errstate keeps scalar-path
        # RuntimeWarnings out of the logs (array ops never warn)
        with np.errstate(over="ignore"):
            h = np.uint64(0)
            for v in b:
                h = h * _ROLL_MULT + v
        return np.array([h], dtype=np.uint64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = h * _ROLL_MULT + b[j : j + m]
    return np.unique(h)


def _rolling_hashes(b: np.ndarray, k: int) -> np.ndarray:
    """All k-window rolling hashes of the uint64 byte array ``b`` by
    binary doubling — h_{2w}(p) = h_w(p)·M^w + h_w(p+w) — ~log2(k)+
    popcount(k) multiply-add passes instead of k. Bit-identical to the
    k-pass Horner form (uint64 wraparound multiplication distributes/
    associates mod 2^64). Requires b.size >= k >= 1."""
    mask = 0xFFFFFFFFFFFFFFFF
    n = b.size
    # collect the power-of-two window hashes for k's set bits
    pieces = []  # (width, hashes, M^width)
    w, cur, Mw = 1, b, int(_ROLL_MULT)
    kk = k
    while True:
        if kk & 1:
            pieces.append((w, cur, np.uint64(Mw)))
        kk >>= 1
        if not kk:
            break
        cur = cur[: cur.size - w] * np.uint64(Mw) + cur[w:]
        Mw = (Mw * Mw) & mask
        w *= 2
    # combine MSB→LSB (Horner order: widest chunk first)
    pieces.reverse()
    pos, h, _ = pieces[0]
    for w, arr, Mw in pieces[1:]:
        new_len = n - (pos + w) + 1
        h = h[:new_len] * Mw + arr[pos : pos + new_len]
        pos += w
    m = n - k + 1
    if h is b:  # k == 1: don't alias the caller's buffer
        return b.copy()
    return h if h.size == m else h[:m]


def batch_shingle_hashes(
    off: np.ndarray, buf, k: int
) -> list[np.ndarray]:
    """Per-doc unique k-byte shingle hashes for a WHOLE batch, bit-
    identical to calling ``shingle_hashes`` per doc.

    One ``astype`` + k multiply-add passes over the batch's
    concatenated byte buffer compute every window hash at once; each
    doc then sorts + masks its own disjoint slice (windows that cross
    a doc boundary are simply never read). Replaces the per-doc
    rolling-hash calls whose numpy dispatch + per-doc ``astype`` +
    ``np.unique`` dominated the signer (28 → ~16 ms on a 512-doc /
    500 KB batch). Docs shorter than k bytes fall back to the scalar
    whole-doc hash, same as ``shingle_hashes``."""
    n_docs = off.size - 1
    out: list[np.ndarray] = [np.empty(0, dtype=np.uint64)] * n_docs
    base = int(off[0])
    b = np.frombuffer(buf[base : int(off[-1])], dtype=np.uint8).astype(
        np.uint64
    )
    m = b.size - k + 1
    if m > 0:
        h = _rolling_hashes(b, k)
    for i in range(n_docs):
        a = int(off[i]) - base
        L = int(off[i + 1]) - base - a
        if L == 0:
            continue
        if L >= k:
            seg = h[a : a + L - k + 1]
            seg.sort()  # in place: doc slices are disjoint
            keep = np.empty(seg.size, dtype=bool)
            keep[0] = True
            np.not_equal(seg[1:], seg[:-1], out=keep[1:])
            out[i] = seg[keep]
        else:
            with np.errstate(over="ignore"):
                hh = np.uint64(0)
                for v in b[a : a + L]:
                    hh = hh * _ROLL_MULT + v
            out[i] = np.array([hh], dtype=np.uint64)
    return out


def _batch_shingle_concat(
    off: np.ndarray, buf, k: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Fast path for ``MinHashSigner.__call__``: the batch's per-doc
    unique shingle hashes as ONE concatenated array (doc-major, sorted
    within each doc — the exact layout the signer builds from the
    per-doc list) plus per-doc unique counts.

    The per-doc Python work shrinks to an in-place ``sort`` on each
    doc's disjoint window slice; dedup + gather run as ONE masked copy
    of the global window-hash array (boundary-crossing windows and
    in-doc repeats masked out) — no per-position index gather at all.
    Returns None when any doc is shorter than k bytes (the rare
    scalar-hash case) or k < 2 (no boundary gap to separate docs) —
    caller falls back to ``batch_shingle_hashes``. Bit-identical
    output either way."""
    lens = np.diff(off)
    if k < 2 or ((lens > 0) & (lens < k)).any():
        return None
    n_docs = off.size - 1
    base = int(off[0])
    cnt = np.maximum(lens - k + 1, 0).astype(np.int64)
    total = int(cnt.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), cnt
    b = np.frombuffer(buf[base : int(off[-1])], dtype=np.uint8).astype(
        np.uint64
    )
    h = _rolling_hashes(b, k)
    m = h.size
    starts = (off[:-1] - base).astype(np.int64)
    for a, c in zip(starts, cnt):
        if c > 1:
            h[a : a + c].sort()  # in place: doc slices are disjoint
    # validity mask: True on each doc's own windows, False on the k-1
    # boundary-crossing positions between docs. Gaps are rare relative
    # to m (n_docs·(k-1) vs ~n_docs·doclen positions), so mark them by
    # fancy index instead of an O(m) cumsum: each non-final non-empty
    # doc is followed by exactly k-1 invalid positions
    valid = np.ones(m, dtype=bool)
    gap_start = (starts + cnt)[(cnt > 0) & (starts + cnt < m)]
    if gap_start.size:
        valid[
            (gap_start[:, None] + np.arange(k - 1, dtype=np.int64)).ravel()
        ] = False
    # first-in-run within each sorted doc slice: a position is a repeat
    # iff its predecessor is valid (same doc — the ≥1-position boundary
    # gap guarantees cross-doc positions are never adjacent) and equal
    keep = valid.copy()
    dup = np.empty(m, dtype=bool)
    dup[0] = False
    np.equal(h[1:], h[:-1], out=dup[1:])
    dup[1:] &= valid[:-1]
    keep &= ~dup
    concat = h[keep]
    # per-doc unique counts via prefix sums of the keep mask
    csum = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(keep, out=csum[1:])
    sizes = csum[starts + cnt] - csum[starts]
    return concat, sizes


def token_shingle_hashes(data: bytes, k: int, token_pattern) -> np.ndarray:
    """Unique hashes of k-grams of word tokens (BPE-ish regex tokens);
    the token stream is re-hashed with the same rolling scheme."""
    toks = token_pattern.findall(data)
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter(
        (hashless(t) for t in toks), dtype=np.uint64, count=len(toks)
    )
    if th.size <= k:
        with np.errstate(over="ignore"):
            h = np.uint64(0)
            for v in th:
                h = h * _ROLL_MULT + v
        return np.array([h], dtype=np.uint64)
    m = th.size - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = h * _ROLL_MULT + th[j : j + m]
    return np.unique(h)


# byte-value → 8 bit indicators, for the histogram form of the SimHash
# vote count below
_BYTE_BITS = ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1).astype(
    np.int64
)
_LITTLE_ENDIAN = np.dtype(np.uint64).byteorder in ("<", "=") and __import__(
    "sys"
).byteorder == "little"


def _simhash_votes(
    concat: np.ndarray, sizes: np.ndarray, seg: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Per-doc SimHash bit votes (ones·2 − n) over a segmented shingle
    array — (n_docs, 64) int64.

    Histogram form: per byte position j of the uint64 hash, bincount
    byte values per doc (one C pass over the batch), then expand the
    256-bin histogram to 8 bit counts with a tiny (docs×256)@(256×8)
    matmul. 8 passes over the data instead of the naive 64
    shift+mask+reduceat passes — measured 3.6× (80 ms → 22 ms on a
    512-doc/416k-shingle batch), exactly equal output. Falls back to
    the bit-loop on big-endian hosts (the uint8 view is byte-order-
    dependent)."""
    n = sizes.size
    if _LITTLE_ENDIAN and concat.size:
        by = concat.view(np.uint8).reshape(-1, 8)
        base = np.repeat(np.arange(n, dtype=np.int64), sizes) * 256
        votes = np.empty((n, 64), dtype=np.int64)
        for j in range(8):
            hist = np.bincount(
                base + by[:, j], minlength=n * 256
            ).reshape(n, 256)
            votes[:, 8 * j : 8 * j + 8] = hist @ _BYTE_BITS
        return votes * 2 - counts[:, None]
    votes = np.empty((n, 64), dtype=np.int64)
    for bit in range(64):
        ones = ((concat >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        votes[:, bit] = np.add.reduceat(ones, seg) * 2 - counts
    return votes


def hashless(token: bytes) -> int:
    """Stable 64-bit FNV-1a of a token (no Python hash() salt)."""
    h = 0xCBF29CE484222325
    for c in token:
        h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


class MinHashSigner:
    """Actor-pool stage: (row_id, text) batches → (row_id, minhash,
    simhash, n_shingles) batches. Permutation state built once per actor.
    """

    def __init__(
        self,
        *,
        num_perms: int = 128,
        shingle_k: int = 8,
        seed: int = 42,
        text_column: str = "content",
        id_column: str = "row_id",
        use_token_shingles: bool = False,
        keep_columns: tuple[str, ...] = (),
        scheme: str = "oph",
        emit_minhash: bool = True,
    ):
        """scheme="oph" (default): one-permutation hashing with rotation
        densification (Li/Owen/Zhang 2012; Shrivastava/Li 2014) — ONE
        pass over the shingle set fills all K slots (top-log2(K) bits
        bucket, min of the remainder per bucket), ~K× less hashing work
        than K independent permutations, same unbiased Jaccard
        estimator P(slot_a == slot_b) = J.
        scheme="classic": K independent (a·x+b) mod p permutations.
        emit_minhash=False: SimHash-only signing — skips the MinHash
        slot fill and omits the ``minhash`` column (~25% less batch
        CPU), for consumers like stages/simhash_nd.py that band on the
        fingerprint alone. simhash/n_shingles are unchanged."""
        rng = np.random.RandomState(seed)
        # a ∈ [1, p), b ∈ [0, p) — 31-bit universal hashing coefficients
        self.a = rng.randint(1, int(MERSENNE31), size=num_perms).astype(np.uint64)
        self.b = rng.randint(0, int(MERSENNE31), size=num_perms).astype(np.uint64)
        self.k = shingle_k
        self.K = num_perms
        self.scheme = scheme
        if scheme == "oph":
            if num_perms & (num_perms - 1):
                raise ValueError("oph scheme requires power-of-two num_perms")
            self.bin_bits = int(np.log2(num_perms))
        self.text_column = text_column
        self.id_column = id_column
        self.keep_columns = keep_columns
        self.emit_minhash = emit_minhash
        self.bit_idx = np.arange(64, dtype=np.uint64)
        if use_token_shingles:
            import re

            self.token_pattern = re.compile(rb"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")
        else:
            self.token_pattern = None

    def _signature(self, sh: np.ndarray) -> np.ndarray:
        if sh.size == 0:
            return np.full(self.K, int(MERSENNE31), dtype=np.uint64)
        s31 = sh % MERSENNE31  # fold to 31 bits: products fit in uint64
        vals = (self.a[:, None] * s31[None, :] + self.b[:, None]) % MERSENNE31
        return vals.min(axis=1)

    def _oph_signatures(
        self,
        s31: np.ndarray,
        sizes: np.ndarray,
        seg: np.ndarray,
        sigs: np.ndarray,
        ne: np.ndarray,
    ) -> None:
        """One-permutation MinHash: rehash once (universal a[0]·x+b[0]),
        top bin_bits bits pick the slot, min of the value fills it; a
        single scatter-min pass fills the whole batch. Empty slots are
        densified by circular rotation: slot i borrows slot i−j (the
        nearest filled slot to the left), offset by j·C so different
        emptiness patterns cannot fake agreement."""
        EMPTY = np.uint64(1) << np.uint64(62)
        h = (self.a[0] * s31 + self.b[0]) % MERSENNE31
        bins = (h >> np.uint64(31 - self.bin_bits)).astype(np.int64)
        vals = h & ((np.uint64(1) << np.uint64(31 - self.bin_bits)) - np.uint64(1))
        m = ne.size
        flat = np.full(m * self.K, EMPTY, dtype=np.uint64)
        doc_idx = np.repeat(np.arange(m, dtype=np.int64), sizes)
        np.minimum.at(flat, doc_idx * self.K + bins, vals)
        grid = flat.reshape(m, self.K)
        empty = grid == EMPTY
        # densify ONLY the docs that have an empty slot: with ~1k
        # shingles into 128 bins an empty bin is ~0.05%-rare, so the
        # doubling loop below touches a handful of rows, not the whole
        # grid (was ~2/3 of this function's time on typical batches)
        rows = np.flatnonzero(empty.any(axis=1))
        if rows.size:
            C = np.uint64(0x9E3779B1)
            sub = grid[rows]
            sub_empty = empty[rows]
            # circular forward fill: after K-1 doubling steps every slot
            # has borrowed from its nearest filled predecessor
            fill_src = sub.copy()
            dist = np.zeros((rows.size, self.K), dtype=np.uint64)
            shift = 1
            while shift < self.K:
                rolled = np.roll(fill_src, shift, axis=1)
                rolled_dist = np.roll(dist, shift, axis=1) + np.uint64(shift)
                need = (fill_src == EMPTY) & (rolled != EMPTY)
                fill_src[need] = rolled[need]
                dist[need] = rolled_dist[need]
                shift *= 2
            # mask to 31 bits so the documented <2^31 invariant holds
            # for densified slots too (uint32 storage truncates
            # consistently either way, but the masked form keeps the
            # stated invariant true and the collision bound tight)
            borrowed = (fill_src + dist * C) & MERSENNE31
            sub[sub_empty] = borrowed[sub_empty]
            grid[rows] = sub
        sigs[ne] = grid

    def _simhash(self, sh: np.ndarray) -> np.uint64:
        if sh.size == 0:
            return np.uint64(0)
        bits = (sh[:, None] >> self.bit_idx[None, :]) & np.uint64(1)
        votes = bits.sum(axis=0, dtype=np.int64) * 2 - sh.size
        return np.uint64(
            ((votes > 0).astype(np.uint64) << self.bit_idx).sum(dtype=np.uint64)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from deduper_ray.functions.hashing import _utf8_slices

        # zero-copy doc bytes straight off the Arrow value buffer — no
        # per-doc str materialization / re-encode (Arrow strings ARE
        # UTF-8; np.frombuffer accepts the memoryview slices directly)
        offsets, buf = _utf8_slices(batch[self.text_column])
        n = len(offsets) - 1
        sigs = (
            np.empty((n, self.K), dtype=np.uint64)
            if self.emit_minhash
            else None
        )
        simhashes = np.empty(n, dtype=np.uint64)
        n_shingles = np.empty(n, dtype=np.int64)

        # whole-batch shingling: ONE astype + k rolling passes over the
        # batch's concatenated bytes, per-doc in-place sorts + one
        # global dedup-gather (_batch_shingle_concat) — then the K
        # permutations and 64 SimHash bit-sums run as reduceat passes
        # over the whole batch instead of per-doc Python calls
        concat = None
        if self.token_pattern is None:
            fast = _batch_shingle_concat(
                np.asarray(offsets, dtype=np.int64), buf, self.k
            )
            if fast is not None:
                concat, all_sizes = fast
                n_shingles[:] = all_sizes
        if concat is None:
            # list path: token shingles, or byte docs shorter than k
            if self.token_pattern is None:
                shingle_list = batch_shingle_hashes(
                    np.asarray(offsets, dtype=np.int64), buf, self.k
                )
                for i, sh in enumerate(shingle_list):
                    n_shingles[i] = sh.size
            else:
                shingle_list = []
                for i, (a, b) in enumerate(zip(offsets, offsets[1:])):
                    sh = token_shingle_hashes(
                        bytes(buf[a:b]), self.k, self.token_pattern
                    )
                    shingle_list.append(sh)
                    n_shingles[i] = sh.size
            nonempty = [i for i, sh in enumerate(shingle_list) if sh.size]
            if nonempty:
                concat = np.concatenate(
                    [shingle_list[i] for i in nonempty]
                )

        ne = np.flatnonzero(n_shingles)
        if ne.size < n:
            # empty-doc defaults
            empty_rows = np.flatnonzero(n_shingles == 0)
            if sigs is not None:
                sigs[empty_rows] = int(MERSENNE31)
            simhashes[empty_rows] = 0
        if ne.size:
            sizes = n_shingles[ne]
            seg = np.zeros(ne.size, dtype=np.int64)
            np.cumsum(sizes[:-1], out=seg[1:])
            if sigs is not None:
                s31 = concat % MERSENNE31
                if self.scheme == "oph":
                    self._oph_signatures(s31, sizes, seg, sigs, ne)
                else:
                    for p in range(self.K):
                        vals = (self.a[p] * s31 + self.b[p]) % MERSENNE31
                        sigs[ne, p] = np.minimum.reduceat(vals, seg)
            counts = n_shingles[ne]
            votes = _simhash_votes(concat, sizes, seg, counts)
            bitvals = (votes > 0).astype(np.uint64)
            simhashes[ne] = (bitvals << self.bit_idx[None, :]).sum(axis=1)
        cols = {self.id_column: batch[self.id_column]}
        if sigs is not None:
            # uint32: MinHash values are < 2^31 by construction (mod
            # Mersenne-31); half the bytes in the parquet checkpoint,
            # the LSH shuffle and the verify gather
            cols["minhash"] = pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1).astype(np.uint32), type=pa.uint32()),
                self.K,
            )
        cols["simhash"] = pa.array(simhashes, type=pa.uint64())
        cols["n_shingles"] = pa.array(n_shingles, type=pa.int64())
        for c in self.keep_columns:
            cols[c] = batch[c]
        return pa.table(cols)


def exact_jaccard(a: bytes | str, b: bytes | str, k: int) -> float:
    """Brute-force k-shingle Jaccard — the test oracle for recall
    measurement (SURVEY.md §5.2c), also usable as a final verify."""
    if isinstance(a, str):
        a = a.encode("utf-8", "surrogatepass")
    if isinstance(b, str):
        b = b.encode("utf-8", "surrogatepass")
    sa = set(shingle_hashes(a, k).tolist())
    sb = set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# Per-worker-process signer cache: lets the signatures stage run as a
# STATELESS task pool (tasks reuse Ray's warm worker processes — no
# per-job actor process spawn) while still building permutation state
# once per process, which is all the "actor state" this stage needs.
# Capped at 2 entries (only the current job's config recurs).
_SIGNER_CACHE: dict[tuple, "MinHashSigner"] = {}


def make_signer_fn(**kwargs):
    """Task-pool twin of ``map_batches(MinHashSigner, ...)``: returns a
    plain function whose per-process ``MinHashSigner`` is built on
    first use and reused for every subsequent batch in that worker."""
    key = tuple(sorted(kwargs.items()))

    def _sign(batch: pa.Table) -> pa.Table:
        signer = _SIGNER_CACHE.get(key)
        if signer is None:
            if len(_SIGNER_CACHE) >= 2:
                _SIGNER_CACHE.pop(next(iter(_SIGNER_CACHE)))
            signer = _SIGNER_CACHE[key] = MinHashSigner(**kwargs)
        return signer(batch)

    return _sign
