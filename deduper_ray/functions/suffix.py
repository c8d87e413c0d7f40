"""Suffix-array substring matching — the exact-overlap / containment
stage of the north rule (BASELINE.json: "suffix-array substring
matching for exact-overlap dedup"). The reference has no equivalent.

``SuffixArray`` builds the array with the prefix-doubling algorithm
(Manber–Myers, O(n log n) via numpy lexsort — no per-character Python
loop) and answers "is pattern P a substring of T" in
O(|P| log |T|) by binary search. Build once per haystack, probe many
patterns — the shape the containment stage uses (one big file vs many
suspected-embedded files).
"""

from __future__ import annotations

import numpy as np


class SuffixArray:
    def __init__(self, text: bytes):
        self.text = np.frombuffer(text, dtype=np.uint8)
        self.sa = self._build(self.text)

    @staticmethod
    def _build(t: np.ndarray) -> np.ndarray:
        n = t.size
        if n == 0:
            return np.empty(0, dtype=np.int64)
        rank = t.astype(np.int64)
        sa = np.argsort(rank, kind="stable")
        k = 1
        while k < n:
            # key = (rank[i], rank[i+k]); -1 past the end
            second = np.full(n, -1, dtype=np.int64)
            second[:-k] = rank[k:]
            order = np.lexsort((second, rank))
            # recompute ranks: new rank increments where either key differs
            r_sorted = rank[order]
            s_sorted = second[order]
            diff = np.ones(n, dtype=np.int64)
            diff[0] = 0
            diff[1:] = (r_sorted[1:] != r_sorted[:-1]) | (
                s_sorted[1:] != s_sorted[:-1]
            )
            new_rank = np.cumsum(diff)
            rank = np.empty(n, dtype=np.int64)
            rank[order] = new_rank
            sa = order
            if new_rank[-1] == n - 1:
                break
            k *= 2
        return sa.astype(np.int64)

    def contains(self, pattern: bytes) -> bool:
        """Binary search the suffix array for ``pattern`` as a prefix of
        some suffix."""
        if not pattern:
            return True
        p = np.frombuffer(pattern, dtype=np.uint8)
        if p.size > self.text.size:
            return False
        lo, hi = 0, self.sa.size
        while lo < hi:
            mid = (lo + hi) // 2
            start = self.sa[mid]
            suffix = self.text[start : start + p.size]
            c = _compare(suffix, p)
            if c < 0:
                lo = mid + 1
            else:
                hi = mid
        if lo == self.sa.size:
            return False
        start = self.sa[lo]
        suffix = self.text[start : start + p.size]
        return suffix.size == p.size and bool(np.array_equal(suffix, p))


def _compare(a: np.ndarray, b: np.ndarray) -> int:
    """Lexicographic compare of two uint8 arrays (a may be shorter)."""
    m = min(a.size, b.size)
    neq = np.nonzero(a[:m] != b[:m])[0]
    if neq.size:
        i = neq[0]
        return -1 if a[i] < b[i] else 1
    if a.size < b.size:
        return -1
    return 0 if a.size == b.size else 1


def containment_check(
    contents: dict[int, str], pairs: list[tuple[int, int]]
) -> dict[tuple[int, int], bool]:
    """For each (id_a, id_b) pair: is the smaller content a verbatim
    substring of the larger? Suffix arrays are built once per haystack
    and reused across all pairs sharing it."""
    sa_cache: dict[int, SuffixArray] = {}
    out: dict[tuple[int, int], bool] = {}
    for a, b in pairs:
        ca = contents[a].encode("utf-8", "surrogatepass")
        cb = contents[b].encode("utf-8", "surrogatepass")
        if len(ca) >= len(cb):
            hay_id, hay, needle = a, ca, cb
        else:
            hay_id, hay, needle = b, cb, ca
        sa = sa_cache.get(hay_id)
        if sa is None:
            sa = sa_cache[hay_id] = SuffixArray(hay)
        out[(a, b)] = sa.contains(needle)
    return out
