"""Benchmark decontamination — drop training documents that overlap a
benchmark/eval set (the standard pre-training hygiene step: a doc
containing a benchmark n-gram must not be trained on).

Two modes, chosen by benchmark-set size:

- ``substring`` (exact, oracle-checkable): the benchmark grams ride the
  object store once (``ray.put``); each batch runs one vectorized
  LITERAL ``match_substring`` per gram. Cost is O(#grams) vectorized
  passes per batch — right for eval suites (10²-10⁴ grams).
- ``ngram_hash`` (scale path): documents are shingled into token
  n-grams via a vectorized rolling hash over per-word fingerprints,
  and membership is tested against the broadcast benchmark-hash array
  with one ``np.isin`` — cost independent of benchmark size. Right
  for decontaminating against entire benchmark CORPORA. Token-exact
  (not substring) semantics; hashes are blake2b-based and stable
  across processes (NOT Python ``hash()``, which is seed-randomized).

Both modes broadcast the small side once and never shuffle the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from deduper_ray.stages.relational import _fetch_broadcast

# odd multiplier for the positional rolling combine (uint64 wraparound)
_P = np.uint64(0x9E3779B97F4A7C15)


def _word_hashes(words: np.ndarray) -> np.ndarray:
    """Stable 64-bit fingerprint per word; the Python loop is bounded
    by the batch's DISTINCT vocabulary, then mapped back vectorized."""
    uniq, inverse = np.unique(words, return_inverse=True)
    hu = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(),
                "little",
            )
            for w in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return hu[inverse]


def _roll(h: np.ndarray, n: int) -> np.ndarray:
    """Positional rolling combine: out[j] = Σ_k h[j+k] · P^(n-1-k)."""
    m = len(h) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    out = np.zeros(m, dtype=np.uint64)
    for k in range(n):
        out = out * _P + h[k:k + m]
    return out


def token_ngram_hashes(text: str, n: int) -> np.ndarray:
    """Benchmark-side gram hashing — same word-fingerprint + rolling
    combine as the distributed pass, so membership tests line up."""
    words = np.array([w for w in text.split(" ") if w], dtype=object)
    if len(words) == 0:
        return np.empty(0, dtype=np.uint64)
    h = _word_hashes(words)
    if len(words) < n:
        return _roll(h, len(words))
    return _roll(h, n)


def decontaminate(
    ds: rd.Dataset,
    benchmark_grams: list[str],
    *,
    text_column: str = "text",
    mode: str = "substring",
    ngram_n: int = 5,
    keep_flag: str | None = None,
) -> rd.Dataset:
    """Filter out documents overlapping any benchmark gram.

    ``keep_flag=None`` drops contaminated rows; a column name instead
    ANNOTATES rows with a bool keep marker (audit-sink friendly).

    Empty benchmark grams are IGNORED (deliberate divergence from SQL
    ``contains(text, '') = true``, which would mark every row
    contaminated); null text never matches any gram.
    """
    grams = [g for g in benchmark_grams if g]
    if mode == "substring":
        grams_ref = ray.put(grams)

        def _clean(t: pa.Table) -> pa.Table:
            gs = _fetch_broadcast(grams_ref)
            contaminated = np.zeros(t.num_rows, dtype=bool)
            col = t[text_column]
            for g in gs:
                # null text → not contaminated (fill_null keeps the mask
                # a clean bool array; without it nulls propagate as None
                # objects and the |= raises)
                contaminated |= pc.fill_null(
                    pc.match_substring(col, g), False
                ).to_numpy(zero_copy_only=False)
            if keep_flag is not None:
                return t.append_column(keep_flag, pa.array(~contaminated))
            return t.filter(pa.array(~contaminated))

        return ds.map_batches(_clean, batch_format="pyarrow")

    if mode == "ngram_hash":
        bench = np.unique(
            np.concatenate(
                [token_ngram_hashes(g, ngram_n) for g in grams]
                or [np.empty(0, dtype=np.uint64)]
            )
        )
        bench_ref = ray.put(bench)

        def _clean_hash(t: pa.Table) -> pa.Table:
            bench_arr = _fetch_broadcast(bench_ref)
            toks = t[text_column]
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            lists = pc.split_pattern(toks, " ")
            flat = lists.values.to_numpy(zero_copy_only=False)
            offsets = lists.offsets.to_numpy(zero_copy_only=False)
            keep_mask = flat != ""  # collapse double spaces like split()
            # doc index per word, then drop empties
            doc_of = np.repeat(
                np.arange(t.num_rows, dtype=np.int64), np.diff(offsets)
            )[keep_mask]
            words = flat[keep_mask]
            contaminated = np.zeros(t.num_rows, dtype=bool)
            if len(words):
                h = _word_hashes(words)
                grams_h = _roll(h, ngram_n)
                if len(grams_h):
                    # a gram is real only if it doesn't span two docs
                    valid = doc_of[: len(grams_h)] == doc_of[
                        ngram_n - 1: ngram_n - 1 + len(grams_h)
                    ]
                    hit = valid & np.isin(grams_h, bench_arr)
                    contaminated[np.unique(doc_of[: len(grams_h)][hit])] = (
                        True
                    )
                # short docs (< n words) match short benchmark grams
                counts = np.bincount(doc_of, minlength=t.num_rows)
                short = np.flatnonzero((counts > 0) & (counts < ngram_n))
                for i in short:
                    sel = h[doc_of == i]
                    if np.isin(_roll(sel, len(sel)), bench_arr).any():
                        contaminated[i] = True
            if keep_flag is not None:
                return t.append_column(keep_flag, pa.array(~contaminated))
            return t.filter(pa.array(~contaminated))

        return ds.map_batches(_clean_hash, batch_format="pyarrow")

    raise ValueError(f"unknown decontaminate mode {mode!r}")
