"""Text-analysis operators over a document column — the training-data
curation set (language ID, quality scoring, token counting, document
fingerprinting). All vectorized pyarrow.compute kernels (RE2 regex —
the same engine DuckDB uses, so the oracle SQL matches exactly);
no per-row Python in any hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[A-Za-z0-9_]+"          # BPE-ish word tokens
ALPHA_RE = r"[A-Za-z]"
DIGIT_RE = r"[0-9]"
PUNCT_RE = r"[^\w\s]"

# tiny per-language stopword lexicons for the n-gram/stopword heuristic
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "por", "con", "que"],
}


def _lexicon_pattern(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def add_token_count(
    batch: pa.Table, *, text_column: str = "text", out: str = "n_tokens"
) -> pa.Table:
    """Token count = number of TOKEN_RE matches (whitespace-and-
    punctuation-delimited words, digits and underscores included)."""
    n = pc.count_substring_regex(batch[text_column], TOKEN_RE)
    return batch.append_column(out, pc.cast(n, pa.int64()))


def add_quality_scores(
    batch: pa.Table, *, text_column: str = "text"
) -> pa.Table:
    """Quality-signal columns: n_chars, n_alpha, n_digit, n_punct,
    n_stopwords(en), alpha_ratio, stopword_ratio."""
    txt = batch[text_column]
    n_chars = pc.cast(pc.utf8_length(txt), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(txt, ALPHA_RE), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(txt, DIGIT_RE), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(txt, PUNCT_RE), pa.int64())
    n_tok = pc.cast(pc.count_substring_regex(txt, TOKEN_RE), pa.int64())
    n_stop = pc.cast(
        pc.count_substring_regex(txt, _lexicon_pattern(LANG_LEXICONS["en"])),
        pa.int64(),
    )
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    tok_denom = pc.max_element_wise(n_tok, pa.scalar(1, pa.int64()))
    batch = batch.append_column("n_chars_q", n_chars)
    batch = batch.append_column("n_alpha", n_alpha)
    batch = batch.append_column("n_digit", n_digit)
    batch = batch.append_column("n_punct", n_punct)
    batch = batch.append_column("n_stopwords", n_stop)
    batch = batch.append_column(
        "alpha_ratio",
        pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(denom, pa.float64())),
    )
    batch = batch.append_column(
        "stopword_ratio",
        pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(tok_denom, pa.float64())),
    )
    return batch


def add_compression_ratio(
    batch: pa.Table,
    *,
    text_column: str = "text",
    out: str = "compression_ratio",
    level: int = 6,
) -> pa.Table:
    """zlib-deflate compression ratio per doc (compressed/raw bytes) —
    the CCNet/RedPajama-family quality signal: highly repetitive or
    templated text compresses far below ~0.4, random bytes sit near 1.
    Empty text → 1.0 (nothing to judge).

    Bytes come straight off the Arrow value buffer (the hashing.py
    buffer+offsets pattern — no per-row str materialization); the zlib
    call itself is C and releases the GIL, and the stage runs inside
    distributed map_batches tasks. Deterministic for a fixed zlib
    version/level — pin ``level`` across runs that must be comparable.
    No SQL-oracle form (DuckDB has no deflate); pinned by pytest
    monotonicity and bounds instead."""
    import zlib

    from deduper_ray.functions.hashing import _utf8_slices

    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets, data = _utf8_slices(col)
    compress = zlib.compress
    ratios = np.empty(batch.num_rows, dtype=np.float64)
    for i, (a, b) in enumerate(zip(offsets, offsets[1:])):
        raw = b - a
        if raw == 0:
            ratios[i] = 1.0
        else:
            ratios[i] = len(compress(data[a:b], level)) / raw
    return batch.append_column(out, pa.array(ratios, type=pa.float64()))


class LangIdScorer:
    """Actor-pool stage: stopword-lexicon language ID.

    Patterns are compiled once per actor (``__init__``); scoring is one
    vectorized count per language per batch. Ties and zero-hit rows
    fall back to 'unknown'.
    """

    def __init__(self, *, text_column: str = "text", out: str = "lang_pred"):
        self.text_column = text_column
        self.out = out
        self.patterns = {
            lang: _lexicon_pattern(words) for lang, words in LANG_LEXICONS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        txt = batch[self.text_column]
        langs = list(self.patterns)
        scores = np.stack(
            [
                pc.count_substring_regex(txt, p).to_numpy(zero_copy_only=False)
                for p in self.patterns.values()
            ],
            axis=1,
        )
        best = scores.argmax(axis=1)
        hit = scores.max(axis=1) > 0
        pred = np.where(hit, np.array(langs, dtype=object)[best], "unknown")
        return batch.append_column(self.out, pa.array(pred, type=pa.string()))


def add_fingerprint(
    batch: pa.Table, *, text_column: str = "text", out: str = "fingerprint"
) -> pa.Table:
    """Document fingerprint: first 16 hex chars of the MD5 — a stable
    64-bit content fingerprint in hex (matches DuckDB
    ``substr(md5(text), 1, 16)``)."""
    import hashlib

    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = [
        hashlib.md5((s or "").encode("utf-8", "surrogatepass")).hexdigest()[:16]
        for s in col.to_pylist()
    ]
    return batch.append_column(out, pa.array(vals, type=pa.string()))


# PII patterns — RE2 syntax (pyarrow.compute and DuckDB both run RE2,
# so `regexp_replace(..., 'g')` in the oracle is bit-identical).
# Replacement order matters (IP before phone: a dotted quad must not be
# half-eaten by the phone pattern) and is part of the operator contract.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    (r"\+?[0-9][0-9()\- ]{6,}[0-9]", "[PHONE]"),
]


def redact_pii(
    batch: pa.Table, *, text_column: str = "text", out: str = "clean_text"
) -> pa.Table:
    """PII redaction: emails → [EMAIL], IPv4 → [IP], phone-shaped digit
    runs → [PHONE]. One vectorized RE2 global-replace per pattern —
    no per-row Python."""
    col = batch[text_column]
    for pattern, repl in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern, repl)
    return batch.append_column(out, col)


def add_simhash_md5(
    batch: pa.Table,
    *,
    shingle_k: int = 8,
    text_column: str = "text",
    out: str = "simhash",
) -> pa.Table:
    """ORACLE-CHECKABLE SimHash: 64-bit majority-vote fingerprint over
    the doc's DISTINCT k-shingles, where each shingle hashes via
    MD5 — specifically DuckDB's ``md5_number_lower(gram)``, i.e. the
    last 8 digest bytes little-endian. Bit i of the output is set iff
    strictly more than half the shingles have bit i set.

    This is the conformance twin of ``MinHashSigner``'s production
    SimHash (stages/minhash.py:179 — rolling-hash shingles, ~10×
    faster): identical vote math, an MD5 shingle hash a SQL oracle can
    reproduce exactly. Output is the uint64 bit pattern VIEWED as
    int64 (bit 63 → sign bit), plus the distinct-shingle count."""
    import hashlib

    import numpy as np

    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    sims = np.empty(batch.num_rows, dtype=np.uint64)
    counts = np.empty(batch.num_rows, dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    md5 = hashlib.md5
    for i, s in enumerate(col.to_pylist()):
        data = (s or "").encode("utf-8", "surrogatepass")
        if len(data) <= shingle_k:
            grams = {data} if data else set()
        else:
            grams = {
                data[j:j + shingle_k]
                for j in range(len(data) - shingle_k + 1)
            }
        counts[i] = len(grams)
        if not grams:
            sims[i] = 0
            continue
        hv = np.fromiter(
            (
                int.from_bytes(md5(g).digest()[8:16], "little")
                for g in grams
            ),
            dtype=np.uint64,
            count=len(grams),
        )
        ones = ((hv[:, None] >> bit_idx[None, :]) & np.uint64(1)).sum(
            axis=0, dtype=np.int64
        )
        bits = (2 * ones > len(grams)).astype(np.uint64)
        sims[i] = (bits << bit_idx).sum(dtype=np.uint64)
    return batch.append_column(
        out, pa.array(sims.view(np.int64), type=pa.int64())
    ).append_column("n_shingles", pa.array(counts, type=pa.int64()))


def add_repetition_stats(
    batch: pa.Table, *, text_column: str = "text"
) -> pa.Table:
    """Intra-document repetition signals (the Gopher-rule family):
    n_words, n_distinct_words, dup_word_ratio (1 − distinct/total) and
    top_word_ratio (most frequent word's share). Vectorized: one
    split per batch, then C-level pandas explode + groupby nunique —
    no per-row Python."""
    import pandas as pd

    toks = pc.split_pattern(batch[text_column], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values.to_numpy(zero_copy_only=False)
    import numpy as np

    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    doc_of = np.repeat(
        np.arange(batch.num_rows, dtype=np.int64), np.diff(offsets)
    )
    keep = flat != ""
    s = pd.DataFrame({"d": doc_of[keep], "w": flat[keep]})
    g = s.groupby("d")["w"]
    n_words = np.zeros(batch.num_rows, dtype=np.int64)
    n_distinct = np.zeros(batch.num_rows, dtype=np.int64)
    top_freq = np.zeros(batch.num_rows, dtype=np.int64)
    if len(s):
        cnt = g.count()
        n_words[cnt.index.to_numpy()] = cnt.to_numpy()
        nun = g.nunique()
        n_distinct[nun.index.to_numpy()] = nun.to_numpy()
        per = s.groupby(["d", "w"]).size().groupby(level=0).max()
        top_freq[per.index.to_numpy()] = per.to_numpy()
    denom = np.maximum(n_words, 1)
    batch = batch.append_column("n_words", pa.array(n_words))
    batch = batch.append_column("n_distinct_words", pa.array(n_distinct))
    batch = batch.append_column(
        "dup_word_ratio",
        pa.array(1.0 - n_distinct / denom, type=pa.float64()),
    )
    batch = batch.append_column(
        "top_word_ratio", pa.array(top_freq / denom, type=pa.float64())
    )
    return batch
