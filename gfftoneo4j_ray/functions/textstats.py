"""Text analysis kernels for the documents table: token counting,
quality scoring, language ID, document fingerprinting.

All deterministic, all designed to run vectorized (or near-vectorized)
inside ``map_batches``; the SQL-expressible ones (token/char counts)
share exact definitions with the DuckDB oracle:

  * n_tokens  = count of non-empty whitespace-separated tokens
  * n_chars   = len(text) in characters
  * n_spaces  = count of ' ' characters
  * alpha_c   = floor(alpha_ratio * 10000 + 0.5) where alpha_ratio =
                (# of [a-z] chars) / max(n_chars, 1)
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS_SPLIT = re.compile(r"\s+")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "que", "de"},
}


def text_stats_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Vectorized token/char/space counts + scaled alpha ratio."""
    text = batch[text_col]
    n_chars = pc.utf8_length(text)
    # tokens: count of \S+ matches == count of non-empty
    # whitespace-separated tokens — matches the oracle's
    # list_filter(regexp_split_to_array(...), x -> x <> ''); RE2
    # kernel, no per-row Python
    n_tokens = pc.cast(
        pc.fill_null(pc.count_substring_regex(text, r"\S+"), 0), pa.int64())
    n_spaces = pc.count_substring(text, " ")
    alpha = pc.cast(
        pc.fill_null(pc.count_substring_regex(text, "[a-z]"), 0), pa.int64())
    nc = np.maximum(n_chars.to_numpy(zero_copy_only=False).astype(np.float64), 1.0)
    alpha_c = np.floor(
        alpha.to_numpy(zero_copy_only=False).astype(np.float64) / nc * 10000
        + 0.5).astype(np.int64)
    return pa.table({
        id_col: batch[id_col],
        "n_chars": pc.cast(n_chars, pa.int64()),
        "n_tokens": n_tokens,
        "n_spaces": pc.cast(n_spaces, pa.int64()),
        "alpha_c": pa.array(alpha_c, pa.int64()),
    })


def lang_id(text: str) -> str:
    """Stopword-profile language ID; 'und' when no profile scores ≥ 2 hits.

    Deterministic tie-break: highest hit count, then alphabetical code."""
    toks = _WS_SPLIT.split(text.lower())
    scores = {lang: sum(1 for t in toks if t in sw)
              for lang, sw in sorted(STOPWORDS.items())}
    best = max(sorted(scores), key=lambda k: scores[k])
    return best if scores[best] >= 2 else "und"


def lang_id_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    langs = [lang_id(t or "") for t in batch[text_col].to_pylist()]
    return pa.table({
        id_col: batch[id_col],
        "lang_pred": pa.array(langs, pa.string()),
    })


def quality_score(text: str) -> float:
    """Composite quality heuristic in [0,1]: length band + alpha ratio
    + mean token length band — the C4-style filter family."""
    if not text:
        return 0.0
    n = len(text)
    toks = [t for t in _WS_SPLIT.split(text) if t]
    if not toks:
        return 0.0
    mean_tok = sum(len(t) for t in toks) / len(toks)
    alpha_ratio = sum(1 for ch in text if ch.isalpha()) / n
    len_score = min(n / 500.0, 1.0)
    tok_score = 1.0 if 3.0 <= mean_tok <= 10.0 else 0.5
    return round(0.4 * len_score + 0.4 * alpha_ratio + 0.2 * tok_score, 6)


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    from .hashing import fingerprint64

    fps = [fingerprint64(t or "") for t in batch[text_col].to_pylist()]
    return pa.table({
        id_col: batch[id_col],
        "fingerprint": pa.array(fps, pa.int64()),
    })
