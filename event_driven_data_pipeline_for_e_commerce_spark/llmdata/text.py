"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting. All pure Catalyst expressions (split/filter/size/md5),
vectorized JVM-side — a 100 TB documents scan stays in whole-stage
codegen with zero Python round-trips.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# per-language stopword probes for the n-gram/stopword language
# heuristic; CASE evaluation order = alphabetical for tie determinism
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "les", "et", "est", "une"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is")


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization of normalized text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish subword proxy: alnum runs + isolated punctuation
    (`regexp_count`, JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"))


def _membership_count(tokens: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring features (length / punctuation / stopword ratios)
    and a composite score. Deterministic, engine-neutral arithmetic so a
    SQL oracle reproduces it bit-for-bit after rounding."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(c)
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    stop_cnt = _membership_count(toks, STOPWORDS_EN)
    punct_cnt = n_chars - F.length(F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", ""))
    stop_ratio = F.round(stop_cnt / n_tokens, 4)
    punct_ratio = F.round(punct_cnt / n_chars, 4)
    score = F.round(
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (stop_cnt / n_tokens)
        + 0.3 * (1 - punct_cnt / n_chars),
        4,
    )
    return {
        "n_tokens": n_tokens,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "quality_score": score,
    }


def language_guess(text: Column | str) -> Column:
    """Stopword-hit language heuristic: argmax over per-language hit
    counts, alphabetical tie-break (deterministic CASE chain)."""
    toks = tokens_col(text)
    hits = {lang: _membership_count(toks, words) for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*hits.values())
    out = None
    for lang in sorted(hits):  # alphabetical tie-break
        cond = hits[lang] == best
        out = F.when(cond, F.lit(lang)) if out is None else out.when(cond, F.lit(lang))
    return out


def document_fingerprints(text: Column | str) -> dict[str, Column]:
    """Document fingerprints: full normalized-content hash + a prefix
    fingerprint over the first 5 tokens (cheap near-head dedup probe)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(c)
    return {
        "fp_full": F.md5(F.lower(F.trim(c))),
        "fp_prefix": F.md5(F.concat_ws(" ", F.slice(toks, 1, 5))),
    }


# PII patterns kept deliberately simple (char classes + bounded
# quantifiers only) so the Java-regex (Spark) and RE2-ish (oracle)
# engines agree byte-for-byte.
PII_PATTERNS = {
    "email": r"[a-z0-9._]+@[a-z0-9.]+",
    "phone": r"555-[0-9]{4}",
}


def redact_pii(text: Column | str) -> dict[str, Column]:
    """PII redaction for training-data pipelines: replace email/phone
    spans with typed placeholder tokens and count the redactions.

    Pure codegen string ops (regexp_replace / regexp_extract_all) — no
    UDF, map-side only, safe at any scale."""
    c = F.col(text) if isinstance(text, str) else text
    red = F.regexp_replace(c, PII_PATTERNS["email"], "<EMAIL>")
    red = F.regexp_replace(red, PII_PATTERNS["phone"], "<PHONE>")
    return {
        "redacted": red,
        "n_emails": F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS["email"]), 0)),
        "n_phones": F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS["phone"]), 0)),
    }
