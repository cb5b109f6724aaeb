"""Text-analysis column functions for training-data pipelines.

All pure native ``pyspark.sql.functions`` expressions — JVM-side, inside
whole-stage codegen, no Python in the hot path.  Each has an equivalent
ANSI-SQL form used by the DuckDB oracles in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish word/number/punctuation segmentation (shared with the oracle).
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Deterministic n-gram language markers (docs vocabulary is synthetic;
# the heuristic's value is its determinism + plumbing, not NLP accuracy).
LANG_MARKERS = {
    "en": ("the", "a", "fast", "slow", "big"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "et", "est", "une"),
}


def whitespace_tokens(text: Column) -> Column:
    return F.split(text, " ")


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under a BPE-ish regex segmentation (long, to match
    the BIGINT the SQL oracles produce)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def stopword_ratio(text: Column) -> Column:
    toks = whitespace_tokens(text)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return F.round(n_stop / F.size(toks), 6)


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword quality features."""
    toks = whitespace_tokens(text)
    n_tok = F.size(toks)
    return {
        "n_chars": F.length(text).cast("long"),
        "n_tokens": n_tok.cast("long"),
        "avg_token_len": F.round((F.length(text) - (n_tok - 1)) / n_tok, 6),
        "stopword_ratio": stopword_ratio(text),
        "punct_ratio": F.round(
            F.regexp_count(text, F.lit("[^a-z0-9 ]")) / F.length(text), 6),
    }


def lang_id(text: Column) -> Column:
    """Marker-token language heuristic: argmax hit count, ties → 'und'
    unless a single language strictly wins."""
    toks = whitespace_tokens(text)

    def hits(markers: tuple) -> Column:
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    en, de, fr = (hits(LANG_MARKERS[k]) for k in ("en", "de", "fr"))
    best = F.greatest(en, de, fr)
    return (F.when(best == 0, F.lit("und"))
            .when(en == best, F.lit("en"))
            .when(de == best, F.lit("de"))
            .otherwise(F.lit("fr")))


def doc_fingerprint(text: Column) -> Column:
    """Whitespace-normalized lowercase md5 content fingerprint."""
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.md5(F.encode(norm, "UTF-8"))
