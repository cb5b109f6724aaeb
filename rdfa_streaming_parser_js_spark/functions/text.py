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


# PII patterns (shared verbatim with the DuckDB oracle — RE2/Java
# common subset: no lookarounds, no backrefs).  Deliberately
# high-recall/simple: a corpus scrub favors over-redaction, and the
# value here is the deterministic distributed plumbing; swap in
# stricter production patterns at the call site.
PII_PATTERNS = (
    # e-mail
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # international/US-ish phone: +1-555-867-5309, (555) 867 5309 …
    (r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
    # IPv4
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # 13–19 digit card-like runs (with optional - / space groups)
    (r"\b[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{1,7}\b", "<CC>"),
)


def redact_pii(text: Column) -> Column:
    """Scrub e-mails, phone numbers, IPv4 addresses and card-like
    digit runs from a text column — the standard pre-training PII
    redaction pass — as a chain of ``regexp_replace`` (pure codegen,
    order matters: e-mail first so its digits never half-match the
    phone rule, then card runs and IPv4 before the greedy phone
    rule — a long dotted IP is phone-shaped)."""
    out = text
    for pat, tag in (PII_PATTERNS[0], PII_PATTERNS[3],
                     PII_PATTERNS[2], PII_PATTERNS[1]):
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (long) on the UNREDACTED text — the audit
    metric reported alongside the scrub."""
    names = ("n_emails", "n_phones", "n_ips", "n_cards")
    return {name: F.regexp_count(text, F.lit(pat)).cast("long")
            for name, (pat, _) in zip(names, PII_PATTERNS)}


def redact_pii_sql(expr: str) -> str:
    """DuckDB mirror of :func:`redact_pii` (same patterns, same
    order; 'g' flag = Spark's replace-all default)."""
    out = expr
    for pat, tag in (PII_PATTERNS[0], PII_PATTERNS[3],
                     PII_PATTERNS[2], PII_PATTERNS[1]):
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{tag}', 'g')"
    return out


def pii_counts_sql(expr: str) -> list[str]:
    names = ("n_emails", "n_phones", "n_ips", "n_cards")
    return [
        f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT) "
        f"AS {name}"
        for name, (pat, _) in zip(names, PII_PATTERNS)]


def doc_fingerprint(text: Column) -> Column:
    """Whitespace-normalized lowercase md5 content fingerprint."""
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.md5(F.encode(norm, "UTF-8"))


def repetition_cols(text: Column) -> dict[str, Column]:
    """Gopher-style repetition features, pure per-row codegen (no
    shuffle): duplicate-token and duplicate-bigram fractions.  High
    values flag boilerplate / spam documents for corpus filtering.

    ``top_token_share`` (max token frequency / n) is NOT here — an
    exact per-row argmax is quadratic in document length as an
    expression, so it lives in the aggregation operator
    ``top_token_share_stats`` (explode → two-level groupBy, map-side
    partial aggregation; linear, one shuffle)."""
    toks = whitespace_tokens(text)
    n = F.size(toks)
    bigrams = F.transform(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        lambda w, i: F.concat_ws(" ", w, F.element_at(toks, i + 2)))
    return {
        "n_tokens": n.cast("long"),
        "dup_token_ratio": F.round(
            1 - F.size(F.array_distinct(toks)) / n, 6),
        "dup_bigram_ratio": F.when(n > 1, F.round(
            1 - F.size(F.array_distinct(bigrams)) / (n - 1), 6)
        ).otherwise(F.lit(0.0)),
    }


def top_token_share_stats(docs, id_col: str = "doc_id",
                          text_col: str = "text"):
    """(id, top_token_share): most-frequent-token share per document.

    explode → groupBy(id, tok) → groupBy(id) max/sum; both aggregations
    combine map-side, so the shuffle carries (id, tok) partial counts —
    linear in corpus size, no per-document quadratic work, safe at
    100 TB document lengths."""
    per_tok = (docs.select(F.col(id_col).alias("id"),
                           F.explode(whitespace_tokens(F.col(text_col)))
                           .alias("tok"))
               .groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c")))
    return (per_tok.groupBy("id")
            .agg(F.max("c").alias("top_c"), F.sum("c").alias("n"))
            .select("id", F.round(F.col("top_c") / F.col("n"), 6)
                    .alias("top_token_share")))
