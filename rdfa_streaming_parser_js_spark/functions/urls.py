"""URL canonicalization for web-crawl dedup pipelines.

Common-Crawl-style corpora carry the same page under many URL spellings
(case-variant hosts, tracking parameters, fragments, default ports).
Canonicalizing URLs BEFORE content dedup collapses those variants with
a pure projection — no shuffle, no Python — which is the cheapest dedup
win available at 100 TB: a codegen expression per row versus a
shingle/minhash pipeline per near-dup family.

All pure native ``pyspark.sql.functions`` expressions (JVM-side, inside
whole-stage codegen).  Each rule has an equivalent ANSI-SQL form used by
the DuckDB oracle in ``__spark_entry__.py`` (``url_canonical_dedup``).

Rules (conservative, order matters):
  1. scheme and host lowercased (RFC 3986 §6.2.2.1 — case-insensitive
     components);
  2. fragment stripped (never sent to the server; mirrors the
     reference's base-IRI fragment strip, /root/reference/lib/Util.ts:146-153);
  3. default ports dropped (``:80`` for http, ``:443`` for https);
  4. tracking query parameters removed (``utm_*``, ``fbclid``,
     ``gclid``, ``ref``);
  5. remaining query parameters sorted bytewise (param order is almost
     never semantic; sorting makes equivalent URLs bit-equal);
  6. empty path normalized to ``/``, empty query string dropped.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query parameters that never change page content.
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "ref")

# scheme://host[:port][/path][?query][#fragment]
_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]*)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$"


def _part(url: Column, group: int) -> Column:
    return F.regexp_extract(url, _URL_RE, group)


def _is_tracking(param: Column) -> Column:
    out = F.lit(False)
    for t in TRACKING_PARAMS:
        if t.endswith("_"):
            out = out | param.startswith(t)
        else:
            out = out | (param == t) | param.startswith(t + "=")
    return out


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` under the module's six rules; URLs that
    do not match ``scheme://authority...`` are passed through unchanged
    (same containment behavior as the extractor's IRI-validity filter:
    never drop, never guess)."""
    scheme = F.lower(_part(url, 1))
    host = F.lower(_part(url, 2))
    port = _part(url, 3)
    path = _part(url, 4)
    query = _part(url, 5)

    port = F.when(
        ((scheme == "http") & (port == ":80"))
        | ((scheme == "https") & (port == ":443")), F.lit("")
    ).otherwise(port)
    path = F.when(path == "", F.lit("/")).otherwise(path)

    params = F.array_sort(F.filter(
        F.split(F.substring(query, 2, 1 << 30), "&"),
        lambda p: (p != "") & ~_is_tracking(p)))
    query = F.when(F.size(params) > 0,
                   F.concat(F.lit("?"), F.array_join(params, "&"))
                   ).otherwise(F.lit(""))

    canon = F.concat(scheme, F.lit("://"), host, port, path, query)
    return F.when(_part(url, 1) == "", url).otherwise(canon)


def canonical_url_sql(expr: str) -> str:
    """DuckDB mirror of :func:`canonical_url` over SQL ``expr``."""
    # starts_with, not LIKE: SQL '_' is a single-char wildcard, so
    # LIKE 'utm_%' would also match 'utma=...' — Spark's startswith
    # is literal, and the oracle must classify identically.
    track = " OR ".join(
        f"starts_with(p, '{t}')" if t.endswith("_")
        else f"(p = '{t}' OR p LIKE '{t}=%')"
        for t in TRACKING_PARAMS)
    # DuckDB regexp_extract(expr, re, group)
    part = lambda g: f"regexp_extract({expr}, '{_URL_RE}', {g})"  # noqa: E731
    scheme, host = f"lower({part(1)})", f"lower({part(2)})"
    port = (f"CASE WHEN ({scheme} = 'http' AND {part(3)} = ':80')"
            f" OR ({scheme} = 'https' AND {part(3)} = ':443')"
            f" THEN '' ELSE {part(3)} END")
    path = f"CASE WHEN {part(4)} = '' THEN '/' ELSE {part(4)} END"
    params = (f"list_sort(list_filter(string_split(substr({part(5)}, 2),"
              f" '&'), p -> p <> '' AND NOT ({track})))")
    query = (f"CASE WHEN len({params}) > 0"
             f" THEN '?' || array_to_string({params}, '&') ELSE '' END")
    return (f"CASE WHEN {part(1)} = '' THEN {expr} ELSE "
            f"{scheme} || '://' || {host} || {port} || {path} || {query} "
            f"END")
