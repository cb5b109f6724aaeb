"""Turtle serialization as native column expressions.

The third text interchange pair (next to N-Triples and N-Quads,
functions/ntriples.py / nquads.py): Turtle with prefix compaction —
the format KG consumers actually read.  The reference emits RDFJS
quads (/root/reference/lib/RdfaParser.ts:803-811); Turtle is the
serialization its ecosystem's `rdf-serialize-turtle` pairing writes.
:func:`parse_turtle_lines` reads the one-line-per-triple dialect back
(serialize → parse is the identity on any triples frame).

Kept deterministic and whole-stage-codegen-clean like the other sinks:

- One line per triple (valid Turtle — predicate grouping with ``;``
  is an optional compression, not a conformance requirement), so the
  output is order-insensitive and a plain ``.write.text`` sink.
- An IRI compacts to ``prefix:local`` when it extends a declared
  namespace and the remainder is PN_LOCAL-safe (conservative subset:
  leading alnum/underscore, then alnum/``_.-``, no trailing dot —
  anything else keeps the ``<...>`` form).  The LONGEST matching
  namespace wins; ties cannot occur (namespaces are distinct strings).
- ``rdf:type`` in predicate position prints as ``a``.
- Literal escaping is the shared ECHAR chain (functions/ntriples.py);
  plain literals stay bare (implied xsd:string), language literals get
  ``@lang``, typed literals a compacted ``^^`` datatype.

Scale shape: a projection — no shuffle, no Python; the prefix table
is a compiled CASE chain (bounded: prefix maps are human-sized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdfa_streaming_parser_js_spark.functions.ntriples import (
    escape_literal)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# conservative PN_LOCAL: no leading/trailing dot, no %-escapes needed
_LOCAL_RE = r"^[A-Za-z0-9_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?$"


def turtle_header(prefixes: dict[str, str]) -> str:
    """``@prefix`` block for the given {prefix: namespace} map, sorted
    by prefix — prepend to the written lines."""
    return "".join(f"@prefix {p}: <{ns}> .\n"
                   for p, ns in sorted(prefixes.items()))


def _compact_iri(value: Column, prefixes: dict[str, str]) -> Column:
    """``prefix:local`` when a namespace + safe local part matches,
    else ``<iri>``.  Longest namespace tried first."""
    out = F.concat(F.lit("<"), value, F.lit(">"))
    for p, ns in sorted(prefixes.items(),
                        key=lambda kv: len(kv[1])):  # longest LAST wins
        local = F.substring(value, len(ns) + 1, 2_000_000)
        out = F.when(
            value.startswith(ns) & local.rlike(_LOCAL_RE),
            F.concat(F.lit(p + ":"), local)).otherwise(out)
    return out


def _term(value: Column, kind: Column, prefixes: dict[str, str],
          datatype: Column | None = None,
          lang: Column | None = None) -> Column:
    iri = _compact_iri(value, prefixes)
    if datatype is None:  # subject position: iri | bnode
        return F.when(kind == "iri", iri).otherwise(value)
    lit = F.concat(
        F.lit('"'), escape_literal(value), F.lit('"'),
        F.when(lang.isNotNull(), F.concat(F.lit("@"), lang))
        .when(datatype.isNotNull(),
              F.concat(F.lit("^^"), _compact_iri(datatype, prefixes)))
        .otherwise(F.lit("")))
    return (F.when(kind == "iri", iri)
            .when(kind == "bnode", value)
            .otherwise(lit))


def turtle_lines(triples: DataFrame, prefixes: dict[str, str],
                 url_col: str | None = None) -> DataFrame:
    """triples DF → one Turtle line per triple (``(url, line)`` when
    ``url_col`` is given, else ``(line)``).  Write with
    ``.write.text`` after prepending :func:`turtle_header`."""
    pred = F.when(F.col("pred") == RDF_TYPE, F.lit("a")).otherwise(
        _compact_iri(F.col("pred"), prefixes))
    line = F.concat_ws(
        " ",
        _term(F.col("subj"), F.col("subj_kind"), prefixes),
        pred,
        _term(F.col("obj_value"), F.col("obj_kind"), prefixes,
              F.col("obj_datatype"), F.col("obj_lang")),
        F.lit("."))
    if url_col is None:
        return triples.select(line.alias("line"))
    return triples.select(F.col(url_col).alias("url"), line.alias("line"))


# --------------------------------------------------------------------------
# reader (the source half of the interchange pair)
# --------------------------------------------------------------------------

# Coarse line shape for the one-triple-per-line Turtle this sink emits:
# three space-separated terms, object may contain spaces only inside the
# quoted literal, line ends " .".  Term-level regexes below do the real
# validation; this filter drops comments/blank/garbage lines.
_PNAME_RE = r"[A-Za-z][A-Za-z0-9_.\-]*:[^\s<>\"]*"
TTL_LINE_RE = (r'^(?:<[^>]*>|_:\S+|' + _PNAME_RE + r') '
               r'(?:a|<[^>]*>|' + _PNAME_RE + r') '
               r'(?:<[^>]*>|_:\S+|' + _PNAME_RE + r'|"(?:[^"\\]|\\.)*"'
               r'(?:@[A-Za-z0-9-]+|\^\^(?:<[^>]*>|' + _PNAME_RE + r'))?)'
               r' \.$')

# literal object: "escaped" [@lang | ^^<dt> | ^^pname]
_LIT_RE = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^(.+))?$'


def _expand_iri(term: Column, prefixes: dict[str, str]) -> Column:
    """Inverse of :func:`_compact_iri`: ``<iri>`` → iri, ``p:local`` →
    namespace + local for declared prefixes.  Prefix match is exact, so
    expansion order does not matter."""
    out = F.regexp_replace(term, r"^<(.*)>$", r"$1")
    for p, ns in sorted(prefixes.items()):
        out = F.when(term.startswith(p + ":"),
                     F.concat(F.lit(ns),
                              F.substring(term, len(p) + 2, 2_000_000))
                     ).otherwise(out)
    return out


def parse_turtle_lines(lines: DataFrame, prefixes: dict[str, str],
                       line_col: str = "line") -> DataFrame:
    """(.., line) → triples columns — the distributed Turtle SOURCE for
    the one-line-per-triple dialect :func:`turtle_lines` writes (the
    prefix map must cover the file's ``@prefix`` header).  Pure codegen:
    line filter + term splits + per-term regex/replace chains; rows that
    do not match the grammar (comments, ``@prefix`` headers, blanks) are
    dropped.  Passthrough columns other than ``line_col`` are kept."""
    line = F.col(line_col)
    # leading term = bracketed IRI first (IRIs may contain spaces —
    # ordered alternation, so a naive space-split would shear them),
    # else the next space-free token
    term_head = r"^(<[^>]*>|\S+)"
    subj_t = F.regexp_extract(line, term_head, 1)
    rest = F.substring(line, F.length(subj_t) + 2, F.length(line))
    pred_t = F.regexp_extract(rest, term_head, 1)
    # object = everything after the predicate up to the final " ."
    obj_t = F.substring(rest, F.length(pred_t) + 2,
                        F.length(rest) - F.length(pred_t) - 3)
    lit_v = F.regexp_extract(obj_t, _LIT_RE, 1)
    lit_lang = F.regexp_extract(obj_t, _LIT_RE, 2)
    lit_dt = F.regexp_extract(obj_t, _LIT_RE, 3)
    is_lit = obj_t.startswith('"')
    parsed_cols = {"subj", "subj_kind", "pred", "obj_value", "obj_kind",
                   "obj_datatype", "obj_lang"}
    passthrough = [c for c in lines.columns
                   if c != line_col and c not in parsed_cols]
    from rdfa_streaming_parser_js_spark.functions.ntriples import (
        unescape_literal)
    return lines.filter(line.rlike(TTL_LINE_RE)).select(
        *passthrough,
        F.when(subj_t.startswith("_:"), subj_t)
        .otherwise(_expand_iri(subj_t, prefixes)).alias("subj"),
        F.when(subj_t.startswith("_:"), F.lit("bnode"))
        .otherwise(F.lit("iri")).alias("subj_kind"),
        F.when(pred_t == "a", F.lit(RDF_TYPE))
        .otherwise(_expand_iri(pred_t, prefixes)).alias("pred"),
        F.when(is_lit, unescape_literal(lit_v))
        .when(obj_t.startswith("_:"), obj_t)
        .otherwise(_expand_iri(obj_t, prefixes)).alias("obj_value"),
        F.when(is_lit, F.lit("literal"))
        .when(obj_t.startswith("_:"), F.lit("bnode"))
        .otherwise(F.lit("iri")).alias("obj_kind"),
        F.when(is_lit & (lit_dt != ""),
               _expand_iri(lit_dt, prefixes)).alias("obj_datatype"),
        F.when(is_lit & (lit_lang != ""), lit_lang).alias("obj_lang"))


_PREFIX_DECL_RE = r"^@prefix\s+([A-Za-z][A-Za-z0-9_.\-]*):\s+<([^>]*)>\s+\.$"


def read_turtle(spark, path: str) -> DataFrame:
    """Read a Turtle dump written by :func:`turtle_header` +
    :func:`turtle_lines` back into a triples frame.  The ``@prefix``
    declarations are recovered from the file itself (one bounded
    collect — prefix maps are human-sized), then every data line is
    parsed distributed; header/comment/blank lines drop out in
    :func:`parse_turtle_lines`'s grammar filter."""
    import re

    lines = spark.read.text(path).withColumnRenamed("value", "line")
    decls = (lines.filter(F.col("line").rlike(_PREFIX_DECL_RE))
             .distinct().collect())
    prefixes = {}
    for row in decls:
        m = re.match(_PREFIX_DECL_RE, row.line)
        if m:
            prefixes[m.group(1)] = m.group(2)
    return parse_turtle_lines(lines, prefixes)


def write_turtle(triples: DataFrame, prefixes: dict[str, str],
                 path: str) -> None:
    """Write a triples frame as a Turtle dump: data lines distributed
    via ``.write.text``, the ``@prefix`` header as one extra shard
    (every line is self-delimiting, so shard order is irrelevant)."""
    spark = triples.sparkSession
    turtle_lines(triples, prefixes).write.mode("overwrite").text(path)
    hdr = [(ln,) for ln in turtle_header(prefixes).splitlines()]
    (spark.createDataFrame(hdr, "line string").coalesce(1)
     .write.mode("append").text(path))


def turtle_lines_sql(triples_cte: str, prefixes: dict[str, str]) -> str:
    """DuckDB mirror of :func:`turtle_lines` (no url column) over a
    triples-shaped CTE — same compaction order, same escaping."""
    def esc(col: str) -> str:
        bs = "chr(92)"
        return (f"replace(replace(replace(replace(replace({col}, "
                f"{bs}, {bs} || {bs}), "
                f"'\"', {bs} || '\"'), "
                f"chr(10), {bs} || 'n'), "
                f"chr(13), {bs} || 'r'), "
                f"chr(9), {bs} || 't')")

    def q(s: str) -> str:  # SQL string literal (quote-escaped)
        return "'" + s.replace("'", "''") + "'"

    def compact(col: str) -> str:
        out = f"'<' || {col} || '>'"
        for p, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
            local = f"substr({col}, {len(ns) + 1})"
            out = (f"CASE WHEN starts_with({col}, {q(ns)}) "
                   f"AND regexp_matches({local}, '{_LOCAL_RE}') "
                   f"THEN {q(p + ':')} || {local} ELSE {out} END")
        return out

    subj = (f"CASE WHEN subj_kind = 'iri' THEN {compact('subj')} "
            f"ELSE subj END")
    pred = (f"CASE WHEN pred = '{RDF_TYPE}' THEN 'a' "
            f"ELSE {compact('pred')} END")
    obj = (f"CASE WHEN obj_kind = 'iri' THEN {compact('obj_value')} "
           f"WHEN obj_kind = 'bnode' THEN obj_value "
           f"ELSE '\"' || {esc('obj_value')} || '\"' || "
           f"CASE WHEN obj_lang IS NOT NULL THEN '@' || obj_lang "
           f"WHEN obj_datatype IS NOT NULL "
           f"THEN '^^' || {compact('obj_datatype')} "
           f"ELSE '' END END")
    return (f"SELECT {subj} || ' ' || {pred} || ' ' || {obj} || ' .' "
            f"AS line FROM ({triples_cte})")
