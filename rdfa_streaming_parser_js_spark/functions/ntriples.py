"""N-Triples serialization as native column expressions.

The reference emits RDFJS quads whose canonical text form is N-Triples
(what its consumers write to disk).  Serializing with pure
``pyspark.sql.functions`` keeps the sink inside whole-stage codegen —
one concat per row, no Python.  Escaping follows N-Triples: backslash,
double quote, LF, CR, TAB in literal lexical forms
(https://www.w3.org/TR/n-triples/#grammar-production-ECHAR).

Plain literals serialize bare (xsd:string is the implied datatype, and
the kernel never attaches it explicitly — /root/reference/lib/Util.ts:203-213
only tags non-string datatypes); language literals get ``@lang``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def escape_literal(col: Column) -> Column:
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    out = F.regexp_replace(out, "\t", r"\\t")
    return out


def _term(value: Column, kind: Column, datatype: Column | None = None,
          lang: Column | None = None) -> Column:
    """Engine term model (operators/bgp.py:61, kernel/terms.py:54):
    ``obj_lang`` and ``obj_datatype`` are mutually exclusive — a
    language-tagged literal implicitly has datatype rdf:langString and
    carries a NULL datatype column.  For out-of-contract rows with both
    set, the language wins (matching the N-Triples grammar, where
    ``@lang`` IS the rdf:langString serialization)."""
    iri = F.concat(F.lit("<"), value, F.lit(">"))
    if datatype is None:  # subject position: iri | bnode
        return F.when(kind == "iri", iri).otherwise(value)
    lit = F.concat(
        F.lit('"'), escape_literal(value), F.lit('"'),
        F.when(lang.isNotNull(), F.concat(F.lit("@"), lang))
        .when(datatype.isNotNull(),
              F.concat(F.lit("^^<"), datatype, F.lit(">")))
        .otherwise(F.lit("")))
    return (F.when(kind == "iri", iri)
            .when(kind == "bnode", value)
            .otherwise(lit))


def ntriples_lines(triples: DataFrame, url_col: str = "url") -> DataFrame:
    """triples DF → (url, line) with one canonical N-Triples line per
    triple; write with ``.write.text`` after dropping ``url`` (or keep
    url for per-page grouping)."""
    line = F.concat_ws(
        " ",
        _term(F.col("subj"), F.col("subj_kind")),
        F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
        _term(F.col("obj_value"), F.col("obj_kind"),
              F.col("obj_datatype"), F.col("obj_lang")),
        F.lit("."))
    return triples.select(F.col(url_col).alias("url"), line.alias("line"))


# --------------------------------------------------------------------------
# reader (the source half of the interchange pair)
# --------------------------------------------------------------------------

# subject | predicate | object(iri/bnode/literal[@lang|^^<dt>]) " ."
NT_LINE_RE = (r'^(?:<([^>]*)>|(_:\S+)) <([^>]*)> '
              r'(?:<([^>]*)>|(_:\S+)|"((?:[^"\\]|\\.)*)"'
              r'(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?) \.$')

def unescape_literal(col: Column) -> Column:
    """Inverse of :func:`escape_literal`, sentinel-free: split on
    escaped-backslash pairs, unescape the remaining (single-backslash)
    ECHARs inside each part, re-join with a real backslash.

    A sentinel-character scheme is WRONG here: ECHAR only escapes
    ``\\ " LF CR TAB``, so any other byte — including whatever sentinel
    one picks — can legitimately appear raw inside a serialized
    literal, and the sentinel round-trip corrupts it (fuzz-found with
    literals containing 0x01)."""
    parts = F.split(col, r"\\\\", -1)
    unesc = F.transform(
        parts,
        lambda x: F.replace(
            F.replace(
                F.replace(
                    F.replace(x, F.lit('\\"'), F.lit('"')),
                    F.lit("\\n"), F.lit("\n")),
                F.lit("\\r"), F.lit("\r")),
            F.lit("\\t"), F.lit("\t")))
    return F.array_join(unesc, "\\")


def parse_ntriples_lines(lines: DataFrame,
                         line_col: str = "line") -> DataFrame:
    """(.., line) → triples columns — the distributed N-Triples SOURCE
    (read serialized graph dumps back into the pipeline).  Pure
    codegen: one regexp per line + replace chains; rows that do not
    match the grammar are dropped (interchange files may carry comments
    or blank lines).  Passthrough columns other than ``line_col`` are
    preserved — except ones named like a parsed output column, which
    would make the result ambiguous (same guard as the N-Quads
    reader)."""
    g = lambda i: F.regexp_extract(F.col(line_col), NT_LINE_RE, i)  # noqa: E731
    subj_bn = g(2)
    obj_iri, obj_bn, obj_lit = g(4), g(5), g(6)
    lang, dtype = g(7), g(8)
    parsed_cols = {"subj", "subj_kind", "pred", "obj_value", "obj_kind",
                   "obj_datatype", "obj_lang"}
    passthrough = [c for c in lines.columns
                   if c != line_col and c not in parsed_cols]
    parsed = lines.filter(
        F.col(line_col).rlike(NT_LINE_RE)).select(
        *passthrough,
        F.when(subj_bn != "", subj_bn).otherwise(g(1)).alias("subj"),
        F.when(subj_bn != "", F.lit("bnode")).otherwise(F.lit("iri"))
        .alias("subj_kind"),
        g(3).alias("pred"),
        F.when(obj_iri != "", obj_iri)
        .when(obj_bn != "", obj_bn)
        .otherwise(unescape_literal(obj_lit)).alias("obj_value"),
        F.when(obj_iri != "", F.lit("iri"))
        .when(obj_bn != "", F.lit("bnode"))
        .otherwise(F.lit("literal")).alias("obj_kind"),
        F.when(dtype != "", dtype).alias("obj_datatype"),
        F.when(lang != "", lang).alias("obj_lang"))
    return parsed


def parse_ntriples_sql(line_expr: str) -> str:
    """DuckDB mirror of :func:`parse_ntriples_lines` column logic —
    returns a SELECT-list fragment over ``line_expr`` (same regex, same
    replace chains; embed in a query that also filters on
    ``regexp_matches(line, ...)``)."""
    pat = NT_LINE_RE
    g = lambda i: f"regexp_extract({line_expr}, '{pat}', {i})"  # noqa: E731
    # sentinel-free, mirrors unescape_literal: split on '\\' pairs
    # (string_split takes a PLAIN separator), per-part ECHAR replaces,
    # re-join with a single backslash
    unesc = (
        "array_to_string(list_transform(string_split("
        f"{g(6)}, '\\\\'), x -> "
        "replace(replace(replace(replace(x,"
        " '\\\"', '\"'), '\\n', chr(10)), '\\r', chr(13)),"
        " '\\t', chr(9))), '\\')")
    return f"""
        CASE WHEN {g(2)} <> '' THEN {g(2)} ELSE {g(1)} END AS subj,
        CASE WHEN {g(2)} <> '' THEN 'bnode' ELSE 'iri' END AS subj_kind,
        {g(3)} AS pred,
        CASE WHEN {g(4)} <> '' THEN {g(4)}
             WHEN {g(5)} <> '' THEN {g(5)}
             ELSE {unesc} END AS obj_value,
        CASE WHEN {g(4)} <> '' THEN 'iri'
             WHEN {g(5)} <> '' THEN 'bnode'
             ELSE 'literal' END AS obj_kind,
        nullif({g(8)}, '') AS obj_datatype,
        nullif({g(7)}, '') AS obj_lang"""
