"""N-Quads interchange — the named-graph (4-term) sibling of the
N-Triples pair in functions/ntriples.py.

The reference emits *quads*: every triple is pushed into a configurable
named graph (the ``defaultGraph`` option,
/root/reference/lib/RdfaParser.ts:37,947-951, tested in
test/RdfaParser-test.ts "with a custom default graph").  In the
distributed pipeline the natural graph term is the page ``url`` — a
quad dump keeps per-page provenance in the interchange file itself, so
a recrawl-replace merge (operators/incremental.py) works directly on a
re-imported dump.

Serializer and reader reuse the ECHAR machinery from ntriples.py; both
stay inside whole-stage codegen (one concat / one regexp per row), no
Python in the hot path.  Per the N-Quads grammar the graph label is
optional (absent = default graph) and may be an IRI or a blank node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfa_streaming_parser_js_spark.functions.ntriples import (
    NT_LINE_RE, _term, parse_ntriples_sql)

# the N-Triples line regex with its terminal ' .' swapped for an
# optional graph term.  The graph term (IRI or bnode, brackets kept) is
# ONE group — group 9 — because DuckDB's regexp_extract caps group
# indices at 9; the kind is recovered from the leading character.
NQ_LINE_RE = (NT_LINE_RE[:-len(r" \.$")]
              + r"(?: (<[^>]*>|_:\S+))? \.$")


def nquads_lines(triples: DataFrame,
                 graph_col: str = "url") -> DataFrame:
    """triples DF → (graph, line): one canonical N-Quads line per
    triple with ``graph_col`` (an IRI column) as the graph label."""
    line = F.concat_ws(
        " ",
        _term(F.col("subj"), F.col("subj_kind")),
        F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
        _term(F.col("obj_value"), F.col("obj_kind"),
              F.col("obj_datatype"), F.col("obj_lang")),
        F.concat(F.lit("<"), F.col(graph_col), F.lit(">")),
        F.lit("."))
    return triples.select(F.col(graph_col).alias("graph"),
                          line.alias("line"))


def parse_nquads_lines(lines: DataFrame,
                       line_col: str = "line") -> DataFrame:
    """(.., line) → quad columns: the N-Triples reader plus ``graph`` /
    ``graph_kind`` (NULL / 'default' for 3-term lines, which the quad
    grammar admits).  Non-matching rows are dropped, like the
    N-Triples reader."""
    g = lambda i: F.regexp_extract(F.col(line_col), NQ_LINE_RE, i)  # noqa: E731
    subj_bn = g(2)
    obj_iri, obj_bn, obj_lit = g(4), g(5), g(6)
    lang, dtype = g(7), g(8)
    graph_term = g(9)
    from rdfa_streaming_parser_js_spark.functions.ntriples import (
        unescape_literal)
    parsed_cols = {"subj", "subj_kind", "pred", "obj_value", "obj_kind",
                   "obj_datatype", "obj_lang", "graph", "graph_kind"}
    # a passthrough column named like a parsed output (e.g. the
    # serializer's own ``graph``) would make the result ambiguous
    passthrough = [c for c in lines.columns
                   if c != line_col and c not in parsed_cols]
    return lines.filter(F.col(line_col).rlike(NQ_LINE_RE)).select(
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
        F.when(lang != "", lang).alias("obj_lang"),
        F.when(graph_term.startswith("<"),
               F.regexp_replace(graph_term, r"^<|>$", ""))
        .when(graph_term != "", graph_term).alias("graph"),
        F.when(graph_term.startswith("<"), F.lit("iri"))
        .when(graph_term != "", F.lit("bnode"))
        .otherwise(F.lit("default")).alias("graph_kind"))


def parse_nquads_sql(line_expr: str) -> str:
    """DuckDB mirror of :func:`parse_nquads_lines` — the N-Triples
    SELECT fragment (regex swapped for the quad grammar) plus the graph
    columns."""
    frag = parse_ntriples_sql(line_expr).replace(NT_LINE_RE, NQ_LINE_RE)
    pat = NQ_LINE_RE
    gt = f"regexp_extract({line_expr}, '{pat}', 9)"
    return frag + f""",
        CASE WHEN {gt} LIKE '<%' THEN trim({gt}, '<>')
             WHEN {gt} <> '' THEN {gt} END AS graph,
        CASE WHEN {gt} LIKE '<%' THEN 'iri'
             WHEN {gt} <> '' THEN 'bnode'
             ELSE 'default' END AS graph_kind"""
