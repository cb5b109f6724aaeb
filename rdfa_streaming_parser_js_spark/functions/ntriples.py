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
