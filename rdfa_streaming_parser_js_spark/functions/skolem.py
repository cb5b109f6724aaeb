"""Blank-node skolemization — publishing-grade bnode → IRI rewriting.

RDF 1.1 Concepts §3.5 defines the interchange form: systems may replace
a blank node ``_:label`` with the well-known IRI
``https://{authority}/.well-known/genid/{label}`` and convert back.
The reference keeps bnodes as engine-local terms
(/root/reference/lib/Util.ts:81-87 ``dataFactory.blankNode``); this
pipeline's extraction already mints *deterministic* per-url labels
(SURVEY.md §1.5), so skolemizing them yields globally stable IRIs a
downstream system can join on, cache, or re-import losslessly.

Both directions are single-projection column expressions — pure
whole-stage codegen, zero shuffle, trivially correct at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GENID_PATH = "/.well-known/genid/"


def _prefix(authority: str) -> str:
    return f"https://{authority}{GENID_PATH}"


def _skolem_value(value: Column, kind: Column, authority: str) -> Column:
    return F.when(kind == "bnode",
                  F.concat(F.lit(_prefix(authority)),
                           F.substring(value, 3, 2 ** 30))
                  ).otherwise(value)


def _unskolem_value(value: Column, kind: Column,
                    authority: str) -> Column:
    p = _prefix(authority)
    is_genid = (kind == "iri") & value.startswith(p)
    return (F.when(is_genid,
                   F.concat(F.lit("_:"), F.substring(value, len(p) + 1,
                                                     2 ** 30)))
            .otherwise(value),
            F.when(is_genid, F.lit("bnode")).otherwise(kind))


def skolemize(triples: DataFrame,
              authority: str = "corpus.example.org") -> DataFrame:
    """Rewrite every bnode subject/object to its well-known genid IRI
    (kinds flip to ``iri``); non-bnode rows pass through untouched."""
    return (triples
            .withColumn("subj", _skolem_value(F.col("subj"),
                                              F.col("subj_kind"),
                                              authority))
            .withColumn("subj_kind",
                        F.when(F.col("subj_kind") == "bnode",
                               F.lit("iri")).otherwise(F.col("subj_kind")))
            .withColumn("obj_value", _skolem_value(F.col("obj_value"),
                                                   F.col("obj_kind"),
                                                   authority))
            .withColumn("obj_kind",
                        F.when(F.col("obj_kind") == "bnode",
                               F.lit("iri")).otherwise(F.col("obj_kind"))))


def deskolemize(triples: DataFrame,
                authority: str = "corpus.example.org") -> DataFrame:
    """Inverse of :func:`skolemize` — genid IRIs under ``authority``
    become bnodes again; foreign genid IRIs are left alone only if the
    authority differs (the spec makes the path authoritative)."""
    s_val, s_kind = _unskolem_value(F.col("subj"), F.col("subj_kind"),
                                    authority)
    o_val, o_kind = _unskolem_value(F.col("obj_value"),
                                    F.col("obj_kind"), authority)
    # one atomic projection: the kind expressions read the *original*
    # value columns, so value and kind must be replaced together
    repl = {"subj": s_val, "subj_kind": s_kind,
            "obj_value": o_val, "obj_kind": o_kind}
    return triples.select(*[
        (repl[c].alias(c) if c in repl else F.col(c))
        for c in triples.columns])
