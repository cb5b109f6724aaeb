"""Bnode skolemization round-trip (functions/skolem.py)."""

from pyspark.sql import functions as F

from rdfa_streaming_parser_js_spark.functions.skolem import (
    deskolemize, skolemize)

S = "http://schema.org/"

COLS = ("subj string, subj_kind string, pred string, obj_value string, "
        "obj_kind string")


def _kg(spark):
    rows = [
        ("d1", "iri", f"{S}author", "_:abc123", "bnode"),
        ("_:abc123", "bnode", f"{S}name", "ann", "literal"),
        ("d1", "iri", f"{S}isPartOf", "http://src/a", "iri"),
    ]
    return spark.createDataFrame(rows, COLS)


def test_skolemize_rewrites_bnodes_only(spark):
    got = {(r.subj, r.subj_kind, r.obj_value, r.obj_kind)
           for r in skolemize(_kg(spark), "ex.org").collect()}
    genid = "https://ex.org/.well-known/genid/abc123"
    assert got == {
        ("d1", "iri", genid, "iri"),
        (genid, "iri", "ann", "literal"),
        ("d1", "iri", "http://src/a", "iri"),
    }


def test_roundtrip_identity(spark):
    kg = _kg(spark)
    back = deskolemize(skolemize(kg, "ex.org"), "ex.org")
    assert ({tuple(r) for r in back.collect()}
            == {tuple(r) for r in kg.collect()})


def test_foreign_genid_not_deskolemized(spark):
    kg = _kg(spark).withColumn(
        "obj_value",
        F.when(F.col("obj_kind") == "iri",
               F.lit("https://other.org/.well-known/genid/zzz"))
        .otherwise(F.col("obj_value")))
    back = deskolemize(kg, "ex.org")
    row = back.filter(F.col("pred") == f"{S}isPartOf").head()
    assert row.obj_kind == "iri" and row.obj_value.startswith(
        "https://other.org/")


def test_skolemize_is_shuffle_free(spark):
    plan = (skolemize(_kg(spark))._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
