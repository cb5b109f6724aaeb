"""RDFS ρdf materialization (operators/entailment.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfa_streaming_parser_js_spark.operators.entailment import (
    RDF_TYPE, RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASS, RDFS_SUBPROP,
    rdfs_entail)

EX = "http://example.org/"

SCHEMA = ("url string, subj string, subj_kind string, pred string, "
          "obj_value string, obj_kind string, obj_datatype string, "
          "obj_lang string")


def _row(subj, pred, obj, obj_kind="iri"):
    return ("http://p.example/1", subj, "iri", pred, obj, obj_kind,
            None, None)


def _ontology(spark):
    return spark.createDataFrame([
        _row(f"{EX}Article", RDFS_SUBCLASS, f"{EX}CreativeWork"),
        _row(f"{EX}CreativeWork", RDFS_SUBCLASS, f"{EX}Thing"),
        _row(f"{EX}name", RDFS_SUBPROP, f"{EX}label"),
        _row(f"{EX}wrote", RDFS_DOMAIN, f"{EX}Person"),
        _row(f"{EX}wrote", RDFS_RANGE, f"{EX}CreativeWork"),
    ], SCHEMA)


def _spo(df):
    return {(r.subj, r.pred, r.obj_value) for r in df.collect()}


def test_rdfs9_transitive_type_inheritance(spark):
    inst = spark.createDataFrame(
        [_row(f"{EX}d", RDF_TYPE, f"{EX}Article")], SCHEMA)
    got = _spo(rdfs_entail(inst, _ontology(spark)))
    assert got == {(f"{EX}d", RDF_TYPE, f"{EX}Article"),
                   (f"{EX}d", RDF_TYPE, f"{EX}CreativeWork"),
                   (f"{EX}d", RDF_TYPE, f"{EX}Thing")}


def test_rdfs7_property_inheritance_keeps_literal_shape(spark):
    inst = spark.createDataFrame(
        [("u", f"{EX}d", "iri", f"{EX}name", "t", "literal", None, "en")],
        SCHEMA)
    out = rdfs_entail(inst, _ontology(spark))
    lab = out.filter(F.col("pred") == f"{EX}label").collect()
    assert len(lab) == 1
    assert (lab[0].obj_value, lab[0].obj_kind, lab[0].obj_lang) == \
        ("t", "literal", "en")


def test_rdfs2_rdfs3_domain_range_then_subclass(spark):
    # wrote: domain Person, range CreativeWork; the range-derived type
    # must then climb the class hierarchy (stratified completeness)
    inst = spark.createDataFrame(
        [_row(f"{EX}alice", f"{EX}wrote", f"{EX}book")], SCHEMA)
    got = _spo(rdfs_entail(inst, _ontology(spark)))
    assert (f"{EX}alice", RDF_TYPE, f"{EX}Person") in got
    assert (f"{EX}book", RDF_TYPE, f"{EX}CreativeWork") in got
    assert (f"{EX}book", RDF_TYPE, f"{EX}Thing") in got  # via rdfs9


def test_rdfs3_skips_literal_objects(spark):
    ont = spark.createDataFrame(
        [_row(f"{EX}name", RDFS_RANGE, f"{EX}Text")], SCHEMA)
    inst = spark.createDataFrame(
        [_row(f"{EX}d", f"{EX}name", "plain", obj_kind="literal")],
        SCHEMA)
    out = rdfs_entail(inst, ont)
    assert out.filter(F.col("pred") == RDF_TYPE).count() == 0


def test_subprop_then_domain_chain(spark):
    # x P y, P subProp Q, domain(Q)=C  =>  x type C  (rdfs7 feeds rdfs2)
    ont = spark.createDataFrame([
        _row(f"{EX}P", RDFS_SUBPROP, f"{EX}Q"),
        _row(f"{EX}Q", RDFS_DOMAIN, f"{EX}C"),
    ], SCHEMA)
    inst = spark.createDataFrame([_row(f"{EX}x", f"{EX}P", f"{EX}y")],
                                 SCHEMA)
    got = _spo(rdfs_entail(inst, ont))
    assert (f"{EX}x", f"{EX}Q", f"{EX}y") in got
    assert (f"{EX}x", RDF_TYPE, f"{EX}C") in got


def test_derived_rows_inherit_provenance_and_schema(spark):
    inst = spark.createDataFrame(
        [_row(f"{EX}d", RDF_TYPE, f"{EX}Article")], SCHEMA)
    out = rdfs_entail(inst, _ontology(spark))
    assert out.columns == inst.columns
    assert {r.url for r in out.collect()} == {"http://p.example/1"}


def test_ontology_never_iterated_per_instance_row(spark):
    # plan shape: both hierarchy joins are broadcast (the instance
    # side is never shuffled by the materialization)
    inst = spark.createDataFrame(
        [_row(f"{EX}d", RDF_TYPE, f"{EX}Article")], SCHEMA)
    plan = (rdfs_entail(inst, _ontology(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
