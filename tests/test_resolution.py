"""owl:sameAs entity resolution (operators/resolution.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfa_streaming_parser_js_spark.operators.resolution import (
    OWL_SAMEAS, resolve_same_as, same_as_mapping)

EX = "http://example.org/"

COLS = ("url string, subj string, subj_kind string, pred string, "
        "obj_value string, obj_kind string, obj_datatype string, "
        "obj_lang string")


def _row(subj, pred, obj, subj_kind="iri", obj_kind="iri"):
    return ("http://p.example/1", subj, subj_kind, pred, obj, obj_kind,
            None, None)


def _kg(spark):
    # sameAs chain c -> b -> a (transitive closure needed, not a star):
    # canonical must be 'a' for all three
    return spark.createDataFrame([
        _row(f"{EX}c", OWL_SAMEAS, f"{EX}b"),
        _row(f"{EX}b", OWL_SAMEAS, f"{EX}a"),
        _row(f"{EX}c", f"{EX}name", "carol", obj_kind="literal"),
        _row(f"{EX}b", f"{EX}age", "33", obj_kind="literal"),
        _row(f"{EX}d", f"{EX}knows", f"{EX}c"),      # object rewrite
        _row(f"{EX}e", f"{EX}knows", f"{EX}other"),  # untouched
    ], COLS)


def test_mapping_is_transitive_min_and_drops_identity(spark):
    m = {r.node: r.canonical
         for r in same_as_mapping(_kg(spark)).collect()}
    assert m == {f"{EX}b": f"{EX}a", f"{EX}c": f"{EX}a"}


def test_resolve_rewrites_subjects_and_objects(spark):
    got = resolve_same_as(_kg(spark))
    rows = {(r.subj, r.pred, r.obj_value) for r in got.collect()}
    assert rows == {
        (f"{EX}a", f"{EX}name", "carol"),
        (f"{EX}a", f"{EX}age", "33"),
        (f"{EX}d", f"{EX}knows", f"{EX}a"),
        (f"{EX}e", f"{EX}knows", f"{EX}other"),
    }


def test_resolve_drops_sameas_triples(spark):
    got = resolve_same_as(_kg(spark))
    assert got.filter(F.col("pred") == OWL_SAMEAS).count() == 0


def test_literal_objects_never_rewritten(spark):
    # a literal whose lexical form equals an aliased IRI must NOT merge
    kg = _kg(spark).union(_kg(spark).sparkSession.createDataFrame(
        [_row(f"{EX}x", f"{EX}note", f"{EX}c", obj_kind="literal")],
        COLS))
    got = resolve_same_as(kg).filter(F.col("pred") == f"{EX}note")
    assert [r.obj_value for r in got.collect()] == [f"{EX}c"]


def test_kind_rederived_when_bnode_wins(spark):
    # '_:x' < 'h...' lexicographically is false ('_' > 'Z' but '_' (95)
    # > 'h' (104)? no: '_'=95 < 'h'=104) -> '_:x' wins the min
    kg = spark.createDataFrame([
        _row(f"{EX}i", OWL_SAMEAS, "_:x", obj_kind="bnode"),
        _row(f"{EX}i", f"{EX}name", "n", obj_kind="literal"),
    ], COLS)
    got = resolve_same_as(kg).collect()
    assert got[0].subj == "_:x" and got[0].subj_kind == "bnode"


def test_bag_semantics_and_passthrough_columns(spark):
    kg = _kg(spark)
    dup = kg.union(kg.filter(F.col("pred") == f"{EX}age"))
    got = resolve_same_as(dup).filter(F.col("pred") == f"{EX}age")
    assert got.count() == 2  # one row per input row, url preserved
    assert set(got.columns) == {"url", "subj", "subj_kind", "pred",
                                "obj_value", "obj_kind", "obj_datatype",
                                "obj_lang"}


def test_precomputed_mapping_reused_across_tables(spark):
    kg = _kg(spark)
    mapping = same_as_mapping(kg)
    other = spark.createDataFrame(
        [_row(f"{EX}b", f"{EX}title", "t", obj_kind="literal")], COLS)
    got = resolve_same_as(other, mapping=mapping).collect()
    assert got[0].subj == f"{EX}a"


# --------------------------------------------------------------------
# IFP entity matching (ifp_same_as)
# --------------------------------------------------------------------

from rdfa_streaming_parser_js_spark.operators.resolution import (  # noqa: E402
    ifp_same_as)

GCOLS = ("subj string, subj_kind string, pred string, obj_value string,"
         " obj_kind string, obj_datatype string, obj_lang string")


def _t(s, p, o, sk="iri", ok="literal", dt=None, lang=None):
    return (s, sk, p, o, ok, dt, lang)


def test_ifp_links_sharing_nodes_to_min_anchor(spark):
    g = spark.createDataFrame([
        _t("_:b2", f"{EX}email", "x@example.org", sk="bnode"),
        _t("_:b1", f"{EX}email", "x@example.org", sk="bnode"),
        _t(f"{EX}p3", f"{EX}email", "x@example.org"),
        _t(f"{EX}p4", f"{EX}email", "y@example.org"),
        _t(f"{EX}p5", f"{EX}other", "x@example.org"),  # not an IFP
    ], GCOLS)
    got = {(r.subj, r.pred, r.obj_value, r.obj_kind)
           for r in ifp_same_as(g, [f"{EX}email"]).collect()}
    # lexicographic min of {_:b1, _:b2, http://...p3} is _:b1
    # ('_' 0x5F < 'h' 0x68), so the bnode anchors the group
    assert got == {
        ("_:b2", OWL_SAMEAS, "_:b1", "bnode"),
        (f"{EX}p3", OWL_SAMEAS, "_:b1", "bnode"),
    }


def test_ifp_literal_identity_includes_datatype_and_lang(spark):
    g = spark.createDataFrame([
        _t("a", f"{EX}id", "7"),
        _t("b", f"{EX}id", "7",
           dt="http://www.w3.org/2001/XMLSchema#integer"),
        _t("c", f"{EX}id", "7",
           dt="http://www.w3.org/2001/XMLSchema#integer"),
        _t("d", f"{EX}id", "x", lang="en"),
        _t("e", f"{EX}id", "x", lang="de"),
    ], GCOLS)
    got = {(r.subj, r.obj_value)
           for r in ifp_same_as(g, [f"{EX}id"]).collect()}
    assert got == {("c", "b")}  # only the two typed "7"s co-identify


def test_ifp_ignores_non_literal_objects(spark):
    g = spark.createDataFrame([
        _t("a", f"{EX}id", f"{EX}thing", ok="iri"),
        _t("b", f"{EX}id", f"{EX}thing", ok="iri"),
    ], GCOLS)
    assert ifp_same_as(g, [f"{EX}id"]).count() == 0


def test_ifp_max_group_guards_junk_values(spark):
    g = spark.createDataFrame(
        [_t(f"s{i}", f"{EX}id", "") for i in range(5)]
        + [_t("a", f"{EX}id", "real"), _t("b", f"{EX}id", "real")],
        GCOLS)
    got = ifp_same_as(g, [f"{EX}id"], max_group=3)
    assert {(r.subj, r.obj_value) for r in got.collect()} == {("b", "a")}


def test_ifp_composes_with_resolution(spark):
    # two bnodes share an email; a third is sameAs-chained to one of
    # them: the component algorithm merges asserted + derived edges
    g = spark.createDataFrame([
        _t("_:x", f"{EX}email", "x@example.org", sk="bnode"),
        _t("_:y", f"{EX}email", "x@example.org", sk="bnode"),
        _t("_:z", OWL_SAMEAS, "_:y", sk="bnode", ok="bnode"),
        _t("_:z", f"{EX}name", "zed", sk="bnode"),
        _t(f"{EX}doc", f"{EX}author", "_:z", ok="bnode"),
    ], GCOLS)
    merged = g.unionByName(ifp_same_as(g, [f"{EX}email"]))
    out = resolve_same_as(merged)
    rows = {(r.subj, r.pred, r.obj_value) for r in out.collect()}
    assert (f"{EX}doc", f"{EX}author", "_:x") in rows
    assert ("_:x", f"{EX}name", "zed") in rows
    assert not any(p == OWL_SAMEAS for _, p, _o in rows)
