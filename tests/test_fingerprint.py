"""WL graph-fingerprint tests: rename invariance, structural
sensitivity, DuckDB-mirror parity, storage discipline, and a
hypothesis property sweep over random bnode graphs."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rdfa_streaming_parser_js_spark.operators.fingerprint import (
    fingerprint_sql, graph_fingerprint, rename_bnodes)

SCHEMA = ("url string, subj string, subj_kind string, pred string, "
          "obj_value string, obj_kind string, obj_datatype string, "
          "obj_lang string")


def T(url, s, sk, p, o, ok, dt=None, lg=None):
    return (url, s, sk, p, o, ok, dt, lg)


TOY = [
    T("u1", "http://e/it", "iri", "http://s/author", "_:b0", "bnode"),
    T("u1", "_:b0", "bnode", "http://s/name", "Alice", "literal",
      None, "en"),
    T("u1", "_:b0", "bnode", "http://r/type", "http://s/Person", "iri"),
    T("u1", "http://e/it", "iri", "http://s/kw", "_:b1", "bnode"),
    T("u1", "_:b1", "bnode", "http://r/first", "w1", "literal"),
    T("u1", "_:b1", "bnode", "http://r/rest", "_:b2", "bnode"),
    T("u1", "_:b2", "bnode", "http://r/first", "w2", "literal"),
    T("u1", "_:b2", "bnode", "http://r/rest", "http://r/nil", "iri"),
    # u2: bnode-free page plus one bnode with a typed literal
    T("u2", "http://e/it", "iri", "http://s/author", "_:x9", "bnode"),
    T("u2", "_:x9", "bnode", "http://s/age", "5", "literal",
      "http://www.w3.org/2001/XMLSchema#integer", None),
    T("u3", "http://e/it", "iri", "http://s/name", "plain", "literal"),
]


def _fp(df):
    return {r.url: r.fingerprint for r in df.collect()}


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(TOY, SCHEMA)


def test_rename_invariance(spark, toy):
    base = _fp(graph_fingerprint(toy))
    ren = _fp(graph_fingerprint(rename_bnodes(toy)))
    assert base == ren and set(base) == {"u1", "u2", "u3"}


def test_structural_sensitivity(spark, toy):
    """Swapping the two list words moves literals between cells —
    isomorphism broken on u1, u2/u3 untouched; dropping a triple also
    changes the hash."""
    base = _fp(graph_fingerprint(toy))
    mut = toy.withColumn(
        "obj_value",
        F.when(F.col("obj_value") == "w1", "w2")
        .when(F.col("obj_value") == "w2", "w1")
        .otherwise(F.col("obj_value")))
    mu = _fp(graph_fingerprint(mut))
    assert mu["u1"] != base["u1"]
    assert mu["u2"] == base["u2"] and mu["u3"] == base["u3"]
    dropped = _fp(graph_fingerprint(
        toy.filter(F.col("obj_value") != "http://r/nil")))
    assert dropped["u1"] != base["u1"]


def test_typed_vs_tagged_literals_distinct(spark):
    """Same lexical object under different datatype/lang must not
    collide (the L:lex|dt|lang ground-term identity)."""
    rows = [T("a", "_:b", "bnode", "http://p", "5", "literal",
              "http://www.w3.org/2001/XMLSchema#integer", None),
            T("b", "_:b", "bnode", "http://p", "5", "literal",
              None, "en"),
            T("c", "_:b", "bnode", "http://p", "5", "literal",
              None, None)]
    fp = _fp(graph_fingerprint(spark.createDataFrame(rows, SCHEMA)))
    assert len({fp["a"], fp["b"], fp["c"]}) == 3


def test_duckdb_mirror_parity(spark, toy):
    base = _fp(graph_fingerprint(toy))
    con = duckdb.connect()
    con.register("tri", toy.toPandas())
    got = {r[0]: r[1]
           for r in con.sql(fingerprint_sql("SELECT * FROM tri"))
           .fetchall()}
    assert got == base


def test_wl_distinguishes_list_cells(spark):
    """Two urls whose graphs differ only in list ORDER (w1,w2 vs
    w2,w1) get different fingerprints — WL separates the cells of a
    directed spine even though both graphs have the same triple
    multiset shape."""
    def spine(url, first, second):
        return [
            T(url, "http://e/it", "iri", "http://s/kw", "_:c1", "bnode"),
            T(url, "_:c1", "bnode", "http://r/first", first, "literal"),
            T(url, "_:c1", "bnode", "http://r/rest", "_:c2", "bnode"),
            T(url, "_:c2", "bnode", "http://r/first", second, "literal"),
            T(url, "_:c2", "bnode", "http://r/rest", "http://r/nil",
              "iri"),
        ]
    df = spark.createDataFrame(spine("a", "w1", "w2")
                               + spine("b", "w2", "w1"), SCHEMA)
    fp = _fp(graph_fingerprint(df))
    assert fp["a"] != fp["b"]


def test_storage_discipline(spark, toy):
    """The WL loop releases superseded label generations: after
    collecting a fingerprint and release_tracked(), no cached RDDs
    linger beyond what was pinned before the call."""
    from rdfa_streaming_parser_js_spark.operators.storage import (
        release_tracked)
    release_tracked()
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    graph_fingerprint(toy).collect()
    mid = jsc.getPersistentRDDs().size()
    # pinned while the lazy result is alive: terms + final labels only
    assert mid - before <= 2
    release_tracked()
    assert jsc.getPersistentRDDs().size() <= before


# --- hypothesis sweep -------------------------------------------------------

@st.composite
def bnode_graph(draw):
    """A random small graph: ground terms g0..g3, bnodes n0..n4,
    random edges (src can be any node, dst any node or literal)."""
    n_bnodes = draw(st.integers(min_value=1, max_value=5))
    bnodes = [f"_:n{i}" for i in range(n_bnodes)]
    grounds = ["http://g/0", "http://g/1"]
    preds = ["http://p/a", "http://p/b"]
    n_edges = draw(st.integers(min_value=1, max_value=10))
    rows = []
    for _ in range(n_edges):
        s = draw(st.sampled_from(bnodes + grounds))
        p = draw(st.sampled_from(preds))
        kind = draw(st.sampled_from(["bnode", "iri", "literal"]))
        if kind == "bnode":
            o = draw(st.sampled_from(bnodes))
        elif kind == "iri":
            o = draw(st.sampled_from(grounds))
        else:
            o = draw(st.sampled_from(["x", "y"]))
        rows.append(("g", s, "bnode" if s in bnodes else "iri",
                     p, o, kind, None, None))
    perm = draw(st.permutations(list(range(n_bnodes))))
    return rows, {bnodes[i]: f"_:m{perm[i]}" for i in range(n_bnodes)}


@given(bnode_graph())
@settings(max_examples=12, deadline=None)
def test_fingerprint_invariant_under_random_permutation(spark, gp):
    """ANY bijective bnode relabeling (not just the md5 renaming)
    leaves the fingerprint unchanged, and the DuckDB mirror agrees on
    both sides."""
    rows, mapping = gp
    renamed = [(u, mapping.get(s, s), sk, p, mapping.get(o, o), ok,
                dt, lg) for (u, s, sk, p, o, ok, dt, lg) in rows]
    df1 = spark.createDataFrame(rows, SCHEMA)
    df2 = spark.createDataFrame(renamed, SCHEMA)
    fp1, fp2 = _fp(graph_fingerprint(df1)), _fp(graph_fingerprint(df2))
    assert fp1 == fp2
    con = duckdb.connect()
    con.register("t1", df1.toPandas())
    assert {r[0]: r[1] for r in
            con.sql(fingerprint_sql("SELECT * FROM t1")).fetchall()
            } == fp1
