"""Graph analytics (degrees / integer PageRank), URL canonicalization,
and repetition-stat tests."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rdfa_streaming_parser_js_spark.functions.text import (
    repetition_cols, top_token_share_stats)
from rdfa_streaming_parser_js_spark.functions.urls import (
    canonical_url, canonical_url_sql)
from rdfa_streaming_parser_js_spark.operators.graph import (
    degrees, iri_edges, pagerank, pagerank_sql)


# --- URL canonicalization -------------------------------------------------

URL_CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.ORG/Path", "http://www.example.org/Path"),
    ("http://example.org:80/a", "http://example.org/a"),
    ("https://example.org:443/a", "https://example.org/a"),
    ("https://example.org:8443/a", "https://example.org:8443/a"),
    ("http://example.org", "http://example.org/"),
    ("http://example.org/a#frag", "http://example.org/a"),
    ("http://example.org/a?utm_source=x&utm_medium=y", "http://example.org/a"),
    ("http://example.org/a?b=2&a=1", "http://example.org/a?a=1&b=2"),
    ("http://example.org/a?fbclid=123&z=9&gclid=4&ref=tw",
     "http://example.org/a?z=9"),
    ("http://example.org/a?refresh=1", "http://example.org/a?refresh=1"),
    ("not a url", "not a url"),
    ("mailto:x@example.org", "mailto:x@example.org"),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame([(r,) for r, _ in URL_CASES], ["url"])
    got = [r.c for r in
           df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _, c in URL_CASES]


def test_canonical_url_sql_parity():
    con = duckdb.connect()
    sql = canonical_url_sql("url")
    for raw, want in URL_CASES:
        got = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS url) t", [raw]).fetchone()[0]
        assert got == want, raw


def test_canonical_url_is_projection(spark):
    """No shuffle: canonicalization must stay a map-side expression."""
    df = spark.range(10).select(
        F.concat(F.lit("http://EX.org/p?b=2&a=1&utm_s=x#f"),
                 F.col("id").cast("string")).alias("url"))
    plan = df.select(canonical_url(F.col("url"))
                     )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- repetition stats -----------------------------------------------------

def test_repetition_cols(spark):
    df = spark.createDataFrame([(0, "a a a b")], ["doc_id", "text"])
    cols = repetition_cols(F.col("text"))
    row = df.select(*[c.alias(n) for n, c in cols.items()]).head()
    assert row.n_tokens == 4
    assert row.dup_token_ratio == 0.5  # distinct {a, b} of 4
    # bigrams: "a a", "a a", "a b" → 2 distinct of 3
    assert row.dup_bigram_ratio == pytest.approx(1 / 3, abs=1e-6)


def test_top_token_share(spark):
    df = spark.createDataFrame([(0, "a a a b"), (1, "x y")],
                               ["doc_id", "text"])
    got = {r.id: r.top_token_share
           for r in top_token_share_stats(df).collect()}
    assert got == {0: 0.75, 1: 0.5}


def test_single_token_doc(spark):
    df = spark.createDataFrame([(0, "solo")], ["doc_id", "text"])
    cols = repetition_cols(F.col("text"))
    row = df.select(*[c.alias(n) for n, c in cols.items()]).head()
    assert row.n_tokens == 1
    assert row.dup_token_ratio == 0.0
    assert row.dup_bigram_ratio == 0.0


# --- graph ----------------------------------------------------------------

def _edges(spark):
    # a tiny web: two pages linking a hub, hub linking back to one page
    return spark.createDataFrame(
        [("p1", "hub"), ("p2", "hub"), ("hub", "p1"), ("p1", "p2")],
        ["src", "dst"])


def test_degrees(spark):
    got = {r.id: (r.out_degree, r.in_degree)
           for r in degrees(_edges(spark)).collect()}
    assert got == {"p1": (2, 1), "p2": (1, 1), "hub": (1, 2)}


def test_pagerank_matches_sql_oracle(spark):
    ranks = {r.id: r.rank for r in pagerank(_edges(spark)).collect()}
    con = duckdb.connect()
    cte = ("SELECT 'p1' AS src, 'hub' AS dst UNION ALL "
           "SELECT 'p2', 'hub' UNION ALL SELECT 'hub', 'p1' "
           "UNION ALL SELECT 'p1', 'p2'")
    want = dict(con.execute(pagerank_sql(cte)).fetchall())
    assert ranks == want
    assert ranks["hub"] > ranks["p2"]  # hub collects two in-links


def test_pagerank_partitioning_invariant(spark):
    """Integer arithmetic ⇒ bit-identical ranks at any parallelism."""
    e = _edges(spark)
    r1 = {r.id: r.rank for r in pagerank(e.repartition(1)).collect()}
    r8 = {r.id: r.rank for r in pagerank(e.repartition(8)).collect()}
    assert r1 == r8


def test_iri_edges_filters_literals(spark):
    t = spark.createDataFrame(
        [("s", "p", "http://o", "iri"),
         ("s", "p", "a literal", "literal"),
         ("s", "p", "http://o", "iri")],
        ["subj", "pred", "obj_value", "obj_kind"])
    got = iri_edges(t).collect()
    assert [(r.src, r.dst) for r in got] == [("s", "http://o")]


# --- property-based --------------------------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    _urlish = st.one_of(
        st.text(max_size=60),
        st.builds(
            lambda sch, host, port, path, q, frag:
                f"{sch}://{host}{port}{path}{q}{frag}",
            st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
            st.text(alphabet="abcXYZ09.-", min_size=1, max_size=12),
            st.sampled_from(["", ":80", ":443", ":8080"]),
            st.sampled_from(["", "/", "/a/B", "/p%20q"]),
            st.sampled_from(["", "?a=1", "?b=2&a=1", "?utm_source=x",
                             "?utm_source=x&z=9&fbclid=1", "?ref=t&k"]),
            st.sampled_from(["", "#f", "#a#b"])))

    @given(_urlish)
    @settings(max_examples=200, deadline=None)
    def test_canonical_url_idempotent(raw):
        """Canonicalization is a projection onto its own image:
        canon(canon(x)) == canon(x) — required for it to be safe to
        apply at any (or every) pipeline stage."""
        import duckdb
        con = duckdb.connect()
        sql = canonical_url_sql("url")
        q = f"SELECT {sql} FROM (SELECT ? AS url) t"
        once = con.execute(q, [raw]).fetchone()[0]
        twice = con.execute(q, [once]).fetchone()[0]
        assert twice == once
except ImportError:  # pragma: no cover
    pass


# --- integer k-means -------------------------------------------------------

def test_kmeans_partitioning_invariant(spark, sf_dir):
    """Integer Lloyd steps ⇒ identical assignments at any parallelism."""
    from rdfa_streaming_parser_js_spark.operators.cluster import (
        kmeans_assignments)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a1 = {r.vec_id: r.cluster
          for r in kmeans_assignments(emb.repartition(1)).collect()}
    a8 = {r.vec_id: r.cluster
          for r in kmeans_assignments(emb.repartition(8)).collect()}
    assert a1 == a8
    assert len(a1) == emb.count()
    # seeds stay in their own clusters' id space; all k used or fewer
    assert set(a1.values()) <= set(range(4))


def test_kmeans_converges_sanely(spark):
    """Two obvious blobs → two clusters matching the blobs."""
    from rdfa_streaming_parser_js_spark.operators.cluster import (
        kmeans_assignments)
    rows = []
    for i in range(10):
        rows.append((i * 2, [1.0 + 0.01 * i] * 4, 0))      # blob A
        rows.append((i * 2 + 1, [-1.0 - 0.01 * i] * 4, 1))  # blob B
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {r.vec_id: r.cluster
           for r in kmeans_assignments(emb, k=2, iterations=3).collect()}
    a_clusters = {got[i] for i in range(0, 20, 2)}
    b_clusters = {got[i] for i in range(1, 20, 2)}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters


def test_kmeans_missing_seed_raises(spark):
    import pytest as _pytest
    from rdfa_streaming_parser_js_spark.operators.cluster import (
        kmeans_assignments)
    emb = spark.createDataFrame(
        [(5, [1.0, 2.0], 0), (6, [3.0, 4.0], 1)],
        ["vec_id", "embedding", "label"])
    with _pytest.raises(ValueError, match="seed vectors"):
        kmeans_assignments(emb, k=2)
