"""Property-fuzz of the ORACLE LAYER itself: on small random input
tables, gated queries must agree with their DuckDB oracles not only on
values (the check_oracles canon) but on COLUMN TYPES — the driver's
byte-hash is type-tagged, so a DuckDB HUGEINT against a Spark LONG is a
red row even when every value is bit-equal (the sessionize_events
failure that survived rounds 1-3).  This test catches that class before
the driver does.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entrymod

# events-/documents-only queries: fast, no extraction, cover the agg
# families where integer/decimal type widening differs across engines
QUERIES = ["sessionize_events", "windowed_event_counts",
           "percentiles_by_event_type", "agg_events_by_type",
           "text_quality",
           # late-r04 documents-only additions: winnowed span dedup
           # (may legitimately return zero rows on tiny corpora —
           # schema identity still checks) and fuzzy entity linking
           "dedup_exact_spans", "entity_link_fuzzy"]

# engine type -> shared canonical tag; anything unmapped fails loudly
_SPARK_CANON = {"bigint": "i64", "int": "i32", "smallint": "i16",
                "double": "f64", "float": "f32", "string": "str",
                "timestamp": "ts", "date": "date", "boolean": "bool"}
_DUCK_CANON = {"BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16",
               "HUGEINT": "i128", "DOUBLE": "f64", "FLOAT": "f32",
               "VARCHAR": "str", "TIMESTAMP": "ts", "DATE": "date",
               "BOOLEAN": "bool"}


def _canon_value(v):
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if v is None:
        return "null"
    return "s:" + str(v)


@st.composite
def tables(draw):
    n_users = draw(st.integers(1, 4))
    events = []
    for eid in range(draw(st.integers(1, 25))):
        events.append((
            eid,
            # seconds offset inside one day; duplicates + >30min gaps
            draw(st.integers(0, 86_400)),
            draw(st.integers(0, n_users - 1)),
            draw(st.sampled_from(["view", "click", "buy"])),
            # dyadic values (k/8): double sums are EXACT, so the value
            # comparison is association-order-independent — arbitrary
            # floats made the float-agg queries flake on last-ulp
            # rounding boundaries between Spark's partial aggregation
            # and DuckDB's sequential sum.  The negative-zero class
            # those floats caught is pinned below as a deterministic
            # regression test.
            draw(st.integers(-8000, 8000)) / 8.0,
            "{}",
        ))
    docs = []
    for did in range(draw(st.integers(1, 8))):
        words = draw(st.lists(
            st.sampled_from(["alpha", "beta", "the", "and", "zork"]),
            min_size=1, max_size=30))
        docs.append((did, " ".join(words),
                     draw(st.sampled_from(["en", "de", "es"])),
                     draw(st.sampled_from(["srcA", "srcB"])),
                     len(" ".join(words))))
    return events, docs


@pytest.fixture(scope="module")
def oracle_con():
    return duckdb.connect()


@given(tables())
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gated_queries_type_and_value_identical(spark, tmp_path_factory,
                                                case):
    events, docs = case
    sf_dir = str(tmp_path_factory.mktemp("fuzz_sf"))
    (spark.createDataFrame(
        [(e[0], e[1], e[2], e[3], e[4], e[5]) for e in events],
        "event_id long, ts_off long, user_id long, event_type string, "
        "value double, props string")
     .selectExpr("event_id",
                 "timestamp'2024-01-01 00:00:00' "
                 "+ make_interval(0,0,0,0,0,0,ts_off) AS ts",
                 "user_id", "event_type", "value", "props")
     .write.mode("overwrite").parquet(f"{sf_dir}/events.parquet"))
    (spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet"))

    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(f"CREATE VIEW {t} AS "
                f"SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'")

    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    oracles = entrymod.oracle_sql()
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        rel = con.sql(oracles[name])

        # 1) TYPE identity per column (sorted by name, like the driver)
        spark_types = {f.name: _SPARK_CANON.get(f.dataType.simpleString(),
                                                f.dataType.simpleString())
                       for f in df.schema.fields}
        duck_types = {c: _DUCK_CANON.get(str(t), str(t))
                      for c, t in zip(rel.columns, rel.types)}
        assert spark_types == duck_types, (
            f"{name}: column type mismatch (driver hash is type-tagged)"
            f"\n spark={spark_types}\n duck ={duck_types}")

        # 2) value identity through the check_oracles canon
        cols = sorted(df.columns)
        got = sorted(tuple(_canon_value(r[c]) for c in cols)
                     for r in df.collect())
        order = [rel.columns.index(c) for c in cols]
        exp = sorted(tuple(_canon_value(row[i]) for i in order)
                     for row in rel.fetchall())
        assert got == exp, f"{name}: value mismatch on fuzzed input"


def test_negative_zero_rounding_regression(spark, tmp_path):
    """Pinned fuzz find: a value sum in (-0.0005, 0] rounds to -0.0 in
    DuckDB (sign-preserving round) but +0.0 in Spark; the driver's
    typed byte-hash distinguishes them.  Both sides of the
    agg_events_by_type oracle pair normalize with `+ 0.0`."""
    sf_dir = str(tmp_path / "sf")
    rows = [(i, 0, 0, "view", 0.0, "{}") for i in range(9)]
    rows.append((9, 0, 0, "view", -2.220446049250313e-16, "{}"))
    (spark.createDataFrame(
        rows, "event_id long, ts_off long, user_id long, "
              "event_type string, value double, props string")
     .selectExpr("event_id",
                 "timestamp'2024-01-01 00:00:00' "
                 "+ make_interval(0,0,0,0,0,0,ts_off) AS ts",
                 "user_id", "event_type", "value", "props")
     .write.mode("overwrite").parquet(f"{sf_dir}/events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS "
            f"SELECT * FROM '{sf_dir}/events.parquet/*.parquet'")
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    df = qs["agg_events_by_type"](spark, sf_dir)
    cols = sorted(df.columns)
    got = sorted(tuple(_canon_value(r[c]) for c in cols)
                 for r in df.collect())
    rel = con.sql(entrymod.oracle_sql()["agg_events_by_type"])
    order = [rel.columns.index(c) for c in cols]
    exp = sorted(tuple(_canon_value(row[i]) for i in order)
                 for row in rel.fetchall())
    assert got == exp
    # and the canon really is +0.0 on both sides
    assert all("f:-0.0" not in r for row in got for r in row)
