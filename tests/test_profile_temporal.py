"""KG schema profiling (operators/profile.py) and as-of temporal views
(operators/temporal.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from rdfa_streaming_parser_js_spark.operators.profile import (
    RDF_TYPE, class_property_coverage)
from rdfa_streaming_parser_js_spark.operators.temporal import as_of

S = "http://schema.org/"


def test_class_property_coverage(spark):
    rows = [
        ("d1", RDF_TYPE, f"{S}Article"), ("d1", f"{S}name", "a"),
        ("d1", f"{S}name", "a2"),  # multi-valued: counts once
        ("d2", RDF_TYPE, f"{S}Article"), ("d2", f"{S}name", "b"),
        ("d3", RDF_TYPE, f"{S}Article"),  # no properties at all
        ("d2", f"{S}text", "tt"),
        ("p1", RDF_TYPE, f"{S}Person"), ("p1", f"{S}name", "ann"),
    ]
    kg = spark.createDataFrame(
        rows, "subj string, pred string, obj_value string")
    got = {(r.cls, r.pred): (r.n_subjects, r.n_class_subjects,
                             r.coverage_permille)
           for r in class_property_coverage(kg).collect()}
    assert got == {
        (f"{S}Article", f"{S}name"): (2, 3, 666),
        (f"{S}Article", f"{S}text"): (1, 3, 333),
        (f"{S}Person", f"{S}name"): (1, 1, 1000),
    }


def test_as_of_latest_capture_per_url(spark):
    t = lambda d: datetime(2024, 3, d)  # noqa: E731
    rows = [
        ("u1", t(1), "u1#it", "old-name"),
        ("u1", t(5), "u1#it", "mid-name"),
        ("u1", t(9), "u1#it", "new-name"),
        ("u2", t(6), "u2#it", "only-name"),
    ]
    kg = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, subj string, "
              "obj_value string")
    got = {(r.url, r.obj_value)
           for r in as_of(kg, F.lit("2024-03-06").cast("timestamp"))
           .collect()}
    assert got == {("u1", "mid-name"), ("u2", "only-name")}
    # nothing visible before the first capture
    assert as_of(kg, F.lit("2024-02-01").cast("timestamp")).count() == 0
    # as-of after everything == recrawl-merged latest state
    got_all = {(r.url, r.obj_value)
               for r in as_of(kg, F.lit("2025-01-01").cast("timestamp"))
               .collect()}
    assert got_all == {("u1", "new-name"), ("u2", "only-name")}


def test_as_of_single_exchange(spark):
    kg = spark.createDataFrame(
        [("u1", datetime(2024, 3, 1), "s", "o")],
        "url string, warc_ts timestamp, subj string, obj_value string")
    plan = (as_of(kg, F.lit("2024-03-02").cast("timestamp"))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
