"""Incremental KG maintenance (operators/incremental.py): snapshot
delta classification and recrawl-replace merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfa_streaming_parser_js_spark.operators.incremental import (
    merge_by_url, snapshot_delta)

COLS = ["url", "subj", "pred", "obj_value"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_snapshot_delta_classifies_all_three_states(spark):
    old = _df(spark, [
        ("u1", "s1", "p", "a"),   # unchanged
        ("u2", "s2", "p", "b"),   # removed (value changed)
        ("u3", "s3", "p", "c"),   # removed (url vanished)
    ])
    new = _df(spark, [
        ("u1", "s1", "p", "a"),
        ("u2", "s2", "p", "B"),   # added (new value)
    ])
    got = {(r.url, r.obj_value): r.status
           for r in snapshot_delta(old, new, COLS).collect()}
    assert got == {
        ("u1", "a"): "unchanged",
        ("u2", "b"): "removed",
        ("u2", "B"): "added",
        ("u3", "c"): "removed",
    }


def test_snapshot_delta_set_semantics_on_duplicates(spark):
    old = _df(spark, [("u", "s", "p", "x"), ("u", "s", "p", "x")])
    new = _df(spark, [("u", "s", "p", "x")])
    rows = snapshot_delta(old, new, COLS).collect()
    assert len(rows) == 1 and rows[0].status == "unchanged"


def test_snapshot_delta_null_key_columns_match(spark):
    schema = ("url string, subj string, pred string, obj_value string, "
              "obj_datatype string, obj_lang string")
    cols = COLS + ["obj_datatype", "obj_lang"]
    old = spark.createDataFrame(
        [("u", "s", "p", "x", None, None)], schema)
    new = spark.createDataFrame(
        [("u", "s", "p", "x", None, None)], schema)
    rows = snapshot_delta(old, new, cols).collect()
    assert len(rows) == 1 and rows[0].status == "unchanged"
    assert rows[0].obj_datatype == ""  # canonicalized, not NULL


def test_merge_by_url_replaces_whole_page(spark):
    old = _df(spark, [
        ("u1", "s1", "p", "a"),
        ("u1", "s1", "q", "b"),
        ("u2", "s2", "p", "c"),
    ])
    new = _df(spark, [("u1", "s1", "p", "a2")])
    merged = merge_by_url(old, new)
    got = {(r.url, r.pred, r.obj_value) for r in merged.collect()}
    # BOTH old u1 triples are gone, including the q-pred one
    assert got == {("u1", "p", "a2"), ("u2", "p", "c")}


def test_merge_by_url_idempotent(spark):
    old = _df(spark, [("u1", "s1", "p", "a"), ("u2", "s2", "p", "b")])
    new = _df(spark, [("u1", "s1", "p", "a2")])
    once = merge_by_url(old, new)
    twice = merge_by_url(once, new)
    assert (sorted(map(tuple, once.collect()))
            == sorted(map(tuple, twice.collect())))


def test_merge_plan_is_single_anti_join(spark):
    """Plan shape: one left-anti join on url, no extra shuffles beyond
    the anti-join's own exchange, and the union adds no exchange."""
    old = _df(spark, [("u1", "s1", "p", "a")])
    new = _df(spark, [("u2", "s2", "p", "b")])
    plan = merge_by_url(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert plan.count("Union") == 1
