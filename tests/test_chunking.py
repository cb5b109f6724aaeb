"""Deterministic document chunking (functions/chunking.py)."""

import duckdb
import pytest

from rdfa_streaming_parser_js_spark.functions.chunking import (
    chunk_documents, chunk_documents_sql)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_windows_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))  # w0..w9
    got = sorted((r.chunk_idx, r.chunk_text, r.n_chunk_tokens)
                 for r in chunk_documents(
                     _docs(spark, [text]), chunk_tokens=4,
                     overlap_tokens=2).collect())
    assert got == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w2 w3 w4 w5", 4),
        (2, "w4 w5 w6 w7", 4),
        (3, "w6 w7 w8 w9", 4),
        (4, "w8 w9", 2),  # short tail, never re-anchored
    ]


def test_short_doc_single_chunk_and_validation(spark):
    got = chunk_documents(_docs(spark, ["a b"]), chunk_tokens=8,
                          overlap_tokens=0).collect()
    assert [(r.chunk_idx, r.chunk_text) for r in got] == [(0, "a b")]
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, ["x"]), chunk_tokens=4,
                        overlap_tokens=4)


def test_sql_mirror_matches_spark(spark):
    texts = [" ".join(f"t{i}" for i in range(n)) for n in (1, 5, 9, 33)]
    spark_rows = sorted(
        tuple(r) for r in chunk_documents(
            _docs(spark, texts), chunk_tokens=7,
            overlap_tokens=3).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    oracle = sorted(tuple(r) for r in con.execute(
        chunk_documents_sql(chunk_tokens=7, overlap_tokens=3)).fetchall())
    assert spark_rows == oracle


def test_chunking_is_shuffle_free(spark):
    plan = (chunk_documents(_docs(spark, ["a b c"]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
