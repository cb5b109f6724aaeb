"""Structured Streaming pipeline: incremental extraction with
checkpointed resume, and watermarked windowed aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rdfa_streaming_parser_js_spark.operators.extract import extract_triples
from rdfa_streaming_parser_js_spark.sources.pages import pages_from_documents
from rdfa_streaming_parser_js_spark.streaming import (
    extract_triples_stream, read_page_stream, run_extraction_stream,
    run_kg_maintenance_stream, windowed_pred_counts)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark):
    return pages_from_documents(spark, SF_DIR).cache()


def _await(q, timeout=300):
    q.awaitTermination(timeout)
    assert not q.isActive


def test_stream_matches_batch_and_resumes_incrementally(
        spark, pages, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "triples")
    ck_dir = str(tmp_path / "ck")

    first = pages.filter(F.col("page_id") % 2 == 0)
    second = pages.filter(F.col("page_id") % 2 == 1)
    first.write.parquet(pages_dir)

    _await(run_extraction_stream(spark, pages_dir, out_dir, ck_dir,
                                 max_files_per_trigger=2))
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == extract_triples(first).count()
    assert "warc_ts" in got1.columns

    # New files land; same checkpoint → only the delta is processed.
    second.write.mode("append").parquet(pages_dir)
    _await(run_extraction_stream(spark, pages_dir, out_dir, ck_dir))
    got2 = spark.read.parquet(out_dir)
    expected_total = extract_triples(pages).count()
    assert got2.count() == expected_total

    # Restart with a committed checkpoint and no new files: no-op.
    _await(run_extraction_stream(spark, pages_dir, out_dir, ck_dir))
    assert spark.read.parquet(out_dir).count() == expected_total


def test_windowed_pred_counts_streaming(spark, pages, tmp_path):
    pages_dir = str(tmp_path / "pages")
    pages.write.parquet(pages_dir)

    stream = extract_triples_stream(read_page_stream(spark, pages_dir))
    counts = windowed_pred_counts(stream, window="1 minute",
                                  watermark="2 minutes")
    q = (counts.writeStream.format("memory")
         .queryName("win_counts")
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    _await(q)
    got = spark.sql(
        "SELECT sum(n_triples) AS n FROM win_counts").head().n

    batch = extract_triples(pages, passthrough=("warc_ts",))
    exp = (batch.groupBy(F.window("warc_ts", "1 minute"), "pred")
           .count().agg(F.sum("count")).head()[0])
    assert got == exp == batch.count()
    # window boundaries are real event-time buckets
    n_windows = spark.sql(
        "SELECT count(DISTINCT win_start) AS n FROM win_counts").head().n
    assert n_windows > 1


def test_kg_maintenance_stream_replaces_recrawled_pages(
        spark, pages, tmp_path):
    """foreachBatch composition of streaming extraction + recrawl-replace
    merge: a recrawled page's new triples fully replace its old ones,
    and the checkpoint makes re-invocation incremental."""
    pages_dir = str(tmp_path / "pages")
    graph_dir = str(tmp_path / "graph")
    ck_dir = str(tmp_path / "ck")

    pages.write.parquet(pages_dir)
    _await(run_kg_maintenance_stream(spark, pages_dir, graph_dir, ck_dir))
    g1 = spark.read.parquet(graph_dir)
    assert g1.count() == extract_triples(pages).count()

    # Recrawl every 5th page a month later with changed content.
    recrawl = (pages.filter(F.col("page_id") % 5 == 0)
               .withColumn("warc_ts",
                           F.col("warc_ts") + F.expr("INTERVAL 30 DAYS"))
               .withColumn("html", F.encode(F.regexp_replace(
                   F.decode("html", "UTF-8"),
                   'content="([a-z]{2})"', 'content="qq"'), "UTF-8")))
    recrawl.write.mode("append").parquet(pages_dir)
    _await(run_kg_maintenance_stream(spark, pages_dir, graph_dir, ck_dir))

    expected_pages = pages.filter(F.col("page_id") % 5 != 0).union(recrawl)
    expected = {tuple(r) for r in
                extract_triples(expected_pages).collect()}
    got = {tuple(r) for r in spark.read.parquet(graph_dir).collect()}
    assert got == expected
    # the recrawled pages' OLD inLanguage values are really gone
    langs = {r.obj_value for r in spark.read.parquet(graph_dir)
             .filter(F.col("pred").endswith("inLanguage")
                     & (F.regexp_extract("url", r"(\d+)$", 1)
                        .cast("long") % 5 == 0)).collect()}
    assert langs == {"qq"}

    # committed checkpoint + no new files: table unchanged
    _await(run_kg_maintenance_stream(spark, pages_dir, graph_dir, ck_dir))
    assert {tuple(r) for r in
            spark.read.parquet(graph_dir).collect()} == expected


def test_kg_maintenance_sink_recovers_from_mid_swap_crash(
        spark, pages, tmp_path):
    """Crash-atomicity of the read-modify-swap sink: a process that died
    between the two commit renames leaves no current table but a
    complete staging/backup dir — the next run must re-establish the
    committed state instead of losing the whole graph (ADVICE r03)."""
    import os
    import shutil

    pages_dir = str(tmp_path / "pages")
    graph_dir = str(tmp_path / "graph")
    ck_dir = str(tmp_path / "ck")
    pages.write.parquet(pages_dir)
    _await(run_kg_maintenance_stream(spark, pages_dir, graph_dir, ck_dir))
    expected = {tuple(r) for r in spark.read.parquet(graph_dir).collect()}

    # crash window A: current renamed to .old, staging promotion lost
    os.rename(graph_dir, graph_dir + ".old")
    _await(run_kg_maintenance_stream(spark, pages_dir, graph_dir, ck_dir))
    assert {tuple(r) for r in
            spark.read.parquet(graph_dir).collect()} == expected

    # crash window B: staging completely written, swap never started
    shutil.copytree(graph_dir, graph_dir + ".staging")
    os.rename(graph_dir, graph_dir + ".bak-simulated-loss")
    shutil.rmtree(graph_dir + ".bak-simulated-loss")
    _await(run_kg_maintenance_stream(spark, pages_dir, graph_dir, ck_dir))
    assert {tuple(r) for r in
            spark.read.parquet(graph_dir).collect()} == expected


def test_stateful_first_seen_dedup_across_batches(spark, pages, tmp_path):
    """applyInPandasWithState: re-crawled urls are suppressed across
    micro-batches within one run (state lives in the state store)."""
    from rdfa_streaming_parser_js_spark.streaming.stateful import (
        stream_dedup_first_seen)

    pages_dir = str(tmp_path / "pages")
    half = pages.filter(F.col("page_id") % 2 == 0)
    # file 1: first crawl; file 2: full re-crawl (every url again, later ts)
    half.write.parquet(pages_dir)
    (pages.withColumn("warc_ts",
                      F.col("warc_ts") + F.expr("INTERVAL 10 DAYS"))
     .write.mode("append").parquet(pages_dir))

    stream = (spark.readStream.schema(pages.schema)
              .option("maxFilesPerTrigger", 1).parquet(pages_dir))
    q = (stream_dedup_first_seen(stream)
         .writeStream.format("memory").queryName("first_seen")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert not q.isActive

    got = spark.sql("SELECT url, warc_ts FROM first_seen").collect()
    n_urls = pages.select("url").distinct().count()
    assert len(got) == n_urls  # each url exactly once
    # urls in the first file keep their ORIGINAL (not re-crawl) timestamp
    first_ts = {r.url: r.warc_ts for r in
                half.select("url", "warc_ts").collect()}
    for r in got:
        if r.url in first_ts:
            assert r.warc_ts == first_ts[r.url]
