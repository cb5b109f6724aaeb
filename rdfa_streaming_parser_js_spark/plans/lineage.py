"""Per-partition lineage + resumable checkpointed extraction.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + triple-count metrics".  The reference has no analogue (a Node
stream dies with its process); this is distributed-systems design on top
of the extraction kernel:

- the corpus is split into ``n_buckets`` url-hash buckets
  (``pmod(xxhash64(url), n_buckets)``) — the unit of checkpointing,
  deterministic at any parallelism;
- each commit extracts a chunk of buckets in ONE distributed job and
  writes ``triples/bucket=K/`` via **dynamic partition overwrite**, so a
  re-run of a bucket whose job died mid-write replaces partial output
  instead of duplicating it (idempotent restart);
- only after a chunk's data is fully written is its lineage recorded in
  the ``_manifest`` table ``(run_id, bucket, n_pages, n_triples,
  wall_sec)`` — write-ahead data, commit-behind metadata, exactly the
  Iceberg snapshot-commit ordering (data files first, metadata pointer
  last);
- ``run()`` anti-joins the manifest, so a restarted job processes only
  buckets without a committed manifest row.

On a real cluster the parquet dirs become Iceberg tables and the
manifest a snapshot log; the control flow is identical.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType, DoubleType)

from ..operators.extract import extract_triples

MANIFEST_SCHEMA = StructType([
    StructField("run_id", StringType()),
    StructField("bucket", LongType()),
    StructField("n_pages", LongType()),
    StructField("n_triples", LongType()),
    StructField("commit_wall_sec", DoubleType()),  # whole chunk's wall
    StructField("committed_at", DoubleType()),     # epoch sec of commit
])


def url_bucket(n_buckets: int, url_col: str = "url") -> F.Column:
    """Deterministic corpus partition id — stable across restarts,
    parallelism levels, and input ordering."""
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("long")


class CheckpointedExtraction:
    """Resumable bucket-at-a-time extraction with a lineage manifest."""

    def __init__(self, out_dir: str, n_buckets: int = 64):
        self.out_dir = out_dir.rstrip("/")
        self.n_buckets = n_buckets
        self.triples_dir = f"{self.out_dir}/triples"
        self.manifest_dir = f"{self.out_dir}/_manifest"

    # -- lineage ----------------------------------------------------------

    def manifest(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.schema(MANIFEST_SCHEMA).parquet(
                self.manifest_dir)
        except Exception:
            return spark.createDataFrame([], MANIFEST_SCHEMA)

    def completed_buckets(self, spark: SparkSession) -> set[int]:
        return {r.bucket for r in
                self.manifest(spark).select("bucket").distinct().collect()}

    def metrics(self, spark: SparkSession) -> DataFrame:
        """Triple-count metrics per bucket — latest commit wins (by
        ``committed_at``), with the commit history length alongside."""
        from pyspark.sql import Window
        w = Window.partitionBy("bucket").orderBy(F.desc("committed_at"))
        latest = (self.manifest(spark)
                  .withColumn("rn", F.row_number().over(w)))
        counts = latest.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_commits"))
        return (latest.filter(F.col("rn") == 1)
                .select("bucket", "n_pages", "n_triples")
                .join(counts, "bucket"))

    # -- data -------------------------------------------------------------

    def triples(self, spark: SparkSession) -> DataFrame:
        from ..operators.extract import TRIPLES_SCHEMA
        try:
            return spark.read.parquet(self.triples_dir)
        except Exception:  # empty corpus: no data files written yet
            return spark.createDataFrame(
                [], TRIPLES_SCHEMA + ", bucket int")

    # -- execution --------------------------------------------------------

    def run(self, pages: DataFrame, buckets_per_commit: int = 16,
            stop_after_commits: int | None = None,
            run_id: str | None = None) -> dict:
        """Extract all buckets not yet in the manifest.

        ``stop_after_commits`` simulates a mid-job failure for restart
        tests.  Returns counters for the work done by THIS invocation.
        """
        spark = pages.sparkSession
        run_id = run_id or f"run-{int(time.time() * 1000):x}"
        done = self.completed_buckets(spark)
        remaining = [b for b in range(self.n_buckets) if b not in done]
        bucketed = pages.withColumn(
            "bucket", url_bucket(self.n_buckets))

        commits = 0
        processed: list[int] = []
        for i in range(0, len(remaining), buckets_per_commit):
            if stop_after_commits is not None and commits >= stop_after_commits:
                break
            chunk = remaining[i:i + buckets_per_commit]
            t0 = time.time()
            # Repartition BEFORE extraction, hashed on bucket: extraction
            # parallelism must not be hostage to the input's file-split
            # count, and bucket-aligned tasks write exactly one file per
            # bucket=K/ dir.  Parallelism == buckets per chunk; size
            # n_buckets ≥ cluster cores (at 10^12 pages it is ≫).
            chunk_pages = (bucketed.filter(F.col("bucket").isin(chunk))
                           .repartition(len(chunk), "bucket"))
            triples = extract_triples(
                chunk_pages, passthrough=("bucket",)).cache()
            # Page counts come from the INPUT chunk, not the extracted
            # triples: a page that parses to zero triples was still
            # processed and must be counted (quarantine/monitoring
            # reads n_pages as "work done", not "pages with output").
            page_counts = {r.bucket: r.n_pages for r in
                           (chunk_pages.groupBy("bucket")
                            .agg(F.count(F.lit(1)).alias("n_pages"))
                            .collect())}
            # Triple stats from the cached chunk itself — a read-back of
            # the output dir would fail on an all-empty first commit (no
            # parquet files yet to infer a schema from).
            stats = {r.bucket: (page_counts.get(r.bucket, 0), r.n_triples)
                     for r in (triples.groupBy("bucket")
                               .agg(F.count(F.lit(1)).alias("n_triples"))
                               .collect())}
            for b, np_ in page_counts.items():
                stats.setdefault(b, (np_, 0))
            # Data first: dynamic overwrite replaces any partial output of
            # a previously-failed attempt at these buckets.  No second
            # shuffle: tasks already hold (bucket, url) co-partitioned
            # triples; partitionBy groups them into bucket=K/ dirs.
            (triples.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("bucket")
             .parquet(self.triples_dir))
            triples.unpersist()
            # Metadata last: the manifest row IS the commit point.
            wall = time.time() - t0
            rows = [(run_id, int(b), int(stats.get(b, (0, 0))[0]),
                     int(stats.get(b, (0, 0))[1]), round(wall, 3),
                     time.time())
                    for b in chunk]
            (spark.createDataFrame(rows, MANIFEST_SCHEMA)
             .coalesce(1).write.mode("append").parquet(self.manifest_dir))
            commits += 1
            processed.extend(chunk)

        return {"run_id": run_id, "commits": commits,
                "buckets_processed": processed,
                "buckets_skipped": sorted(done)}
