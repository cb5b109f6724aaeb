"""Incremental page-stream → triple-stream pipeline.

Design (idiomatic Structured Streaming, scales to a real cluster
unchanged):

- **Source**: file-stream over the pages directory.  Each micro-batch is
  a set of newly-arrived parquet files; ``maxFilesPerTrigger`` bounds
  batch size so executor memory is independent of backlog depth.
- **Transform**: the SAME ``extract_triples`` ``mapInArrow`` kernel as
  the batch path — map-only, so the streaming plan is stateless and
  needs no state store; ``warc_ts`` rides through as a passthrough
  column to serve as event time downstream.
- **Sink**: append-mode parquet (Iceberg ``toTable`` on a cluster) with
  a checkpoint directory.  Restarting after a crash resumes from the
  last committed micro-batch — no reprocessing, no loss (north-rule
  resumability, streaming flavor).
- **Late data**: ``windowed_pred_counts`` adds a watermark on
  ``warc_ts`` and a tumbling window, the standard pattern for
  crawl-time triple-rate monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (BinaryType, LongType, StringType,
                               StructField, StructType, TimestampType)

from ..operators.extract import extract_triples

PAGES_SCHEMA = StructType([
    StructField("page_id", LongType()),
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def read_page_stream(spark: SparkSession, pages_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """File-stream source over a directory of page parquet files."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(pages_dir)


def extract_triples_stream(pages: DataFrame) -> DataFrame:
    """Streaming triples with event-time: identical kernel as batch."""
    return extract_triples(pages, passthrough=("warc_ts",))


def windowed_pred_counts(triples: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Triple rate per predicate per event-time window, tolerating
    ``watermark`` of out-of-order crawl timestamps before a window is
    finalized and its state dropped."""
    return (triples
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("win"), "pred")
            .agg(F.count(F.lit(1)).alias("n_triples"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "pred", "n_triples"))


def run_extraction_stream(spark: SparkSession, pages_dir: str,
                          out_dir: str, checkpoint_dir: str,
                          max_files_per_trigger: int | None = None,
                          ) -> StreamingQuery:
    """Process all currently-available page files, then stop.

    ``Trigger.AvailableNow``: drains the backlog in bounded micro-batches
    and commits the checkpoint, so the next invocation processes only
    files that arrived since — incremental crawl ingestion as repeated
    bounded jobs (the recommended pattern for scheduled pipelines).
    """
    pages = read_page_stream(spark, pages_dir, max_files_per_trigger)
    triples = extract_triples_stream(pages)
    return (triples.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
