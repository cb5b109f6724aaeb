"""Temporal KG views over crawl timestamps — as-of (time-travel) reads.

A Common-Crawl-style corpus carries ``warc_ts`` per capture; the same
url is recrawled many times.  The KG "as of T" is the union, over
urls, of the triples extracted from each url's LATEST capture at or
before T — the read-side complement of the recrawl-replace merge in
operators/incremental.py (which maintains only the newest state).

Plan shape at 10^12 captures:
- one hash partition by url, one window (max ts per url within the
  cutoff) — a single Exchange; no self-join of the triple table;
- the timestamp filter is pushed to the scan, so captures after T are
  never read (on an Iceberg table partitioned by day this prunes whole
  partitions);
- composing with snapshot_delta(as_of(t1), as_of(t2)) yields the audit
  diff between any two historical states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of(triples: DataFrame, ts, ts_col: str = "warc_ts",
          url_col: str = "url") -> DataFrame:
    """Triples visible at time ``ts``: per url, only rows from the
    latest capture with ``ts_col`` <= ts.  ``ts`` is anything Spark can
    compare with the column (timestamp literal, ISO string, column)."""
    visible = triples.filter(F.col(ts_col) <= ts)
    w = Window.partitionBy(url_col)
    return (visible
            .withColumn("_latest", F.max(ts_col).over(w))
            .filter(F.col(ts_col) == F.col("_latest"))
            .drop("_latest"))
