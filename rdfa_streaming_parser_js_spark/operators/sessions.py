"""Gap-based sessionization over an event stream (batch flavor).

Spark has no native batch sessionize; the classic composition is two
windows over the same (user, time) partitioning — one shuffle total:

1. ``lag(ts)`` per user → gap to previous event;
2. cumulative sum of "gap exceeded" flags → session ordinal per user.

Session id = (user_id, session_ordinal), deterministic.  The streaming
twin is ``F.session_window`` (used with watermarks); this batch form is
what backfills historical sessions at 100 TB — both windows share one
hash partitioning on user_id, so Catalyst plans a single Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """events → events + (session_seq, session_id)."""
    by_time = Window.partitionBy(user_col).orderBy(ts_col)
    gap_sec = gap_minutes * 60
    prev_ts = F.lag(ts_col).over(by_time)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts))
           > gap_sec), 1).otherwise(0)
    seq = F.sum(new_session).over(
        by_time.rowsBetween(Window.unboundedPreceding, 0))
    return (events
            .withColumn("session_seq", seq.cast("long"))
            .withColumn("session_id",
                        F.concat_ws("-", F.col(user_col).cast("string"),
                                    F.col("session_seq").cast("string"))))


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  user_col: str = "user_id",
                  ts_col: str = "ts") -> DataFrame:
    """Per-session rollup: bounds, event count, value sum."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    # Decimal sum, not double: partial-aggregation order is
    # nondeterministic across partitions, and a double sum's last bits
    # can cross a rounding boundary run-to-run.  decimal(18,6) is exact
    # and associative.  The sum is then emitted as an exact integer
    # (milli-units) rather than a double: different engines format the
    # same double value differently at the byte level, so keeping a
    # float out of the output column makes the result
    # serialization-proof, not merely value-equal.
    return (s.groupBy(user_col, "session_seq")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.unix_timestamp(F.min(ts_col)).alias("start_epoch"),
                 F.unix_timestamp(F.max(ts_col)).alias("end_epoch"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                         * 1000, 0)
                 .cast("bigint").alias("sum_value_milli")))
