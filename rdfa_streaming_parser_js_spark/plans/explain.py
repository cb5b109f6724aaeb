"""Plan-shape inspection: keep the physical plans we designed for.

At 100 TB the difference between "works" and "works fast" is visible in
the plan string: parquet scans must show pushed filters + pruned read
schemas, small dimensions must broadcast, map-only stages must not
shuffle.  Tests assert these properties so a refactor cannot silently
regress them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    try:
        jdf = df._jdf  # same accessor pyspark's own explain() uses
        return df.sparkSession._jvm.PythonSQLUtils.explainString(
            jdf.queryExecution(), mode)
    except Exception:
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()


def scan_read_schema(df: DataFrame) -> list[str]:
    """Every ``ReadSchema:`` line in the plan — shows column pruning."""
    return [ln.strip() for ln in plan_string(df).splitlines()
            if "ReadSchema:" in ln]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if some scan's ``PushedFilters`` mentions ``fragment``."""
    return any(fragment in ln for ln in plan_string(df).splitlines()
               if "PushedFilters" in ln)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan.

    Counts in 'simple' mode (operator tree only — 'formatted' repeats
    every node in a details section, which would double-count)."""
    plan = plan_string(df, "simple")
    return sum(1 for ln in plan.splitlines()
               if "Exchange" in ln and "ReusedExchange" not in ln
               and "BroadcastExchange" not in ln)


def assert_map_only(df: DataFrame) -> None:
    """Assert the plan has no shuffle (extraction must stay map-only)."""
    plan = plan_string(df)
    assert "Exchange" not in plan, f"unexpected shuffle in plan:\n{plan}"
