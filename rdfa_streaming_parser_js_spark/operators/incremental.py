"""Incremental KG maintenance across crawl snapshots.

A Common-Crawl-style corpus is recrawled continuously; the KG built from
it must absorb a new snapshot without recomputing the world.  Two
primitives cover that lifecycle:

- ``snapshot_delta``: classify every triple as added / removed /
  unchanged between two snapshots (the audit/metrics view — feeds
  "what changed" reporting and downstream cache invalidation).
- ``merge_by_url``: recrawl-replace semantics — a page's new extraction
  replaces ALL triples previously derived from that url (provenance
  unit = url, matching the reference's one-parser-per-document model,
  /root/reference/lib/RdfaParser.ts:19).

Scale notes (100 TB / 10^12 pages):
- ``snapshot_delta`` is one shuffle per side on the full triple key;
  both sides are pre-deduplicated on the SAME key so the exchange is
  reused (set semantics — extraction can legitimately emit the same
  triple twice per page).  No driver state, no collect.
- ``merge_by_url`` is a left-anti join on url — hash-partitioned and
  skew-free (urls are unique); when the new snapshot is a small
  incremental chunk, mark it broadcastable with
  ``F.broadcast(new.select(url).distinct())`` at the call site, turning
  the anti-join map-side.  The union is shuffle-free.
- Both compose with the bucketed graph catalog (sources/catalog.py):
  reading `old` from a subject-bucketed table keeps downstream
  aggregations co-located after the merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _null_safe(df: DataFrame, cols: list[str]) -> DataFrame:
    """NULL-safe join keys: an equi-join key must not contain NULLs
    (NULL != NULL would classify such a triple as both added and
    removed).  EVERY string key column is coalesced to '' — not just
    obj_datatype/obj_lang: quad dumps re-imported through
    parse_nquads_lines carry a NULL graph column for default-graph
    lines, and any future nullable key gets the same treatment for
    free.  Non-string key columns (none in the triple schema) would
    need their own sentinel; keep keys stringly-typed."""
    out = df.select(*cols)
    for field in out.schema.fields:
        if field.dataType.typeName() == "string":
            out = out.withColumn(
                field.name, F.coalesce(F.col(field.name), F.lit("")))
    return out


def snapshot_delta(old: DataFrame, new: DataFrame,
                   key_cols: list[str] | None = None) -> DataFrame:
    """Set-difference audit between two triple snapshots.

    Returns one row per distinct key with ``status`` in
    ``('added', 'removed', 'unchanged')``.  NULLs in the nullable key
    columns are canonicalized to ``''`` in the output.
    """
    cols = key_cols or old.columns
    o = _null_safe(old, cols).dropDuplicates(cols).withColumn(
        "_in_old", F.lit(1))
    n = _null_safe(new, cols).dropDuplicates(cols).withColumn(
        "_in_new", F.lit(1))
    joined = o.join(n, cols, "full_outer")
    status = (F.when(F.col("_in_old").isNotNull()
                     & F.col("_in_new").isNotNull(), F.lit("unchanged"))
              .when(F.col("_in_new").isNotNull(), F.lit("added"))
              .otherwise(F.lit("removed")))
    return joined.select(*cols, status.alias("status"))


def merge_by_url(old: DataFrame, new: DataFrame,
                 url_col: str = "url") -> DataFrame:
    """Recrawl-replace: drop every old triple whose url was re-extracted
    in ``new``, then append the new extraction.  Idempotent: merging the
    same snapshot twice is a no-op."""
    recrawled = new.select(url_col).distinct()
    kept = old.join(recrawled, url_col, "left_anti")
    return kept.unionByName(new)
