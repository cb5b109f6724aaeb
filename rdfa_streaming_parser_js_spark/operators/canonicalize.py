"""Canonicalization + graph materialization of the extracted triples.

The reference emits a raw quad stream and leaves dedup/normalization to
the consumer (/root/reference/lib/RdfaParser.ts:810).  At 10^12 pages
these become first-class distributed stages:

- ``canonicalize_triples``: language tags are already lowercased by the
  kernel (/root/reference/lib/Util.ts:212); here we add the salted-hash
  identity columns used for partitioning/bucketing and distinct-ify.
- ``hub_subjects``: top-k heavy-hitter subjects — the skew list.  AQE
  splits skewed *joins* at runtime but not skewed groupBys, so heavy
  keys get an explicit salt (SURVEY.md §4).
- ``materialize_graph``: deduplicated triples written bucketed by
  subject hash so downstream subject-joins are co-located (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TRIPLE_KEY = ["subj", "subj_kind", "pred", "obj_value", "obj_kind",
              "obj_datatype", "obj_lang"]


def canonicalize_triples(triples: DataFrame,
                         with_provenance: bool = True) -> DataFrame:
    """Distinct (s,p,o) with stable 64-bit identity hashes.

    ``subj_hash`` is the partitioning key for all graph tables; xxhash64
    is Spark's codegen'd non-cryptographic hash (cheap at 100 TB scale).
    With provenance we keep the first url per triple (min — deterministic).
    """
    agg = (triples.groupBy(*TRIPLE_KEY)
           .agg(F.min("url").alias("first_url"),
                F.count(F.lit(1)).alias("n_pages"))
           if with_provenance else triples.select(*TRIPLE_KEY).distinct())
    return agg.withColumn("subj_hash", F.xxhash64("subj"))


def hub_subjects(triples: DataFrame, k: int = 100) -> DataFrame:
    """Top-k subjects by triple count — the explicit skew-salt list."""
    return (triples.groupBy("subj")
            .agg(F.count(F.lit(1)).alias("n_triples"))
            .orderBy(F.desc("n_triples"), F.asc("subj"))
            .limit(k))


def salted_object_counts(triples: DataFrame, hot: DataFrame,
                         salt_buckets: int = 16) -> DataFrame:
    """Per-object triple counts with two-phase aggregation on hot keys.

    Objects on the hot list are pre-aggregated under ``salt_buckets``
    sub-keys (map-side spread), then re-aggregated — the classic
    salt-and-merge that keeps a single reducer from owning a hub entity.
    """
    hot_objs = F.broadcast(hot.select(F.col("subj").alias("obj_value"),
                                      F.lit(True).alias("is_hot")))
    salted = (triples.join(hot_objs, "obj_value", "left")
              .withColumn("salt",
                          F.when(F.col("is_hot"),
                                 F.pmod(F.xxhash64("subj"),
                                        F.lit(salt_buckets)))
                          .otherwise(F.lit(0))))
    partial = (salted.groupBy("obj_value", "salt")
               .agg(F.count(F.lit(1)).alias("c")))
    return (partial.groupBy("obj_value")
            .agg(F.sum("c").alias("n_triples")))


def materialize_graph(triples: DataFrame, out_dir: str,
                      buckets: int = 64) -> None:
    """Write the deduplicated graph partitioned by subject-hash bucket.

    Parquet in the sandbox; on a cluster this is an Iceberg
    ``writeTo(...).partitionedBy(bucket(N, 'subj'))`` — same layout:
    subject-co-located files so entity-centric reads prune to one bucket.
    """
    canon = canonicalize_triples(triples)
    (canon.withColumn("bucket", F.pmod(F.col("subj_hash"), F.lit(buckets)))
     .repartition(buckets, "bucket")
     .write.mode("overwrite").partitionBy("bucket").parquet(out_dir))
