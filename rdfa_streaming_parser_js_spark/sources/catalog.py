"""Graph-table catalog: Iceberg when available, bucketed parquet fallback.

The north-star deployment stores pages/triples/entities as Iceberg
tables (snapshot isolation gives the checkpoint/resume commit point
"for free"; `plans/lineage.py` reproduces that ordering over raw
parquet).  The sandbox ships no iceberg-spark-runtime jar, so this
adapter keeps ONE call site per table operation:

- with Iceberg configured (`spark.sql.catalog.<name>` set and the
  runtime jar on the classpath): `writeTo(...).partitionedBy(bucket(N,
  key))` / `spark.read.table(...)` — hidden-partitioning bucket joins;
- otherwise: an explicit `bucket = pmod(xxhash64(key), N)` column with
  `partitionBy("bucket")` parquet — the SAME physical layout (key-hash
  co-location, partition pruning on bucket), minus snapshot metadata.

Either way, readers prune to one bucket for entity-centric access and
subject-keyed joins are co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    """True if an Iceberg catalog named ``catalog`` is usable."""
    conf = spark.conf
    try:
        impl = conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    if not impl:
        return False
    try:  # the class must actually be loadable (jar present)
        spark._jvm.java.lang.Class.forName(impl)
        return True
    except Exception:
        return False


class GraphCatalog:
    """Named graph tables with bucket layout, Iceberg-or-parquet."""

    def __init__(self, spark: SparkSession, warehouse: str,
                 catalog: str = "kg", n_buckets: int = 64):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        self.catalog = catalog
        self.n_buckets = n_buckets
        self.iceberg = iceberg_available(spark, catalog)

    def _path(self, table: str) -> str:
        return f"{self.warehouse}/{table}"

    def write(self, df: DataFrame, table: str, bucket_key: str,
              mode: str = "overwrite") -> None:
        if self.iceberg:
            writer = (df.writeTo(f"{self.catalog}.{table}")
                      .using("iceberg")
                      .partitionedBy(F.bucket(self.n_buckets, bucket_key)))
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
            return
        out = (df.withColumn(
            "bucket",
            F.pmod(F.xxhash64(bucket_key), F.lit(self.n_buckets))
            .cast("int")))
        (out.repartition(self.n_buckets, "bucket")
         .write.mode(mode)
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket").parquet(self._path(table)))

    def read(self, table: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(f"{self.catalog}.{table}")
        return self.spark.read.parquet(self._path(table))

    def read_bucket_of(self, table: str, key_value: str) -> DataFrame:
        """Partition-pruned read: only the bucket that can hold
        ``key_value`` is scanned (checked in tests via the plan)."""
        df = self.read(table)
        if self.iceberg:
            # Iceberg prunes via hidden partitioning on the key predicate
            return df
        bucket = F.pmod(F.xxhash64(F.lit(key_value)),
                        F.lit(self.n_buckets)).cast("int")
        return df.filter(F.col("bucket") == bucket)
