"""Parquet table loaders for the driver-generated synthetic testdata.

At production scale these reads would be ``spark.read.format("iceberg")``
over a catalog table; the sandbox has plain parquet, which exercises the
same DataSourceV2 pushdown surface (PushedFilters / ReadSchema in
``.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
