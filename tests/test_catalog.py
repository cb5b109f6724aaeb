"""GraphCatalog: bucketed layout, partition-pruned reads, Iceberg gating."""

from __future__ import annotations

import pyspark.sql.functions as F

from rdfa_streaming_parser_js_spark.operators.extract import extract_triples
from rdfa_streaming_parser_js_spark.plans.explain import plan_string
from rdfa_streaming_parser_js_spark.sources.catalog import (
    GraphCatalog, iceberg_available)
from rdfa_streaming_parser_js_spark.sources.pages import pages_from_documents

SF_DIR = "/root/testdata/sf0.001"


def test_iceberg_gating_is_honest(spark):
    # sandbox has no iceberg runtime: the adapter must detect that
    assert iceberg_available(spark, "kg") is False


def test_write_read_roundtrip_bucketed(spark, tmp_path):
    cat = GraphCatalog(spark, str(tmp_path), n_buckets=8)
    triples = extract_triples(pages_from_documents(spark, SF_DIR))
    cat.write(triples, "triples", bucket_key="subj")
    back = cat.read("triples")
    assert back.count() == triples.count()
    assert back.select("bucket").distinct().count() == 8
    # same subject always lands in the same bucket (join co-location)
    assert (back.groupBy("subj")
            .agg(F.count_distinct("bucket").alias("nb"))
            .filter("nb > 1").count()) == 0


def test_bucket_pruned_point_read(spark, tmp_path):
    cat = GraphCatalog(spark, str(tmp_path), n_buckets=8)
    triples = extract_triples(pages_from_documents(spark, SF_DIR))
    cat.write(triples, "triples", bucket_key="subj")
    subj = triples.select("subj").head().subj
    pruned = cat.read_bucket_of("triples", subj).filter(
        F.col("subj") == subj)
    assert pruned.count() == 7  # the template emits 7 triples per page
    # partition pruning visible in the plan: one bucket dir selected
    plan = plan_string(pruned)
    assert "PartitionFilters" in plan and "bucket" in plan
