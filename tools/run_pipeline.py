"""End-to-end KG-construction job — the spark-submit entrypoint.

    spark-submit --master local[8] --py-files /tmp/rdfa_kg.zip \
        tools/run_pipeline.py --sf-dir /root/testdata/sf0.01 \
        --out-dir /tmp/kg_out

(Build the zip with ``python tools/make_pyfiles_zip.py /tmp/rdfa_kg.zip``.
On a cluster the same command with ``--master yarn``/k8s and an Iceberg
catalog config is the production launch; north-rule launch contract.)

Stages: synthesize/read pages → checkpointed bucket extraction (resumable,
per-partition lineage) → canonicalize → materialize bucketed graph →
entity links → print metrics JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--copies", type=int, default=1)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--buckets-per-commit", type=int, default=8)
    ap.add_argument("--mode", choices=("batch", "streaming", "warc"),
                    default="batch",
                    help="streaming: incremental file-stream ingestion "
                         "with a Structured Streaming checkpoint; "
                         "warc: resumable shard-level ingestion from "
                         "--warc-dir (synthesized from --sf-dir when "
                         "absent)")
    ap.add_argument("--warc-dir", default=None,
                    help="existing WARC shard directory for --mode warc")
    ap.add_argument("--shards-per-commit", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from rdfa_streaming_parser_js_spark.operators.canonicalize import (
        hub_subjects, materialize_graph)
    from rdfa_streaming_parser_js_spark.operators.entity_link import (
        best_entity_per_doc, entity_dictionary)
    from rdfa_streaming_parser_js_spark.plans.lineage import (
        CheckpointedExtraction)
    from rdfa_streaming_parser_js_spark.sources.pages import (
        pages_from_documents)

    spark = SparkSession.builder.appName("rdfa-kg-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    pages = pages_from_documents(spark, args.sf_dir, copies=args.copies)

    if args.mode == "streaming":
        # Stage pages as a file-stream source dir; resume lives in the
        # Structured Streaming checkpoint instead of the bucket manifest.
        from rdfa_streaming_parser_js_spark.streaming import (
            run_extraction_stream)
        pages_dir = f"{args.out_dir}/pages_in"
        pages.write.mode("overwrite").parquet(pages_dir)
        q = run_extraction_stream(
            spark, pages_dir, f"{args.out_dir}/extract/triples",
            f"{args.out_dir}/stream_ck", max_files_per_trigger=8)
        q.awaitTermination()
        run_info = {"mode": "streaming",
                    "progress": q.lastProgress and
                    q.lastProgress.get("numInputRows")}
        triples = spark.read.parquet(f"{args.out_dir}/extract/triples")
    elif args.mode == "warc":
        # Common-Crawl flavor: WARC shards in, shard-level lineage,
        # repeated invocations pick up newly-arrived shards.
        from rdfa_streaming_parser_js_spark.sources.warc import (
            WarcIngestion, write_warc_shards)
        warc_dir = args.warc_dir or f"{args.out_dir}/warc_in"
        if args.warc_dir is None:
            write_warc_shards(pages, warc_dir, shard_size=2000,
                              compress=True)
        ing = WarcIngestion(warc_dir, f"{args.out_dir}/extract")
        run_info = ing.run(spark,
                           shards_per_commit=args.shards_per_commit)
        run_info["mode"] = "warc"
        triples = ing.triples(spark)
    else:
        ck = CheckpointedExtraction(f"{args.out_dir}/extract",
                                    n_buckets=args.n_buckets)
        run_info = ck.run(pages,
                          buckets_per_commit=args.buckets_per_commit)
        triples = ck.triples(spark)
    materialize_graph(triples, f"{args.out_dir}/graph")
    hubs = hub_subjects(triples, k=10).collect()

    # publish gating: SHACL report + VoID description live NEXT TO the
    # graph — consumers read the stats, operators alert on violations
    from rdfa_streaming_parser_js_spark.operators.validate import (
        PropertyShape, shacl_report)
    from rdfa_streaming_parser_js_spark.operators.void_stats import (
        void_description)
    schema_org = "http://schema.org/"
    xsd = "http://www.w3.org/2001/XMLSchema#"
    shapes = [
        PropertyShape("sh:article-name", f"{schema_org}Article",
                      f"{schema_org}name", min_count=1, max_count=1),
        PropertyShape("sh:article-src", f"{schema_org}Article",
                      f"{schema_org}isPartOf", node_kind="iri"),
        PropertyShape("sh:article-wc", f"{schema_org}Article",
                      f"{schema_org}wordCount",
                      datatype=f"{xsd}integer"),
    ]
    graph_set = triples.select("subj", "pred", "obj_value", "obj_kind",
                               "obj_datatype", "obj_lang").distinct()
    report = shacl_report(triples, shapes)
    report.write.mode("overwrite").parquet(
        f"{args.out_dir}/shacl_report")
    void_description(
        graph_set, "http://corpus.example.org/void/dataset"
    ).write.mode("overwrite").parquet(f"{args.out_dir}/void")

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    links = best_entity_per_doc(docs, entity_dictionary(spark))
    links.write.mode("overwrite").parquet(f"{args.out_dir}/entity_links")

    graph = spark.read.parquet(f"{args.out_dir}/graph")
    metrics = {
        "run": run_info,
        "n_pages": pages.count(),
        "n_raw_triples": triples.count(),
        "n_canonical_triples": graph.count(),
        "n_graph_buckets": graph.select("bucket").distinct().count(),
        "n_entity_links": links.count(),
        "n_shacl_violations": spark.read.parquet(
            f"{args.out_dir}/shacl_report").count(),
        "n_void_triples": spark.read.parquet(
            f"{args.out_dir}/void").count(),
        "top_hub_subjects": [(r.subj, r.n_triples) for r in hubs[:3]],
        "lineage_buckets": (ck.metrics(spark).count()
                            if args.mode == "batch" else None),
        "lineage_shards": (ing.manifest(spark).count()
                           if args.mode == "warc" else None),
    }
    print("PIPELINE_METRICS " + json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
