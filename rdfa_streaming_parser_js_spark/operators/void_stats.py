"""VoID dataset description of the constructed KG — statistics *as RDF*.

Publishing a knowledge graph means publishing its W3C VoID description
(the "Vocabulary of Interlinked Datasets"): global triple /
distinct-subject / property counts plus per-class and per-property
partitions.  The reference parser is a per-document quad emitter and
has no dataset-level view at all (/root/reference/lib/RdfaParser.ts:
803-811); at 10^12 pages the description is itself a distributed job.

Output is triples-shaped (same columns as the extractor minus ``url``),
so the description can be unioned into the graph, serialized by the
N-Triples sink, or validated by the SHACL operator like any other data.

Scale shape:
- Global stats: one single-row aggregate.  The four exact
  count-distincts expand the input ×4 (Spark's Expand) — still one
  shuffle keyed on nothing, partial aggregation applies; swap in
  approx_count_distinct at 10^13 if exactness is not contractual.
- Class partition: the rdf:type slice (predicate filter pushed to the
  scan) grouped by class — classes are few, counts are exact.
- Property partition: groupBy(pred).  Predicate skew is bounded by the
  vocabulary size, not the data.
- Partition node IRIs are md5-derived from the partitioned term, so the
  description is deterministic on any engine and any parallelism.

Counts are emitted as xsd:integer literals (string lexical forms) —
exact and byte-stable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
VOID_NS = "http://rdfs.org/ns/void#"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"

TRIPLE_SHAPE = ["subj", "pred", "obj_value", "obj_kind", "obj_datatype",
                "obj_lang"]


def _iri(subj, pred: str, obj) -> list:
    return [subj, F.lit(pred), obj, F.lit("iri"),
            F.lit(None).cast("string"), F.lit(None).cast("string")]


def _int(subj, pred: str, n) -> list:
    return [subj, F.lit(pred), n.cast("string"), F.lit("literal"),
            F.lit(XSD_INTEGER), F.lit(None).cast("string")]


def _rows(df: DataFrame, *specs) -> DataFrame:
    """Fan one aggregate row out into len(specs) triples."""
    parts = [df.select(*[c.alias(n) for c, n in zip(spec, TRIPLE_SHAPE)])
             for spec in specs]
    return reduce(lambda a, b: a.unionByName(b), parts)


def _part_iri(dataset_iri: str, kind: str, term) -> F.Column:
    return F.concat(F.lit(f"{dataset_iri}#{kind}-"), F.md5(term))


def void_description(triples: DataFrame, dataset_iri: str) -> DataFrame:
    """VoID description triples for the graph-set in ``triples``
    (callers pass deduplicated triples; per-url provenance rows would
    inflate every count).  Emits the void:Dataset node, its global
    statistics, and one partition node per class / per predicate."""
    d = F.lit(dataset_iri)

    glob = triples.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_subj"),
        F.countDistinct("obj_value").alias("n_obj"),
        F.countDistinct("pred").alias("n_pred"),
        F.countDistinct(F.when(F.col("pred") == RDF_TYPE,
                               F.col("obj_value"))).alias("n_class"))
    global_rows = _rows(
        glob,
        _iri(d, RDF_TYPE, F.lit(f"{VOID_NS}Dataset")),
        _int(d, f"{VOID_NS}triples", F.col("n_triples")),
        _int(d, f"{VOID_NS}distinctSubjects", F.col("n_subj")),
        _int(d, f"{VOID_NS}distinctObjects", F.col("n_obj")),
        _int(d, f"{VOID_NS}properties", F.col("n_pred")),
        _int(d, f"{VOID_NS}classes", F.col("n_class")))

    classes = (triples.filter(F.col("pred") == RDF_TYPE)
               .groupBy(F.col("obj_value").alias("cls"))
               .agg(F.countDistinct("subj").alias("n_entities")))
    cp = _part_iri(dataset_iri, "class", F.col("cls"))
    class_rows = _rows(
        classes,
        _iri(d, f"{VOID_NS}classPartition", cp),
        _iri(cp, f"{VOID_NS}class", F.col("cls")),
        _int(cp, f"{VOID_NS}entities", F.col("n_entities")))

    props = (triples.groupBy("pred")
             .agg(F.count(F.lit(1)).alias("n_triples"),
                  F.countDistinct("subj").alias("n_subj")))
    pp = _part_iri(dataset_iri, "prop", F.col("pred"))
    prop_rows = _rows(
        props,
        _iri(d, f"{VOID_NS}propertyPartition", pp),
        _iri(pp, f"{VOID_NS}property", F.col("pred")),
        _int(pp, f"{VOID_NS}triples", F.col("n_triples")),
        _int(pp, f"{VOID_NS}distinctSubjects", F.col("n_subj")))

    return global_rows.unionByName(class_rows).unionByName(prop_rows)
