"""Mention detection + entity-link scoring (BASELINE.json north_star:
"batched mention detection and entity-link scoring").

Shape at 10^12 pages: explode page text into candidate mention tokens
(map-only), equi-join a **broadcast** entity dictionary (the dictionary
is small — no shuffle of the big side), aggregate mention evidence per
(page, entity), then a window top-1 per page.  The only shuffle is the
per-page aggregation, partitioned by the page key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

KB_PREFIX = "http://kb.example.org/entity/"

# Deterministic demo dictionary over the synthetic docs vocabulary.
DEFAULT_ENTITY_NAMES = (
    "spark", "join", "hash", "window", "stream", "vector", "query",
    "table", "shuffle", "batch",
)


def entity_dictionary(spark: SparkSession,
                      names=DEFAULT_ENTITY_NAMES) -> DataFrame:
    rows = [(n, KB_PREFIX + n) for n in sorted(names)]
    return spark.createDataFrame(rows, "name string, entity_iri string")


def detect_mentions(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, token) — one row per token occurrence (evidence unit)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"))


def link_entities(docs: DataFrame, dictionary: DataFrame,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-doc candidate entities with evidence counts.

    Broadcast hash join: mentions ⋈ dictionary on the token key.
    """
    mentions = detect_mentions(docs, id_col, text_col)
    cand = mentions.join(
        F.broadcast(dictionary),
        mentions.token == dictionary.name)
    return (cand.groupBy("id", "entity_iri", "name")
            .agg(F.count(F.lit(1)).alias("n_mentions")))


def best_entity_per_doc(docs: DataFrame, dictionary: DataFrame,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Window top-1: highest evidence count, ties → lexicographic name."""
    scored = link_entities(docs, dictionary, id_col, text_col)
    w = Window.partitionBy("id").orderBy(F.desc("n_mentions"), F.asc("name"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") == 1)
            .select("id", "entity_iri", "name", "n_mentions"))


def scored_entity_links(docs: DataFrame, dictionary: DataFrame,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """TF-IDF-weighted link scoring: mention count × corpus rarity.

    ``score = n_mentions · ln(1 + N/df)`` where df = how many documents
    mention the entity — a ubiquitous name ("table") is weak evidence, a
    rare one is strong.  df is tiny (≤ dictionary size) so it broadcasts
    back; the big side shuffles only once (the per-doc aggregation in
    link_entities)."""
    cand = link_entities(docs, dictionary, id_col, text_col)
    # N as a broadcast scalar IN the DAG — a driver-side docs.count()
    # here would force a separate full pass over the corpus before the
    # job even starts; as a 1-row broadcast crossJoin it runs inside
    # the same job (and the count scan prunes to zero data columns).
    n_docs = docs.agg(
        F.count(F.lit(1)).cast("double").alias("corpus_n_docs"))
    df_ = cand.groupBy("name").agg(
        F.count_distinct("id").alias("doc_freq"))
    return (cand.join(F.broadcast(df_), "name")
            .crossJoin(F.broadcast(n_docs))
            .withColumn(
                "score",
                F.round(F.col("n_mentions")
                        * F.log(F.lit(1.0)
                                + F.col("corpus_n_docs")
                                / F.col("doc_freq")),
                        6))
            .select("id", "entity_iri", "name", "n_mentions",
                    "doc_freq", "score"))
