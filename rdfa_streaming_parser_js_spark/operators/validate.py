"""SHACL-lite shape validation over the constructed KG.

The reference emits whatever the markup asserts — it has no notion of a
schema (/root/reference/lib/RdfaParser.ts:803-811 pushes every quad the
evaluation stack produces).  A production KG-construction pipeline gates
publication on a validation report: which entities are missing required
properties, carry the wrong datatype, or point at the wrong node kind.
This module implements the workhorse SHACL core constraint components
(sh:minCount / sh:maxCount / sh:datatype / sh:nodeKind / sh:in /
sh:pattern) as Catalyst plans.

Shapes are driver-side metadata (a real shapes graph is a few hundred
rows — ontology-sized, never big data), so each constraint compiles to
a declarative plan over the triple table:

- Focus selection: one filtered projection per target class
  (``pred = rdf:type AND obj_value = <class>``) — pushed to the scan.
- Value rows: focus ⨝ triples on ``subj`` restricted to the shape's
  path predicate.  The pred filter lands in the scan too, so the join
  input is the property's slice, not the graph.
- Cardinality: groupBy(focus) count, compared to min/max.  minCount
  additionally needs the zero-count foci — a left-anti join from the
  focus set against the value-bearing foci (counting can't see absent
  groups).
- Value constraints (datatype / nodeKind / in / pattern): row-local
  predicates on the value rows — pure codegen, no shuffle at all.

Scale shape: every shuffle is keyed on the focus subject and operates
on one property slice of one class — the full graph is never shuffled.
Violations of all shapes/components are unioned into one report with a
deterministic schema, ready to gate a publish step or to route rows to
quarantine (the same pattern as operators/extract's parse_error
column).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

REPORT_COLUMNS = ["focus", "shape_id", "constraint", "path", "value",
                  "detail"]


@dataclass(frozen=True)
class PropertyShape:
    """One SHACL property shape: constraints on ``path`` values of all
    instances of ``target_class``.  Only the fields set are checked."""

    shape_id: str
    target_class: str
    path: str
    min_count: Optional[int] = None
    max_count: Optional[int] = None
    datatype: Optional[str] = None       # required obj_datatype IRI
    node_kind: Optional[str] = None      # 'iri' | 'literal' | 'bnode'
    in_values: Optional[Sequence[str]] = None
    pattern: Optional[str] = None        # RLIKE over obj_value


def _focus_nodes(triples: DataFrame, target_class: str) -> DataFrame:
    return (triples.filter((F.col("pred") == RDF_TYPE)
                           & (F.col("obj_value") == target_class))
            .select(F.col("subj").alias("focus")).distinct())


def _report(focus, shape: PropertyShape, constraint: str, value, detail):
    """Project a violation DataFrame onto the report schema."""
    return focus.select(
        F.col("focus"), F.lit(shape.shape_id).alias("shape_id"),
        F.lit(constraint).alias("constraint"),
        F.lit(shape.path).alias("path"), value.alias("value"),
        detail.alias("detail"))


def shacl_report(triples: DataFrame,
                 shapes: Sequence[PropertyShape]) -> DataFrame:
    """Validate the graph against ``shapes``; returns the violation
    report (one row per violated constraint per focus node — empty
    means conforming).  ``value`` carries the offending value (or the
    observed count for cardinality components); ``detail`` carries the
    expectation."""
    spark = triples.sparkSession
    parts: list[DataFrame] = []
    for sh in shapes:
        focus = _focus_nodes(triples, sh.target_class)
        values = (triples.filter(F.col("pred") == sh.path)
                  .join(focus, triples.subj == F.col("focus"))
                  .select("focus", "obj_value", "obj_kind",
                          "obj_datatype", "obj_lang"))

        if sh.min_count is not None or sh.max_count is not None:
            counts = values.groupBy("focus").agg(
                F.count(F.lit(1)).alias("n"))
            if sh.min_count is not None:
                if sh.min_count > 0:
                    absent = focus.join(counts.select("focus"), "focus",
                                        "left_anti").withColumn(
                        "n", F.lit(0).cast("long"))
                    low = counts.filter(F.col("n") < sh.min_count).unionByName(
                        absent)
                else:   # minCount 0 is vacuous
                    low = counts.filter(F.lit(False))
                parts.append(_report(
                    low, sh, "minCount", F.col("n").cast("string"),
                    F.lit(f"minCount {sh.min_count}")))
            if sh.max_count is not None:
                parts.append(_report(
                    counts.filter(F.col("n") > sh.max_count), sh,
                    "maxCount", F.col("n").cast("string"),
                    F.lit(f"maxCount {sh.max_count}")))

        if sh.datatype is not None:
            bad = values.filter(
                F.col("obj_datatype").isNull()
                | (F.col("obj_datatype") != sh.datatype))
            parts.append(_report(
                bad, sh, "datatype", F.col("obj_value"),
                F.coalesce(F.col("obj_datatype"), F.lit("(plain)"))))
        if sh.node_kind is not None:
            bad = values.filter(F.col("obj_kind") != sh.node_kind)
            parts.append(_report(bad, sh, "nodeKind", F.col("obj_value"),
                                 F.col("obj_kind")))
        if sh.in_values is not None:
            bad = values.filter(~F.col("obj_value").isin(
                list(sh.in_values)))
            parts.append(_report(
                bad, sh, "in", F.col("obj_value"),
                F.lit(",".join(sh.in_values))))
        if sh.pattern is not None:
            bad = values.filter(~F.col("obj_value").rlike(sh.pattern))
            parts.append(_report(bad, sh, "pattern", F.col("obj_value"),
                                 F.lit(sh.pattern)))

    if not parts:
        return spark.createDataFrame(
            [], "focus string, shape_id string, constraint string, "
                "path string, value string, detail string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def conforms(triples: DataFrame,
             shapes: Sequence[PropertyShape]) -> bool:
    """SHACL ``sh:conforms`` — True iff the report is empty."""
    return not shacl_report(triples, shapes).take(1)
