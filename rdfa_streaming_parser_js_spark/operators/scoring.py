"""Triple-level precision/recall as distributed set operations.

The correctness gate (BASELINE.json: P/R ≥ 0.95 vs reference triples)
must itself run at corpus scale: expected ∩ got via a null-safe inner
join on the full triple key, differences via anti-joins — never a
collect.  Mirrors the reference's isomorphism-based comparison
(/root/reference/test/RdfParser-test.ts:178) for the skolemized-bnode
representation, where label-independence is already guaranteed by
deterministic skolemization (operators/extract.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_KEY = ("url", "subj", "subj_kind", "pred", "obj_value", "obj_kind",
          "obj_datatype", "obj_lang")


def _null_safe_on(a: DataFrame, b: DataFrame, keys) -> F.Column:
    return reduce(lambda x, y: x & y,
                  [a[k].eqNullSafe(b[k]) for k in keys])


def triple_pr(got: DataFrame, expected: DataFrame,
              keys=PR_KEY) -> DataFrame:
    """One-row (n_expected, n_got, n_common, precision, recall).

    Distinct-ifies both sides (the reference stream may emit duplicate
    quads; set semantics match isomorphism scoring).
    """
    g = got.select(*keys).distinct().cache()
    e = expected.select(*keys).distinct().cache()
    try:
        common = g.alias("g").join(
            e.alias("e"), _null_safe_on(g, e, keys), "inner")
        n_got = g.count()
        n_exp = e.count()
        n_common = common.count()
    finally:
        g.unpersist()
        e.unpersist()
    spark = got.sparkSession
    row = [(n_exp, n_got, n_common,
            round(n_common / n_got, 6) if n_got else 0.0,
            round(n_common / n_exp, 6) if n_exp else 0.0)]
    return spark.createDataFrame(
        row, "n_expected long, n_got long, n_common long, "
             "precision double, recall double")


def false_positives(got: DataFrame, expected: DataFrame,
                    keys=PR_KEY) -> DataFrame:
    """Triples we emitted that the expectation lacks (debugging aid)."""
    g = got.select(*keys).distinct()
    e = expected.select(*keys).distinct()
    return g.join(e, _null_safe_on(g, e, keys), "left_anti")


def false_negatives(got: DataFrame, expected: DataFrame,
                    keys=PR_KEY) -> DataFrame:
    g = got.select(*keys).distinct()
    e = expected.select(*keys).distinct()
    return e.join(g, _null_safe_on(e, g, keys), "left_anti")
