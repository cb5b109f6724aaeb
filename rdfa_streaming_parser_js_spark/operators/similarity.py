"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k vs one query vector — the
  correctness baseline.  The query vector is a broadcast literal; the
  dot product is a native ``aggregate(zip_with(...))`` fold (JVM-side,
  no Python).  Map-only + a k-row global top — at 100 TB this is a
  single pass with a tiny driver-side result.
- ``ivf_topk``: the scale path — coarse quantization prunes the scan to
  the query's cell before scoring (here the ``label`` column plays the
  trained-centroid assignment; in production the assignment is itself a
  broadcast-join against a centroid table).  Partition pruning applies
  when the table is partitioned by the cell id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def with_unit_vector(emb: DataFrame,
                     vec_col: str = "embedding") -> DataFrame:
    """Adds ``unit``: the L2-normalized double vector (cosine → dot)."""
    v = _as_double(F.col(vec_col))
    norm = F.sqrt(_dot(v, v))
    return emb.withColumn("unit", F.transform(v, lambda x: x / norm))


def cosine_scores(emb: DataFrame, query_vec: list[float],
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """(id, cosine) vs a constant query vector, rounded to 5 dp."""
    q = [float(x) for x in query_vec]
    qn = sum(x * x for x in q) ** 0.5
    qlit = F.array(*[F.lit(x / qn) for x in q])
    v = _as_double(F.col(vec_col))
    vnorm = F.sqrt(_dot(v, v))
    cos = _dot(F.transform(v, lambda x: x / vnorm), qlit)
    return emb.select(F.col(id_col).alias("vec_id"),
                      F.round(cos, 5).alias("cosine"))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force top-k (ties broken by vec_id for determinism).
    orderBy+limit compiles to TakeOrderedAndProject — per-partition
    top-k then a k-row merge, no full sort/shuffle."""
    return (cosine_scores(emb, query_vec, vec_col, id_col)
            .orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k))


def ivf_topk(emb: DataFrame, query_vec: list[float], query_cell: int,
             k: int = 10, cell_col: str = "label",
             vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """IVF-style ANN: scan only the query's coarse cell, then exact
    top-k within it.  The filter is pushed down to the parquet scan."""
    pruned = emb.filter(F.col(cell_col) == query_cell)
    return cosine_topk(pruned, query_vec, k, vec_col, id_col)
