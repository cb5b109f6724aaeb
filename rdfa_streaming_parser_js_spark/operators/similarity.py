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


def _scaled(v: Column, norm: Column) -> Column:
    """``v / norm`` element-wise with ``norm`` evaluated ONCE per row.

    Embedding ``norm`` inside a ``transform`` lambda re-evaluates the
    whole d-element dot-product subtree for every element (Spark does
    not hoist lambda-invariant subexpressions out of higher-order
    functions, and CollapseProject re-inlines a hoisted projection), so
    normalization degrades to O(d^2) per row — measured 17x slower at
    d=64.  ``array_repeat`` forces one evaluation; ``zip_with`` then
    divides element-for-element, bit-identical to the naive form."""
    return F.zip_with(v, F.array_repeat(norm, F.size(v)),
                      lambda x, n: x / n)


def with_unit_vector(emb: DataFrame,
                     vec_col: str = "embedding") -> DataFrame:
    """Adds ``unit``: the L2-normalized double vector (cosine → dot)."""
    v = _as_double(F.col(vec_col))
    return emb.withColumn("unit", _scaled(v, F.sqrt(_dot(v, v))))


def cosine_scores(emb: DataFrame, query_vec: list[float],
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """(id, cosine) vs a constant query vector, rounded to 5 dp.

    The driver-side normalization mirrors the engine's sequential fold
    bit-for-bit (left-fold sum, ``math.sqrt`` — not ``** 0.5``, whose
    pow() is not guaranteed correctly rounded) so the DuckDB oracle
    reproduces the literal exactly."""
    import math
    q = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in q))
    qlit = F.array(*[F.lit(x / qn) for x in q])
    v = _as_double(F.col(vec_col))
    cos = _dot(_scaled(v, F.sqrt(_dot(v, v))), qlit)
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


# Pseudo-random but DETERMINISTIC projection dimensions for sign-LSH
# (no RNG state: dims derive from a fixed multiplicative hash).
def lsh_projection_dims(dim: int, n_bits: int = 8) -> list[int]:
    if dim < n_bits:
        raise ValueError(
            f"need dim >= n_bits distinct projection dims ({dim=}, {n_bits=})")
    dims, seen, x = [], set(), 0
    while len(dims) < n_bits:
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        d = x % dim
        if d not in seen:
            seen.add(d)
            dims.append(int(d))
    return dims


def lsh_bucket(vec: Column, dims: list[int]) -> Column:
    """Sign-projection bucket id: bit b = sign(vec[dims[b]]).

    Axis-aligned random projections — the hyperplanes are coordinate
    axes chosen pseudo-randomly, so the bucket is a cheap native
    expression (no per-row Python, no stored hyperplane table)."""
    bits = [
        F.when(F.element_at(vec, d + 1) >= 0,
               F.lit(1 << b)).otherwise(F.lit(0))
        for b, d in enumerate(dims)
    ]
    out = bits[0]
    for bcol in bits[1:]:
        out = out.bitwiseOR(bcol)
    return out.cast("int")


def lsh_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             n_bits: int = 8, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """LSH-bucketed ANN: score only vectors sharing the query's
    sign-projection bucket (expected 1/2^n_bits of the table), exact
    cosine top-k within the bucket.  Standard ANN recall trade-off —
    ``cosine_topk`` is the exact baseline to validate against.  On a
    bucket-partitioned table the filter prunes partitions."""
    dim = len(query_vec)
    dims = lsh_projection_dims(dim, n_bits)
    qbucket = 0
    for b, d in enumerate(dims):
        if float(query_vec[d]) >= 0:
            qbucket |= 1 << b
    pruned = emb.filter(
        lsh_bucket(_as_double(F.col(vec_col)), dims) == qbucket)
    return cosine_topk(pruned, query_vec, k, vec_col, id_col)
