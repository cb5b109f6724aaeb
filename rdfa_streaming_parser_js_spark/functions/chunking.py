"""Deterministic document chunking — the tokenize→window→overlap step
of a training-data pipeline.

LLM training corpora are built from web text cut into fixed-size token
windows with overlap (context stuffing, dedup granularity, retrieval
units).  This stays entirely inside whole-stage codegen: one
``sequence`` per row for the window starts, one ``transform`` +
``slice`` for the chunk bodies, one ``posexplode`` — no Python, no
shuffle; chunking is a pure flatMap and scales with input splits.

Chunk identity (doc_id, chunk_idx) is deterministic at any parallelism
— starts are ``1, 1+step, 1+2·step, …`` over the whitespace token
array, step = chunk_tokens − overlap_tokens, and the final window is
allowed to be short rather than re-anchored (re-anchoring the tail
would duplicate most of the previous chunk and make chunk content
depend on document length parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(docs: DataFrame, chunk_tokens: int = 32,
                    overlap_tokens: int = 8,
                    text_col: str = "text",
                    id_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """One row per (document, window): ``chunk_idx`` (0-based),
    ``chunk_text`` (space-joined), ``n_chunk_tokens``.  Windows start
    every ``chunk_tokens - overlap_tokens`` tokens; the last window may
    be shorter."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap_tokens}) < chunk size "
            f"({chunk_tokens})")
    step = chunk_tokens - overlap_tokens
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)),
                        F.lit(step))
    chunks = F.transform(starts, lambda s: F.slice(toks, s, chunk_tokens))
    return (docs
            .select(*id_cols, F.posexplode(chunks)
                    .alias("chunk_idx", "chunk_toks"))
            .select(*id_cols, "chunk_idx",
                    F.array_join("chunk_toks", " ").alias("chunk_text"),
                    F.size("chunk_toks").alias("n_chunk_tokens")))


def chunk_documents_sql(chunk_tokens: int = 32,
                        overlap_tokens: int = 8) -> str:
    """DuckDB mirror of :func:`chunk_documents` over the ``documents``
    view (doc_id, text) — same starts, same tail rule."""
    step = chunk_tokens - overlap_tokens
    return f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        starts AS (
          SELECT doc_id, t,
                 unnest(generate_series(1, greatest(len(t), 1), {step}))
                   AS s
          FROM toks)
        SELECT doc_id,
               CAST((s - 1) / {step} AS BIGINT) AS chunk_idx,
               array_to_string(t[s:s + {chunk_tokens} - 1], ' ')
                 AS chunk_text,
               CAST(len(t[s:s + {chunk_tokens} - 1]) AS INT)
                 AS n_chunk_tokens
        FROM starts
    """
