"""Structured Streaming variant of the KG-construction pipeline.

The reference is itself a streaming parser — a Node Transform that emits
quads as chunks arrive (/root/reference/lib/RdfaParser.ts:19,77-85).
Its streaming axis is *within one document*; ours is *across the
corpus*: new page files (Common-Crawl dumps land as file batches) are
discovered by ``readStream``, extracted incrementally, and appended to
the triples sink, with exactly-once progress tracked in the streaming
checkpoint — the corpus-level analogue of the reference's resumable
incremental consumption.
"""

from .pipeline import (  # noqa: F401
    PAGES_SCHEMA, extract_triples_stream, read_page_stream,
    run_extraction_stream, run_kg_maintenance_stream,
    windowed_pred_counts)
