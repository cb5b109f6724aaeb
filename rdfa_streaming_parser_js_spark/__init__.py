"""PySpark-native knowledge-graph construction engine.

Re-implements the query/data-processing capabilities of
rubensworks/rdfa-streaming-parser.js (reference at /root/reference) as a
Spark-first pipeline:

- ``kernel``     — pure-Python RDFa Core 1.1 + HTML5 extraction kernel
                   (semantic port of the reference's evaluation-context
                   machine; no Spark dependency, unit-testable standalone).
- ``operators``  — distributed DataFrame operators: vectorized triple
                   extraction (mapInArrow), canonicalization/skolemization,
                   graph materialization with dedup + skew salting, entity
                   linking, document dedup (exact/MinHash-LSH/SimHash),
                   embedding similarity search.
- ``sources``    — synthetic Common-Crawl-style pages generator + parquet
                   table loaders.
- ``functions``  — text analysis (lang-id, quality, tokens, fingerprints)
                   and multimodal column plumbing.
- ``plans``      — end-to-end pipeline wiring, per-partition lineage and
                   checkpoint/resume.
- ``streaming``  — Structured Streaming variant of the extraction stage.
"""

__version__ = "0.1.0"
