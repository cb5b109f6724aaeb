"""Vectorized RDFa triple extraction over a pages DataFrame.

The reference is a per-document Node Transform stream
(/root/reference/lib/RdfaParser.ts:19,77-85).  Here the distributed scan
IS the source: we run the pure-Python kernel once per row inside
``mapInArrow`` — Arrow batches in/out, no per-row Python UDF round-trips
(BASELINE.json input_hint mandate).  One input page row fans out to N
triple rows, emitted directly as Arrow arrays.

Scale notes (100 TB / 10^12 pages):
- the stage is map-only: no shuffle, linear in input, embarrassingly
  parallel across pages; Spark schedules one task per input split.
- only (url, html, lang) are shipped to Python — callers keep the scan
  column-pruned so parquet never materializes unused columns.
- blank-node labels are minted by a deterministic per-document counter
  (kernel) then skolemized as ``_:sha256(url || '|' || label)`` so output
  is identical at any parallelism / retry — a global counter like the
  reference's (/root/reference/lib/Util.ts:219-224) would not be.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from ..kernel import parse_rdfa
from ..kernel.terms import BlankNode, Literal, NamedNode

TRIPLES_SCHEMA = (
    "url string, subj string, subj_kind string, pred string, "
    "obj_value string, obj_kind string, obj_datatype string, "
    "obj_lang string"
)

_TEXT_SCHEMA = "url string, text string"

_OUT_FIELDS = ("url", "subj", "subj_kind", "pred", "obj_value", "obj_kind",
               "obj_datatype", "obj_lang")

# Emit output batches around this many triple rows to bound memory.
_OUT_BATCH_ROWS = 8192


def _skolem(url: str, label: str) -> str:
    return "_:" + hashlib.sha256(f"{url}|{label}".encode()).hexdigest()


def _term_cols(term, url: str, skolemize: bool):
    """Flatten one RDF term → (value, kind, datatype, lang)."""
    if isinstance(term, NamedNode):
        return term.value, "iri", None, None
    if isinstance(term, BlankNode):
        value = _skolem(url, term.value) if skolemize else term.value
        return value, "bnode", None, None
    lit: Literal = term
    return (lit.value, "literal",
            lit.datatype.value if lit.datatype else None, lit.language)


def extract_triples(pages: DataFrame, profile: str = "html",
                    skolemize: bool = True, url_col: str = "url",
                    html_col: str = "html",
                    lang_col: str | None = "lang",
                    content_type_col: str | None = None,
                    passthrough: tuple[str, ...] = (),
                    vocab: str | None = None,
                    default_graph: str | None = None) -> DataFrame:
    """pages(url, html[, lang]) → triples DataFrame (TRIPLES_SCHEMA).

    ``passthrough`` columns (e.g. ``warc_ts`` for the streaming pipeline's
    event-time watermark) are carried through unchanged, repeated on every
    triple of their page — avoiding a post-extraction join back to pages.

    ``content_type_col`` routes each row to its RDFa profile by MIME type
    (text/html → html, application/xhtml+xml → xhtml, image/svg+xml /
    application/xml / text/xml → xml), mirroring the reference's
    contentType option (/root/reference/lib/RdfaProfile.ts:150-161); rows
    with an unmapped/missing content type fall back to ``profile``.

    ``vocab`` seeds the root evaluation context's default vocabulary,
    mirroring the reference's ``vocab`` option
    (/root/reference/lib/RdfaParser.ts:936-939).

    ``default_graph`` mirrors the reference's quad graph term
    (/root/reference/lib/RdfaParser.ts:37,803-811): the parser emits
    quads in one constant graph per run, so the columnar equivalent is
    a constant ``graph`` column appended to the output (omitted — the
    triple default — when None, leaving existing consumers unchanged).
    """
    cols = [url_col, html_col] + ([lang_col] if lang_col else [])
    if content_type_col:
        cols.append(content_type_col)
    n_base = len(cols)
    pruned = pages.select(*cols, *passthrough)
    dtypes = dict(pruned.dtypes)
    schema = TRIPLES_SCHEMA + "".join(
        f", {c} {dtypes[c]}" for c in passthrough)
    out_names = list(_OUT_FIELDS) + list(passthrough)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        buf: list[list] = [[] for _ in out_names]
        pass_types: list[pa.DataType] = []

        def flush():
            arrays = [pa.array(col, type=pa.string())
                      for col in buf[:len(_OUT_FIELDS)]]
            arrays += [pa.array(col, type=t) for col, t in
                       zip(buf[len(_OUT_FIELDS):], pass_types)]
            for col in buf:
                col.clear()
            return pa.RecordBatch.from_arrays(arrays, names=out_names)

        for batch in batches:
            if not pass_types:
                pass_types.extend(
                    batch.schema.field(n_base + i).type
                    for i in range(len(passthrough)))
            urls = batch.column(0).to_pylist()
            htmls = batch.column(1).to_pylist()
            langs = (batch.column(2).to_pylist() if lang_col
                     else [None] * len(urls))
            ctypes = (batch.column(n_base - 1).to_pylist()
                      if content_type_col else [None] * len(urls))
            extra = [batch.column(n_base + i).to_pylist()
                     for i in range(len(passthrough))]
            for i, (url, html, lang) in enumerate(zip(urls, htmls, langs)):
                try:
                    extractor = parse_rdfa(html or b"", base_iri=url or "",
                                           profile=profile,
                                           content_type=ctypes[i],
                                           language=lang or None,
                                           vocab=vocab)
                except Exception:
                    # Hard kernel failure on an adversarial page (e.g.
                    # mutually-cyclic rdfa:copy patterns exhaust the
                    # replay stack — the reference's JS throws the same
                    # way): quarantine the page (zero triples) instead
                    # of failing the task; per-page error visibility is
                    # extract_page_stats' job.  Soft errors (malformed
                    # markup) never reach here — the drivers record
                    # them on parse_error and keep partial triples.
                    continue
                for s, p, o in extractor.triples:
                    sv, sk, _, _ = _term_cols(s, url, skolemize)
                    ov, ok, odt, olang = _term_cols(o, url, skolemize)
                    row = (url, sv, sk, p.value, ov, ok, odt, olang,
                           *(col[i] for col in extra))
                    for col, v in zip(buf, row):
                        col.append(v)
                if len(buf[0]) >= _OUT_BATCH_ROWS:
                    yield flush()
        if buf[0]:
            if not pass_types:
                pass_types.extend(pa.string() for _ in passthrough)
            yield flush()

    out = pruned.mapInArrow(run, schema)
    if default_graph is not None:
        from pyspark.sql import functions as F
        out = out.withColumn("graph", F.lit(default_graph))
    return out


_STATS_SCHEMA = ("url string, n_triples long, text_chars long, "
                 "parse_error string")


def extract_page_stats(pages: DataFrame, profile: str = "html",
                       url_col: str = "url", html_col: str = "html",
                       lang_col: str | None = "lang") -> DataFrame:
    """Per-page diagnostics: triple count, extracted-text length, and the
    recoverable parse error if any (kernel ``parse_error``, the
    per-document analogue of the reference's stream 'error' event).  At
    corpus scale this is the quarantine/monitoring table — broken pages
    are rows here, never task failures."""
    cols = [url_col, html_col] + ([lang_col] if lang_col else [])
    pruned = pages.select(*cols)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column(0).to_pylist()
            htmls = batch.column(1).to_pylist()
            langs = (batch.column(2).to_pylist() if lang_col
                     else [None] * len(urls))
            n_triples, text_chars, errors = [], [], []
            for url, html, lang in zip(urls, htmls, langs):
                try:
                    ex = parse_rdfa(html or b"", base_iri=url or "",
                                    profile=profile, language=lang or None)
                except Exception as e:  # hard kernel failure: a row,
                    n_triples.append(0)  # never a task failure
                    text_chars.append(0)
                    errors.append(f"{type(e).__name__}: {e}"[:500])
                    continue
                n_triples.append(len(ex.triples))
                text_chars.append(len(ex.extracted_text()))
                errors.append(ex.parse_error)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, type=pa.string()),
                 pa.array(n_triples, type=pa.int64()),
                 pa.array(text_chars, type=pa.int64()),
                 pa.array(errors, type=pa.string())],
                names=["url", "n_triples", "text_chars", "parse_error"])

    return pruned.mapInArrow(run, _STATS_SCHEMA)


def extract_page_text(pages: DataFrame, profile: str = "html",
                      url_col: str = "url", html_col: str = "html",
                      lang_col: str | None = "lang") -> DataFrame:
    """pages → (url, text) where text is the reference-semantics extracted
    text (the byte-identical-text invariant;
    /root/reference/lib/RdfaParser.ts:592-610,657)."""
    cols = [url_col, html_col] + ([lang_col] if lang_col else [])
    pruned = pages.select(*cols)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column(0).to_pylist()
            htmls = batch.column(1).to_pylist()
            langs = (batch.column(2).to_pylist() if batch.num_columns > 2
                     else [None] * len(urls))
            texts = []
            for url, html, lang in zip(urls, htmls, langs):
                try:
                    extractor = parse_rdfa(html or b"", base_iri=url or "",
                                           profile=profile,
                                           language=lang or None)
                    texts.append(extractor.extracted_text())
                except Exception:  # hard kernel failure: empty text,
                    texts.append("")  # never a task failure

            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, type=pa.string()),
                 pa.array(texts, type=pa.string())],
                names=["url", "text"])

    return pruned.mapInArrow(run, _TEXT_SCHEMA)
