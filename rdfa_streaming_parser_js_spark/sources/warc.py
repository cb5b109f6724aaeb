"""WARC source: distributed reader for Common Crawl's container format
(ISO 28500 / WARC 1.0).

Real 100 TB crawls arrive as WARC shards (~1 GB of concatenated
records, usually gzipped), not as a pages table — this module is the
ingestion edge that turns those shards into the pipeline's canonical
``(url, warc_ts, html)`` DataFrame, after which everything downstream
(extraction, canonicalization, dedup) is unchanged.

Physical shape: ``spark.read.format("binaryFile")`` yields one row per
shard file; an Arrow-batched ``mapInArrow`` parses records within each
shard.  That matches WARC's own granularity — gzip shards are not
byte-splittable, so the parallel unit IS the file, and a crawl has
millions of them (Common Crawl publishes ~64 000/month).  Memory per
task is bounded by one shard.  Malformed or truncated records are
skipped, never fatal — same quarantine philosophy as the extractor's
``parse_error`` column (a crawl always contains garbage).

The writer half is a driver-side helper for synthesizing test/bench
shards from a pages DataFrame at sandbox scale; production corpora are
already WARC.
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"
_WARC_DATE_SPARK_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
_CRLF2 = b"\r\n\r\n"


# --------------------------------------------------------------------------
# record building / writing (test + bench corpora)
# --------------------------------------------------------------------------

def warc_record_bytes(url: str, date_iso: str, html: bytes) -> bytes:
    """One WARC ``response`` record wrapping an HTTP/1.1 response."""
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: " + str(len(html)).encode() + b"\r\n"
            b"\r\n" + html)
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"WARC-Date: " + date_iso.encode() + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        b"\r\n")
    return headers + http + _CRLF2


def warcinfo_record_bytes(filename: str) -> bytes:
    """A ``warcinfo`` header record (readers must skip non-response
    types)."""
    body = b"software: synthetic-warc-writer\r\n"
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Filename: " + filename.encode() + b"\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n")
    return headers + body + _CRLF2


def write_warc_shards(pages: DataFrame, out_dir: str,
                      shard_size: int = 1000,
                      compress: bool = False) -> list[str]:
    """Write ``pages`` (url, warc_ts, html) as WARC shard files;
    returns the shard paths.

    Driver-side on purpose: this is the TEST/BENCH corpus synthesizer
    (sandbox scale), not a production sink — real pipelines ingest
    WARC, they don't produce it.  Rows are ordered by url so shard
    contents are deterministic."""
    os.makedirs(out_dir, exist_ok=True)
    rows = (pages.select("url", F.date_format(
        "warc_ts", _WARC_DATE_SPARK_FMT).alias("warc_date"), "html")
        .orderBy("url").collect())
    paths = []
    for shard_i in range(0, len(rows), shard_size):
        n = shard_i // shard_size
        name = f"shard-{n:05d}.warc" + (".gz" if compress else "")
        path = os.path.join(out_dir, name)
        buf = io.BytesIO()
        buf.write(warcinfo_record_bytes(name))
        for r in rows[shard_i:shard_i + shard_size]:
            h = bytes(r.html) if not isinstance(r.html, bytes) else r.html
            buf.write(warc_record_bytes(r.url, r.warc_date, h))
        data = buf.getvalue()
        if compress:
            data = gzip.compress(data, mtime=0)  # deterministic bytes
        with open(path, "wb") as f:
            f.write(data)
        paths.append(path)
    return paths


# --------------------------------------------------------------------------
# parsing
# --------------------------------------------------------------------------

def parse_warc_records(data: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Yield (url, warc_date, html_bytes) from one shard's bytes.

    Content-Length-driven (never splits on markers inside payloads);
    multi-member gzip (Common Crawl's record-per-member layout) and
    whole-file gzip both decompress via ``gzip.decompress``.  Records
    that are malformed, truncated, or not ``response`` type are
    skipped."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except OSError:
            return
    pos, n = 0, len(data)
    while pos < n:
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            return
        head = data[pos:head_end]
        if not head.startswith(b"WARC/"):
            # resync: find the next record boundary
            nxt = data.find(b"WARC/1.", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        fields = {}
        for line in head.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get(b"content-length", b""))
        except ValueError:
            pos = head_end + len(_CRLF2)
            continue
        body_start = head_end + len(_CRLF2)
        body_end = body_start + length
        if body_end > n:
            return  # truncated tail
        if fields.get(b"warc-type") == b"response":
            url = fields.get(b"warc-target-uri", b"").decode(
                "utf-8", errors="replace")
            date = fields.get(b"warc-date", b"").decode("ascii",
                                                        errors="replace")
            payload = data[body_start:body_end]
            http_end = payload.find(_CRLF2)
            html = payload[http_end + len(_CRLF2):] if http_end >= 0 \
                else payload
            if url:
                yield url, date, html
        pos = body_end
        # consume the inter-record CRLFs
        while data.startswith(b"\r\n", pos):
            pos += 2


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan → (url, warc_ts, html) pages DataFrame.

    One task per shard file (binaryFile rows), Arrow-batched record
    parsing, timestamp parsing JVM-side.  Output schema matches
    sources/pages.pages_from_documents, so
    ``extract_triples(read_warc_pages(...))`` is the full
    Common-Crawl-to-KG path."""
    import pyarrow as pa

    out_schema = pa.schema([
        pa.field("url", pa.string()),
        pa.field("warc_date", pa.string()),
        pa.field("html", pa.binary()),
    ])

    def parse_batches(batches):
        for batch in batches:
            contents = batch.column("content")
            urls, dates, htmls = [], [], []
            for i in range(len(contents)):
                data = contents[i].as_py()
                for url, date, html in parse_warc_records(data):
                    urls.append(url)
                    dates.append(date)
                    htmls.append(html)
            if urls:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(urls, pa.string()),
                     pa.array(dates, pa.string()),
                     pa.array(htmls, pa.binary())], schema=out_schema)

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*").load(path)
             .select("content"))
    raw = files.mapInArrow(parse_batches,
                           "url string, warc_date string, html binary")
    return raw.select(
        "url",
        F.to_timestamp("warc_date", _WARC_DATE_SPARK_FMT).alias("warc_ts"),
        "html")
