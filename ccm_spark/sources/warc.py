"""WARC crawl-container source — the stage BEFORE ``html.extract_text``.

The reference has no file-format surface (it consumes in-memory lists,
lib/ccm.ex:26); this is extension surface for the training-data
pipeline: real pretraining corpora start as web crawls shipped in WARC
containers (ISO 28500 — the Common Crawl interchange format), and the
r7 HTML extraction stage needs something to feed it. This module turns
a directory of ``.warc`` / ``.warc.gz`` shards into the relations the
rest of the pipeline consumes:

    warc shards --read_warc--> records --warc_html_documents--> documents
                                                (html.extract_text)

100 TB design:
  - **File-level parallelism is the unit of work.** Production crawls
    ship as many ~1 GB shards, each record individually gzipped and
    concatenated (so the file is NOT splittable — the gzip members are
    the record boundaries). One Spark task parses one shard; a
    1000-executor cluster chews a 100 TB crawl as ~100k independent
    tasks with zero shuffle and zero driver involvement. This is
    exactly how Common Crawl is processed in practice.
  - **One narrow Arrow pass.** ``spark.read.format("binaryFile")``
    yields (path, content) rows; ``mapInPandas`` parses records and
    emits one output frame per shard. No shuffle anywhere — the plan
    is scan → parse → (downstream codegen projection).
  - **Memory bound = one shard, not one corpus.** A task holds one
    shard's bytes (plus its decompressed records) at a time; keep
    shards at the standard ~1 GB and executor memory is flat. The
    parser streams gzip members through one ``zlib`` decompress object
    rather than materialising a second whole-file copy eagerly.
  - **Malformed input degrades, never crashes.** Framing errors stop
    the parse of THAT shard at the last well-formed record (partial
    crawl shards — truncated uploads — are routine at crawl scale);
    everything already parsed is still emitted, and the skipped-bytes
    count is reported per shard in the trailing ``resync`` record.

Honest limits (documented, not hidden): payload text decoding is
UTF-8-with-replacement (charset sniffing from HTTP headers / meta tags
trades correctness on a long tail of legacy encodings for a second
parse pass; mojibake from the few non-UTF-8 pages is exactly what
``text.mojibake_signals`` downstream is for), and chunked
transfer-encoding bodies are passed through un-dechunked (Common Crawl
stores payloads already de-chunked; the chunk framing, if present,
survives as noise that the quality filter prices in).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..pipeline.html import strip_html

#: one row per WARC record (+ one `resync` row per shard that had
#: unparseable bytes, so data loss is observable, not silent).
WARC_RECORDS_SCHEMA = (
    "warc_file string, record_offset long, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, http_status int, http_content_type string, "
    "payload binary, payload_len long"
)

_GZIP_MAGIC = b"\x1f\x8b"
_MAX_HEADER_BYTES = 64 * 1024  # a sane WARC/HTTP header block bound


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the per-record-gzip
    layout of production ``.warc.gz`` shards). Trailing garbage after
    the last complete member is dropped, mirroring gzip tooling."""
    out = []
    while data[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=47)
        try:
            out.append(d.decompress(data))
        except zlib.error:
            break
        if not d.eof:  # truncated final member
            break
        data = d.unused_data
    return b"".join(out)


def _parse_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an ``application/http`` payload into (status, content-type,
    body). Returns (None, None, payload) when it doesn't look like HTTP."""
    head_end = payload.find(b"\r\n\r\n", 0, _MAX_HEADER_BYTES)
    if head_end < 0:
        return None, None, payload
    head = payload[:head_end]
    body = payload[head_end + 4 :]
    lines = head.split(b"\r\n")
    first = lines[0].split(None, 2)
    if len(first) < 2 or not first[0].startswith(b"HTTP/"):
        return None, None, payload
    try:
        status = int(first[1])
    except ValueError:
        return None, None, payload
    ctype = None
    for ln in lines[1:]:
        k, sep, v = ln.partition(b":")
        if sep and k.strip().lower() == b"content-type":
            ctype = v.strip().decode("ascii", errors="replace").lower()
            break
    return status, ctype, body


def _parse_warc_shard(path: str, data: bytes) -> Iterator[dict]:
    """Parse one shard's bytes into record dicts. Framing damage skips
    forward to the next ``WARC/`` magic (resync) instead of aborting;
    skipped byte counts are emitted as a trailing ``resync`` row."""
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    skipped = 0

    def _resync(p: int) -> int:
        nxt = data.find(b"WARC/", p + 1)
        return nxt if nxt >= 0 else n

    while pos < n:
        if not data.startswith(b"WARC/", pos):
            nxt = _resync(pos)
            skipped += nxt - pos
            pos = nxt
            continue
        head_end = data.find(b"\r\n\r\n", pos, pos + _MAX_HEADER_BYTES)
        if head_end < 0:
            skipped += n - pos
            break
        headers: dict[str, str] = {}
        for ln in data[pos:head_end].split(b"\r\n")[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            nxt = _resync(pos)
            skipped += nxt - pos
            pos = nxt
            continue
        if clen < 0:
            # int() accepts '-N'; a negative length would move pos
            # BACKWARDS past this record's own 'WARC/' magic, so the
            # next _resync would re-find the same record forever —
            # an unbounded-yield executor hang from one malformed
            # header. Treat it as a framing error and resync FORWARD
            # (_resync searches from pos + 1, so progress is strictly
            # monotonic).
            nxt = _resync(pos)
            skipped += nxt - pos
            pos = nxt
            continue
        body_start = head_end + 4
        if body_start + clen > n:  # truncated shard: stop at last whole record
            skipped += n - pos
            break
        payload = data[body_start : body_start + clen]
        ctype = headers.get("content-type", "")
        status, http_ctype, http_body = (None, None, payload)
        if ctype.startswith("application/http"):
            status, http_ctype, http_body = _parse_http_payload(payload)
        yield {
            "warc_file": path,
            "record_offset": pos,
            "warc_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": ctype,
            "http_status": status,
            "http_content_type": http_ctype,
            "payload": http_body,
            "payload_len": len(http_body),
        }
        # past payload + record separator (tolerate a missing one)
        pos = body_start + clen
        if data.startswith(b"\r\n\r\n", pos):
            pos += 4
    if skipped:
        yield {
            "warc_file": path,
            "record_offset": -1,
            "warc_type": "resync",
            "record_id": "",
            "target_uri": None,
            "warc_date": None,
            "content_type": "",
            "http_status": None,
            "http_content_type": None,
            "payload": None,
            "payload_len": skipped,
        }


def _parse_mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        # one output frame per shard bounds task memory to one
        # shard's records, never the whole input batch's
        for p, content in zip(pdf["path"], pdf["content"]):
            rows = list(_parse_warc_shard(p, bytes(content)))
            if rows:
                yield pd.DataFrame(rows)


def read_warc(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """One row per WARC record across every shard under ``path``.

    Plan: binaryFile scan → mapInPandas parse. No shuffle; parallelism =
    shard count (the production unit — per-record-gzip shards are not
    splittable, so tasks-per-file would buy nothing)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_mapper, schema=WARC_RECORDS_SCHEMA)


def parse_warc_shards(shards: DataFrame) -> DataFrame:
    """Parse an already-materialised ``(path string, content binary)``
    relation with the SAME kernel :func:`read_warc` runs on binaryFile
    scans — for shard bytes that arrive through another relation (a
    fetcher's output table, a synthetic fixture) instead of a
    directory. One mapInPandas pass, no shuffle; the gated
    ``warc_extract`` query drives this against a documents-derived
    fixture so the record parser itself holds a CORRECTNESS row."""
    return shards.select("path", "content").mapInPandas(
        _parse_mapper, schema=WARC_RECORDS_SCHEMA
    )


def warc_records_stream(
    spark: SparkSession, path: str, glob: str = "*.warc*"
) -> DataFrame:
    """Streaming twin of :func:`read_warc`: new shards landing under
    ``path`` are parsed as they arrive (continuous crawl ingestion —
    the fetcher drops finished shards into the directory and the
    pipeline tails it). Same kernel, same schema, stateless — and
    :func:`warc_html_documents` is a narrow projection, so the whole
    shard → documents chain runs unchanged in append mode
    (stream == batch pinned in tests/test_warc.py)."""
    files = (
        spark.readStream.format("binaryFile")
        # streaming sources need the schema up front (no inference pass);
        # this is binaryFile's fixed schema
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_mapper, schema=WARC_RECORDS_SCHEMA)


def warc_html_documents(
    records: DataFrame, min_chars: int = 1, max_status: int = 299
) -> DataFrame:
    """Crawl records → the pipeline's ``documents`` shape: keep 2xx HTML
    responses, UTF-8-decode, run the r7 markup extraction, and mint a
    deterministic doc_id from (record_id, uri) so re-parses are stable.

    Everything after the parse is codegen (decode + regex chain + hash)
    — one narrow projection, streaming-safe."""
    kept = records.filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(200, max_status)
        & F.col("http_content_type").startswith("text/html")
    )
    html = F.decode(F.col("payload"), "UTF-8").alias("html")
    out = kept.select(
        F.xxhash64("record_id", "target_uri").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date"),
        strip_html(html).alias("text"),
    )
    return out.withColumn("n_chars", F.length("text")).filter(
        F.col("n_chars") >= F.lit(min_chars)
    )
