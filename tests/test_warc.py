"""WARC crawl-container source (extension surface — the reference has no
file-format layer, lib/ccm.ex:26 consumes in-memory lists).

Pins: record framing (plain and per-record-gzip shards parse to the SAME
relation), HTTP payload split, truncation/garbage resync accounting, the
records → documents composition through the r7 HTML extraction, and the
no-shuffle plan shape."""

from __future__ import annotations

import gzip

import pyspark.sql.functions as F
import pytest

from ccm_spark.pipeline.html import strip_html
from ccm_spark.sources.warc import read_warc, warc_html_documents

HTML_A = (
    b"<html><head><title>T</title><style>p{}</style></head>"
    b"<body><script>var x=1;</script><p>Fish &amp; chips</p>"
    b"<p>second&nbsp;para</p></body></html>"
)
HTML_B = b"<html><body><h1>Other</h1>page two</body></html>"


def _http(status: int, ctype: str, body: bytes) -> bytes:
    head = (
        f"HTTP/1.1 {status} X\r\nServer: t\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode() + body


def _rec(wtype: str, rid: str, uri: str | None, payload: bytes, ctype: str) -> bytes:
    heads = [
        "WARC/1.0",
        f"WARC-Type: {wtype}",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        "WARC-Date: 2026-01-02T03:04:05Z",
        f"Content-Type: {ctype}",
        f"Content-Length: {len(payload)}",
    ]
    if uri is not None:
        heads.insert(3, f"WARC-Target-URI: {uri}")
    return "\r\n".join(heads).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _shard_records() -> list[bytes]:
    return [
        _rec("warcinfo", "info1", None, b"robots: obey\r\n", "application/warc-fields"),
        _rec(
            "request",
            "req1",
            "http://ex.com/a",
            b"GET /a HTTP/1.1\r\nHost: ex.com\r\n\r\n",
            "application/http;msgtype=request",
        ),
        _rec(
            "response",
            "resp1",
            "http://ex.com/a",
            _http(200, "text/html; charset=UTF-8", HTML_A),
            "application/http;msgtype=response",
        ),
        _rec(
            "response",
            "resp2",
            "http://ex.com/b.pdf",
            _http(200, "application/pdf", b"%PDF-1.4 xxxx"),
            "application/http;msgtype=response",
        ),
        _rec(
            "response",
            "resp3",
            "http://ex.com/gone",
            _http(404, "text/html", b"<html>nope</html>"),
            "application/http;msgtype=response",
        ),
        _rec(
            "response",
            "resp4",
            "http://ex.com/c",
            _http(200, "text/html", HTML_B),
            "application/http;msgtype=response",
        ),
    ]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    recs = _shard_records()
    (d / "shard0.warc").write_bytes(b"".join(recs))
    # production layout: each record its own gzip member, concatenated
    (d / "shard1.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in recs))
    return str(d)


def test_plain_and_gzip_shards_parse_identically(spark, warc_dir):
    recs = read_warc(spark, warc_dir).collect()
    by_file = {}
    for r in recs:
        by_file.setdefault(r.warc_file.rsplit("/", 1)[-1], []).append(r)
    plain = sorted(by_file["shard0.warc"], key=lambda r: r.record_offset)
    gz = sorted(by_file["shard1.warc.gz"], key=lambda r: r.record_offset)
    assert len(plain) == len(gz) == 6
    for p, g in zip(plain, gz):
        # gzip members decompress to the same byte stream -> same offsets
        assert (p.record_offset, p.warc_type, p.record_id, p.target_uri) == (
            g.record_offset,
            g.warc_type,
            g.record_id,
            g.target_uri,
        )
        assert p.payload == g.payload

    r3 = next(r for r in plain if r.record_id == "<urn:uuid:resp1>")
    assert r3.warc_type == "response"
    assert r3.http_status == 200
    assert r3.http_content_type == "text/html; charset=utf-8"
    assert r3.payload == HTML_A  # HTTP head split off
    assert r3.payload_len == len(HTML_A)
    assert r3.warc_date == "2026-01-02T03:04:05Z"
    info = next(r for r in plain if r.warc_type == "warcinfo")
    assert info.http_status is None and info.payload == b"robots: obey\r\n"


def test_truncated_and_garbage_shards_resync(spark, tmp_path):
    recs = _shard_records()
    whole = b"".join(recs[:3])
    # garbage prefix + truncated final record
    (tmp_path / "bad.warc").write_bytes(b"JUNKJUNK" + whole[: len(whole) - 40])
    got = read_warc(spark, str(tmp_path)).collect()
    parsed = [r for r in got if r.warc_type != "resync"]
    resync = [r for r in got if r.warc_type == "resync"]
    # first two records survive; the truncated third is dropped, not crashed
    assert [r.record_id for r in parsed] == ["<urn:uuid:info1>", "<urn:uuid:req1>"]
    assert len(resync) == 1
    assert resync[0].payload_len == 8 + (len(recs[2]) - 40)  # every lost byte counted


def test_negative_content_length_resyncs_forward(spark, tmp_path):
    """int() accepts '-N': a negative Content-Length used to move the
    cursor BACKWARDS, re-finding the same record's magic forever — an
    unbounded-yield executor hang from one attacker-controlled header.
    It must be treated as a framing error that resyncs strictly
    forward, with the healthy following record still parsed."""
    recs = _shard_records()
    payload_len = len(recs[1]) - recs[1].index(b"\r\n\r\n") - 4 - 4  # two seps
    bad = recs[1].replace(
        f"Content-Length: {payload_len}".encode(), b"Content-Length: -9999"
    )
    assert bad != recs[1]  # the header really was rewritten
    (tmp_path / "neg.warc").write_bytes(recs[0] + bad + recs[2])
    got = read_warc(spark, str(tmp_path)).collect()
    parsed = [r for r in got if r.warc_type != "resync"]
    resync = [r for r in got if r.warc_type == "resync"]
    # the poisoned record is skipped; its neighbors both survive
    assert [r.record_id for r in parsed] == ["<urn:uuid:info1>", "<urn:uuid:resp1>"]
    assert len(resync) == 1 and resync[0].payload_len > 0


def test_warc_html_documents_composes_with_extraction(spark, warc_dir):
    docs = warc_html_documents(read_warc(spark, warc_dir)).collect()
    # 2 shards x 2 OK html pages; pdf and 404 excluded
    assert len(docs) == 4
    assert {d.url for d in docs} == {"http://ex.com/a", "http://ex.com/c"}
    expect = {
        row.url: row.text
        for row in spark.createDataFrame(
            [("http://ex.com/a", HTML_A.decode()), ("http://ex.com/c", HTML_B.decode())],
            "url string, html string",
        )
        .select("url", strip_html(F.col("html")).alias("text"))
        .collect()
    }
    for d in docs:
        assert d.text == expect[d.url]
        assert d.n_chars == len(d.text)
    a = next(d for d in docs if d.url == "http://ex.com/a")
    assert "Fish & chips" in a.text and "var x=1" not in a.text
    # doc_id deterministic across shards: same (record_id, uri) -> same id
    ids = sorted(d.doc_id for d in docs)
    assert ids[0] == ids[1] and ids[2] == ids[3]


def test_warc_plan_is_shuffle_free(spark, warc_dir):
    plan = (
        warc_html_documents(read_warc(spark, warc_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # scan -> parse -> codegen projection


def test_warc_stream_equals_batch(spark, warc_dir, tmp_path):
    """The shard -> documents chain is stateless + narrow, so streaming
    ingestion of the same shards must produce the identical relation."""
    from ccm_spark.sources.warc import warc_records_stream

    batch = {
        r.doc_id: (r.url, r.text, r.n_chars)
        for r in warc_html_documents(read_warc(spark, warc_dir)).collect()
    }
    q = (
        warc_html_documents(warc_records_stream(spark, warc_dir))
        .writeStream.format("memory")
        .queryName("warc_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_warc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.url, r.text, r.n_chars)
        for r in spark.sql("select * from warc_stream").collect()
    }
    # both shards carry the same pages -> 2 distinct doc_ids
    assert got == batch and len(got) == 2
