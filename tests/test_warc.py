"""WARC source (r9): record walking, member-gzip decompression, HTTP
payload splitting, defensive handling of malformed tails, and the
composition into the crawl front door."""

from __future__ import annotations

import gzip

from openaq_data_pipeline_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
)

HTML = b"<html><body><p>hello crawl world</p></body></html>"
HTTP = (
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/html; charset=utf-8\r\n"
    b"\r\n" + HTML
)


def _record(wtype: str, uri: str | None, payload: bytes,
            ctype: str) -> bytes:
    h = [
        b"WARC/1.0",
        b"WARC-Type: " + wtype.encode(),
        b"WARC-Record-ID: <urn:uuid:" + wtype.encode() + b"-1>",
        b"WARC-Date: 2026-08-15T00:00:00Z",
        b"Content-Type: " + ctype.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if uri:
        h.insert(3, b"WARC-Target-URI: " + uri.encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _archive() -> bytes:
    return (
        _record("warcinfo", None, b"software: test\r\n",
                "application/warc-fields")
        + _record("request", "https://a.org/x",
                  b"GET /x HTTP/1.1\r\nHost: a.org\r\n\r\n",
                  "application/http;msgtype=request")
        + _record("response", "https://a.org/x", HTTP,
                  "application/http;msgtype=response")
    )


class TestParseWarcBytes:
    def test_plain_records_and_http_split(self):
        recs = parse_warc_bytes(_archive())
        assert [r["warc_type"] for r in recs] == [
            "warcinfo", "request", "response",
        ]
        resp = recs[2]
        assert resp["target_uri"] == "https://a.org/x"
        assert resp["http_status"] == 200
        assert resp["http_content_type"] == "text/html; charset=utf-8"
        assert resp["payload"] == HTML  # HTTP headers stripped
        # the request record splits too (it IS application/http) but
        # has no status line → status stays NULL, payload intact
        assert recs[1]["http_status"] is None

    def test_member_gzip(self):
        # Common Crawl layout: each record its own gzip member
        gz = (
            gzip.compress(_record("warcinfo", None, b"software: t\r\n",
                                  "application/warc-fields"))
            + gzip.compress(_record("response", "https://a.org/y", HTTP,
                                    "application/http;msgtype=response"))
        )
        recs = parse_warc_bytes(gz)
        assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
        assert recs[1]["payload"] == HTML

    def test_malformed_tail_keeps_parsed_prefix(self):
        data = _archive() + b"WARC/1.0\r\nContent-Length: oops\r\n\r\nx"
        recs = parse_warc_bytes(data)
        assert len(recs) == 3  # the corrupt tail is dropped, not fatal

    def test_empty_and_garbage(self):
        assert parse_warc_bytes(b"") == []
        assert parse_warc_bytes(b"not a warc at all") == []


class TestReadWarc:
    def test_scan_and_front_door_composition(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.text import html_extract

        p = tmp_path / "crawl"
        p.mkdir()
        (p / "seg-0.warc").write_bytes(_archive())
        (p / "seg-1.warc.gz").write_bytes(
            gzip.compress(
                _record("response", "https://b.org/z", HTTP,
                        "application/http;msgtype=response")
            )
        )
        df = read_warc(spark, str(p))
        rows = {
            (r.warc_type, r.target_uri): r for r in df.collect()
        }
        assert len(rows) == 4
        pages = (
            df.where("warc_type = 'response' AND http_status = 200")
            .select(
                F.col("target_uri").alias("url"),
                html_extract(F.decode("payload", "utf-8")).alias("text"),
            )
        )
        got = {r.url: r.text for r in pages.collect()}
        assert got == {
            "https://a.org/x": "hello crawl world",
            "https://b.org/z": "hello crawl world",
        }
