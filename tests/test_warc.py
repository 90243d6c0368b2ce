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


class TestCrawlIntakeEndToEnd:
    """The full r9 acquisition path composed: WARC archives → response
    records → URL-ledger dedup (canonical spellings) → robots gate
    (wildcard rules) → content-density extraction (boilerplate dies)
    → Gopher structural gate → exact-dedup against crawl history.
    Every stage is an already-tested operator; this pins that the r9
    additions COMPOSE end-to-end."""

    def test_pipeline(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.frontier import (
            apply_robots,
            parse_robots,
            url_ledger_gate,
        )
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            incremental_exact_dedup,
            temp_exact_index,
        )
        from openaq_data_pipeline_spark.operators.text import (
            gopher_rules,
            html_extract_density,
        )

        art = (
            "<p>the quick brown fox jumps over the lazy dog and then "
            "the calm river flows through the old valley and the town "
            "while the people of the village act with reason and care "
            "in a spirit of brotherhood for all of the free world and "
            "every autumn the water slows while the village measures "
            "the change with the same brass gauge it has used for "
            "eighty years of quiet work</p>"
        )
        art2 = art.replace("quick", "swift")
        boiler = (
            '<nav><a href="/">Home</a> <a href="/n">News</a> '
            '<a href="/a">About</a></nav>'
        )

        def page(body):
            return (
                "<html><head><title>t</title></head><body>"
                + boiler + "<article>" + body + "</article>"
                + '<footer><a href="/p">Privacy</a> <a href="/t">Terms</a>'
                "</footer></body></html>"
            ).encode()

        def http(body: bytes) -> bytes:
            return (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            )

        resp = lambda uri, body: _record(  # noqa: E731
            "response", uri, http(page(body)),
            "application/http;msgtype=response",
        )
        p = tmp_path / "crawl"
        p.mkdir()
        (p / "seg.warc").write_bytes(
            resp("https://A.org/x?utm_source=tw", art)   # 1: survives
            + resp("https://a.org:443/x", art)           # 2: URL dup of 1
            + resp("https://a.org/private/y", art2)      # 3: robots-blocked
            + resp("https://a.org/tiny", "<p>tiny</p>")  # 4: gopher reject
            + resp("https://a.org/again", art)           # 5: content dup of 1
        )
        pages = (
            read_warc(spark, str(p))
            .where("warc_type = 'response' AND http_status = 200")
            .select(
                F.monotonically_increasing_id().alias("page_id"),
                F.col("target_uri").alias("url"),
                F.decode("payload", "utf-8").alias("html"),
            )
        )
        robots = spark.createDataFrame(
            [("a.org", "User-agent: *\nDisallow: /priv*/")],
            "host string, content string",
        )
        with temp_exact_index(n_buckets=4) as ledger, temp_exact_index(
            n_buckets=4
        ) as hist:
            # 1. URL ledger: spelling variants collapse
            led = url_ledger_gate(pages, "url", "page_id", ledger)
            fetchable = pages.join(
                led.where("kept").select("page_id"), "page_id"
            )
            # 2. robots gate (wildcard rule must fire on /private/)
            verdicts = apply_robots(
                fetchable, "url", "page_id", parse_robots(robots, "host", "content")
            )
            fetched = fetchable.join(
                verdicts.where("allowed").select("page_id"), "page_id"
            )
            # 3. density extraction: boilerplate dies with the nav
            texts = html_extract_density(fetched, "html").select(
                "page_id", "url", "text"
            )
            assert all(
                "Home" not in r.text and "Privacy" not in r.text
                for r in texts.collect()
            )
            # 4. structural quality gate
            keep = gopher_rules(texts, "text", "page_id").where("keep")
            gated = texts.join(keep.select("page_id"), "page_id")
            # 5. exact dedup against (empty) crawl history
            build_exact_index(
                gated.limit(0).select("page_id", "text"),
                "text", "page_id", hist,
            )
            disp = incremental_exact_dedup(
                gated.select("page_id", "text"), "text", "page_id", hist
            )
            survivors = {
                r.url
                for r in gated.join(
                    disp.where("kept").select("page_id"), "page_id"
                ).collect()
            }
        assert survivors == {"https://A.org/x?utm_source=tw"}
        # 6. (r10) targeted re-extraction through the CDX record
        # index — the retraction-audit shape: re-read ONLY the
        # survivor's record by (file, offset, length), one ranged
        # read, no full-archive decode
        from openaq_data_pipeline_spark.sources.warc import (
            build_warc_cdx,
            read_warc_records,
        )

        cdx = build_warc_cdx(spark, str(p))
        rec = read_warc_records(
            spark, cdx.where("target_uri = 'https://A.org/x?utm_source=tw'")
        )
        re_extracted = html_extract_density(
            rec.select(F.decode("payload", "utf-8").alias("html")), "html"
        ).collect()
        assert len(re_extracted) == 1
        assert "quick brown fox" in re_extracted[0].text
        assert "Home" not in re_extracted[0].text


class TestWarcCorruptMember:
    def test_corrupt_member_loses_only_itself(self):
        """One flipped bit costs ONE record: the walk resyncs at the
        next gzip magic, so members BEFORE and AFTER the corrupt one
        both survive (r9 review finding — a break would silently drop
        the archive's whole tail)."""
        good1 = gzip.compress(
            _record("response", "https://a.org/ok", HTTP,
                    "application/http;msgtype=response")
        )
        bad = bytearray(
            gzip.compress(
                _record("response", "https://a.org/bad", HTTP,
                        "application/http;msgtype=response")
            )
        )
        bad[len(bad) // 2] ^= 0xFF  # flip a bit mid-member
        good2 = gzip.compress(
            _record("response", "https://a.org/after", HTTP,
                    "application/http;msgtype=response")
        )
        recs = parse_warc_bytes(good1 + bytes(bad) + good2)
        assert [r["target_uri"] for r in recs] == [
            "https://a.org/ok", "https://a.org/after",
        ]

    def test_corrupt_file_does_not_abort_scan(self, spark, tmp_path):
        p = tmp_path / "crawl"
        p.mkdir()
        (p / "good.warc").write_bytes(_archive())
        corrupt = bytearray(gzip.compress(_archive()))
        corrupt[30] ^= 0xFF
        (p / "bad.warc.gz").write_bytes(bytes(corrupt))
        df = read_warc(spark, str(p))
        # the good archive's 3 records survive; the corrupt file
        # degrades instead of failing the job
        assert df.count() >= 3


class TestWarcCdx:
    """r10 (VERDICT r9 #8): the CDX-style record index + targeted
    probe — one ranged read + one member decode per addressed
    record, never a full-archive decompression."""

    def _members(self):
        """Three independently-gzipped members (the CC layout)."""
        recs = [
            _record("response", f"https://a.org/p{i}",
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + f"<p>page {i}</p>".encode(),
                    "application/http;msgtype=response")
            for i in range(3)
        ]
        return recs, b"".join(gzip.compress(r) for r in recs)

    def test_cdx_addresses_and_probe_round_trip(self, spark, tmp_path):
        from openaq_data_pipeline_spark.sources.warc import (
            build_warc_cdx,
            read_warc_records,
        )

        _, gz = self._members()
        p = tmp_path / "a.warc.gz"
        p.write_bytes(gz)
        cdx = build_warc_cdx(spark, str(p))
        rows = sorted(cdx.collect(), key=lambda r: r.offset)
        assert [r.target_uri for r in rows] == [
            f"https://a.org/p{i}" for i in range(3)
        ]
        # spans tile the compressed archive exactly
        assert rows[0].offset == 0
        for a, b in zip(rows, rows[1:]):
            assert a.offset + a.length == b.offset
        assert rows[-1].offset + rows[-1].length == len(gz)
        # probe the middle record: identical to the full scan's row
        full = {
            r.target_uri: r.payload
            for r in read_warc(spark, str(p)).collect()
        }
        probe = read_warc_records(
            spark, cdx.where("target_uri = 'https://a.org/p1'")
        ).collect()
        assert len(probe) == 1
        assert probe[0].target_uri == "https://a.org/p1"
        assert bytes(probe[0].payload) == bytes(
            full["https://a.org/p1"]
        )

    def test_probe_never_touches_other_members(self, spark, tmp_path):
        """The hard proof of 'no full decode': corrupt every byte of
        the OTHER members on disk — the addressed record still comes
        back exactly."""
        from openaq_data_pipeline_spark.sources.warc import (
            build_warc_cdx,
            read_warc_records,
        )

        _, gz = self._members()
        p = tmp_path / "a.warc.gz"
        p.write_bytes(gz)
        # materialize the index while the archive is healthy — the
        # production shape: CDX persisted at crawl time, probed later
        target = build_warc_cdx(spark, str(p)).where(
            "target_uri = 'https://a.org/p1'"
        ).collect()[0]
        index_df = spark.createDataFrame(
            [(target.warc_file, target.offset, target.length)],
            "warc_file string, offset long, length long",
        )
        want = read_warc_records(spark, index_df).collect()[0]
        # trash everything outside the addressed span
        mut = bytearray(gz)
        for i in range(len(mut)):
            if not (target.offset <= i < target.offset + target.length):
                mut[i] ^= 0xFF
        p.write_bytes(bytes(mut))
        got = read_warc_records(spark, index_df).collect()
        assert len(got) == 1
        assert bytes(got[0].payload) == bytes(want.payload)

    def test_uncompressed_archive_spans(self, spark, tmp_path):
        from openaq_data_pipeline_spark.sources.warc import (
            build_warc_cdx,
            read_warc_records,
        )

        p = tmp_path / "a.warc"
        p.write_bytes(_archive())
        cdx = build_warc_cdx(spark, str(p))
        got = read_warc_records(
            spark, cdx.where("warc_type = 'response'")
        ).collect()
        assert len(got) == 1
        assert bytes(got[0].payload) == HTML


class TestScanMemoryShape:
    """ADVICE r9: per-task memory must be bounded by one decompressed
    member + one pandas chunk, not the whole decompressed stream."""

    def test_member_walk_is_a_generator(self):
        import inspect

        from openaq_data_pipeline_spark.sources import warc

        assert inspect.isgeneratorfunction(warc._iter_gzip_members)
        assert inspect.isgeneratorfunction(warc._parse_plain_records)

    def test_scan_frames_chunk_bound(self):
        from openaq_data_pipeline_spark.sources.warc import (
            _scan_frames,
            parse_warc_bytes,
        )

        recs = b"".join(
            gzip.compress(
                _record("response", f"https://a.org/p{i}", HTTP,
                        "application/http;msgtype=response")
            )
            for i in range(5)
        )
        frames = list(_scan_frames(["f"], [recs], chunk_records=2))
        assert [len(f) for f in frames] == [2, 2, 1]
        import pandas as pd

        cat = pd.concat(frames, ignore_index=True)
        assert len(cat) == len(parse_warc_bytes(recs)) == 5


class TestRecrawlCandidates:
    """Sitemap lastmod → recrawl priority (r12): the comparison the
    lastmod extraction exists to feed — never-crawled URLs first,
    changed pages next, unknown-lastmod pages owned by the caller's
    age policy, fresh pages deprioritized. Canonical-spelling join
    (case/query-order variants unify; a trailing slash stays a
    DISTINCT resource by the ledger contract)."""

    def test_priorities_and_parsing(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            recrawl_candidates,
        )

        entries = spark.createDataFrame(
            [
                (1, "https://a.org/new", "2026-02-01"),
                (2, "HTTPS://A.org/changed?b=2&a=1",
                 "2026-02-01T10:00:00+01:00"),
                (3, "https://a.org/fresh", "2026-01-01"),
                (4, "https://a.org/nolm", None),
                (5, "https://a.org/badlm", "not a date"),
            ],
            "eid long, url string, lastmod string",
        )
        crawled = spark.createDataFrame(
            [
                ("https://a.org/changed?a=1&b=2",),
                ("https://a.org/fresh",),
                ("https://a.org/nolm",),
                ("https://a.org/badlm",),
            ],
            "url string",
        ).selectExpr(
            "url", "CAST('2026-01-15 00:00:00' AS TIMESTAMP) last_crawl_ts"
        )
        out = {
            r.eid: (r.status, r.priority)
            for r in recrawl_candidates(entries, crawled).collect()
        }
        assert out == {
            1: ("new", 0),
            # case + query-order variants unify through the canonical
            # join; the offset timestamp parses and beats the crawl
            2: ("changed", 1),
            3: ("fresh", 3),
            4: ("unknown", 2),
            # an unparseable lastmod degrades to 'unknown', never a
            # failure
            5: ("unknown", 2),
        }

    def test_duplicate_ledger_rows_do_not_fan_out(self, spark):
        """r12 review: a ledger accumulated over crawl rounds (or
        holding spelling variants) must yield ONE status row per
        entry, judged against the MOST RECENT crawl — not
        contradictory duplicates that would schedule the URL
        twice."""
        from openaq_data_pipeline_spark.operators.frontier import (
            recrawl_candidates,
        )

        entries = spark.createDataFrame(
            [(1, "https://a.org/p?a=1&b=2", "2026-01-20")],
            "eid long, url string, lastmod string",
        )
        crawled = spark.createDataFrame(
            [
                ("https://a.org/p?a=1&b=2", "2026-01-10 00:00:00"),
                # query-order variant, re-crawled AFTER the lastmod
                ("https://a.org/p?b=2&a=1", "2026-02-01 00:00:00"),
            ],
            "url string, ts string",
        ).selectExpr("url", "CAST(ts AS TIMESTAMP) last_crawl_ts")
        rows = recrawl_candidates(entries, crawled).collect()
        assert len(rows) == 1
        # judged against the most recent crawl: fresh, not changed
        assert (rows[0].status, rows[0].priority) == ("fresh", 3)

    def test_provenance_columns_survive(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            recrawl_candidates,
        )

        entries = spark.createDataFrame(
            [("s1", "https://a.org/p", "2026-02-01", True)],
            "source string, url string, lastmod string, from_index boolean",
        )
        crawled = spark.createDataFrame(
            [("https://never.example/x",)], "url string"
        ).selectExpr("url", "CAST(NULL AS TIMESTAMP) last_crawl_ts")
        r = recrawl_candidates(entries, crawled).first()
        assert (r.source, r.from_index, r.status) == ("s1", True, "new")
        assert r.lastmod_ts is not None and r.last_crawl_ts is None


class TestFrontierPriority:
    """frontier_schedule(priority_col=...) — recrawl priorities
    permute fetch order INSIDE each host (new/changed first) while
    every politeness invariant binds unchanged."""

    def test_priority_orders_within_host_and_budget_evicts_low(
        self, spark
    ):
        from openaq_data_pipeline_spark.operators.frontier import (
            frontier_schedule,
        )

        rows = [
            (1, "https://a.org/fresh1", 3),
            (2, "https://a.org/new1", 0),
            (3, "https://a.org/changed1", 1),
            (4, "https://a.org/fresh2", 3),
            (5, "https://b.org/only", 2),
        ]
        df = spark.createDataFrame(
            rows, "uid long, url string, priority int"
        )
        sched = {
            r.uid: r
            for r in frontier_schedule(
                df, "url", "uid", priority_col="priority"
            ).collect()
        }
        a_order = sorted(
            (r.pos_in_host, uid)
            for uid, r in sched.items()
            if r.host == "a.org"
        )
        # new (0) then changed (1) then the two fresh (3)
        assert [uid for _, uid in a_order[:2]] == [2, 3]
        assert {uid for _, uid in a_order[2:]} == {1, 4}
        # slot math untouched: positions dense per host from 0
        assert [p for p, _ in a_order] == [0, 1, 2, 3]
        assert sched[5].pos_in_host == 0
        # budget eviction drops the LOWEST-priority tail, not an
        # arbitrary MD5 tail
        budget = frontier_schedule(
            df, "url", "uid", max_per_host=2, priority_col="priority"
        ).collect()
        a_kept = {r.uid for r in budget if r.host == "a.org"}
        assert a_kept == {2, 3}


class TestContentEncodingPlumbing:
    """VERDICT r12 next #2 (WARC side): Content-Encoding parses into
    its own column (body stays encoded at scan time) and the routed
    front door resolves gzip AND deflate bodies through the hinted
    hop."""

    def _encoded_archive(self) -> bytes:
        import gzip as _gz
        import zlib as _z

        co = _z.compressobj(wbits=-15)
        raw_deflate = co.compress(HTML) + co.flush()
        variants = [
            (b"https://a.org/id", HTML, None),
            (b"https://a.org/gz", _gz.compress(HTML), b"gzip"),
            (b"https://a.org/zl", _z.compress(HTML), b"deflate"),
            (b"https://a.org/rd", raw_deflate, b"deflate"),
            (b"https://a.org/br", b"\x00\x01 not brotli", b"br"),
        ]
        out = b""
        for uri, body, enc in variants:
            head = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            if enc:
                head += b"Content-Encoding: " + enc + b"\r\n"
            out += _record(
                "response", uri.decode(), head + b"\r\n" + body,
                "application/http;msgtype=response",
            )
        return out

    def test_scan_parses_encoding_header(self):
        recs = parse_warc_bytes(self._encoded_archive())
        by_uri = {r["target_uri"]: r for r in recs}
        assert by_uri["https://a.org/id"]["http_content_encoding"] is None
        assert by_uri["https://a.org/gz"]["http_content_encoding"] == "gzip"
        assert by_uri["https://a.org/zl"]["http_content_encoding"] == "deflate"
        assert by_uri["https://a.org/br"]["http_content_encoding"] == "br"
        # the body is NOT decoded at scan time — the routing layer
        # owns the bomb cap and the one-hop contract
        assert by_uri["https://a.org/gz"]["payload"][:2] == b"\x1f\x8b"

    def test_warc_to_text_plane_via_hinted_hop(self, spark, tmp_path):
        from openaq_data_pipeline_spark.operators.router import (
            extract_routed_text,
            route_crawl_payloads,
        )

        p = tmp_path / "enc.warc"
        p.write_bytes(self._encoded_archive())
        pages = read_warc(spark, str(p)).where(
            "warc_type = 'response' AND http_status = 200"
        )
        routed = route_crawl_payloads(
            pages.select("target_uri", "http_content_encoding", "payload"),
            "payload",
            encoding_col="http_content_encoding",
        )
        rows = {r.target_uri: r for r in routed.collect()}
        for uri in ("https://a.org/id", "https://a.org/gz",
                    "https://a.org/zl", "https://a.org/rd"):
            assert (rows[uri].mime, rows[uri].route) == (
                "text/html", "text"), uri
        assert rows["https://a.org/br"].route == "discard"
        texts = [
            r.text
            for r in extract_routed_text(
                routed.where("route = 'text'"), "payload", out_col="text",
                min_len=1,
            ).where("text IS NOT NULL").collect()
        ]
        # all four encodings converge on the SAME extracted text
        assert len(texts) == 4 and set(texts) == {"hello crawl world"}


class TestWarcValidators:
    """r14: ETag / Last-Modified response headers surface as
    http_etag / http_last_modified — the feed columns
    crawl_intake_gate(etag_col=/last_modified_col=) rides into the
    crawl ledger for conditional-fetch scheduling."""

    def test_validators_extracted(self):
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html\r\n"
            b'ETag: W/"abc123"\r\n'
            b"Last-Modified: Sat, 15 Aug 2026 00:00:00 GMT\r\n"
            b"\r\n" + HTML
        )
        recs = parse_warc_bytes(
            _record("response", "https://a.org/v", http,
                    "application/http;msgtype=response")
        )
        assert recs[0]["http_etag"] == 'W/"abc123"'
        assert recs[0]["http_last_modified"] == (
            "Sat, 15 Aug 2026 00:00:00 GMT"
        )
        # absent headers stay NULL (the base fixture has neither)
        base = parse_warc_bytes(_archive())[2]
        assert base["http_etag"] is None
        assert base["http_last_modified"] is None


class TestRevisitRecords:
    """WARC 1.1 revisit plane (r15): the storage-side twin of the
    r14 conditional-fetch validators — identical content archives as
    a digest-bearing revisit record, and resolve_revisits expands it
    back to a full observation."""

    def _archive(self):
        from openaq_data_pipeline_spark.sources.warc import (
            build_revisit_record,
            build_warc_record,
            warc_payload_digest,
        )

        p1 = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            b"original body"
        )
        resp = build_warc_record(
            "response", p1, target_uri="https://a.org/x",
            record_id="<urn:uuid:orig-1>",
            warc_date="2026-01-01T00:00:00Z",
        )
        rev = build_revisit_record(
            "https://a.org/x", "<urn:uuid:orig-1>",
            warc_payload_digest(b"original body"),
            warc_date="2026-02-01T00:00:00Z",
        )
        dangling = build_revisit_record(
            "https://a.org/y", "<urn:uuid:gone-9>", "sha1:00",
            warc_date="2026-02-02T00:00:00Z",
        )
        info = build_warc_record(
            "warcinfo", b"software: t\r\n", content_type=
            "application/warc-fields",
        )
        return info + resp + rev + dangling

    def test_parse_surfaces_revisit_headers(self):
        from openaq_data_pipeline_spark.sources.warc import (
            REVISIT_PROFILE,
            parse_warc_bytes,
            warc_payload_digest,
        )

        recs = {r["warc_type"]: r for r in parse_warc_bytes(
            self._archive()
        ) if r["warc_type"] != "revisit"}
        revs = [r for r in parse_warc_bytes(self._archive())
                if r["warc_type"] == "revisit"]
        assert recs["response"]["warc_refers_to"] is None
        assert revs[0]["warc_profile"] == REVISIT_PROFILE
        assert revs[0]["warc_refers_to"] == "<urn:uuid:orig-1>"
        assert revs[0]["warc_payload_digest"] == warc_payload_digest(
            b"original body"
        )
        assert revs[0]["payload"] == b""
        # digest format is labelled hex (engine-neutral recompute)
        import hashlib

        assert warc_payload_digest(b"x") == (
            "sha1:" + hashlib.sha1(b"x").hexdigest()
        )

    def test_resolve_revisits(self, spark, tmp_path):
        from openaq_data_pipeline_spark.sources.warc import (
            read_warc,
            resolve_revisits,
        )

        (tmp_path / "a.warc").write_bytes(self._archive())
        recs = read_warc(spark, str(tmp_path / "a.warc"))
        out = resolve_revisits(recs).collect()
        by = {(r.is_revisit, r.target_uri): r for r in out}
        assert len(out) == 3  # warcinfo excluded
        orig = by[(False, "https://a.org/x")]
        assert bytes(orig.payload) == b"original body"
        rev = by[(True, "https://a.org/x")]
        assert bytes(rev.payload) == b"original body"  # expanded
        assert rev.warc_date == "2026-02-01T00:00:00Z"  # own date
        assert rev.revisit_of == "<urn:uuid:orig-1>"
        assert rev.http_status == 200
        dang = by[(True, "https://a.org/y")]
        assert dang.payload is None  # observable, not dropped


class TestWarcWriter:
    """write_warc_shards (r15): the republish face — member-gzipped
    shards in the Common Crawl layout, round-tripping through this
    module's own reader AND independently addressable through the
    CDX probe; byte-deterministic across runs; NULL payloads skip
    observably."""

    def test_roundtrip_cdx_and_determinism(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.sources.warc import (
            build_warc_cdx,
            read_warc,
            read_warc_records,
            write_warc_shards,
        )

        rows = [
            (f"https://h.test/p{i}",
             f"<html><body>page {i}</body></html>".encode(),
             "text/html")
            for i in range(20)
        ] + [("https://h.test/null", None, "text/html")]
        df = spark.createDataFrame(
            rows, "url string, payload binary, ct string"
        )
        out1 = str(tmp_path / "w1")
        man = write_warc_shards(
            df, out1, "url", "payload", n_shards=3,
            content_type_col="ct",
        ).collect()
        assert sum(m.n_records for m in man) == 20
        assert sum(m.n_skipped for m in man) == 1
        back = read_warc(spark, out1 + "/*.warc.gz")
        got = {
            r.target_uri: (bytes(r.payload), r.http_content_type,
                           r.http_status)
            for r in back.collect()
        }
        assert len(got) == 20
        for i in range(20):
            assert got[f"https://h.test/p{i}"] == (
                f"<html><body>page {i}</body></html>".encode(),
                "text/html", 200,
            )
        # CDX addresses each record as its own gzip member; a ranged
        # probe recovers one record without the archive
        cdx = build_warc_cdx(spark, out1 + "/*.warc.gz")
        one = cdx.where(
            F.col("target_uri") == "https://h.test/p7"
        )
        rec = read_warc_records(spark, one).first()
        assert bytes(rec.payload) == b"<html><body>page 7</body></html>"
        # byte determinism: a second run produces identical shards
        out2 = str(tmp_path / "w2")
        write_warc_shards(
            df, out2, "url", "payload", n_shards=3,
            content_type_col="ct",
        ).collect()
        import pathlib

        for p1 in sorted(pathlib.Path(out1).glob("*.warc.gz")):
            p2 = pathlib.Path(out2) / p1.name
            assert p1.read_bytes() == p2.read_bytes(), p1.name

    def test_duplicate_urls_not_fanned_out(self, spark, tmp_path):
        """ADVICE r15: crawl corpora carry duplicate URLs (recrawls);
        the r15 assign-on-url-then-join-back shape duplicated each
        k-times URL into k×k shard rows. Shard keys are now the
        per-RECORD url+payload digest — every input row lands exactly
        once, including exact-duplicate rows and NULL payloads."""
        from openaq_data_pipeline_spark.sources.warc import (
            read_warc,
            write_warc_shards,
        )

        dup = "https://h.test/dup"
        rows = [
            (dup, b"<html>v1</html>", "text/html"),
            (dup, b"<html>v2</html>", "text/html"),
            (dup, b"<html>v2</html>", "text/html"),  # exact dup row
            (dup, None, "text/html"),
            ("https://h.test/only", b"<html>x</html>", "text/html"),
        ]
        df = spark.createDataFrame(
            rows, "url string, payload binary, ct string"
        )
        out = str(tmp_path / "dups")
        man = write_warc_shards(
            df, out, "url", "payload", n_shards=2,
            content_type_col="ct",
        ).collect()
        assert sum(m.n_records for m in man) == 4
        assert sum(m.n_skipped for m in man) == 1
        back = read_warc(spark, out + "/*.warc.gz").collect()
        assert len(back) == 4
        got = sorted(
            bytes(r.payload) for r in back if r.target_uri == dup
        )
        assert got == [
            b"<html>v1</html>", b"<html>v2</html>", b"<html>v2</html>"
        ]
