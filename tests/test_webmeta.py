"""Structured web-metadata plane (r15): JSON-LD records, OpenGraph
properties, link/anchor extraction and RFC 3986-style reference
resolution — all codegen, edge cases pinned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.webmeta import (
    extract_links,
    jsonld_records,
    opengraph_properties,
    resolve_url,
)


class TestJsonLd:
    def test_blocks_types_and_nested_fields(self, spark):
        html = (
            '<script type="application/ld+json">{"@type": "Article",'
            ' "name": "N1", "datePublished": "2026-01-02",'
            ' "author": {"name": "A. Writer"}}</script>'
            "<script type='application/ld+json'>"
            '{"@type": "Product", "name": "Widget"}</script>'
            '<script type="application/ld+json">broken {json</script>'
            '<script type="text/javascript">{"@type": "NotLd"}</script>'
        )
        df = spark.createDataFrame([(1, html)], "id long, html string")
        rows = (
            jsonld_records(df, "html", "id")
            .orderBy("ld_pos")
            .collect()
        )
        assert [r.ld_pos for r in rows] == [0, 1, 2]
        assert [r.ld_type for r in rows] == ["Article", "Product", None]
        assert rows[0].author_name == "A. Writer"
        assert rows[0].date_published == "2026-01-02"
        assert rows[1].name == "Widget"
        assert rows[2].name is None  # malformed: NULLs, not a failure

    def test_page_without_ld_emits_no_rows(self, spark):
        df = spark.createDataFrame(
            [(1, "<html><body>plain</body></html>")],
            "id long, html string",
        )
        assert jsonld_records(df, "html", "id").count() == 0


class TestOpenGraph:
    def test_both_attribute_orders_and_absent(self, spark):
        html = (
            '<meta property="og:title" content="My Title"/>'
            '<meta content="desc here" property="og:description">'
        )
        df = spark.createDataFrame([(html,)], "html string")
        r = (
            df.select(opengraph_properties(F.col("html")).alias("og"))
            .select("og.*")
            .first()
        )
        assert r.title == "My Title"
        assert r.description == "desc here"
        assert r.image is None and r.type is None and r.url is None


class TestResolveUrl:
    @pytest.mark.parametrize(
        "href,expected",
        [
            ("", "https://ex.com/d1/d2/page.html"),  # self
            ("https://abs.x/p", "https://abs.x/p"),
            ("//cdn.x/y.js", "https://cdn.x/y.js"),
            ("/root?q=1", "https://ex.com/root?q=1"),
            ("other.html", "https://ex.com/d1/d2/other.html"),
            ("./same.html", "https://ex.com/d1/d2/same.html"),
            ("../up.html", "https://ex.com/d1/up.html"),
            ("../../up2.html", "https://ex.com/up2.html"),
            ("a/b/../../c", "https://ex.com/d1/d2/c"),
            ("p.html#frag", "https://ex.com/d1/d2/p.html"),
            ("mailto:x@y.z", "mailto:x@y.z"),
            # RFC 3986 §5.3: query-only ref keeps the base PATH
            # (ADVICE r15 — the dir-join arm used to strip page.html)
            ("?x=1", "https://ex.com/d1/d2/page.html?x=1"),
            ("?a=b#frag", "https://ex.com/d1/d2/page.html?a=b"),
        ],
    )
    def test_resolution_cases(self, spark, href, expected):
        df = spark.createDataFrame([(href,)], "href string")
        got = df.select(
            resolve_url(
                F.lit("https://ex.com/d1/d2/page.html"), F.col("href")
            ).alias("r")
        ).first()
        assert got.r == expected, href


class TestExtractLinks:
    def test_links_anchors_nofollow_and_hrefless(self, spark):
        html = (
            '<a href="/p1">First link</a>'
            '<a class="x" href="https://o.ex/a" rel="noopener nofollow">'
            "Abs <b>bold</b></a>"
            "<a name='no-href'>skip me</a>"
            "<a href=''>empty href skips too</a>"
            '<A HREF="/caps">upper tag</A>'
        )
        df = spark.createDataFrame(
            [(1, html, "https://base.test/d/page.html")],
            "id long, html string, url string",
        )
        rows = (
            extract_links(df, "html", "id", base_url_col="url")
            .orderBy("link_pos")
            .collect()
        )
        assert [r.href for r in rows] == [
            "/p1", "https://o.ex/a", "/caps"
        ]
        assert rows[0].resolved == "https://base.test/p1"
        assert rows[1].anchor_text == "Abs bold"  # tags stripped
        assert [r.nofollow for r in rows] == [False, True, False]

    def test_codegen_only(self, spark):
        """The link plane must stay JVM-side: no Python eval nodes
        in the physical plan (scale posture)."""
        df = spark.createDataFrame(
            [(1, "<a href='/x'>y</a>", "https://b.t/p")],
            "id long, html string, url string",
        )
        plan = (
            extract_links(df, "html", "id", base_url_col="url")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan and "ArrowEval" not in plan


class TestPageDirectives:
    def test_robots_meta_header_and_canonical(self, spark):
        from openaq_data_pipeline_spark.operators.webmeta import (
            page_directives,
        )

        rows = [
            (1, '<meta name="robots" content="noindex, follow"/>'
                '<link rel="canonical" '
                'href="https://c.test/x"/>', "https://a.test/p", None),
            (2, '<meta content="nofollow" name="robots"/>',
             "https://a.test/p", None),
            (3, '<meta name="robots" content="none"/>'
                '<link href="../c" rel="canonical"/>',
             "https://a.test/d/e/p.html", None),
            (4, "<p>nothing</p>", "https://a.test/p", None),
            # header ORs into a directive-less page
            (5, "<p>nothing</p>", "https://a.test/p", "noindex"),
        ]
        df = spark.createDataFrame(
            rows, "id long, html string, url string, hdr string"
        )
        got = {
            r.id: r
            for r in page_directives(
                df, "html", "id", base_url_col="url",
                header_col="hdr",
            ).collect()
        }
        assert (got[1].noindex, got[1].nofollow) == (True, False)
        assert got[1].canonical_resolved == "https://c.test/x"
        assert (got[2].noindex, got[2].nofollow) == (False, True)
        assert (got[3].noindex, got[3].nofollow) == (True, True)
        assert got[3].canonical_resolved == "https://a.test/d/c"
        assert (got[4].noindex, got[4].canonical) == (False, None)
        assert got[5].noindex is True  # X-Robots-Tag alone


class TestInlineImages:
    def test_data_uri_explode_and_real_decode(self, spark):
        import base64

        import numpy as np

        from openaq_data_pipeline_spark.operators.multimodal import (
            _decode_image,
            encode_gif,
            encode_png,
        )
        from openaq_data_pipeline_spark.operators.webmeta import (
            extract_inline_images,
        )

        img = np.full((4, 6, 3), 50, np.uint8)
        png64 = base64.b64encode(encode_png(img)).decode()
        gif64 = base64.b64encode(encode_gif(img)).decode()
        html = (
            f'<img src="data:image/png;base64,{png64}"/>'
            f'<div style="background:url(data:image/png;base64,{gif64})"/>'
            '<img src="https://h.test/fetched.png"/>'  # not inline
        )
        df = spark.createDataFrame([(1, html)], "id long, html string")
        rows = (
            extract_inline_images(df, "html", "id")
            .orderBy("img_pos")
            .collect()
        )
        assert len(rows) == 2
        assert rows[0].declared_mime == "image/png"
        assert np.array_equal(_decode_image(bytes(rows[0].content)), img)
        # mislabeled: declared png, actual bytes are GIF — the
        # decoded pixels still come from the REAL format
        assert bytes(rows[1].content)[:6] in (b"GIF87a", b"GIF89a")
        assert np.array_equal(_decode_image(bytes(rows[1].content)), img)
