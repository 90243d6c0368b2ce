"""r16: EPUB manifest extraction (zip-hop composition) and MBOX
message explode (RFC 5322 headers, envelope-split semantics)."""

from __future__ import annotations

import io
import zipfile

from openaq_data_pipeline_spark.operators.ebooks import epub_manifest
from openaq_data_pipeline_spark.operators.mail import explode_mbox
from openaq_data_pipeline_spark.operators.router import (
    route_container_members,
)


def _epub(opf_path="OEBPS/content.opf", with_container=True,
          with_opf=True):
    buf = io.BytesIO()
    opf = (
        "<package><metadata xmlns:dc='x'>"
        "<dc:title>T&amp;T</dc:title>"
        "<dc:language>en</dc:language>"
        "<dc:creator>A</dc:creator></metadata>"
        '<manifest><item id="a" href="a.xhtml" media-type="x"/>'
        '<item id="b" href="b.xhtml" media-type="x"/></manifest>'
        '<spine><itemref idref="a"/></spine></package>'
    )
    container = (
        "<container><rootfiles>"
        f'<rootfile full-path="{opf_path}" media-type="y"/>'
        "</rootfiles></container>"
    )
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", "application/epub+zip")
        if with_container:
            zf.writestr("META-INF/container.xml", container)
        if with_opf:
            zf.writestr("OEBPS/content.opf", opf)
        zf.writestr("OEBPS/a.xhtml", "<html/>")
    return buf.getvalue()


class TestEpub:
    def test_manifest_extraction_and_observable_faces(self, spark):
        rows_in = [
            (1, _epub()),
            (2, _epub(with_container=False)),       # no row
            (3, _epub(opf_path="missing.opf")),     # NULL metadata
        ]
        df = spark.createDataFrame(rows_in, "doc_id long, payload binary")
        members = route_container_members(df, "payload", fmt="zip")
        got = {
            r.doc_id: r
            for r in epub_manifest(members, "doc_id").collect()
        }
        assert set(got) == {1, 3}
        r = got[1]
        assert r.rootfile == "OEBPS/content.opf"
        assert r.title == "T&amp;T"  # entity decoding is not claimed
        assert (r.language, r.creator) == ("en", "A")
        assert (r.n_manifest_items, r.n_spine_items) == (2, 1)
        assert got[3].rootfile == "missing.opf"
        assert got[3].title is None


MBOX = (
    "From alice Mon Jan  1 00:00:00 2026\n"
    "From: alice@example.test\n"
    "Subject: a folded\n subject line\n"
    "Message-ID: <one@list>\n"
    "\n"
    "first body\n"
    ">From is quoted, must not split\n"
    "\n"
    "From bob Mon Jan  1 01:00:00 2026\n"
    "From: bob@example.test\n"
    "Subject: plain\n"
    "\n"
    "second body\n"
)


class TestMbox:
    def test_split_unfold_and_counts(self, spark):
        df = spark.createDataFrame(
            [(1, MBOX)], "id long, content string"
        )
        rows = (
            explode_mbox(df, "content", "id")
            .orderBy("msg_idx")
            .collect()
        )
        assert len(rows) == 2
        a, b = rows
        assert a.from_addr == "alice@example.test"
        assert a.subject == "a folded subject line"  # unfolded
        assert a.message_id == "<one@list>"
        # body keeps the quoted >From line; trailing blank stripped
        assert (a.body_lines, a.body_chars) == (
            2, len("first body\n>From is quoted, must not split")
        )
        assert b.from_addr == "bob@example.test"
        assert b.date is None  # absent header is NULL, not ""
        assert (b.body_lines, b.body_chars) == (1, len("second body"))

    def test_headers_only_message(self, spark):
        df = spark.createDataFrame(
            [(1, "From x\nFrom: a@b\nSubject: s\n")],
            "id long, content string",
        )
        r = explode_mbox(df, "content", "id").first()
        assert r.subject == "s"
        assert (r.body_lines, r.body_chars) == (0, 0)
