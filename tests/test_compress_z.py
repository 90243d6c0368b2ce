"""unix compress(1) .Z codec (r15): byte-exact external validation
through the container's gzip (the reference unlzw), the format's two
quirks, the bomb cap, and the router composition for the three new
single-file compression formats (.Z / xz / bzip2)."""

from __future__ import annotations

import bz2
import lzma
import random
import subprocess

import pytest

from openaq_data_pipeline_spark.operators.compress_z import (
    compress_z,
    decompress_z_capped,
)


def _gzip_decodes(blob: bytes, tmp_path) -> bytes:
    p = tmp_path / "t.Z"
    p.write_bytes(blob)
    res = subprocess.run(
        ["gzip", "-dc", str(p)], capture_output=True
    )
    assert res.returncode == 0, res.stderr
    return res.stdout


class TestCompressZ:
    def test_roundtrip_cross_validated_by_gzip(self, tmp_path):
        """Every encoder shape decodes byte-exactly through BOTH the
        engine's decoder and the system gzip — external ground
        truth, mirrored-bug immunity (the vp8l-vs-libwebp
        posture). Shapes cross the 9→10→…→16 width bumps, fill the
        table, and include the group-alignment boundaries."""
        rng = random.Random(7)
        cases = [
            b"",
            b"A",
            b"ab" * 4000,
            b"the quick brown fox jumps over the lazy dog " * 500,
            bytes(rng.randrange(256) for _ in range(30000)),
            b"\x00" * 100000,
            bytes(rng.randrange(4) for _ in range(200000)),
        ]
        for data in cases:
            z = compress_z(data)
            assert decompress_z_capped(z, 1 << 26) == data
            assert _gzip_decodes(z, tmp_path) == data

    @pytest.mark.parametrize("maxbits", [9, 10, 12, 14, 16])
    def test_every_maxbits_vs_gzip(self, maxbits, tmp_path):
        """All maxbits settings agree with gzip — including the
        maxbits=9 init quirk (maxcode starts at 511 regardless, so
        the frozen 9-bit table still takes one bump to 10-bit
        codes)."""
        rng = random.Random(maxbits)
        data = bytes(rng.randrange(8) for _ in range(120000))
        z = compress_z(data, maxbits=maxbits)
        assert z[2] == 0x80 | maxbits
        assert decompress_z_capped(z, 1 << 26) == data
        assert _gzip_decodes(z, tmp_path) == data

    def test_clear_code_matches_gzip(self, tmp_path):
        """Hand-built stream with a CLEAR code: the decoder's
        dictionary reset + group realignment must match gzip on a
        shape the engine's encoder never emits."""

        def build(codes_widths):
            out = bytearray([0x1F, 0x9D, 0x90])  # block mode, mb=16
            bitbuf = bitcnt = 0
            for code, w in codes_widths:
                bitbuf |= code << bitcnt
                bitcnt += w
                while bitcnt >= 8:
                    out.append(bitbuf & 0xFF)
                    bitbuf >>= 8
                    bitcnt -= 8
            if bitcnt:
                out.append(bitbuf & 0xFF)
            return bytes(out)

        # 'a' 'b' CLEAR (realign to the 72-bit group boundary)
        # then 'x' 'y' 257 (post-clear 257 = 'xy')
        pad = 72 - 27
        blob = build(
            [(97, 9), (98, 9), (256, 9), (0, pad),
             (120, 9), (121, 9), (257, 9)]
        )
        expected = _gzip_decodes(blob, tmp_path)
        assert expected == b"abxyxy"
        assert decompress_z_capped(blob, 1 << 20) == expected

    def test_caps_and_corruption(self):
        data = b"bomb " * 100000
        z = compress_z(data)
        assert decompress_z_capped(z, 1000) is None  # over the cap
        assert decompress_z_capped(b"\x1f\x9d", 1 << 20) is None
        assert decompress_z_capped(b"\x1f\x9d\x08junk", 1 << 20) is None
        assert decompress_z_capped(b"\x1f\x9d\xf0junk", 1 << 20) is None
        assert decompress_z_capped(b"nope", 1 << 20) is None
        # first code > 255 is malformed
        assert decompress_z_capped(
            b"\x1f\x9d\x90\xff\x01", 1 << 20
        ) is None
        # bytearray (the Arrow shape) coerces
        assert decompress_z_capped(bytearray(z), 1 << 26) == data
        with pytest.raises(ValueError, match="maxbits"):
            compress_z(b"x", maxbits=8)


class TestNewFormatsRouting:
    def test_sniff_and_hop(self, spark):
        """.Z / xz / bzip2 payloads sniff to their mimes, take the
        magic-driven nested hop, and decode to the text plane; a
        failed hop keeps the compression mime and discards; nested
        compression discards under the one-hop contract."""
        import gzip as gz

        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.router import (
            route_crawl_payloads,
        )
        from openaq_data_pipeline_spark.operators.text import sniff_mime

        body = b"plain text body for the router"
        rows = [
            (0, compress_z(body)),
            (1, lzma.compress(body)),
            (2, bz2.compress(body)),
            (3, b"\x1f\x9d\x90" + b"\xff" * 30),      # corrupt .Z
            (4, compress_z(gz.compress(body))),        # nested: 1 hop
        ]
        df = spark.createDataFrame(rows, "id long, payload binary")
        mimes = {
            r.id: r.m
            for r in df.select(
                "id", sniff_mime(F.col("payload")).alias("m")
            ).collect()
        }
        assert mimes[0] == "application/x-compress"
        assert mimes[1] == "application/x-xz"
        assert mimes[2] == "application/x-bzip2"
        routed = {
            r.id: r
            for r in route_crawl_payloads(df, "payload").collect()
        }
        for i in (0, 1, 2):
            assert (routed[i].mime, routed[i].route) == (
                "text/plain", "text"
            ), i
            assert routed[i].was_gzip
            assert bytes(routed[i].payload) == body
        assert routed[3].route == "discard"
        assert routed[3].mime == "application/x-compress"
        # inner gzip after the .Z hop: one hop only -> discard with
        # the inner compression mime
        assert routed[4].route == "discard"
        assert routed[4].mime == "application/gzip"

    def test_hint_tokens(self, spark):
        from openaq_data_pipeline_spark.operators.router import (
            gunzip_once,
        )

        body = b"hinted body"
        rows = [
            (0, compress_z(body), "compress"),
            (1, lzma.compress(body), "x-xz"),
            (2, bz2.compress(body), "bzip2"),
            (3, body, "exi"),  # registered but undecodable: NULL
        ]
        df = spark.createDataFrame(
            rows, "id long, payload binary, content_encoding string"
        )
        out = {
            r.id: r.inner
            for r in gunzip_once(
                df, "payload", "inner", encoding_col="content_encoding"
            ).collect()
        }
        assert bytes(out[0]) == body
        assert bytes(out[1]) == body
        assert bytes(out[2]) == body
        assert out[3] is None


class TestCompressedTarComposition:
    def test_tar_xz_and_tar_z_reach_members(self, spark):
        """.tar.xz / .tar.Z / .tar.bz2 archives flow hop -> tar sniff
        -> container plane: the single-file decode hop unwraps the
        compression, the inner tar routes 'nested', and
        route_container_members explodes it into routed member rows
        — the archive-crawl path for the three new formats."""
        import io
        import tarfile

        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.router import (
            route_container_members,
            route_crawl_payloads,
        )

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for name, data in (
                ("a.txt", b"member text one"),
                ("b.html", b"<!doctype html><html>x</html>"),
            ):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        tar = buf.getvalue()
        rows = [
            (0, compress_z(tar)),
            (1, lzma.compress(tar)),
            (2, bz2.compress(tar)),
        ]
        df = spark.createDataFrame(rows, "id long, payload binary")
        routed = route_crawl_payloads(df, "payload")
        # after the hop every row is the INNER TAR — mime observable,
        # route 'discard' at the front door (top-level archives only
        # explode through the explicit container plane, the pinned
        # r12 taxonomy); the composition selects them BY MIME
        assert {
            (r.mime, r.route) for r in routed.collect()
        } == {("application/x-tar", "discard")}
        members = route_container_members(
            routed.where(F.col("mime") == "application/x-tar"),
            "payload",
            fmt="tar",
        )
        got = {
            (r.id, r.member_name): (r.mime, r.route)
            for r in members.collect()
        }
        assert len(got) == 6
        for i in range(3):
            assert got[(i, "a.txt")] == ("text/plain", "text")
            assert got[(i, "b.html")] == ("text/html", "text")


class TestCappedDecodeBoundary:
    """ADVICE r16: a payload whose decoded size is EXACTLY the cap
    must be accepted — max_length can stop the decompressor at the
    cap before the stream-end bytes are consumed (eof False), which
    the r15 code misread as a bomb. One zero-input pull
    distinguishes at-cap-and-finished from output-remaining."""

    def test_xz_exact_cap_accepted(self):
        from openaq_data_pipeline_spark.operators.router import (
            _xz_decompress_capped,
        )

        body = b"q" * 4096
        blob = lzma.compress(body)
        assert _xz_decompress_capped(blob, 4096) == body
        assert _xz_decompress_capped(blob, 4095) is None  # real bomb
        # truncated stream still rejected at a generous cap
        assert _xz_decompress_capped(blob[:-4], 1 << 20) is None

    def test_bz2_exact_cap_accepted(self):
        from openaq_data_pipeline_spark.operators.router import (
            _bz2_decompress_capped,
        )

        body = b"q" * 4096
        blob = bz2.compress(body)
        assert _bz2_decompress_capped(blob, 4096) == body
        assert _bz2_decompress_capped(blob, 4095) is None
        assert _bz2_decompress_capped(blob[:-4], 1 << 20) is None
