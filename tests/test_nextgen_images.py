"""r16: next-generation image headers — HEIF (HEVC-coded, iPhone
default; ISO 23008-12 meta walk, header-only boundary) and JPEG XL
(SizeHeader bitstream walk over codestream and container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.multimodal import (
    encode_avif_header,
    encode_heif_header,
    encode_jxl_header,
    heif_header_stats,
    jxl_header_stats,
)


class TestHeif:
    def test_walk_brands_and_alpha(self):
        for brand in (b"heic", b"heix", b"mif1"):
            for alpha in (False, True):
                blob = encode_heif_header(640, 480, brand, alpha)
                assert heif_header_stats(blob) == (
                    brand.decode(), 640, 480, alpha,
                )

    def test_avif_stays_in_its_own_walk(self):
        with pytest.raises(ValueError, match="is not HEIF"):
            heif_header_stats(encode_avif_header(10, 10))
        with pytest.raises(ValueError, match="ispe"):
            # meta present but no ispe
            from openaq_data_pipeline_spark.operators.multimodal import (
                _mp4_box,
                _mp4_full,
            )
            import struct

            blob = (
                _mp4_box(
                    b"ftyp",
                    b"heic" + struct.pack(">I", 0) + b"heicmif1",
                )
                + _mp4_full(b"meta", 0, 0, b"")
            )
            heif_header_stats(blob)


class TestJxl:
    @pytest.mark.parametrize(
        "w,h", [(8, 8), (256, 160), (100, 77), (513, 1000),
                (70000, 12345), (1 << 29, 3)]
    )
    def test_sizeheader_roundtrip(self, w, h):
        for cont in (False, True):
            blob = encode_jxl_header(w, h, container=cont)
            assert jxl_header_stats(blob) == (w, h, cont)

    def test_rejects(self):
        with pytest.raises(ValueError, match="truncated"):
            jxl_header_stats(b"\xff\x0a")
        with pytest.raises(ValueError, match="not a JPEG XL"):
            jxl_header_stats(b"\xff\xd8\xff\xe0")
        with pytest.raises(ValueError, match="jxlc"):
            from openaq_data_pipeline_spark.operators.multimodal import (
                _JXL_CONTAINER_SIG,
                _mp4_box,
            )

            jxl_header_stats(
                _JXL_CONTAINER_SIG + _mp4_box(b"free", b"")
            )


class TestSniff:
    def test_heif_and_jxl_route_image(self, spark):
        from openaq_data_pipeline_spark.operators.router import (
            route_for_mime,
        )
        from openaq_data_pipeline_spark.operators.text import sniff_mime

        rows = [
            (0, encode_heif_header(8, 6, b"heic")),
            (1, encode_heif_header(8, 6, b"mif1")),
            (2, encode_jxl_header(16, 16)),
            (3, encode_jxl_header(16, 16, container=True)),
            # a plain mp4 brand still routes video
            (4, b"\x00\x00\x00\x14ftypisom" + b"\x00" * 12),
        ]
        df = spark.createDataFrame(rows, "id long, payload binary")
        got = {
            r.id: (r.m, r.route)
            for r in df.select(
                "id", sniff_mime(F.col("payload")).alias("m")
            )
            .withColumn("route", route_for_mime(F.col("m")))
            .collect()
        }
        assert got[0] == ("image/heif", "image")
        assert got[1] == ("image/heif", "image")
        assert got[2] == ("image/jxl", "image")
        assert got[3] == ("image/jxl", "image")
        assert got[4] == ("video/mp4", "video")
