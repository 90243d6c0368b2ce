"""ICO favicon codec (r16): PNG and DIB members (BGRA + 1/4/8-bpp
palettes), doubled XOR+AND height, largest-member selection, the
guarded sniffer arm and the image-plane dispatch."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.multimodal import (
    _decode_image,
    decode_ico,
    encode_ico,
)


class TestIcoCodec:
    @pytest.mark.parametrize(
        "mode,ncol",
        [("png", None), ("bmp32", None), ("pal8", 200), ("pal4", 13),
         ("pal1", 2)],
    )
    def test_roundtrip_all_member_modes(self, mode, ncol):
        rng = np.random.default_rng(8)
        for w, h in ((9, 7), (16, 16), (33, 20)):
            if ncol:
                colors = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
                img = colors[rng.integers(0, ncol, (h, w))]
            else:
                img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            blob = encode_ico([img], [mode])
            assert np.array_equal(decode_ico(blob), img), (mode, w, h)
            assert np.array_equal(_decode_image(blob), img)

    def test_largest_member_wins_and_256_encoding(self):
        rng = np.random.default_rng(9)
        small = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
        big = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
        blob = encode_ico([small, big], ["bmp32", "png"])
        assert np.array_equal(decode_ico(blob), big)
        # 256-px members encode as directory byte 0
        big256 = rng.integers(0, 256, (256, 256, 3)).astype(np.uint8)
        assert decode_ico(
            encode_ico([big256], ["bmp32"])
        ).shape == (256, 256, 3)

    def test_malformed_rejects(self):
        with pytest.raises(ValueError, match="not an ICO"):
            decode_ico(b"\x00\x00\x03\x00\x01\x00" + b"\x00" * 20)
        with pytest.raises(ValueError, match="too short"):
            decode_ico(b"\x00" * 5)
        # member offset past EOF
        img = np.zeros((4, 4, 3), np.uint8)
        blob = bytearray(encode_ico([img], ["png"]))
        blob[14:18] = (2 ** 31).to_bytes(4, "little")  # entry size
        with pytest.raises(ValueError, match="out of range"):
            decode_ico(bytes(blob))
        with pytest.raises(ValueError, match="capacity"):
            colors = np.arange(24, dtype=np.uint8).reshape(8, 3)
            encode_ico(
                [colors[np.arange(8) % 8].reshape(2, 4, 3)], ["pal1"]
            )

    def test_sniff_and_route(self, spark):
        from openaq_data_pipeline_spark.operators.router import (
            route_for_mime,
        )
        from openaq_data_pipeline_spark.operators.text import sniff_mime

        img = np.full((4, 4, 3), 9, np.uint8)
        rows = [
            (0, encode_ico([img], ["png"])),
            (1, encode_ico([img], ["bmp32"])),
            # NUL-heavy non-ICO binary: the count-byte guard keeps
            # the magic from swallowing it
            (2, b"\x00\x00\x01\x00\x00\x00" + b"\x00" * 40),
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
        assert got[0] == ("image/vnd.microsoft.icon", "image")
        assert got[1] == ("image/vnd.microsoft.icon", "image")
        assert got[2][0] != "image/vnd.microsoft.icon"
