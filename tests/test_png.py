"""PNG codec completion (r16, VERDICT r15 next #2): palette /
Adam7 / sub-8-bit / 16-bit decode in the pure-NumPy codec, and the
gated libpng16 binding that gives PNG the EXTERNAL ground truth
JPEG (libjpeg), VP8L (libwebp) and ``.Z`` (gzip) already have —
byte-exact agreement across every encoder shape, both directions."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from openaq_data_pipeline_spark.operators import png_native
from openaq_data_pipeline_spark.operators.multimodal import (
    _png_chunk,
    decode_png,
    encode_png,
    encode_png_grey,
    encode_png_palette,
)

SIG = b"\x89PNG\r\n\x1a\n"


def _manual_png(w, h, depth, color, rows_raw, plte=None, interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(rows_raw)) + _png_chunk(
        b"IEND", b""
    )


class TestPureCodecNewShapes:
    def test_palette_roundtrip_all_depths_and_interlace(self):
        rng = np.random.default_rng(11)
        for depth in (1, 2, 4, 8):
            ncol = min(1 << depth, 7)
            colors = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
            img = colors[rng.integers(0, ncol, (9, 10))]
            for il in (False, True):
                for f in (0, 2, 4):
                    blob = encode_png_palette(
                        img, depth=depth, filter_type=f, interlace=il
                    )
                    assert (decode_png(blob) == img).all(), (depth, il, f)

    def test_grey_depths_scale_like_libpng(self):
        """1/2/4-bit grey scales ×255/(2^d−1) (exact integers);
        16-bit quantizes by rounded linear scale."""
        rng = np.random.default_rng(12)
        for depth in (1, 2, 4, 8, 16):
            hi = (1 << depth) if depth < 16 else 65536
            g = rng.integers(0, hi, (11, 13)).astype(np.uint16)
            for il in (False, True):
                out = decode_png(
                    encode_png_grey(g, depth=depth, interlace=il)
                )
                if depth < 8:
                    want = (g * (255 // ((1 << depth) - 1))).astype(np.uint8)
                elif depth == 8:
                    want = g.astype(np.uint8)
                else:
                    want = (
                        (g.astype(np.uint32) * 255 + 32767) // 65535
                    ).astype(np.uint8)
                assert (out[:, :, 0] == want).all(), (depth, il)
                assert (out[:, :, 0] == out[:, :, 1]).all()

    def test_rgb_adam7_roundtrip_all_filters(self):
        y, x, c = np.meshgrid(
            np.arange(13), np.arange(9), np.arange(3), indexing="ij"
        )
        img = ((13 * y * y + 91 * x + 201 * c + 250) % 256).astype(np.uint8)
        for f in range(5):
            blob = encode_png(img, filter_type=f, interlace=True)
            assert (decode_png(blob) == img).all(), f

    def test_adam7_tiny_images_skip_empty_passes(self):
        """Images smaller than the 8×8 Adam7 tile leave some passes
        empty — the pass walk must skip them exactly as libpng
        does."""
        rng = np.random.default_rng(13)
        for h, w in ((1, 1), (1, 5), (3, 1), (2, 2), (7, 3)):
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            blob = encode_png(img, interlace=True)
            assert (decode_png(blob) == img).all(), (h, w)

    def test_grey_alpha_and_16bit_rgb(self):
        # grey+alpha 8-bit: alpha dropped, grey broadcast
        raw = bytes([0, 77, 13, 200, 255])
        blob = _manual_png(2, 1, 8, 4, raw)
        assert (decode_png(blob) == [[[77] * 3, [200] * 3]]).all()
        # RGB 16-bit: rounded linear quantization
        vals = [0x0000, 0x00FF, 0xFFFF, 0x8000, 0x0100, 0x1234]
        raw = bytes([0]) + b"".join(struct.pack(">H", v) for v in vals)
        blob = _manual_png(2, 1, 16, 2, raw)
        want = np.array(
            [(v * 255 + 32767) // 65535 for v in vals], np.uint8
        ).reshape(1, 2, 3)
        assert (decode_png(blob) == want).all()

    def test_malformed_rejects(self):
        # palette index out of range (2 entries, index 3 used)
        plte = bytes([1, 2, 3, 4, 5, 6])
        blob = _manual_png(4, 1, 2, 3, bytes([0, 0x1B]), plte=plte)
        with pytest.raises(ValueError, match="palette index"):
            decode_png(blob)
        # palette without PLTE
        blob = _manual_png(4, 1, 2, 3, bytes([0, 0x1B]))
        with pytest.raises(ValueError, match="missing PLTE"):
            decode_png(blob)
        # illegal depth for color type (RGB at depth 4)
        blob = _manual_png(2, 1, 4, 2, bytes([0, 0x12]))
        with pytest.raises(ValueError, match="illegal PNG depth"):
            decode_png(blob)
        # PLTE not a multiple of 3
        ihdr = struct.pack(">IIBBBBB", 4, 1, 2, 3, 0, 0, 0)
        blob = (
            SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", b"\x01\x02")
            + _png_chunk(b"IDAT", zlib.compress(bytes([0, 0x1B])))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="PLTE"):
            decode_png(blob)
        # truncated payload
        blob = _manual_png(4, 4, 8, 2, bytes([0]) + bytes(12))
        with pytest.raises(ValueError, match="size mismatch"):
            decode_png(blob)

    @settings(max_examples=25, deadline=None)
    @given(
        data=st.data(),
        depth=st.sampled_from([1, 2, 4, 8, 16]),
        interlace=st.booleans(),
        h=st.integers(1, 9),
        w=st.integers(1, 9),
    )
    def test_grey_property_roundtrip(self, data, depth, interlace, h, w):
        hi = (1 << depth) if depth < 16 else 65536
        g = np.array(
            data.draw(
                st.lists(
                    st.integers(0, hi - 1),
                    min_size=h * w, max_size=h * w,
                )
            ),
            np.uint16,
        ).reshape(h, w)
        out = decode_png(encode_png_grey(g, depth=depth, interlace=interlace))
        if depth < 8:
            want = (g * (255 // ((1 << depth) - 1))).astype(np.uint8)
        elif depth == 8:
            want = g.astype(np.uint8)
        else:
            want = ((g.astype(np.uint32) * 255 + 32767) // 65535).astype(
                np.uint8
            )
        assert (out[:, :, 0] == want).all()


@pytest.mark.skipif(
    not png_native.available(), reason="libpng16 not present"
)
class TestLibpngGroundTruth:
    """Byte-exact agreement between the pure codec and the system
    libpng in BOTH directions, across every encoder shape — the
    external cross-validation that rules out mirrored encoder/
    decoder bugs (the posture test_jpeg_native.py set for JPEG)."""

    def _shapes(self):
        rng = np.random.default_rng(21)
        y, x, c = np.meshgrid(
            np.arange(10), np.arange(7), np.arange(3), indexing="ij"
        )
        img = ((13 * y * y + 91 * x + 201 * c + 250) % 256).astype(np.uint8)
        shapes = []
        for f in range(5):
            shapes.append(encode_png(img, filter_type=f))
            shapes.append(encode_png(img, filter_type=f, interlace=True))
        for depth in (1, 2, 4, 8, 16):
            hi = (1 << depth) if depth < 16 else 65536
            g = rng.integers(0, hi, (8, 9)).astype(np.uint16)
            shapes.append(encode_png_grey(g, depth=depth))
            shapes.append(encode_png_grey(g, depth=depth, interlace=True))
            shapes.append(encode_png_grey(g, depth=depth, filter_type=4))
        for depth in (1, 2, 4, 8):
            ncol = min(1 << depth, 7)
            colors = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
            p = colors[rng.integers(0, ncol, (9, 10))]
            shapes.append(encode_png_palette(p, depth=depth))
            shapes.append(encode_png_palette(p, depth=depth, interlace=True))
            shapes.append(encode_png_palette(p, depth=depth, filter_type=3))
        return shapes

    def test_agreement_every_engine_shape(self):
        shapes = self._shapes()
        for i, blob in enumerate(shapes):
            ours = decode_png(blob)
            ref = png_native.decode_png_rgb8(blob)
            assert np.array_equal(ours, ref), f"shape {i} disagrees"
        assert len(shapes) >= 36

    def test_libpng_encoded_decodes_identically(self):
        """libpng picks its own adaptive per-row filters — decoding
        its output exercises filter mixes the engine's fixed-filter
        encoder never emits."""
        rng = np.random.default_rng(22)
        for shape in ((5, 5), (16, 24), (33, 7)):
            img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
            blob = png_native.encode_png_native(img)
            assert np.array_equal(decode_png(blob), img)
            assert np.array_equal(png_native.decode_png_rgb8(blob), img)

    def test_16bit_sample_recovery_against_linear_read(self):
        """The raw 16-bit samples the pure codec reconstructs match
        libpng's LINEAR (no transfer function) read exactly — ground
        truth for the defilter+join path before any quantization."""
        rng = np.random.default_rng(23)
        g = rng.integers(0, 65536, (6, 5)).astype(np.uint16)
        blob = encode_png_grey(g, depth=16, filter_type=2)
        lin = png_native.decode_png_linear16(blob)
        assert (lin[:, :, 0] == g).all()
        assert (lin[:, :, 3] == 65535).all()  # opaque alpha fill

    def test_alpha_dropped_not_composited(self):
        """Both paths DROP alpha (the codec posture) — libpng's
        default composite-onto-background is explicitly not used."""
        raw = bytes([0, 100, 150, 200, 0, 100, 150, 200, 255])
        blob = _manual_png(2, 1, 8, 6, raw)
        want = np.array([[[100, 150, 200]] * 2], np.uint8)
        assert (decode_png(blob) == want).all()
        assert (png_native.decode_png_rgb8(blob) == want).all()

    def test_dimension_cap_before_alloc(self):
        img = np.zeros((4, 4, 3), np.uint8)
        blob = encode_png(img)
        with pytest.raises(ValueError, match="exceed cap"):
            png_native.decode_png_rgb8(blob, max_px=8)


class TestGateDegrade:
    def test_loader_monkeypatch_closes_gate(self, monkeypatch):
        """Absent library = ValueError from the binding faces, never
        an ImportError (the avif_native posture)."""
        monkeypatch.setattr(png_native, "_LIB", None)
        monkeypatch.setattr(png_native, "_LOAD_FAILED", True)
        assert not png_native.available()
        with pytest.raises(ValueError, match="unavailable"):
            png_native.decode_png_rgb8(b"\x89PNG")
        with pytest.raises(ValueError, match="unavailable"):
            png_native.encode_png_native(np.zeros((2, 2, 3), np.uint8))
        # the pure codec is unaffected
        img = np.full((3, 3, 3), 9, np.uint8)
        assert (decode_png(encode_png(img)) == img).all()
