"""TIFF external ground truth + PackBits (r16, VERDICT r15 next
#4): the pure-NumPy TIFF codec's LZW/Deflate/PackBits/predictor
paths cross-validated byte-exactly against the system libtiff —
the check that immediately caught the fixtures omitting the
required PhotometricInterpretation tag — plus the PackBits RLE
unit surface."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from openaq_data_pipeline_spark.operators import tiff_native
from openaq_data_pipeline_spark.operators.multimodal import (
    _packbits_decode,
    _packbits_encode_row,
    decode_tiff_rgb,
    encode_tiff_rgb,
)

_SHAPES = (
    dict(),
    dict(big_endian=True),
    dict(lzw=True),
    dict(lzw=True, predictor=True),
    dict(deflate=True),
    dict(deflate=True, predictor=True),
    dict(packbits=True),
    dict(big_endian=True, lzw=True, predictor=True),
    dict(big_endian=True, packbits=True),
)


class TestPackBits:
    def test_roundtrip_runs_and_literals(self):
        rng = np.random.default_rng(31)
        img = rng.integers(0, 256, (7, 9, 3)).astype(np.uint8)
        img[2:4] = 99  # long runs
        img[5, :, :] = np.arange(27).reshape(9, 3)  # literals
        for be in (False, True):
            blob = encode_tiff_rgb(img, packbits=True, big_endian=be)
            assert np.array_equal(decode_tiff_rgb(blob), img)

    def test_long_rows_cross_128_boundaries(self):
        # >128-byte runs and >128-byte literal stretches both split
        row = bytes([7] * 300) + bytes(range(256)) * 2
        enc = _packbits_encode_row(row)
        assert _packbits_decode(enc, len(row)) == row

    def test_decode_malformed(self):
        with pytest.raises(ValueError, match="literal run truncated"):
            _packbits_decode(bytes([5, 1, 2]), 6)
        with pytest.raises(ValueError, match="repeat run truncated"):
            _packbits_decode(bytes([200]), 10)
        with pytest.raises(ValueError, match="short of declared"):
            _packbits_decode(bytes([0, 1]), 10)
        # output past the declared rows = bomb, refused
        with pytest.raises(ValueError, match="exceeds declared"):
            _packbits_decode(bytes([129, 7]), 127)
        # 0x80 is a spec no-op, skipped
        assert _packbits_decode(bytes([128, 0, 42]), 1) == b"\x2a"

    @settings(max_examples=30, deadline=None)
    @given(st.binary(min_size=1, max_size=600))
    def test_property_roundtrip(self, row):
        enc = _packbits_encode_row(row)
        assert _packbits_decode(enc, len(row)) == row


@pytest.mark.skipif(
    not tiff_native.available(), reason="libtiff not present"
)
class TestLibtiffGroundTruth:
    def test_agreement_every_encoder_shape(self):
        """libtiff applies full photometric interpretation — exact
        agreement across every shape rules out mirrored
        encoder/decoder bugs in LZW, Deflate, PackBits and the
        predictor, in both byte orders."""
        rng = np.random.default_rng(32)
        img = rng.integers(0, 256, (11, 13, 3)).astype(np.uint8)
        img[3:5] = 77
        for kwargs in _SHAPES:
            blob = encode_tiff_rgb(img, **kwargs)
            ours = decode_tiff_rgb(blob)
            ref = tiff_native.decode_tiff_rgb_native(blob)
            assert np.array_equal(ours, img), kwargs
            assert np.array_equal(ref, img), kwargs

    def test_photometric_tag_present(self):
        """The r16 regression pin: fixtures carry tag 262 = 2 (RGB).
        Without it libtiff read the engine's TIFFs as greyscale —
        the exact mirrored-blind-spot class this binding exists to
        catch."""
        from openaq_data_pipeline_spark.operators.multimodal import (
            _tiff_ifds,
        )

        img = np.full((2, 2, 3), 9, np.uint8)
        for kwargs in (dict(), dict(big_endian=True), dict(lzw=True)):
            page = next(_tiff_ifds(encode_tiff_rgb(img, **kwargs)))
            assert page["photometric"] == [2], kwargs

    def test_dimension_cap_before_alloc(self):
        img = np.zeros((4, 4, 3), np.uint8)
        with pytest.raises(ValueError, match="exceed cap"):
            tiff_native.decode_tiff_rgb_native(
                encode_tiff_rgb(img), max_px=8
            )

    def test_corrupt_stream(self):
        with pytest.raises(ValueError, match="could not parse"):
            tiff_native.decode_tiff_rgb_native(b"II*\x00garbage")


class TestGateDegrade:
    def test_loader_monkeypatch_closes_gate(self, monkeypatch):
        monkeypatch.setattr(tiff_native, "_LIB", None)
        monkeypatch.setattr(tiff_native, "_LOAD_FAILED", True)
        assert not tiff_native.available()
        with pytest.raises(ValueError, match="unavailable"):
            tiff_native.decode_tiff_rgb_native(b"II*\x00")
        # the pure codec is unaffected
        img = np.full((3, 3, 3), 5, np.uint8)
        blob = encode_tiff_rgb(img, packbits=True)
        assert np.array_equal(decode_tiff_rgb(blob), img)

    def test_declared_non_rgb_photometric_refused(self):
        """A TIFF claiming photometric=1 (grey) with 3 samples must
        not decode as RGB — wrong-data-never."""
        import struct

        img = np.full((2, 2, 3), 5, np.uint8)
        blob = bytearray(encode_tiff_rgb(img))
        # entry 4 (tag 262) value: header 8 + count 2 + 4 entries
        # of 12 + tag/type/count 8
        off = 8 + 2 + 12 * 4 + 8
        assert struct.unpack_from("<H", blob, off - 8)[0] == 262
        blob[off : off + 2] = struct.pack("<H", 1)
        with pytest.raises(ValueError, match="photometric"):
            decode_tiff_rgb(bytes(blob))
