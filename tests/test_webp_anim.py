"""Animated WebP frames (r15): container build/walk, the spec's
compositing model (offsets, dispose-to-background, exact integer
alpha blending), the RGBA VP8L encoder arm, libwebp container
validation, and the frame-sampling Arrow plane."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openaq_data_pipeline_spark.operators.multimodal import (
    decode_webp_frames,
    encode_webp_anim,
    sample_webp_frames,
    webp_anim_stats,
    webp_header_stats,
)


class TestAnimCodec:
    def test_roundtrip_and_stats(self):
        f0 = np.full((8, 12, 3), 40, np.uint8)
        f1 = np.full((8, 12, 3), 90, np.uint8)
        blob = encode_webp_anim(
            [f0, f1], durations_ms=[50, 70], loop_count=3
        )
        assert webp_header_stats(blob) == ("VP8X", 12, 8, False, True)
        assert webp_anim_stats(blob) == (12, 8, 2, 120, 3)
        frames = decode_webp_frames(blob)
        assert len(frames) == 2
        assert np.array_equal(frames[0], f0)
        assert np.array_equal(frames[1], f1)

    def test_offsets_and_dispose_to_background(self):
        f0 = np.full((8, 12, 3), 40, np.uint8)
        patch = np.full((4, 6, 3), 200, np.uint8)
        blob = encode_webp_anim(
            [f0, patch, patch],
            offsets=[(0, 0), (2, 4), (6, 4)],
            dispose_background=[False, True, False],
            background_rgb=(10, 20, 30),
        )
        fr = decode_webp_frames(blob)
        assert fr[1][4, 2].tolist() == [200, 200, 200]
        assert fr[1][0, 0].tolist() == [40, 40, 40]  # outside patch
        # frame 2: frame 1's rect restored to background, new patch on
        assert fr[2][4, 2].tolist() == [10, 20, 30]
        assert fr[2][4, 6].tolist() == [200, 200, 200]

    def test_alpha_blend_exact(self):
        f0 = np.full((8, 12, 3), 40, np.uint8)
        rgba = np.zeros((8, 12, 4), np.uint8)
        rgba[..., 0] = 255
        rgba[..., 3] = 128
        blob = encode_webp_anim([f0, rgba], blend=[False, True])
        fb = decode_webp_frames(blob)
        exp_r = (128 * 255 + 127 * 40 + 127) // 255
        exp_g = (127 * 40 + 127) // 255
        assert fb[1][0, 0].tolist() == [exp_r, exp_g, exp_g]

    def test_error_contract(self):
        f0 = np.full((4, 4, 3), 1, np.uint8)
        blob = encode_webp_anim([f0, f0])
        with pytest.raises(ValueError, match="cap"):
            decode_webp_frames(blob, max_px=4)
        with pytest.raises(ValueError):
            decode_webp_frames(blob[:40])  # mid-chunk truncation
        with pytest.raises(ValueError, match="not an animated"):
            from openaq_data_pipeline_spark.operators.vp8l import (
                encode_webp_lossless,
            )

            decode_webp_frames(encode_webp_lossless(f0))
        with pytest.raises(ValueError, match="even"):
            encode_webp_anim([f0], offsets=[(1, 0)])
        with pytest.raises(ValueError, match="at least one"):
            encode_webp_anim([])

    def test_rgba_vp8l_arm_cross_validated(self):
        """The r15 RGBA literal arm of the pure-Python VP8L encoder:
        round-trips through the engine's decoder AND the alpha plane
        survives libwebp's reference RGBA decode byte-exactly."""
        import ctypes

        from openaq_data_pipeline_spark.operators.vp8l import (
            decode_vp8l_payload,
            encode_webp_lossless,
        )
        from openaq_data_pipeline_spark.operators.webp_native import (
            _load,
            available,
        )

        rng = np.random.default_rng(9)
        rgba = rng.integers(0, 256, (7, 11, 4), dtype=np.uint8)
        cont = encode_webp_lossless(rgba)
        (size,) = struct.unpack_from("<I", cont, 16)
        assert np.array_equal(
            decode_vp8l_payload(cont[20 : 20 + size]), rgba
        )
        assert available()
        lib = _load()
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        w = ctypes.c_int()
        h = ctypes.c_int()
        ptr = lib.WebPDecodeRGBA(
            cont, len(cont), ctypes.byref(w), ctypes.byref(h)
        )
        assert ptr
        try:
            ref = np.ctypeslib.as_array(
                ptr, shape=(h.value, w.value, 4)
            ).copy()
        finally:
            lib.WebPFree(ptr)
        assert np.array_equal(ref, rgba)

    def test_container_validates_via_libwebp(self):
        import ctypes

        from openaq_data_pipeline_spark.operators.webp_native import (
            _load,
        )

        blob = encode_webp_anim(
            [np.full((6, 10, 3), 5, np.uint8)] * 2
        )
        lib = _load()
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        w = ctypes.c_int()
        h = ctypes.c_int()
        assert lib.WebPGetInfo(
            blob, len(blob), ctypes.byref(w), ctypes.byref(h)
        ) == 1
        assert (w.value, h.value) == (10, 6)


class TestSamplePlane:
    def test_sample_webp_frames(self, spark):
        blob = encode_webp_anim(
            [np.full((4, 5, 3), v, np.uint8) for v in (10, 20, 30)]
        )
        df = spark.createDataFrame(
            [(7, blob)], "media_id long, content binary"
        )
        rows = {
            r.frame_idx: r
            for r in sample_webp_frames(df, stride=2).collect()
        }
        assert set(rows) == {0, 2}
        assert rows[0].n_frames == 3
        assert rows[0].px_sum == 10 * 4 * 5 * 3
        assert rows[2].px_sum == 30 * 4 * 5 * 3
        assert (rows[0].width, rows[0].height) == (5, 4)
