"""VP8L (WebP lossless) codec subset (r13): encoder/decoder
round-trips over every prefix-code shape, decoder-only features
(color cache, LZ77 backward references) via hand-built streams, the
subset boundary (unsupported transforms raise, never crash), and
the image-plane composition."""

from __future__ import annotations

import numpy as np
import pytest

from openaq_data_pipeline_spark.operators.vp8l import (
    _CACHE_MUL,
    _GREEN_ALPHABET,
    _BitWriter,
    _write_prefix_code,
    decode_vp8l_payload,
    decode_webp_lossless,
    encode_webp_lossless,
)


class TestRoundTrip:
    def test_constant_two_color_and_random(self):
        rng = np.random.default_rng(7)
        imgs = [
            np.full((5, 9, 3), (10, 200, 33), np.uint8),  # zero-bit codes
            np.where(
                rng.random((8, 8, 1)) < 0.5,
                np.array([[[255, 0, 0]]], np.uint8),
                np.array([[[0, 0, 255]]], np.uint8),
            ).astype(np.uint8),  # simple 2-symbol codes
            rng.integers(0, 256, (16, 23, 3), dtype=np.uint8),  # full path
        ]
        for img in imgs:
            assert np.array_equal(
                decode_webp_lossless(encode_webp_lossless(img)), img
            )

    def test_subtract_green_transform(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (12, 7, 3), dtype=np.uint8)
        blob = encode_webp_lossless(img, subtract_green=True)
        assert np.array_equal(decode_webp_lossless(blob), img)

    def test_dims_and_container(self):
        img = np.full((3, 200, 3), 77, np.uint8)
        blob = encode_webp_lossless(img)
        # the r13 header walk reads the same container
        from openaq_data_pipeline_spark.operators.multimodal import (
            webp_header_stats,
        )

        assert webp_header_stats(blob) == ("VP8L", 200, 3, False, False)


class TestDecoderOnlyFeatures:
    """The encoder never emits cache codes or backward references;
    hand-built streams (via the encoder's own bit/prefix writers)
    pin the decoder's LZ77 + color-cache paths."""

    def _stream(self, cache_bits: int = 4) -> bytes:
        # 4x1 image: literal A, LZ77(len=2, dist=1) -> A A, cache(A)
        a_argb = 0xFF010203  # a=255 r=1 g=2 b=3
        cache_sym = _GREEN_ALPHABET + (
            (_CACHE_MUL * a_argb & 0xFFFFFFFF) >> (32 - cache_bits)
        )
        bw = _BitWriter()
        bw.write(0x2F, 8)
        bw.write(4 - 1, 14)
        bw.write(1 - 1, 14)
        bw.write(0, 1)  # alpha hint
        bw.write(0, 3)  # version
        bw.write(0, 1)  # no transforms
        bw.write(1, 1)  # color cache
        bw.write(cache_bits, 4)
        bw.write(0, 1)  # no meta codes
        green_alpha = _GREEN_ALPHABET + (1 << cache_bits)
        g_lengths = [0] * green_alpha
        g_lengths[2] = 1          # literal green=2
        g_lengths[256 + 1] = 2    # length prefix 1 -> copy length 2
        g_lengths[cache_sym] = 2  # cache hit for A
        g_codes = _write_prefix_code(bw, g_lengths)
        r_codes = _write_prefix_code(bw, [0] * 1 + [1] + [0] * 254)  # {1}
        b_codes = _write_prefix_code(bw, [0] * 3 + [1] + [0] * 252)  # {3}
        a_codes = _write_prefix_code(bw, [0] * 255 + [1])  # {255}
        d_codes = _write_prefix_code(bw, [0, 1] + [0] * 38)  # prefix 1
        # literal A
        for codes, sym in ((g_codes, 2), (r_codes, 1), (b_codes, 3),
                           (a_codes, 255)):
            code, ln = codes[sym]
            if ln:
                bw.write_code(code, ln)
        # LZ77: green symbol 257 (length prefix 1 -> 2), distance
        # prefix 1 -> dist_code 2 -> neighborhood (1, 0) -> dist 1
        code, ln = g_codes[257]
        bw.write_code(code, ln)
        code, ln = d_codes[1]
        if ln:
            bw.write_code(code, ln)
        # cache hit
        code, ln = g_codes[cache_sym]
        bw.write_code(code, ln)
        return bw.bytes()

    def test_lz77_and_cache(self):
        rgba = decode_vp8l_payload(self._stream())
        assert rgba.shape == (1, 4, 4)
        expected = np.array([[1, 2, 3, 255]] * 4, np.uint8).reshape(1, 4, 4)
        assert np.array_equal(rgba, expected)


class TestSubsetBoundary:
    def test_out_of_range_predictor_mode_raises(self):
        """All four transform TYPES decode as of r14; the remaining
        wild-stream boundary inside a transform — a predictor tile
        claiming a mode above 13 — must raise, not index garbage."""
        bw = _BitWriter()
        bw.write(0x2F, 8)
        bw.write(1, 14)  # 2 wide
        bw.write(0, 14)  # 1 tall
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(1, 1)  # a transform follows
        bw.write(0, 2)  # PREDICTOR
        bw.write(0, 3)  # size_bits = 2
        bw.write(0, 1)  # tile image: no cache
        # green symbol 14 (mode 14 — out of range), zero-bit singles
        for lengths in (
            [0] * 14 + [1] + [0] * (_GREEN_ALPHABET - 15),
            [1] + [0] * 255,
            [1] + [0] * 255,
            [0] * 255 + [1],
            [1] + [0] * 39,
        ):
            _write_prefix_code(bw, lengths)
        with pytest.raises(ValueError, match="predictor mode"):
            decode_vp8l_payload(bw.bytes())

    def test_truncated_stream_raises_valueerror(self):
        img = np.full((4, 4, 3), 9, np.uint8)
        blob = encode_webp_lossless(img)
        with pytest.raises(ValueError):
            decode_webp_lossless(blob[:24])

    def test_lossy_vp8_stays_header_only(self):
        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_webp_header,
        )

        with pytest.raises(ValueError):
            decode_webp_lossless(encode_webp_header(8, 8, kind="VP8 "))


class TestImagePlaneComposition:
    def test_vp8l_pixels_decode_in_the_image_plane(self, spark):
        """A subset VP8L decodes PIXELS in the lenient pass; a
        header-valid-but-undecodable VP8L still yields header dims
        (the r13 fallback)."""
        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_webp_header,
            extract_features,
        )

        img = np.full((4, 6, 3), 100, np.uint8)
        df = spark.createDataFrame(
            [
                (0, encode_webp_lossless(img)),
                (1, encode_webp_header(32, 16, kind="VP8L")),
            ],
            "id long, payload binary",
        )
        rows = {
            r.id: r
            for r in extract_features(
                df, "payload", id_col="id", decode="real", lenient=True
            ).collect()
        }
        assert (rows[0].width, rows[0].height) == (6, 4)
        assert rows[0].px_sum == 100 * 4 * 6 * 3
        assert rows[0].mean_px == 100.0
        # header-only stub: dims from the walk, pixel stats NULL
        assert (rows[1].width, rows[1].height) == (32, 16)
        assert rows[1].px_sum is None


class TestColorIndexing:
    """COLOR_INDEXING transform (r13 second pass): delta-coded
    palette aux image + pixel bundling — every bundle width (8/4/2/1
    indices per byte), odd widths, and the exclusive-flags guard."""

    def test_all_bundle_widths_roundtrip(self):
        rng = np.random.default_rng(3)
        for ncol, shape in (
            (2, (9, 13)),    # width_bits 3: 8 px/byte
            (4, (7, 10)),    # width_bits 2
            (16, (11, 6)),   # width_bits 1
            (200, (20, 17)),  # width_bits 0
        ):
            pal = np.unique(
                rng.integers(0, 256, (ncol, 3), dtype=np.uint8), axis=0
            )
            img = pal[rng.integers(0, len(pal), shape)]
            blob = encode_webp_lossless(img, palette=True)
            assert np.array_equal(decode_webp_lossless(blob), img), ncol
            # bundling actually compresses the 2-color case
            if ncol == 2:
                assert len(blob) < img.nbytes // 2

    def test_odd_width_padding(self):
        rng = np.random.default_rng(5)
        pal = np.array([[0, 0, 0], [255, 255, 255], [9, 9, 9]], np.uint8)
        img = pal[rng.integers(0, 3, (5, 9))]  # 9 % 4 != 0
        assert np.array_equal(
            decode_webp_lossless(encode_webp_lossless(img, palette=True)),
            img,
        )

    def test_palette_excludes_subtract_green(self):
        img = np.zeros((2, 2, 3), np.uint8)
        with pytest.raises(ValueError, match="exclusive"):
            encode_webp_lossless(img, palette=True, subtract_green=True)

    def test_over_256_colors_raises(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="256"):
            encode_webp_lossless(img, palette=True)


class TestMetaPrefixCodes:
    """Meta prefix codes (r13 third pass): a hand-built stream with
    a 2-tile entropy image routes the left tile through a red-pixel
    code group and the right through a blue-pixel group."""

    def test_two_groups_by_tile(self):
        bw = _BitWriter()
        bw.write(0x2F, 8)
        bw.write(8 - 1, 14)  # 8x2, huffman_bits=2 -> 4px tiles, 2x1
        bw.write(2 - 1, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(1, 1)  # meta prefix codes
        bw.write(2 - 2, 3)  # huffman_bits = 2
        # entropy image (2x1, aux: no meta bit): green = tile's group
        bw.write(0, 1)  # no cache in the aux image
        g = _write_prefix_code(bw, [1, 1] + [0] * (_GREEN_ALPHABET - 2))
        zero = _write_prefix_code(bw, [1] + [0] * 255)
        _write_prefix_code(bw, [1] + [0] * 255)  # blue
        _write_prefix_code(bw, [1] + [0] * 255)  # alpha
        _write_prefix_code(bw, [1] + [0] * 39)   # distance
        for sym in (0, 1):  # tiles 0, 1 (r/b/a are zero-bit singles)
            code, ln = g[sym]
            bw.write_code(code, ln)
        # two code groups for the main image
        reds = []
        for rv in (250, 7):
            gg = _write_prefix_code(bw, [1] + [0] * (_GREEN_ALPHABET - 1))
            rr = _write_prefix_code(
                bw, [0] * rv + [1] + [0] * (255 - rv)
            )
            bb = _write_prefix_code(bw, [0] * (255 - rv) + [1] + [0] * rv)
            aa = _write_prefix_code(bw, [0] * 255 + [1])
            _write_prefix_code(bw, [1] + [0] * 39)
            reds.append((gg, rr, bb, aa))
        # 16 pixels, every code zero-bit single-symbol: no data bits
        rgba = decode_vp8l_payload(bw.bytes())
        assert rgba.shape == (2, 8, 4)
        left, right = rgba[:, :4], rgba[:, 4:]
        assert (left[:, :, 0] == 250).all() and (left[:, :, 2] == 5).all()
        assert (right[:, :, 0] == 7).all() and (right[:, :, 2] == 248).all()
        assert (rgba[:, :, 3] == 255).all()


class TestPredictorTransform:
    """PREDICTOR transform (r14, RFC 9649 §4.1): all 14 modes
    round-trip through the matched encoder, edge rules pinned by a
    hand-built stream with independently computed expected pixels."""

    @staticmethod
    def _img(h, w, seed=7):
        rng = np.random.default_rng(seed)
        y, x = np.mgrid[0:h, 0:w]
        base = np.stack(
            [(x * 7 + y * 3) % 256, (x * 2 + y * 11) % 256,
             (x * 13 + y * 5) % 256], -1)
        return ((base + rng.integers(0, 23, (h, w, 3))) % 256).astype(
            np.uint8
        )

    @pytest.mark.parametrize("mode", range(14))
    def test_all_modes_roundtrip(self, mode):
        img = self._img(9, 7, seed=mode)
        blob = encode_webp_lossless(img, predictor_mode=mode)
        assert np.array_equal(decode_webp_lossless(blob), img)

    @pytest.mark.parametrize("shape", [(1, 9), (9, 1), (2, 2), (5, 16)])
    def test_edge_shapes(self, shape):
        # 1-wide/1-tall hit the L-only / T-only edge rules everywhere;
        # TR-using modes (3, 5, 9, 10) exercise the rightmost-column
        # wrap to the current row's leftmost pixel
        for mode in (3, 5, 9, 10, 11, 12, 13):
            img = self._img(*shape, seed=mode)
            blob = encode_webp_lossless(img, predictor_mode=mode)
            assert np.array_equal(decode_webp_lossless(blob), img)

    def test_hand_built_stream_mode2_exact_pixels(self):
        """2x2, mode 2 (T), residuals all (a,r,g,b)=(0,1,1,1): pixel
        (0,0) = black+1 per channel (alpha 255+0), (1,0) predicts L,
        (0,1) predicts T, (1,1) predicts T — expected grid computed
        BY HAND, not by the codec."""
        bw = _BitWriter()
        bw.write(0x2F, 8)
        bw.write(2 - 1, 14)
        bw.write(2 - 1, 14)
        bw.write(0, 1)  # alpha hint
        bw.write(0, 3)  # version
        bw.write(1, 1)  # a transform follows
        bw.write(0, 2)  # PREDICTOR
        bw.write(0, 3)  # size_bits = 2 -> one 4x4 tile covers 2x2
        # tile entropy image (1x1, aux): green = mode 2, others 0/255
        bw.write(0, 1)  # no cache
        for lengths in (
            [0, 0, 1] + [0] * (_GREEN_ALPHABET - 3),  # green {2}
            [1] + [0] * 255,                           # red {0}
            [1] + [0] * 255,                           # blue {0}
            [0] * 255 + [1],                           # alpha {255}
            [1] + [0] * 39,                            # distance
        ):
            _write_prefix_code(bw, lengths)
        bw.write(0, 1)  # end of transforms
        # main image: residual literals (g=1, r=1, b=1, a=0) x4
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta codes
        for lengths in (
            [0, 1] + [0] * (_GREEN_ALPHABET - 2),  # green {1}
            [0, 1] + [0] * 254,                    # red {1}
            [0, 1] + [0] * 254,                    # blue {1}
            [1] + [0] * 255,                       # alpha {0}
            [1] + [0] * 39,                        # distance
        ):
            _write_prefix_code(bw, lengths)
        # every code is a zero-bit single symbol: no data bits at all
        rgba = decode_vp8l_payload(bw.bytes())
        # (0,0): pred 0xff000000 -> (r,g,b,a) = (1,1,1,255)
        # (1,0): pred L=(1,1,1,255) -> (2,2,2,255)
        # (0,1): pred T=(1,1,1,255) -> (2,2,2,255)
        # (1,1): mode 2 pred T=(2,2,2,255) -> (3,3,3,255)
        expected = np.array(
            [[[1, 1, 1, 255], [2, 2, 2, 255]],
             [[2, 2, 2, 255], [3, 3, 3, 255]]], np.uint8)
        assert np.array_equal(rgba, expected)

    def test_mode_above_13_raises(self):
        img = self._img(2, 2)
        with pytest.raises(ValueError, match="0..13"):
            encode_webp_lossless(img, predictor_mode=14)


class TestAdviceR13Fixes:
    def test_uniform_256_value_channel_roundtrips(self):
        """ADVICE r13 (medium): a channel using all 256 values once
        gives every symbol length 8 — the degenerate single-length
        CLC must not desync the bitstream."""
        img = np.zeros((16, 16, 3), np.uint8)
        img[:, :, 0] = np.arange(256, dtype=np.uint8).reshape(16, 16)
        img[:, :, 1] = 7
        img[:, :, 2] = 13
        assert np.array_equal(
            decode_webp_lossless(encode_webp_lossless(img)), img
        )

    def test_kraft_incomplete_and_oversubscribed_raise(self):
        """ADVICE r13 (low): malformed wild streams with bad length
        sets must raise, not alias symbols silently."""
        from openaq_data_pipeline_spark.operators.vp8l import (
            _PrefixDecoder,
        )

        with pytest.raises(ValueError, match="Kraft"):
            _PrefixDecoder([1, 1, 1])   # over-subscribed
        with pytest.raises(ValueError, match="Kraft"):
            _PrefixDecoder([2, 2, 2])   # incomplete
        _PrefixDecoder([1, 2, 2])       # complete: fine
        _PrefixDecoder([0, 3, 0])       # single symbol: exempt

    def test_duplicate_transform_raises(self):
        """ADVICE r13 (low): the spec allows each transform type at
        most once; a duplicate must raise, not invert with wrong
        width assumptions."""
        bw = _BitWriter()
        bw.write(0x2F, 8)
        bw.write(0, 14)
        bw.write(0, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN again
        with pytest.raises(ValueError, match="twice"):
            decode_vp8l_payload(bw.bytes())


class TestColorTransform:
    """COLOR_TRANSFORM (r14, RFC 9649 §4.2 — the fourth and final
    spec transform): per-tile signed cross-channel multipliers
    round-trip through the matched encoder; the delta arithmetic
    ((int8 t * int8 c) >> 5, arithmetic shift) and the
    red-before-blue inverse ordering are pinned by a case where
    blue's red-term differs between original and transformed red."""

    @staticmethod
    def _img(h, w, seed=9):
        rng = np.random.default_rng(seed)
        y, x = np.mgrid[0:h, 0:w]
        base = np.stack(
            [(x * 7 + y * 3) % 256, (x * 2 + y * 11) % 256,
             (x * 13 + y * 5) % 256], -1)
        return ((base + rng.integers(0, 23, (h, w, 3))) % 256).astype(
            np.uint8
        )

    @pytest.mark.parametrize(
        "ct",
        [(0, 0, 0), (10, -7, 33), (-128, 127, -1), (64, 64, 64)],
    )
    def test_roundtrip(self, ct):
        img = self._img(9, 7, seed=sum(abs(t) for t in ct))
        blob = encode_webp_lossless(img, color_transform=ct)
        assert np.array_equal(decode_webp_lossless(blob), img)

    def test_red_term_uses_reconstructed_red(self):
        """r2b != 0 with a g2r that CHANGES red: if the inverse fed
        blue's red-term the transformed red instead of the
        reconstructed one, this image would not round-trip."""
        img = np.zeros((3, 4, 3), np.uint8)
        img[:, :, 0] = 200  # red
        img[:, :, 1] = 100  # green (drives g2r: delta != 0)
        img[:, :, 2] = 50   # blue
        blob = encode_webp_lossless(img, color_transform=(80, 0, 90))
        assert np.array_equal(decode_webp_lossless(blob), img)

    def test_exclusive_and_range_guards(self):
        img = np.zeros((2, 2, 3), np.uint8)
        with pytest.raises(ValueError, match="exclusive"):
            encode_webp_lossless(
                img, subtract_green=True, color_transform=(1, 2, 3)
            )
        with pytest.raises(ValueError, match="int8"):
            encode_webp_lossless(img, color_transform=(200, 0, 0))


class TestLibwebpCrossValidation:
    """External ground truth (r14): the container ships the REFERENCE
    implementation (system libwebp), so every stream shape the
    engine's pure-Python VP8L encoder emits is decoded by libwebp
    and compared byte-exactly — the mirrored-bug immunity a matched
    encoder/decoder pair cannot provide itself."""

    @staticmethod
    def _img(h, w, seed=1):
        rng = np.random.default_rng(seed)
        y, x = np.mgrid[0:h, 0:w]
        base = np.stack(
            [(x * 7 + y * 3) % 256, (x * 2 + y * 11) % 256,
             (x * 13 + y * 5) % 256], -1)
        return ((base + rng.integers(0, 23, (h, w, 3))) % 256).astype(
            np.uint8
        )

    def test_every_stream_shape_matches_reference(self):
        from openaq_data_pipeline_spark.operators.webp_native import (
            available,
            decode_webp_native,
        )

        assert available(), "libwebp must load in this environment"
        cases = [
            {},
            {"subtract_green": True},
            {"palette": True},
            {"color_transform": (10, -7, 33)},
            {"color_transform": (-128, 127, -1)},
            *[{"predictor_mode": m} for m in range(14)],
        ]
        for kw in cases:
            img = self._img(9, 7, seed=len(repr(kw)))
            if kw.get("palette"):
                img = (img // 64 * 64).astype(np.uint8)
            blob = encode_webp_lossless(img, **kw)
            # our own decoder and the reference agree exactly
            assert np.array_equal(decode_webp_native(blob), img), kw
            assert np.array_equal(decode_webp_lossless(blob), img), kw

    def test_uniform_256_stream_matches_reference(self):
        """The ADVICE r13 degenerate-CLC fix emits a padded CLC —
        the reference decoder must accept it too (the advice warned
        a strict decoder would reject the old incomplete form)."""
        from openaq_data_pipeline_spark.operators.webp_native import (
            decode_webp_native,
        )

        img = np.zeros((16, 16, 3), np.uint8)
        img[:, :, 0] = np.arange(256, dtype=np.uint8).reshape(16, 16)
        img[:, :, 1] = 7
        img[:, :, 2] = 13
        assert np.array_equal(
            decode_webp_native(encode_webp_lossless(img)), img
        )


class TestLossyVP8Native:
    """Lossy VP8 decode through the gated libwebp binding (r14):
    real pixels for the majority wild-web WebP tier the pure-Python
    plane could only header-walk."""

    def test_lossy_roundtrip_close(self):
        from openaq_data_pipeline_spark.operators.webp_native import (
            decode_webp_native,
            encode_webp_lossy,
        )

        img = TestLibwebpCrossValidation._img(32, 48)
        blob = encode_webp_lossy(img, quality=90.0)
        assert blob[:4] == b"RIFF" and blob[12:16] == b"VP8 "
        dec = decode_webp_native(blob)
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert err < 20.0  # lossy, but recognizably the same image

    def test_image_plane_decodes_lossy_vp8(self, spark):
        """A real VP8 stream now yields pixel stats in the lenient
        pass; a header-valid-but-garbage VP8 body still falls back
        to header dims (libwebp refuses it → ValueError → the r13
        path, unchanged)."""
        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_webp_header,
            extract_features,
        )
        from openaq_data_pipeline_spark.operators.webp_native import (
            encode_webp_lossy,
        )

        img = np.full((16, 24, 3), 120, np.uint8)
        df = spark.createDataFrame(
            [
                (0, encode_webp_lossy(img, quality=95.0)),
                (1, encode_webp_header(32, 16, kind="VP8 ")),
            ],
            "id long, payload binary",
        )
        rows = {
            r.id: r
            for r in extract_features(
                df, "payload", id_col="id", decode="real", lenient=True
            ).collect()
        }
        assert (rows[0].width, rows[0].height) == (24, 16)
        assert rows[0].px_sum is not None
        # constant image survives lossy coding near-exactly
        assert abs(rows[0].mean_px - 120.0) < 3.0
        assert (rows[1].width, rows[1].height) == (32, 16)
        assert rows[1].px_sum is None
