"""r16 capability-wave quality planes: decoded-PCM audio signals
(clipping/silence/sum-of-squares, integer-exact) and reference
image-pair metrics (MSE/PSNR/SSIM over the magic-dispatch decode)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from openaq_data_pipeline_spark.operators.flac import encode_flac
from openaq_data_pipeline_spark.operators.multimodal import (
    audio_pcm_stats,
    encode_jpeg_baseline,
    encode_png,
    encode_wav_pcm16,
    image_pair_metrics,
)


class TestAudioPcmStats:
    def test_wav_integer_exact(self):
        s = np.zeros(300, np.int16)
        s[:80] = 25000
        got = audio_pcm_stats(encode_wav_pcm16(s, 44100))
        assert got == ("wav", 1, 44100, 300, 25000, 80 * 25000**2, 0, 220)

    def test_flac_clipping_and_depth_scaled_threshold(self):
        pcm = np.zeros((300, 1), np.int32)
        pcm[:80, 0] = 32767  # full scale at depth 16
        got = audio_pcm_stats(encode_flac(pcm, sample_rate=16000))
        assert got == (
            "flac", 1, 16000, 300, 32767, 80 * 32767**2, 80, 220,
        )
        # silence threshold is FS >> 10 = 31 at 16-bit
        pcm2 = np.full((100, 1), 31, np.int32)
        got2 = audio_pcm_stats(encode_flac(pcm2, sample_rate=8000))
        assert got2[7] == 100  # all within the silence band
        pcm3 = np.full((100, 1), 32, np.int32)
        assert audio_pcm_stats(
            encode_flac(pcm3, sample_rate=8000)
        )[7] == 0

    def test_stereo_flac_counts_both_channels(self):
        pcm = np.zeros((50, 2), np.int32)
        pcm[:10, 0] = 1000
        codec, ch, _r, n, peak, ssq, clip, sil = audio_pcm_stats(
            encode_flac(pcm, sample_rate=44100)
        )
        assert (codec, ch, n) == ("flac", 2, 50)
        assert ssq == 10 * 1000**2
        assert sil == 90  # 10 loud of 100 values

    def test_unknown_magic(self):
        with pytest.raises(ValueError, match="unknown audio magic"):
            audio_pcm_stats(b"OggS1234")


class TestImagePairMetrics:
    def _run(self, spark, rows):
        df = spark.createDataFrame(
            rows, "media_id long, a binary, b binary"
        )
        return {
            r.media_id: r
            for r in image_pair_metrics(
                df, "a", "b", lenient=True
            ).collect()
        }

    def test_known_shift_psnr_and_identity(self, spark):
        base = (
            np.arange(72, dtype=np.int64).reshape(4, 6, 3) % 200
        ).astype(np.uint8)
        shifted = base.copy()
        shifted[:2] += np.uint8(5)
        got = self._run(
            spark,
            [
                (1, encode_png(base), encode_png(shifted)),
                (2, encode_png(base), encode_png(base)),
                (3, encode_png(base), b"not an image"),
            ],
        )
        r = got[1]
        mse_num = 2 * 6 * 3 * 25
        assert r.n_values == 72 and r.mse_num == mse_num
        assert r.psnr_db == pytest.approx(
            10 * math.log10(255 * 255 * 72 / mse_num)
        )
        assert 0 < r.ssim_global < 1
        # identical: PSNR undefined → observable NULL, SSIM exactly 1
        assert got[2].mse_num == 0 and got[2].psnr_db is None
        assert got[2].ssim_global == pytest.approx(1.0)
        # undecodable side → NULL row under lenient
        assert got[3].mse_num is None

    def test_cross_format_pair_decodes_both_sides(self, spark):
        """PNG vs JPEG of the same image: the pair plane rides the
        one magic-dispatch decode, so lossy-vs-lossless transcode
        loss is measurable directly."""
        rng = np.random.default_rng(4)
        coarse = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
        img = np.repeat(np.repeat(coarse, 2, 0), 2, 1)
        got = self._run(
            spark,
            [(1, encode_png(img), encode_jpeg_baseline(img, q=2))],
        )
        r = got[1]
        assert r.n_values == img.size
        assert r.mse_num >= 0 and r.psnr_db is None or r.psnr_db > 20

    def test_shape_mismatch_is_error_not_zero(self, spark):
        a = np.zeros((4, 4, 3), np.uint8)
        b = np.zeros((4, 5, 3), np.uint8)
        got = self._run(spark, [(1, encode_png(a), encode_png(b))])
        assert got[1].mse_num is None  # lenient NULL, never "similar"
        df = spark.createDataFrame(
            [(1, encode_png(a), encode_png(b))],
            "media_id long, a binary, b binary",
        )
        with pytest.raises(Exception):
            image_pair_metrics(df, "a", "b").collect()
