"""AV1 keyframe extraction for av01 MP4 tracks (r16, VERDICT r15
next #5): the repack route — sample tables → keyframe OBUs →
minimal AVIF → gated libavif/dav1d decode — plus the sample
addressing, degrade and fold faces."""

from __future__ import annotations

import numpy as np
import pytest

from openaq_data_pipeline_spark.operators import avif_native
from openaq_data_pipeline_spark.operators.multimodal import (
    _mp4_sample_span,
    _mp4_stats,
    build_avif_still,
    encode_mp4_av01,
    encode_mp4_stub,
    extract_av1_keyframe,
    extract_avif_av1_item,
)

STATIC_AV1C = bytes.fromhex("81200000")


@pytest.mark.skipif(
    not avif_native.available(), reason="libavif not present"
)
class TestKeyframeRoundTrip:
    def _coded(self, seed=2):
        rng = np.random.default_rng(seed)
        coarse = rng.integers(0, 256, (4, 8, 3)).astype(np.uint8)
        img = np.repeat(np.repeat(coarse, 4, 0), 4, 1)
        avif = avif_native.encode_avif(img)
        ref = avif_native.decode_avif_native(avif)
        return avif, ref

    def test_repacked_avif_decodes_identically(self):
        avif, ref = self._coded()
        av1c, obus, w, h = extract_avif_av1_item(avif)
        assert (w, h) == (32, 16)
        rebuilt = build_avif_still(obus, av1c, w, h)
        assert np.array_equal(
            avif_native.decode_avif_native(rebuilt), ref
        )

    def test_mp4_keyframe_matches_avif_decode(self):
        avif, ref = self._coded()
        av1c, obus, w, h = extract_avif_av1_item(avif)
        mp4 = encode_mp4_av01([obus], av1c, w, h)
        assert np.array_equal(extract_av1_keyframe(mp4), ref)
        # the generic header walk still reads the av01 container
        assert _mp4_stats(mp4)[:3] == (1, w, h)

    def test_stss_selects_past_non_sync_lead(self):
        """A garbage delta frame ahead of the keyframe: stss says
        sample 2, the stsc/stsz/stco addressing must skip sample 1's
        bytes exactly."""
        avif, ref = self._coded()
        av1c, obus, w, h = extract_avif_av1_item(avif)
        mp4 = encode_mp4_av01(
            [b"\x00junk\xff" * 5, obus], av1c, w, h, sync_sample=2
        )
        assert np.array_equal(extract_av1_keyframe(mp4), ref)

    def test_garbage_obus_raise(self):
        with pytest.raises(ValueError):
            extract_av1_keyframe(
                encode_mp4_av01([b"\xde\xad" * 20], STATIC_AV1C, 8, 8)
            )

    def test_dimension_cap(self):
        avif, _ = self._coded()
        av1c, obus, w, h = extract_avif_av1_item(avif)
        with pytest.raises(ValueError, match="exceed cap"):
            extract_av1_keyframe(
                encode_mp4_av01([obus], av1c, w, h), max_px=16
            )


class TestAddressingAndDegrade:
    def test_sample_span_multi_chunk(self):
        """stsc runs over two chunks: samples 1-2 in chunk 1,
        samples 3-4 in chunk 2 — offsets accumulate within, and
        only within, the owning chunk."""
        tables = {
            "sizes": [10, 20, 30, 40],
            "offsets": [100, 500],
            "runs": [(1, 2, 1), (2, 2, 1)],
        }
        assert _mp4_sample_span(tables, 1) == (100, 10)
        assert _mp4_sample_span(tables, 2) == (110, 20)
        assert _mp4_sample_span(tables, 3) == (500, 30)
        assert _mp4_sample_span(tables, 4) == (530, 40)
        with pytest.raises(ValueError, match="out of range"):
            _mp4_sample_span(tables, 5)

    def test_non_av01_track_raises(self):
        with pytest.raises(ValueError, match="no av01 track"):
            extract_av1_keyframe(encode_mp4_stub(3, 8, 6))

    def test_gate_closed_degrades(self, monkeypatch):
        monkeypatch.setattr(avif_native, "_LIB", None)
        monkeypatch.setattr(avif_native, "_LOAD_FAILED", True)
        mp4 = encode_mp4_av01([b"\x12" * 40], STATIC_AV1C, 8, 8)
        with pytest.raises(ValueError):
            extract_av1_keyframe(mp4)
        # header walk unaffected
        assert _mp4_stats(mp4)[:3] == (1, 8, 8)

    def test_features_plane_lenient_split(self, spark):
        """One Arrow pass: av01 rows decode (when gated lib loads),
        mp4v rows keep stats with kf_decoded FALSE, corrupt rows
        keep NULLs — observable, never a stage failure."""
        from openaq_data_pipeline_spark.operators.multimodal import (
            av1_keyframe_features,
        )

        rows = [
            (1, encode_mp4_stub(3, 8, 6, frame_payload=4)),
            (2, encode_mp4_av01([b"\xde\xad" * 9], STATIC_AV1C, 6, 4)),
            (3, b"not an mp4 at all"),
        ]
        if avif_native.available():
            img = np.full((8, 16, 3), 50, np.uint8)
            av1c, obus, w, h = extract_avif_av1_item(
                avif_native.encode_avif(img)
            )
            rows.append((4, encode_mp4_av01([obus], av1c, w, h)))
        df = spark.createDataFrame(rows, "media_id long, content binary")
        got = {
            r.media_id: r
            for r in av1_keyframe_features(
                df, "content", lenient=True
            ).collect()
        }
        assert got[1].n_frames == 3 and got[1].kf_decoded is False
        assert got[2].kf_decoded is False and got[2].kf_mean is None
        assert got[3].n_frames is None and got[3].kf_decoded is False
        if avif_native.available():
            assert got[4].kf_decoded is True
            assert abs(got[4].kf_mean - 50.0) <= 5.0
