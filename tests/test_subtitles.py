"""SRT/WebVTT cue extraction (r16): format detection, the codegen
cue explode, optional-hours timestamps, tag strip, non-cue block
drops — plus the JPEG DQT quality-estimation plane from the same
capability wave."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.subtitles import (
    detect_subtitle_format,
    extract_subtitle_cues,
)

SRT = (
    "1\n00:00:01,000 --> 00:00:03,500\nfirst line\nsecond line\n"
    "\n"
    "2\n00:01:00,250 --> 00:01:02,000\nsecond cue\n"
)
VTT = (
    "WEBVTT - with a title\n"
    "\n"
    "NOTE\nthis comment block must drop\n"
    "\n"
    "intro-cue-id\n00:05.000 --> 00:07.250 align:start\n"
    "<b>styled</b> and <c.yellow>classed</c>\n"
    "\n"
    "01:02:03.004 --> 01:02:04.000\nplain tail\n"
)


class TestSubtitles:
    def test_detection(self, spark):
        df = spark.createDataFrame(
            [(0, SRT), (1, VTT), (2, "just some text\nno cues")],
            "id long, content string",
        )
        got = {
            r.id: r.fmt
            for r in df.select(
                "id",
                detect_subtitle_format(F.col("content")).alias("fmt"),
            ).collect()
        }
        assert got == {0: "srt", 1: "vtt", 2: None}

    def test_srt_cues(self, spark):
        df = spark.createDataFrame([(7, SRT)], "id long, content string")
        rows = (
            extract_subtitle_cues(df, "content", "id")
            .orderBy("cue_idx")
            .collect()
        )
        assert [
            (r.cue_idx, r.start_ms, r.end_ms, r.text) for r in rows
        ] == [
            (0, 1000, 3500, "first line second line"),
            (1, 60250, 62000, "second cue"),
        ]

    def test_vtt_cues_tags_notes_and_short_timestamps(self, spark):
        df = spark.createDataFrame([(9, VTT)], "id long, content string")
        rows = (
            extract_subtitle_cues(df, "content", "id")
            .orderBy("cue_idx")
            .collect()
        )
        # the WEBVTT header and NOTE blocks dropped; cue ids ignored
        assert [
            (r.cue_idx, r.start_ms, r.end_ms, r.text) for r in rows
        ] == [
            (0, 5000, 7250, "styled and classed"),
            (1, 3723004, 3724000, "plain tail"),
        ]

    def test_crlf_and_bom(self, spark):
        content = "﻿" + SRT.replace("\n", "\r\n")
        df = spark.createDataFrame(
            [(1, content)], "id long, content string"
        )
        assert extract_subtitle_cues(df, "content", "id").count() == 2


class TestJpegQuality:
    def test_flat_table_returns_none_not_a_guess(self):
        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_jpeg_baseline,
            jpeg_quality_stats,
        )

        img = np.full((8, 8, 3), 90, np.uint8)
        nt, est = jpeg_quality_stats(encode_jpeg_baseline(img, q=8))
        assert (nt, est) == (1, None)
        with pytest.raises(ValueError, match="not a JPEG"):
            jpeg_quality_stats(b"BM123456")

    def test_ijg_inversion_exact(self):
        from openaq_data_pipeline_spark.operators import jpeg_native
        from openaq_data_pipeline_spark.operators.multimodal import (
            jpeg_quality_stats,
        )

        if not jpeg_native.available():
            pytest.skip("libjpeg shim not present")
        img = np.random.default_rng(0).integers(
            0, 256, (16, 16, 3)
        ).astype(np.uint8)
        for q in (5, 30, 50, 85, 97, 100):
            blob = jpeg_native.encode_jpeg_native(img, quality=q)
            assert jpeg_quality_stats(blob) == (2, q)
        prog = jpeg_native.encode_jpeg_native(
            img, quality=80, progressive=True
        )
        assert jpeg_quality_stats(prog) == (2, 80)

    def test_quality_features_lenient(self, spark):
        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_jpeg_baseline,
            jpeg_quality_features,
        )

        img = np.full((8, 8, 3), 33, np.uint8)
        rows = [
            (1, encode_jpeg_baseline(img, q=4)),
            (2, b"not a jpeg"),
        ]
        df = spark.createDataFrame(rows, "media_id long, content binary")
        got = {
            r.media_id: r
            for r in jpeg_quality_features(
                df, "content", lenient=True
            ).collect()
        }
        assert got[1].n_quant_tables == 1
        assert got[1].quality_est is None
        assert got[1].is_progressive is False
        assert got[2].n_quant_tables is None
