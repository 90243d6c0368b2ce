"""Unit tests for the round-5 corpus operators: WAV codec + audio
features, boilerplate line removal, domain-mixture sampling,
embedding quantization, vocabulary heavy hitters."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.curation import (
    mixture_sample,
    remove_boilerplate_lines,
)
from openaq_data_pipeline_spark.operators.multimodal import (
    audio_features,
    decode_wav_pcm16,
    encode_wav_pcm16,
    synthetic_audio,
)
from openaq_data_pipeline_spark.operators.similarity import quantize_embeddings
from openaq_data_pipeline_spark.operators.text import top_ngrams


# --- WAV codec ----------------------------------------------------------


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(7)
    for n, rate in [(1, 8000), (17, 16000), (640, 24000)]:
        samples = rng.integers(-32768, 32768, n, dtype=np.int16)
        back, r = decode_wav_pcm16(encode_wav_pcm16(samples, rate))
        assert r == rate
        assert np.array_equal(back, samples)


def test_wav_decoder_skips_extra_chunks():
    samples = np.arange(-5, 5, dtype=np.int16)
    blob = encode_wav_pcm16(samples, 8000)
    # splice a LIST chunk (odd length → 2-byte aligned) between
    # fmt and data, as real recorders emit
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    back, rate = decode_wav_pcm16(spliced)
    assert rate == 8000 and np.array_equal(back, samples)


def test_wav_decoder_rejects_non_pcm():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm16(b"OggS" + b"\x00" * 60)
    stereo = bytearray(encode_wav_pcm16(np.zeros(4, dtype=np.int16), 8000))
    struct.pack_into("<H", stereo, 12 + 8 + 2, 2)  # channels = 2
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav_pcm16(bytes(stereo))


def test_audio_features_on_synthetic_clips(spark):
    ids = spark.range(0, 20).select(F.col("id").alias("media_id"))
    out = {
        r["media_id"]: r
        for r in audio_features(synthetic_audio(ids)).collect()
    }
    assert len(out) == 20
    for mid, r in out.items():
        n = 256 + 64 * (mid % 7)
        rate = 8000 * (1 + mid % 3)
        k = np.arange(n, dtype=np.int64)
        s = (mid * 7919 + k * 773) % 4001 - 2000
        assert r["n_samples"] == n and r["sample_rate"] == rate
        assert r["n_bytes"] == 44 + 2 * n
        assert r["header_hex"] == "52494646"
        assert r["duration_ms"] == n * 1000 // rate
        assert r["sum_abs"] == int(np.abs(s).sum())
        assert r["peak"] == int(np.abs(s).max())
        neg = s < 0
        assert r["n_zero_cross"] == int((neg[1:] != neg[:-1]).sum())


# --- boilerplate line removal ------------------------------------------


def test_boilerplate_lines_dropped_corpus_wide(spark):
    bl = "all rights reserved"
    rows = [(i, f"unique line {i}\n{bl}\nbody {i} text") for i in range(6)]
    rows.append((99, "no footer here\njust prose"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(df, "text", "doc_id", min_df=3).collect()
    }
    for i in range(6):
        assert out[i]["n_lines"] == 3 and out[i]["n_kept"] == 2
        expected = f"unique line {i}\nbody {i} text"
        assert out[i]["kept_fp"] == hashlib.md5(expected.encode()).hexdigest()
    assert out[99]["n_kept"] == 2  # untouched doc


def test_boilerplate_all_lines_removed_keeps_empty_fp(spark):
    rows = [(i, "same\nsame again") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = remove_boilerplate_lines(df, "text", "doc_id", min_df=4).collect()
    for r in out:
        assert r["n_kept"] == 0
        assert r["kept_fp"] == hashlib.md5(b"").hexdigest()


# --- domain mixture sampling -------------------------------------------


def _mix_fixture(spark):
    rows = [(i, ["a", "b", "c", "junk"][i % 4]) for i in range(4000)]
    return spark.createDataFrame(rows, ["id", "domain"])


def test_mixture_sample_hits_target_composition(spark):
    df = _mix_fixture(spark)
    kept = mixture_sample(df, "id", "domain", {"a": 6, "b": 3, "c": 1}).cache()
    by = {r["domain"]: r["n"] for r in kept.groupBy("domain").count().withColumnRenamed("count", "n").collect()}
    kept.unpersist()
    assert "junk" not in by  # weight-0 strata dropped
    # binding stratum (a: 1000 docs / weight 6) is kept whole
    assert by["a"] == 1000
    # others down-sample to ~ w_s/w_a · 1000 (hash-uniform → ±10%)
    assert abs(by["b"] - 500) < 50
    assert abs(by["c"] - 1000 / 6) < 35
    # mixture, not just counts: b/a ratio ≈ 3/6
    assert abs(by["b"] / by["a"] - 0.5) < 0.05


def test_mixture_sample_deterministic_and_validates(spark):
    df = _mix_fixture(spark)
    w = {"a": 2, "b": 1}
    r1 = sorted(r["id"] for r in mixture_sample(df, "id", "domain", w).collect())
    r2 = sorted(r["id"] for r in mixture_sample(df, "id", "domain", w).collect())
    assert r1 == r2 and len(r1) > 0
    with pytest.raises(ValueError, match="positive"):
        mixture_sample(df, "id", "domain", {"a": 0})
    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample(df, "id", "domain", {})


# --- embedding quantization --------------------------------------------


def test_quantize_embeddings_codes_and_constant_dim(spark):
    rows = [
        (10_000, [0.0, 5.0, -1.0]),
        (10_001, [1.0, 5.0, 0.0]),
        (10_002, [2.0, 5.0, 3.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "vec"])
    out = {
        r["vec_id"]: r
        for r in quantize_embeddings(df, "vec", "vec_id").collect()
    }
    assert all(r["n_dims"] == 3 for r in out.values())
    # dim 0 spans [0, 2] → codes 0 / 127 / 255; dim 1 constant → 0;
    # dim 2 spans [-1, 3] → floor((x+1)·255/4)
    def codes(vid):
        r = out[vid]
        return r["q_sum"], r["q_min"], r["q_max"]

    assert codes(10_000) == (0 + 0 + 0, 0, 0)
    assert codes(10_001) == (127 + 0 + 63, 0, 127)
    assert codes(10_002) == (255 + 0 + 255, 0, 255)
    fp = hashlib.md5(b"127,0,63").hexdigest()
    assert out[10_001]["q_fp"] == fp


def test_quantize_embeddings_bounds_property(spark):
    rng = np.random.default_rng(3)
    rows = [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(64)]
    df = spark.createDataFrame(rows, ["vec_id", "vec"])
    for r in quantize_embeddings(df, "vec", "vec_id").collect():
        assert 0 <= r["q_min"] <= r["q_max"] <= 255
        assert r["n_dims"] == 8


# --- vocabulary heavy hitters ------------------------------------------


def test_top_ngrams_counts_and_rank_order(spark):
    rows = [
        (1, "spark spark spark duck"),
        (2, "spark duck duck"),
        (3, "goose"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uni = {r["gram"]: r for r in top_ngrams(df, "text", "doc_id", n=1, k=10).collect()}
    assert uni["spark"]["n_occurrences"] == 4 and uni["spark"]["n_docs"] == 2
    assert uni["duck"]["n_occurrences"] == 3 and uni["duck"]["n_docs"] == 2
    assert uni["goose"]["rank"] == 3  # tie-break: count desc then text asc
    bi = {r["gram"]: r for r in top_ngrams(df, "text", "doc_id", n=2, k=10).collect()}
    assert bi["spark spark"]["n_occurrences"] == 2
    assert bi["duck duck"]["n_docs"] == 1
    assert "goose" not in bi  # single-token doc carries no bigram


def test_top_ngrams_k_bound(spark):
    rows = [(i, f"w{i} common") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = top_ngrams(df, "text", "doc_id", n=1, k=5).collect()
    assert len(out) == 5
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, 6)
    )
    assert out[0]["gram"] == "common"
