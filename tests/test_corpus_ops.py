"""Unit tests for the round-5 corpus operators: WAV codec + audio
features, boilerplate line removal, domain-mixture sampling,
embedding quantization, vocabulary heavy hitters, bigram-LM scoring,
BM25 retrieval, deterministic training shards."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
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


# --- bigram LM quality scoring -----------------------------------------


class TestBigramLM:
    def _fit(self, spark, rows):
        from openaq_data_pipeline_spark.operators.lm import train_bigram_lm

        train = spark.createDataFrame(rows, "doc_id long, text string")
        return train_bigram_lm(train, "text", "doc_id")

    def test_counts_and_vocab(self, spark):
        c12, c1, v = self._fit(
            spark, [(0, "a b a b c"), (2, "a b")]
        )
        got12 = {(r.w1, r.w2): r.c12 for r in c12.collect()}
        # bigrams: doc0 = (a,b),(b,a),(a,b),(b,c); doc2 = (a,b)
        assert got12 == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
        got1 = {r.w1: r.c1 for r in c1.collect()}
        assert got1 == {"a": 3, "b": 2}
        assert v == 3  # successors {a, b, c}

    def test_degenerate_training_corpus_fails_at_train_time(self, spark):
        """ADVICE r5 #1: a slice with no >=2-token documents must
        raise a clear ValueError at train time, not an opaque
        DIVIDE_BY_ZERO when scoring hits den = 0 + V = 0."""
        with pytest.raises(ValueError, match="vocab_size would be 0"):
            self._fit(spark, [(0, "single"), (2, "word")])

    def test_score_known_probabilities(self, spark):
        from openaq_data_pipeline_spark.operators.lm import score_bigram_lm

        c12, c1, v = self._fit(spark, [(0, "a b a b c"), (2, "a b")])
        docs = spark.createDataFrame(
            [
                (1, "a b"),       # P(b|a) = (3+1)/(3+3) = 0.666667
                (3, "a z"),       # unseen bigram: (0+1)/(3+3) = 0.166667
                (5, "z z"),       # unseen context: 1/(0+3) = 0.333333
                (7, "one"),       # < 2 tokens -> no row
                (9, "a b c"),     # mean of 2/3 and (1+1)/(2+3)=0.4
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: (r.n_bigrams, r.avg_prob)
            for r in score_bigram_lm(docs, "text", "doc_id", c12, c1, v).collect()
        }
        assert out == {
            1: (1, 0.6667),
            3: (1, 0.1667),
            5: (1, 0.3333),
            9: (2, 0.5333),  # mean of fixed-point 0.666667 and 0.4
        }

    def test_normalization_matches_shingle_contract(self, spark):
        """Mixed case + runs of whitespace tokenize identically to
        the dedup shingle pipeline (lower + collapse + trim)."""
        from openaq_data_pipeline_spark.operators.lm import bigram_stream

        df = spark.createDataFrame(
            [(1, "  Foo\t\tBAR  baz\n")], "doc_id long, text string"
        )
        got = [
            (r.w1, r.w2)
            for r in bigram_stream(df, "text", "doc_id").orderBy("w1").collect()
        ]
        assert sorted(got) == [("bar", "baz"), ("foo", "bar")]


# --- BM25 retrieval ----------------------------------------------------


class TestBM25:
    def test_hand_computed_scores(self, spark):
        """3-doc corpus (one empty — it still counts toward N and S),
        1-term query. N=3, S=5, df(apple)=2, idf=(6-4+1)/5=3/5:
        d1: tf=1, dl=2 -> 330/595  = 0.554622 -> 554622
        d2: tf=2, dl=3 -> 660/980  = 0.673469 -> 673469"""
        from openaq_data_pipeline_spark.operators.retrieval import bm25_topk

        corpus = spark.createDataFrame(
            [(1, "apple banana"), (2, "apple apple cherry"), (3, "")],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(100, "apple")], "query_id long, q_text string"
        )
        out = [
            (r.query_id, r.rank, r.doc_id, r.score_fp)
            for r in bm25_topk(
                corpus, queries, "text", "doc_id", "q_text"
            ).orderBy("rank").collect()
        ]
        assert out == [(100, 1, 2, 673469), (100, 2, 1, 554622)]

    def test_multi_term_sums_and_tiebreak(self, spark):
        """Terms sum per doc; equal scores rank by doc_id; docs
        sharing no term never appear; k bounds the output."""
        from openaq_data_pipeline_spark.operators.retrieval import bm25_topk

        corpus = spark.createDataFrame(
            [(1, "x y"), (2, "x y"), (3, "z z z"), (4, "w")],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(7, "x y"), (8, "q")], "query_id long, q_text string"
        )
        rows = bm25_topk(
            corpus, queries, "text", "doc_id", "q_text", k=1
        ).collect()
        out = [(r.query_id, r.rank, r.doc_id) for r in rows]
        # docs 1 and 2 are identical -> tie -> doc 1 wins; query 8
        # matches nothing and emits nothing; k=1 keeps one row
        assert out == [(7, 1, 1)]
        scores = {
            (r.query_id, r.doc_id): r.score_fp
            for r in bm25_topk(
                corpus, queries, "text", "doc_id", "q_text", k=5
            ).collect()
        }
        assert scores[(7, 1)] == scores[(7, 2)]
        assert (7, 3) not in scores and (7, 4) not in scores


# --- training shards ---------------------------------------------------


class TestShards:
    def test_assignment_deterministic_and_dense(self, spark):
        from openaq_data_pipeline_spark.operators.curation import shard_assignments

        df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
        a1 = {(r.doc_id, r.shard_id, r.shard_pos)
              for r in shard_assignments(df, "doc_id", 8).collect()}
        a2 = {(r.doc_id, r.shard_id, r.shard_pos)
              for r in shard_assignments(df, "doc_id", 8).collect()}
        assert a1 == a2 and len(a1) == 500
        by_shard: dict = {}
        for _, sid, pos in a1:
            by_shard.setdefault(sid, []).append(pos)
        # positions are dense 1..n per shard; every shard populated
        # (500 rows over 8 MD5-uniform shards)
        assert set(by_shard) == set(range(8))
        for sid, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1))
        # roughly balanced (uniform hash: 500/8 ≈ 62 ± slack)
        assert all(30 <= len(ps) <= 95 for ps in by_shard.values())
        import pytest as _pytest
        with _pytest.raises(ValueError, match="positive"):
            shard_assignments(df, "doc_id", 0)

    def test_write_shards_layout_and_order(self, spark, tmp_path):
        import json, glob, os
        from openaq_data_pipeline_spark.operators.curation import write_shards

        df = spark.range(0, 100).select(
            F.col("id").alias("doc_id"), (F.col("id") * 2).alias("payload")
        )
        path = str(tmp_path / "shards")
        write_shards(df, path, "doc_id", 4)
        dirs = sorted(
            os.path.basename(p) for p in glob.glob(f"{path}/shard_id=*")
        )
        assert dirs == [f"shard_id={i}" for i in range(4)]
        # within a shard: rows laid down in shard_pos order, payload intact
        for d in dirs:
            rows = []
            for f in sorted(glob.glob(f"{path}/{d}/part-*")):
                with open(f) as fh:
                    rows += [json.loads(line) for line in fh]
            assert [r["shard_pos"] for r in rows] == list(
                range(1, len(rows) + 1)
            )
            assert all(r["payload"] == r["doc_id"] * 2 for r in rows)


# --- video container + frame sampling ----------------------------------


class TestVideoFrames:
    def test_mbmp_roundtrip_and_corruption(self):
        from openaq_data_pipeline_spark.operators.multimodal import (
            decode_video_mbmp,
            encode_video_mbmp,
        )

        rng = np.random.default_rng(11)
        frames = [
            rng.integers(0, 256, (3, 5, 3), dtype=np.uint8) for _ in range(4)
        ]
        blob = encode_video_mbmp(frames)
        back = decode_video_mbmp(blob)
        assert len(back) == 4
        assert all(np.array_equal(a, b) for a, b in zip(frames, back))
        with pytest.raises(ValueError, match="MBMP"):
            decode_video_mbmp(b"RIFF" + blob[4:])
        with pytest.raises(ValueError, match="trailing"):
            decode_video_mbmp(blob + b"\x00")

    def test_stride_sampling_stats(self, spark):
        """stride=2 over n_frames = 3 + id%4 keeps frames {0, 2[, 4]}
        only; per-frame stats match the closed-form pixel formula."""
        from openaq_data_pipeline_spark.operators.multimodal import (
            sample_video_frames,
            synthetic_videos,
        )

        ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
        rows = sample_video_frames(synthetic_videos(ids), stride=2).collect()
        by = {}
        for r in rows:
            by.setdefault(r.media_id, []).append(r)
        for mid in range(12):
            nf = 3 + mid % 4
            w, h = 4 + mid % 5, 3 + mid % 3
            want = [f for f in range(nf) if f % 2 == 0]
            got = sorted(r.frame_idx for r in by[mid])
            assert got == want
            for r in by[mid]:
                assert (r.n_frames, r.width, r.height) == (nf, w, h)
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                exp = int(
                    ((mid * 31 + r.frame_idx * 13 + y * 7 + x * 3 + c * 11) % 256).sum()
                )
                assert r.px_sum == exp

    def test_stride_validation(self, spark):
        from openaq_data_pipeline_spark.operators.multimodal import (
            sample_video_frames,
            synthetic_videos,
        )

        ids = spark.range(0, 2).select(F.col("id").alias("media_id"))
        with pytest.raises(ValueError, match="stride"):
            sample_video_frames(synthetic_videos(ids), stride=0)


# --- BPE merge training ------------------------------------------------


def _py_bpe_merges(words: dict[str, int], n_merges: int):
    """Reference BPE with the module's contract: self-pairs excluded,
    ties by (lhs, rhs) text, simultaneous left-to-right merge."""
    seqs = {w: list(w) for w in words}
    out = []
    for r in range(1, n_merges + 1):
        counts: dict = {}
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                if a != b:
                    counts[(a, b)] = counts.get((a, b), 0) + words[w]
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((r, lhs, rhs, lhs + rhs, cnt))
        for w, seq in seqs.items():
            new, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == lhs and seq[i + 1] == rhs:
                    new.append(lhs + rhs)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            seqs[w] = new
    return out


class TestBPETraining:
    def test_matches_reference_on_known_corpus(self, spark):
        from openaq_data_pipeline_spark.operators.tokenizer import bpe_train_merges

        rows = [
            (1, "low low low lower lower newest newest newest newest widest"),
            (2, "low newest widest widest"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        words: dict = {}
        for _, t in rows:
            for w in t.split():
                words[w] = words.get(w, 0) + 1
        got = [
            (r.merge_round, r.lhs, r.rhs, r.merged, r.pair_count)
            for r in bpe_train_merges(df, "text", "doc_id", n_merges=6)
            .orderBy("merge_round")
            .collect()
        ]
        assert got == _py_bpe_merges(words, 6)

    @given(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=6), min_size=1, max_size=12
        )
    )
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_matches_reference_on_random_corpora(self, spark, wordlist):
        from openaq_data_pipeline_spark.operators.tokenizer import bpe_train_merges

        df = spark.createDataFrame(
            [(1, " ".join(wordlist))], "doc_id long, text string"
        )
        words: dict = {}
        for w in wordlist:
            words[w] = words.get(w, 0) + 1
        got = [
            (r.merge_round, r.lhs, r.rhs, r.merged, r.pair_count)
            for r in bpe_train_merges(df, "text", "doc_id", n_merges=4)
            .orderBy("merge_round")
            .collect()
        ]
        assert got == _py_bpe_merges(words, 4)


class TestBPEDriverTrainer:
    """VERDICT r6 next #2: the driver-side finisher must be
    merge-for-merge identical to the distributed trainer — the heap /
    adjacency-index bookkeeping is where incremental BPE trainers
    classically drift from the naive recount."""

    @given(
        st.lists(
            st.text(alphabet="abcde", min_size=1, max_size=8),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_local_matches_bruteforce_reference(self, wordlist):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            bpe_train_merges_local,
        )

        words: dict = {}
        for w in wordlist:
            words[w] = words.get(w, 0) + 1
        vocab = list(words.items())
        # deep enough to exhaust some corpora (early-stop path) and to
        # exercise many incremental count updates on others
        assert bpe_train_merges_local(vocab, 30) == _py_bpe_merges(words, 30)

    def test_driver_wrapper_matches_distributed(self, spark):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            bpe_train_merges,
            bpe_train_merges_driver,
        )

        rows = [
            (1, "low low low lower lower newest newest newest newest widest"),
            (2, "low newest widest widest"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        dist = [
            tuple(r)
            for r in bpe_train_merges(df, "text", "doc_id", n_merges=8)
            .orderBy("merge_round")
            .collect()
        ]
        drv = [
            tuple(r)
            for r in bpe_train_merges_driver(df, "text", "doc_id", n_merges=8)
            .orderBy("merge_round")
            .collect()
        ]
        assert drv == dist

    def test_production_scale_merge_count_is_fast(self):
        """The point of the finisher: vocabulary-scale merge counts in
        driver time. 2000 merges over a 5k-word synthetic vocab must
        finish in seconds (the sequential-job path would need 2000
        Spark jobs)."""
        import time

        from openaq_data_pipeline_spark.operators.tokenizer import (
            bpe_train_merges_local,
        )

        rng = __import__("random").Random(7)
        alphabet = "abcdefghijklmnop"
        vocab = [
            (
                "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 12))),
                rng.randint(1, 500),
            )
            for _ in range(5000)
        ]
        t0 = time.perf_counter()
        rows = bpe_train_merges_local(vocab, 2000)
        dt = time.perf_counter() - t0
        assert dt < 30.0
        assert len(rows) > 500  # deep vocabulary actually learned
        # ids contract: rounds are 1..n and consecutive
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        # winning counts are non-increasing: a merge only shrinks
        # existing pairs' counts, and every brand-new pair (x,M)/(M,y)
        # is bounded by the merged symbol's count = the winner's count
        for prev, cur in zip(rows, rows[1:]):
            assert cur[4] <= prev[4]


# --- BPE apply/encode (VERDICT r5 next #2) -----------------------------


def _py_bpe_encode(docs, merges):
    """Reference encoder for the bpe_encode id contract: apply merges
    in round order, ids = sorted alphabet then A + round - 1 with
    earliest-round-wins, UNK = -1, empty docs omitted."""
    words = {w for _, t in docs for w in t.split()}
    seqs = {w: list(w) for w in words}
    for _, lhs, rhs, merged, _ in merges:
        for w, seq in seqs.items():
            new, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == lhs and seq[i + 1] == rhs:
                    new.append(merged)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            seqs[w] = new
    alphabet = sorted({c for w in words for c in w})
    ids = {c: i for i, c in enumerate(alphabet)}
    a = len(alphabet)
    for rnd, _, _, merged, _ in merges:
        ids.setdefault(merged, a + rnd - 1)
    return {
        did: [ids.get(s, -1) for w in t.split() for s in seqs[w]]
        for did, t in docs
        if t.split()
    }


class TestBPEEncode:
    ROWS = [
        (0, "low lower lowest"),
        (1, "low low newest"),
        (2, ""),  # zero tokens -> omitted
    ]

    def _encode(self, spark, rows, n_merges=3):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            bpe_encode,
            bpe_train_merges,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = bpe_train_merges(df, "text", "doc_id", n_merges=n_merges)
        return df, merges, bpe_encode(df, "text", "doc_id", merges)

    def test_known_corpus_ids(self, spark):
        """Hand-derived: alphabet e,l,n,o,r,s,t,w -> 0..7; merges
        l+o(8), lo+w(9), e+s(10); 'lowest' -> [low, es, t]."""
        _, _, enc = self._encode(spark, self.ROWS)
        got = {r.doc_id: (list(r.token_ids), r.n_tokens) for r in enc.collect()}
        assert got == {
            0: ([9, 9, 0, 4, 9, 10, 6], 7),
            1: ([9, 9, 2, 0, 7, 10, 6], 7),
        }

    def test_matches_reference_encoder(self, spark):
        words: dict = {}
        for _, t in self.ROWS:
            for w in t.split():
                words[w] = words.get(w, 0) + 1
        merges = _py_bpe_merges(words, 3)
        _, _, enc = self._encode(spark, self.ROWS)
        got = {r.doc_id: list(r.token_ids) for r in enc.collect()}
        assert got == _py_bpe_encode(self.ROWS, merges)

    @given(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=5),
            min_size=1,
            max_size=10,
        )
    )
    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_matches_reference_on_random_corpora(self, spark, wordlist):
        rows = [(1, " ".join(wordlist))]
        words: dict = {}
        for w in wordlist:
            words[w] = words.get(w, 0) + 1
        merges = _py_bpe_merges(words, 3)
        _, _, enc = self._encode(spark, rows)
        got = {r.doc_id: list(r.token_ids) for r in enc.collect()}
        assert got == _py_bpe_encode(rows, merges)

    def test_cross_batch_encoding_keeps_training_ids(self, spark):
        """Encoding a NEW batch with the TRAINING corpus's symbol
        table keeps ids stable and maps unseen characters to -1 —
        ids are a property of the tokenizer, not the batch."""
        from openaq_data_pipeline_spark.operators.tokenizer import (
            bpe_encode,
            bpe_symbol_ids,
            bpe_train_merges,
        )

        train = spark.createDataFrame(
            self.ROWS, "doc_id long, text string"
        )
        merges = bpe_train_merges(train, "text", "doc_id", n_merges=3)
        sym = bpe_symbol_ids(train, "text", merges)
        batch = spark.createDataFrame(
            # 'low' must re-encode as [9]; 'z' is outside the
            # training alphabet -> -1
            [(100, "low zz")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: list(r.token_ids)
            for r in bpe_encode(
                batch, "text", "doc_id", merges, symbol_ids=sym
            ).collect()
        }
        assert got == {100: [9, -1, -1]}

    def test_tokenized_training_shards_end_to_end(self, spark, tmp_path):
        """The pipeline deliverable (VERDICT r5 next #2's framing):
        text → BPE token-id sequences → deterministic sharded export.
        Shards carry the token arrays + lengths, positions are dense
        per shard, and the export is reproducible run-to-run."""
        import glob as _glob
        import os as _os

        from openaq_data_pipeline_spark.operators.curation import write_shards
        from openaq_data_pipeline_spark.operators.tokenizer import (
            bpe_encode,
            bpe_train_merges,
        )

        rows = [(i, f"token stream number {i} with shared words") for i in range(24)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = bpe_train_merges(df, "text", "doc_id", n_merges=2)
        enc = bpe_encode(df, "text", "doc_id", merges)
        path = str(tmp_path / "token_shards")
        write_shards(enc, path, "doc_id", n_shards=3, format="parquet")

        out = spark.read.parquet(path)
        assert set(out.columns) >= {"doc_id", "token_ids", "n_tokens", "shard_id", "shard_pos"}
        assert out.count() == 24
        back = {r.doc_id: (list(r.token_ids), r.n_tokens) for r in out.collect()}
        ref = {r.doc_id: (list(r.token_ids), r.n_tokens) for r in enc.collect()}
        assert back == ref  # token payloads survive the export intact
        # dense per-shard positions
        for sid_dir in _glob.glob(_os.path.join(path, "shard_id=*")):
            rows_s = spark.read.parquet(sid_dir).select("shard_pos").collect()
            got = sorted(r.shard_pos for r in rows_s)
            assert got == list(range(1, len(got) + 1))


class TestBigramLogLik:
    def test_matches_python_reference(self, spark):
        """Production log-likelihood mode (r6): mean ln P(w2|w1)
        under the same add-one-smoothed model, checked against a
        straight Python computation."""
        import math

        from openaq_data_pipeline_spark.operators.lm import (
            score_bigram_loglik,
            train_bigram_lm,
        )

        train_rows = [(0, "a b a b c"), (2, "a b")]
        train = spark.createDataFrame(train_rows, "doc_id long, text string")
        c12, c1, v = train_bigram_lm(train, "text", "doc_id")
        docs = [(1, "a b"), (3, "a z"), (5, "z z"), (9, "a b c")]
        ddf = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_bigrams, r.avg_loglik)
            for r in score_bigram_loglik(
                ddf, "text", "doc_id", c12, c1, v
            ).collect()
        }
        # Python reference
        counts12 = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
        counts1 = {"a": 3, "b": 2}
        V = 3

        def ll(w1, w2):
            return math.log(
                (counts12.get((w1, w2), 0) + 1) / (counts1.get(w1, 0) + V)
            )

        for did, text in docs:
            ws = text.split()
            bigrams = list(zip(ws, ws[1:]))
            exp = sum(ll(a, b) for a, b in bigrams) / len(bigrams)
            n, avg = got[did]
            assert n == len(bigrams)
            assert avg == pytest.approx(round(exp, 6), abs=1e-6), (did, exp)

    def test_rejects_untrained_model(self, spark):
        from openaq_data_pipeline_spark.operators.lm import score_bigram_loglik

        ddf = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="vocab_size"):
            score_bigram_loglik(ddf, "text", "doc_id", ddf, ddf, 0)


class TestAviMjpeg:
    """MJPEG-in-AVI (VERDICT r6 next #6): real RIFF container + the
    real baseline JPEG codec, same partial-demux discipline as MBMP."""

    @staticmethod
    def _frames(mid=7, n=4, w=16, h=8):
        y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        return [
            ((mid * 31 + f * 13 + (y // 8) * 7 + (x // 8) * 3) % 256).astype(
                np.uint8
            )
            for f in range(n)
        ]

    def test_roundtrip_bit_exact_on_constant_blocks(self):
        from openaq_data_pipeline_spark.operators.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        frames = self._frames()
        dec = decode_avi_mjpeg(encode_avi_mjpeg(frames))
        assert len(dec) == len(frames)
        for a, b in zip(frames, dec):
            assert b.shape == (a.shape[0], a.shape[1], 3)
            assert (np.repeat(a[:, :, None], 3, axis=2) == b).all()

    def test_container_hygiene(self):
        import pytest as _pytest

        from openaq_data_pipeline_spark.operators.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        blob = encode_avi_mjpeg(self._frames())
        with _pytest.raises(ValueError, match="not a RIFF/AVI"):
            decode_avi_mjpeg(b"JUNK" + blob[4:])
        with _pytest.raises(ValueError, match="size does not match"):
            decode_avi_mjpeg(blob + b"trailing")
        with _pytest.raises(ValueError, match="truncated|size does not match"):
            decode_avi_mjpeg(blob[:-6])
        with _pytest.raises(ValueError, match="share one"):
            encode_avi_mjpeg(
                [np.zeros((8, 8), np.uint8), np.zeros((8, 16), np.uint8)]
            )

    def test_sampler_skips_unsampled_frames_without_decoding(self, spark):
        """THE partial-demux pin: scramble the entropy bytes of an
        UNSAMPLED (odd-index) frame's JPEG payload — the stride-2
        sampler must stay green because it seeks past the chunk by
        declared size, while the full decoder fails on the same
        blob."""
        import pytest as _pytest

        from openaq_data_pipeline_spark.operators.multimodal import (
            _avi_walk,
            decode_avi_mjpeg,
            encode_avi_mjpeg,
            sample_video_frames,
        )

        blob = bytearray(encode_avi_mjpeg(self._frames(n=4)))
        # frame 1 is unsampled under stride 2; corrupt the middle of
        # its payload (past the headers, inside entropy data)
        chunks = list(_avi_walk(bytes(blob)))
        f1_off, f1_sz = chunks[1][1], chunks[1][2]
        # clobber the frame's SOI marker AND its entropy tail: any
        # attempt to even header-parse this chunk fails immediately
        blob[f1_off] ^= 0xFF
        blob[f1_off + 1] ^= 0xFF
        mid = f1_off + f1_sz // 2
        for i in range(mid, f1_off + f1_sz - 2):
            blob[i] = 0x00
        with _pytest.raises(Exception):
            decode_avi_mjpeg(bytes(blob))
        df = spark.createDataFrame(
            [(1, bytes(blob))], "media_id long, content binary"
        )
        rows = sample_video_frames(df, stride=2).collect()
        assert sorted(r.frame_idx for r in rows) == [0, 2]
        assert all(r.n_frames == 4 for r in rows)

    def test_mp4_header_stats_roundtrip(self, spark):
        """ISO-BMFF walk (VERDICT r11 next #3): video_features reads
        frame count / dims / duration from the box tree of the
        engine's own structurally-valid stub — header-only, same
        frame as the AVI rows, dispatched by magic."""
        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_mp4_stub,
            video_features,
        )

        cases = [(1, 1, 16, 9, 10), (2, 7, 320, 240, 25), (3, 30, 64, 48, 30)]
        df = spark.createDataFrame(
            [(i, encode_mp4_stub(nf, w, h, fps=fps)) for i, nf, w, h, fps in cases],
            "media_id long, content binary",
        )
        got = {r.media_id: r for r in video_features(df).collect()}
        for i, nf, w, h, fps in cases:
            r = got[i]
            assert (r.n_frames, r.width, r.height, r.duration_ms) == (
                nf, w, h, nf * 1000 // fps,
            )
            assert r.header_hex == df.where(F.col("media_id") == i).first(
            )["content"][:4].hex()

    def test_mp4_walker_hygiene(self):
        """Validated, not trusted: ftyp must come first, truncation
        fails loudly, a header promising more sample bytes than mdat
        holds fails loudly (declared-vs-walked, like AVI), and a file
        with only a non-video trak is rejected."""
        import struct as st

        import pytest as _pytest

        from openaq_data_pipeline_spark.operators.multimodal import (
            _mp4_box,
            _mp4_stats,
            encode_mp4_stub,
        )

        blob = encode_mp4_stub(3, 8, 8)
        with _pytest.raises(ValueError, match="ftyp must come first"):
            _mp4_stats(_mp4_box(b"free", b"") + blob)
        with _pytest.raises(ValueError, match="bad MP4 box size"):
            _mp4_stats(blob[:-5])
        mut = bytearray(blob)
        st.pack_into(">I", mut, blob.find(b"stsz") + 16, 10**6)
        with _pytest.raises(ValueError, match="sample bytes"):
            _mp4_stats(bytes(mut))
        mut = bytearray(blob)
        i = blob.find(b"vide")
        mut[i : i + 4] = b"soun"  # audio-only file: no video trak
        with _pytest.raises(ValueError, match="no video trak"):
            _mp4_stats(bytes(mut))

    def test_mp4_version1_and_largesize_boxes(self):
        """The 64-bit faces of the spec: v1 mvhd/tkhd carry u64
        times (width/height shift by +12 bytes), and a size==1 box
        reads its u64 largesize — both public ISO 14496-12 layout."""
        import struct as st

        from openaq_data_pipeline_spark.operators.multimodal import (
            _MP4_UNITY_MATRIX,
            _mp4_box,
            _mp4_full,
            _mp4_stats,
            encode_mp4_stub,
        )

        base = encode_mp4_stub(5, 32, 16, fps=10)
        # rebuild mvhd as version 1 (u64 creation/modification/duration)
        mvhd1 = _mp4_full(
            b"mvhd", 1, 0,
            st.pack(">QQIQ", 0, 0, 10, 5)
            + st.pack(">IHH", 0x00010000, 0x0100, 0)
            + b"\x00" * 8 + _MP4_UNITY_MATRIX + b"\x00" * 24
            + st.pack(">I", 2),
        )
        tkhd1 = _mp4_full(
            b"tkhd", 1, 7,
            st.pack(">QQIIQ", 0, 0, 1, 0, 5)
            + b"\x00" * 8 + st.pack(">HHHH", 0, 0, 0, 0)
            + _MP4_UNITY_MATRIX
            + st.pack(">II", 32 << 16, 16 << 16),
        )
        # splice: swap the v0 boxes for the v1 spellings
        def box_span(blob, tag):
            i = blob.find(tag) - 4
            (sz,) = st.unpack_from(">I", blob, i)
            return i, i + sz

        out = bytearray(base)
        s, e = box_span(base, b"tkhd")
        out[s:e] = tkhd1
        s, e = box_span(bytes(out), b"mvhd")
        out[s:e] = mvhd1
        # fix the enclosing box sizes: moov holds both grown boxes
        # (+24), trak holds only the grown tkhd (+12)
        for tag, grow in ((b"moov", 24), (b"trak", 12)):
            i = bytes(out).find(tag) - 4
            (sz,) = st.unpack_from(">I", out, i)
            st.pack_into(">I", out, i, sz + grow)
        # stco offset: mdat moved by the total growth
        i = bytes(out).find(b"stco")
        (off,) = st.unpack_from(">I", out, i + 12)
        st.pack_into(">I", out, i + 12, off + 24)
        assert _mp4_stats(bytes(out)) == (5, 32, 16, 500)
        # largesize: rewrap mdat as a size==1 box
        m = bytes(out).find(b"mdat") - 4
        (msz,) = st.unpack_from(">I", out, m)
        body = bytes(out[m + 8 : m + msz])
        big = (
            st.pack(">I", 1) + b"mdat" + st.pack(">Q", 16 + len(body)) + body
        )
        out2 = bytes(out[:m]) + big
        # stco is now 8 bytes late, but stats only checks containment
        assert _mp4_stats(out2)[:3] == (5, 32, 16)

    def test_mixed_format_synthetic_corpus(self, spark):
        """mix_formats routes ids ≡1 (mod 3) through AVI; both
        container families sample correctly in one pass."""
        from openaq_data_pipeline_spark.operators.multimodal import (
            sample_video_frames,
            synthetic_videos,
        )

        ids = spark.createDataFrame([(i,) for i in range(6)], "media_id long")
        vids = synthetic_videos(ids, mix_formats=True)
        rows = sample_video_frames(vids, stride=2).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r.media_id, []).append(r)
        for i in range(6):
            nf = 3 + i % 4
            want_frames = [f for f in range(nf) if f % 2 == 0]
            assert sorted(r.frame_idx for r in by_id[i]) == want_frames
            if i % 3 == 1:  # AVI rows
                w, h = 8 * (1 + i % 2), 8 * (1 + (i // 2) % 2)
            else:
                w, h = 4 + i % 5, 3 + i % 3
            assert all((r.width, r.height) == (w, h) for r in by_id[i])
        # hand-check one AVI frame's pixel sum: id 1, frame 0 → 16x8
        # = two 8x8 blocks valued 31 and 31+3, replicated x3
        r = [x for x in by_id[1] if x.frame_idx == 0][0]
        assert r.px_sum == (31 + 34) * 64 * 3


class TestTrigramBackoff:
    """Stupid backoff (r8): each of the three tiers pinned against a
    pure-Python reference on a corpus crafted to hit all of them."""

    TRAIN = [
        (0, "the cat sat on the mat"),
        (2, "the cat ran off the mat"),
        (4, "a dog sat on a log"),
    ]
    # doc 1: "the cat sat" = seen trigram (tier 1);
    # "cat sat quickly": unseen trigram, seen bigram "sat quickly"? no
    # — crafted per-case below instead
    CAND = [
        (1, "the cat sat on the mat"),   # all trigrams seen
        (3, "the cat sat purring now"),  # trigram miss -> bigram/unigram
        (5, "zz yy xx"),                 # everything unseen -> 0
    ]

    def _spark_scores(self, spark):
        from openaq_data_pipeline_spark.operators.lm import (
            score_trigram_backoff,
            train_trigram_lm,
        )

        t = spark.createDataFrame(self.TRAIN, "doc_id long, text string")
        c = spark.createDataFrame(self.CAND, "doc_id long, text string")
        tri, bi, uni, n = train_trigram_lm(t, "text", "doc_id")
        out = score_trigram_backoff(c, "text", "doc_id", tri, bi, uni, n)
        return {r.doc_id: r for r in out.collect()}

    def _python_scores(self):
        from collections import Counter

        tri, bi, uni = Counter(), Counter(), Counter()
        n = 0
        for _, text in self.TRAIN:
            w = text.split()
            n += len(w)
            uni.update(w)
            bi.update(zip(w, w[1:]))
            tri.update(zip(w, w[1:], w[2:]))

        def fp(num, den, k=10**6):
            return (num * 2 * k + den) // (2 * den)

        out = {}
        for doc_id, text in self.CAND:
            w = text.split()
            s = []
            for g in zip(w, w[1:], w[2:]):
                if tri[g] > 0:
                    s.append(fp(tri[g], bi[g[:2]]))
                elif bi[g[1:]] > 0:
                    s.append(fp(2 * bi[g[1:]], 5 * uni[g[1]]))
                else:
                    s.append(fp(4 * uni[g[2]], 25 * n))
            k = 10**6
            t2 = sum(s) * 2 * 10**4 + len(s) * k
            out[doc_id] = (len(s), (t2 - t2 % (2 * len(s) * k)) // (2 * len(s) * k) / 10**4)
        return out

    def test_matches_python_reference(self, spark):
        got = self._spark_scores(spark)
        want = self._python_scores()
        assert set(got) == set(want)
        for doc_id, (n_tri, avg) in want.items():
            assert got[doc_id].n_trigrams == n_tri
            assert got[doc_id].avg_score == avg

    def test_fully_unseen_scores_zero(self, spark):
        got = self._spark_scores(spark)
        assert got[5].avg_score == 0.0

    def test_empty_train_raises(self, spark):
        from openaq_data_pipeline_spark.operators.lm import train_trigram_lm

        t = spark.createDataFrame([], "doc_id long, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            train_trigram_lm(t, "text", "doc_id")


class TestUnigramTokenizer:
    """Unigram-LM tokenizer (r8, Kudo 2018 hard-EM variant): trainer
    pinned against an INDEPENDENT pure-Python replay (own Viterbi,
    own seed counting), encode round-trip coverage, UNK policy and
    stable ids."""

    CORPUS = [
        (0, "low lower lowest low low"),
        (1, "new newer newest new"),
        (2, "wide wider widest lower"),
        (3, "low new wide"),
    ]

    def _python_train(self, vocab_size, n_iters=2, seed_multiplier=3,
                      max_piece=8):
        import math
        from collections import Counter
        from functools import lru_cache

        wf = Counter()
        for _, text in self.CORPUS:
            for w in text.split():
                wf[w] += 1
        seed = Counter()
        for w, n in wf.items():
            for i in range(len(w)):
                for j in range(i + 1, min(len(w), i + max_piece) + 1):
                    seed[w[i:j]] += n
        chars = {p: c for p, c in seed.items() if len(p) == 1}
        multi = sorted(
            ((p, c) for p, c in seed.items() if len(p) > 1),
            key=lambda x: (-x[1], x[0]),
        )[: vocab_size * seed_multiplier]
        pieces = {**chars, **dict(multi)}

        def viterbi(word, logp):
            best = {0: (0.0, None)}
            for i in range(1, len(word) + 1):
                cand = None
                for j in range(max(0, i - max_piece), i):
                    p = word[j:i]
                    if p not in logp or j not in best:
                        continue
                    sc = best[j][0] + logp[p]
                    if (
                        cand is None
                        or sc > cand[0]
                        or (
                            sc == cand[0]
                            and (
                                len(p) > len(cand[1])
                                or (len(p) == len(cand[1]) and p < cand[1])
                            )
                        )
                    ):
                        cand = (sc, p)
                if cand:
                    best[i] = cand
            if len(word) not in best:
                return None
            out, i = [], len(word)
            while i:
                p = best[i][1]
                out.append(p)
                i -= len(p)
            return out[::-1]

        for _ in range(n_iters):
            total = sum(pieces.values())
            logp = {p: math.log(c / total) for p, c in pieces.items()}
            new = Counter()
            for w, n in wf.items():
                for p in viterbi(w, logp) or list(w):
                    new[p] += n
            chars = {p: c for p, c in pieces.items() if len(p) == 1}
            multi = sorted(
                ((p, c) for p, c in new.items() if len(p) > 1),
                key=lambda x: (-x[1], x[0]),
            )[: max(0, vocab_size - len(chars))]
            pieces = {**chars, **dict(multi)}
            for p, c in new.items():
                if len(p) == 1:
                    pieces[p] = c
        return sorted(pieces.items(), key=lambda x: (-x[1], x[0]))

    def test_trainer_matches_independent_replay(self, spark):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            unigram_train,
        )

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        got = unigram_train(df, "text", vocab_size=20, n_iters=2)
        want = self._python_train(20, 2)
        assert got == want

    def test_encode_round_trip_and_ids(self, spark):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            unigram_encode,
            unigram_piece_ids,
            unigram_train,
        )

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        pieces = unigram_train(df, "text", vocab_size=20, n_iters=2)
        ids = unigram_piece_ids(pieces)
        inv = {i: p for p, i in ids.items()}
        out = {
            r.doc_id: list(r.token_ids)
            for r in unigram_encode(df, "text", "doc_id", pieces).collect()
        }
        for doc_id, text in self.CORPUS:
            decoded = "".join(inv[t] for t in out[doc_id])
            assert decoded == text.replace(" ", "")
            assert len(out[doc_id]) >= 1

    def test_unseen_char_emits_unk(self, spark):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            UNIGRAM_UNK_ID,
            unigram_encode,
            unigram_train,
        )

        train = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        pieces = unigram_train(train, "text", vocab_size=20, n_iters=1)
        batch = spark.createDataFrame(
            [(9, "low zz9")], "doc_id long, text string"
        )
        out = {
            r.doc_id: list(r.token_ids)
            for r in unigram_encode(batch, "text", "doc_id", pieces).collect()
        }
        assert UNIGRAM_UNK_ID in out[9]

    def test_empty_corpus_raises(self, spark):
        import pytest as _p

        from openaq_data_pipeline_spark.operators.tokenizer import (
            unigram_train,
        )

        df = spark.createDataFrame([], "doc_id long, text string")
        with _p.raises(ValueError):
            unigram_train(df, "text", vocab_size=10)


def _ref_wordpiece(word_freqs: dict, vocab_size: int) -> list:
    """Brute-force WordPiece reference: full recount every round,
    Fraction-exact scores — independent of the incremental trainer's
    bookkeeping."""
    from collections import Counter
    from fractions import Fraction

    words = [
        ([w[0]] + ["##" + c for c in w[1:]], n)
        for w, n in word_freqs.items()
        if w
    ]

    def counts():
        uc: Counter = Counter()
        pc: Counter = Counter()
        for syms, f in words:
            for s in syms:
                uc[s] += f
            for a, b in zip(syms, syms[1:]):
                if a != b:
                    pc[(a, b)] += f
        return uc, pc

    uc, _ = counts()
    base = sorted(s for s in uc if not s.startswith("##")) + sorted(
        s for s in uc if s.startswith("##")
    )
    merged = []
    seen = set(base)
    while len(base) + len(merged) < vocab_size:
        uc, pc = counts()
        cands = [(p, c) for p, c in pc.items() if c > 0]
        if not cands:
            break
        top = max(Fraction(c, uc[p[0]] * uc[p[1]]) for p, c in cands)
        best = min(
            p for p, c in cands if Fraction(c, uc[p[0]] * uc[p[1]]) == top
        )
        a, b = best
        m = a + (b[2:] if b.startswith("##") else b)
        for wi, (syms, f) in enumerate(words):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = (out, f)
        if m not in seen:
            seen.add(m)
            merged.append(m)
    return base + merged


class TestWordPiece:
    """WordPiece tokenizer (r8, Schuster & Nakajima 2012 / BERT):
    incremental trainer pinned against a recount-from-scratch
    Fraction-exact reference, the score-vs-count distinction that
    separates WordPiece from BPE, greedy longest-match encoding with
    whole-word UNK, and the end-to-end encode contract."""

    @given(
        st.lists(
            st.text(alphabet="abcde", min_size=1, max_size=8),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_trainer_matches_bruteforce_reference(self, wordlist):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            wordpiece_train_local,
        )

        words: dict = {}
        for w in wordlist:
            words[w] = words.get(w, 0) + 1
        # deep enough to exhaust some corpora (early-stop) and to
        # stack merges onto merged units
        want = _ref_wordpiece(words, vocab_size=40)
        got = wordpiece_train_local(list(words.items()), vocab_size=40)
        assert got == want

    def test_score_winner_beats_count_winner(self):
        """The defining WordPiece behavior: (a,##b) occurs 10 times,
        (c,##d) only 6 — but a is diluted across other words, so
        count(cd)/(count(c)·count(d)) = 1/6 beats 1/20 and the FIRST
        merge is cd (BPE would merge ab)."""
        from openaq_data_pipeline_spark.operators.tokenizer import (
            wordpiece_train_local,
        )

        vocab = [("ab", 10), ("az", 10), ("cd", 6)]
        base_size = len({"a", "c"} | {"##b", "##z", "##d"})
        out = wordpiece_train_local(vocab, vocab_size=base_size + 1)
        assert out[-1] == "cd"

    def test_greedy_longest_match_and_unk(self, spark):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            WORDPIECE_UNK_ID,
            wordpiece_encode,
            wordpiece_ids,
        )

        vocab = ["u", "un", "##a", "##able", "##b", "##l", "##n", "##e"]
        ids = wordpiece_ids(vocab)
        df = spark.createDataFrame(
            [(0, "unable"), (1, "banana"), (2, "nab")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (list(r.token_ids), r.n_tokens)
            for r in wordpiece_encode(df, "text", "doc_id", vocab).collect()
        }
        # longest-first: "un" beats "u", "##able" beats "##a"
        assert got[0] == ([ids["un"], ids["##able"]], 2)
        # 'banana' starts with 'b' — not in vocab word-initially → UNK
        assert got[1] == ([WORDPIECE_UNK_ID], 1)
        # 'nab' has no word-initial 'n' either → UNK (## forms don't
        # apply at position 0)
        assert got[2] == ([WORDPIECE_UNK_ID], 1)

    def test_train_encode_round_trip(self, spark):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            WORDPIECE_UNK_ID,
            wordpiece_encode,
            wordpiece_train,
        )

        rows = [
            (0, "low lower lowest low low"),
            (1, "new newer newest new"),
            (2, "wide wider widest lower"),
            (3, "low new wide"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        vocab = wordpiece_train(df, "text", vocab_size=30)
        got = {
            r.doc_id: list(r.token_ids)
            for r in wordpiece_encode(df, "text", "doc_id", vocab).collect()
        }
        # training chars cover the training corpus: no UNK anywhere,
        # and stripping '##' reassembles each document's words
        inv = {i: p for i, p in enumerate(vocab)}
        for doc_id, text in rows:
            toks = got[doc_id]
            assert WORDPIECE_UNK_ID not in toks
            joined = "".join(inv[t].removeprefix("##") for t in toks)
            assert joined == text.replace(" ", "")

    def test_empty_corpus_raises(self, spark):
        import pytest as _pytest

        from openaq_data_pipeline_spark.operators.tokenizer import (
            wordpiece_train,
        )

        df = spark.createDataFrame([], "doc_id long, text string")
        with _pytest.raises(ValueError, match="empty corpus"):
            wordpiece_train(df, "text", vocab_size=10)


class TestTokenizerArtifact:
    """Tokenizer persistence (r8): train once → persist → load →
    encode a NEW batch with ids identical to encoding with the
    in-memory state — the cross-batch id contract made durable.
    Temp artifacts are context-managed (no-residue, as the indexes)."""

    TRAIN_ROWS = [
        (0, "low lower lowest low low"),
        (1, "new newer newest new"),
        (2, "wide wider widest lower"),
    ]
    BATCH_ROWS = [(10, "low wide newer"), (11, "lowest newest")]

    def _dfs(self, spark):
        return (
            spark.createDataFrame(self.TRAIN_ROWS, "doc_id long, text string"),
            spark.createDataFrame(self.BATCH_ROWS, "doc_id long, text string"),
        )

    @staticmethod
    def _ids(df):
        return {r.doc_id: list(r.token_ids) for r in df.collect()}

    def test_bpe_round_trip(self, spark):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            bpe_encode,
            bpe_symbol_ids,
            bpe_train_merges_driver,
            load_tokenizer,
            save_bpe_tokenizer,
            temp_tokenizer_artifact,
        )

        train, batch = self._dfs(spark)
        merges = bpe_train_merges_driver(train, "text", "doc_id", n_merges=5)
        syms = bpe_symbol_ids(train, "text", merges)
        want = self._ids(bpe_encode(batch, "text", "doc_id", merges, syms))
        with temp_tokenizer_artifact() as art:
            save_bpe_tokenizer(art, merges, syms)
            loaded = load_tokenizer(spark, art)
            assert loaded["kind"] == "bpe"
            got = self._ids(
                bpe_encode(
                    batch, "text", "doc_id",
                    loaded["merges"], loaded["symbol_ids"],
                )
            )
            assert got == want
        # no-residue: tables dropped on exit
        assert not spark.catalog.tableExists(art.merges_table)

    def test_wordpiece_round_trip(self, spark):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            load_tokenizer,
            save_wordpiece_tokenizer,
            temp_tokenizer_artifact,
            wordpiece_encode,
            wordpiece_train,
        )

        train, batch = self._dfs(spark)
        vocab = wordpiece_train(train, "text", vocab_size=25)
        want = self._ids(wordpiece_encode(batch, "text", "doc_id", vocab))
        with temp_tokenizer_artifact() as art:
            save_wordpiece_tokenizer(spark, art, vocab)
            loaded = load_tokenizer(spark, art)
            assert loaded["kind"] == "wordpiece" and loaded["vocab"] == vocab
            got = self._ids(
                wordpiece_encode(batch, "text", "doc_id", loaded["vocab"])
            )
            assert got == want

    def test_unigram_round_trip(self, spark):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            load_tokenizer,
            save_unigram_tokenizer,
            temp_tokenizer_artifact,
            unigram_encode,
            unigram_train,
        )

        train, batch = self._dfs(spark)
        pieces = unigram_train(train, "text", vocab_size=25, n_iters=1)
        want = self._ids(unigram_encode(batch, "text", "doc_id", pieces))
        with temp_tokenizer_artifact() as art:
            save_unigram_tokenizer(spark, art, pieces)
            loaded = load_tokenizer(spark, art)
            assert loaded["kind"] == "unigram" and loaded["pieces"] == pieces
            got = self._ids(
                unigram_encode(batch, "text", "doc_id", loaded["pieces"])
            )
            assert got == want


class TestLangIdTrigram:
    """Model-based language ID (r9): character-trigram stupid-backoff
    LMs trained on the per-language UDHR seeds classify a
    multilingual fixture correctly, short/NULL docs fall to 'und',
    ties and ordering are deterministic, and custom seed sets work."""

    FIXTURE = [
        (1, "the people of the village should act with reason and care "
            "in another spirit of the free world", "en"),
        (2, "los derechos de los seres humanos deben ser iguales y los "
            "unos con los otros en dignidad", "es"),
        (3, "die menschen sind mit vernunft und gewissen geboren und "
            "sollen einander im geist begegnen", "de"),
        (4, "tous les droits des etres humains naissent dans un esprit "
            "de raison et de conscience", "fr"),
        (5, "they are endowed with reason and should act towards one "
            "another in a spirit of brotherhood", "en"),
    ]

    def test_multilingual_fixture_accuracy(self, spark):
        from openaq_data_pipeline_spark.operators.lm import lang_id_trigram

        df = spark.createDataFrame(
            [(i, t) for i, t, _ in self.FIXTURE], "doc_id long, text string"
        )
        got = {
            r.doc_id: r.lang
            for r in lang_id_trigram(df, "text", "doc_id").collect()
        }
        want = {i: lang for i, _, lang in self.FIXTURE}
        assert got == want

    def test_short_and_null_fall_to_und(self, spark):
        from openaq_data_pipeline_spark.operators.lm import lang_id_trigram

        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "ab")], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.lang, r.top_score)
            for r in lang_id_trigram(df, "text", "doc_id").collect()
        }
        assert got[1] == ("und", None) and got[2] == ("und", None)
        # "ab" → chars 'a b' → 2 tokens < 3 → no trigram → und
        assert got[3] == ("und", None)

    def test_deterministic_and_custom_seeds(self, spark):
        from openaq_data_pipeline_spark.operators.lm import lang_id_trigram

        df = spark.createDataFrame(
            [(i, t) for i, t, _ in self.FIXTURE], "doc_id long, text string"
        )
        a = sorted(map(tuple, lang_id_trigram(df, "text", "doc_id").collect()))
        b = sorted(map(tuple, lang_id_trigram(df, "text", "doc_id").collect()))
        assert a == b
        # a custom one-language seed set labels everything that forms
        # a trigram with that language (no other hypothesis exists)
        only = lang_id_trigram(
            df, "text", "doc_id", seeds={"xx": "zzz zzz zzz"}
        )
        assert {r.lang for r in only.collect()} == {"xx"}
        import pytest

        with pytest.raises(ValueError, match="seed"):
            lang_id_trigram(df, "text", "doc_id", seeds={})

    def test_onepass_equals_per_language_composition(self, spark):
        """The scale variant (corpus scanned ONCE, lang-keyed model
        tables) must be bit-identical to the per-language
        composition on the same fixture + edge docs."""
        from openaq_data_pipeline_spark.operators.lm import (
            lang_id_trigram,
            lang_id_trigram_onepass,
        )

        rows = [(i, t) for i, t, _ in self.FIXTURE] + [
            (90, None), (91, ""), (92, "ab"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, lang_id_trigram(df, "text", "doc_id").collect()))
        b = sorted(
            map(tuple, lang_id_trigram_onepass(df, "text", "doc_id").collect())
        )
        assert a == b

    def test_onepass_single_corpus_scan(self, spark, tmp_path):
        """The point of the variant: the documents parquet appears in
        the plan's scan set once-per-run semantics — inputFiles of
        the scored plan reference the corpus, and the per-language
        model tables are broadcast (no |languages|× corpus joins on
        the build side). Pin by counting corpus Scan nodes in the
        executed plan."""
        from openaq_data_pipeline_spark.operators.lm import (
            lang_id_trigram_onepass,
        )

        p = str(tmp_path / "docs")
        spark.createDataFrame(
            [(i, t) for i, t, _ in self.FIXTURE], "doc_id long, text string"
        ).write.parquet(p)
        docs = spark.read.parquet(p)
        out = lang_id_trigram_onepass(docs, "text", "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re

        n_corpus_scans = len(
            [m for m in re.finditer(r"Scan parquet", plan) if True]
        )
        # one scan feeds the trigram stream, one the distinct-id
        # left-join anchor — never one per language
        assert n_corpus_scans <= 2, plan[:2000]


class TestScriptPrefilter:
    """Unicode-script hypothesis pruning for language ID (r11,
    VERDICT r10 next #4): the ×|languages| expansion of the corpus
    char-trigram stream is bounded by a codegen dominant-script
    histogram — a Latin document never scores against a Cyrillic
    seed, documents whose script matches no seed keep the full
    hypothesis set, and the expansion stays a broadcast HASH join."""

    RU = (
        "все люди рождаются свободными и равными в своем достоинстве "
        "и правах они наделены разумом и совестью"
    )
    EL = (
        "ολοι οι ανθρωποι γεννιουνται ελευθεροι και ισοι στην "
        "αξιοπρεπεια και τα δικαιωματα ειναι προικισμενοι με λογικη"
    )

    def _seeds(self):
        from openaq_data_pipeline_spark.operators.lm import LANG_ID_SEEDS

        return {**LANG_ID_SEEDS, "ru": self.RU, "el": self.EL}

    def _docs(self, spark):
        rows = [
            (1, "the people of the village should act with reason and "
                "care in another spirit of the free world"),
            (2, "люди рождаются свободными и равными и наделены "
                "разумом и совестью в своем достоинстве"),
            (3, "οι ανθρωποι ειναι ελευθεροι και ισοι και "
                "προικισμενοι με λογικη και συνειδηση"),
            (4, "12345 67890 13579 24680 97531"),  # script-less
            (5, None),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_dominant_script_codegen(self, spark):
        from openaq_data_pipeline_spark.operators.lm import (
            _dominant_script_py,
            dominant_script,
        )

        rows = [
            (1, "plain latin words"), (2, self.RU), (3, self.EL),
            (4, "1234 5678"), (5, None), (6, ""),
            # mixed: Cyrillic majority wins over the Latin minority
            (7, "ok " + self.RU),
        ]
        df = spark.createDataFrame(rows, "i long, t string")
        got = {
            r.i: r.s
            for r in df.select(
                "i", dominant_script(F.col("t")).alias("s")
            ).collect()
        }
        assert got == {
            1: "latin", 2: "cyrillic", 3: "greek",
            4: "none", 5: "none", 6: "none", 7: "cyrillic",
        }
        # the driver-side mirror classifies identically
        for i, t in rows:
            assert _dominant_script_py(t or "") == got[i]

    def test_mixed_script_accuracy_and_exhaustive_agreement(self, spark):
        from openaq_data_pipeline_spark.operators.lm import (
            lang_id_trigram,
            lang_id_trigram_onepass,
        )

        seeds = self._seeds()
        docs = self._docs(spark)
        pruned = sorted(map(tuple, lang_id_trigram_onepass(
            docs, "text", "doc_id", seeds=seeds
        ).collect()))
        exhaustive = sorted(map(tuple, lang_id_trigram(
            docs, "text", "doc_id", seeds=seeds
        ).collect()))
        assert pruned == exhaustive
        langs = {t[0]: t[1] for t in pruned}
        assert langs[1] == "en" and langs[2] == "ru" and langs[3] == "el"
        assert langs[5] == "und"

    def test_hypothesis_rows_pruned(self, spark):
        """The row-count pin: 6 seeds × 5 docs would be 30 exhaustive
        hypothesis rows (4 trigram-forming docs → 24 scored); the
        prefilter admits 4 for the Latin doc, 1 each for the
        Cyrillic/Greek docs, and the full 6 only for the script-less
        fallbacks."""
        from openaq_data_pipeline_spark.operators.lm import (
            script_hypotheses,
        )

        hyp = script_hypotheses(
            self._docs(spark), "text", "doc_id", seeds=self._seeds()
        )
        per_doc = {
            r.doc_id: sorted(r.langs)
            for r in hyp.groupBy("doc_id")
            .agg(F.collect_list("lang").alias("langs"))
            .collect()
        }
        assert per_doc[1] == ["de", "en", "es", "fr"]
        assert per_doc[2] == ["ru"]
        assert per_doc[3] == ["el"]
        assert per_doc[4] == ["de", "el", "en", "es", "fr", "ru"]
        assert per_doc[5] == ["de", "el", "en", "es", "fr", "ru"]
        assert hyp.count() == 4 + 1 + 1 + 6 + 6  # 18 < 30

    def test_expansion_is_broadcast_hash_join(self, spark):
        """Plan pin: the hypothesis expansion is a broadcast HASH
        equi-join (the '*' fallback rows make the condition an
        equi-key), never a BroadcastNestedLoopJoin — and with the
        prefilter on, the corpus parquet still scans ≤ 2× (the
        r10 single-scan pin holds under the new projection)."""
        from openaq_data_pipeline_spark.operators.lm import (
            lang_id_trigram_onepass,
        )

        out = lang_id_trigram_onepass(
            self._docs(spark), "text", "doc_id", seeds=self._seeds()
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan


class TestCompressionRatio:
    """zlib compression-ratio quality signal (r9): repetitive text
    scores far lower than prose, values replay exactly in Python,
    empty/NULL rows yield NULL."""

    def test_separates_prose_from_repetition(self, spark):
        from openaq_data_pipeline_spark.operators.text import (
            compression_ratio,
        )

        prose = (
            "the calm river flows through the old valley carrying "
            "silt from the spring thaw toward the delta where the "
            "herons wait while the village measures the change"
        )
        loop = "buy now click here " * 40
        df = spark.createDataFrame(
            [(1, prose), (2, loop), (3, None), (4, "")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in compression_ratio(df, "text", "doc_id").collect()}
        assert got[2].compression_ratio < 0.5 * got[1].compression_ratio
        assert got[3].compression_ratio is None and got[4].compression_ratio is None
        # exact python replay (determinism contract)
        import zlib

        raw = prose.encode()
        assert got[1].n_bytes == len(raw)
        assert got[1].n_compressed == len(zlib.compress(raw, 6))
        assert got[1].compression_ratio == round(
            len(zlib.compress(raw, 6)) / len(raw), 6
        )


class TestSniffMime:
    """Magic-byte MIME sniffing: every ladder branch, NULL/empty
    edges, and the WARC routing composition."""

    def test_ladder_branches(self, spark):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.text import sniff_mime

        rows = [
            (1, b"%PDF-1.4", "application/pdf"),
            (2, b"\x89PNG\r\n\x1a\nrest", "image/png"),
            (3, b"\xff\xd8\xff\xe0", "image/jpeg"),
            (4, b"GIF87a...", "image/gif"),
            (5, b"\x1f\x8b\x08etc", "application/gzip"),
            (6, b"PK\x03\x04zzz", "application/zip"),
            (7, b"RIFF\x00\x00\x00\x00WAVEfmt", "audio/x-wav"),
            (8, b"RIFF\x00\x00\x00\x00AVI LIST", "video/x-msvideo"),
            (9, b"  <!DOCTYPE HTML><p>x</p>", "text/html"),
            (10, b"<HtMl><body>y", "text/html"),
            (11, b"just some plain words here", "text/plain"),
            (12, bytes(range(16)), "application/octet-stream"),
            # WEBP joined the ladder in r13 (header-only image plane)
            (13, b"RIFF\x00\x00\x00\x00WEBP", "image/webp"),
            # a RIFF that is none of WAVE/AVI/WEBP falls through —
            # binary junk, not text
            (16, b"RIFF\x00\x00\x00\x00ACON", "application/octet-stream"),
            (14, b"", "application/octet-stream"),
            (15, None, None),
        ]
        df = spark.createDataFrame(
            [(i, p) for i, p, _ in rows], "id long, p binary"
        )
        got = {
            r.id: r.mime
            for r in df.select(
                "id", sniff_mime(F.col("p")).alias("mime")
            ).collect()
        }
        for i, _, want in rows:
            assert got[i] == want, (i, got[i], want)

    def test_header_lies_are_overridden(self, spark, tmp_path):
        """The composition the operator exists for: a WARC response
        whose Content-Type header claims text/html but whose body is
        a PDF routes by its bytes, not its header."""
        import gzip as _g

        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.text import sniff_mime
        from openaq_data_pipeline_spark.sources.warc import read_warc

        def rec(uri, body):
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body
            )
            h = (
                b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Record-ID: <urn:uuid:x>\r\n"
                b"WARC-Target-URI: " + uri.encode() + b"\r\n"
                b"Content-Type: application/http;msgtype=response\r\n"
                b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
            )
            return h + http + b"\r\n\r\n"

        p = tmp_path / "a.warc.gz"
        p.write_bytes(
            _g.compress(rec("https://a.org/doc", b"%PDF-1.4 not html"))
            + _g.compress(
                rec("https://a.org/page", b"<html><p>real page</p>")
            )
        )
        routed = {
            r.target_uri: r.mime
            for r in read_warc(spark, str(p))
            .select(
                "target_uri",
                "http_content_type",
                sniff_mime(F.col("payload")).alias("mime"),
            )
            .collect()
        }
        assert routed["https://a.org/doc"] == "application/pdf"
        assert routed["https://a.org/page"] == "text/html"


class TestPdfText:
    """PDF text extraction (r10): FlateDecode streams + Tj/TJ/'/T*
    operators, stdlib-only — the document modality beside the image/
    audio codecs."""

    def test_roundtrip_multipage_and_escapes(self):
        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_pdf_text,
            extract_pdf_text,
        )

        pages = [
            "Hello PDF world.",
            "Parens (nested (deep)) and back\\slash.",
            "Line one\nLine two\ttabbed",
        ]
        assert extract_pdf_text(encode_pdf_text(pages)) == pages

    def test_handwritten_uncompressed_fixture(self):
        """Independent of the module's own encoder: an uncompressed
        literal PDF with T* line breaks and a TJ kerning array."""
        from openaq_data_pipeline_spark.operators.multimodal import (
            extract_pdf_text,
        )

        body = b"BT /F1 12 Tf (Alpha) Tj T* [(He) -30 (llo)] TJ ET"
        pdf = (
            b"%PDF-1.4\n1 0 obj\n<< /Length "
            + str(len(body)).encode()
            + b" >>\nstream\n"
            + body
            + b"\nendstream\nendobj\n%%EOF\n"
        )
        assert extract_pdf_text(pdf) == ["Alpha\nHello"]

    def test_degrade_dont_fail(self):
        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_pdf_text,
            extract_pdf_text,
        )

        assert extract_pdf_text(b"GIF89a not a pdf") == []
        # corrupt ONE page's deflate bytes: the other pages survive
        pdf = bytearray(encode_pdf_text(["Good page one.", "Doomed."]))
        # anchor on the dict-terminated stream keyword ('startxref'
        # also contains 'stream')
        at = pdf.rindex(b">>\nstream\n") + len(b">>\nstream\n")
        pdf[at : at + 4] = b"\xde\xad\xbe\xef"
        assert extract_pdf_text(bytes(pdf)) == ["Good page one."]

    def test_indirect_length_multidigit_object_falls_back(self):
        """/Length as an indirect reference with a MULTI-digit object
        number (`/Length 123 0 R`) must fall back to the trim
        heuristic, not backtrack the digit run into a bogus direct
        length of 12 that truncates the stream and drops the page
        (r10 ADVICE)."""
        import re

        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_pdf_text,
            extract_pdf_text,
        )

        pages = ["Indirect length survives extraction."]
        pdf = encode_pdf_text(pages)
        m = re.search(rb"/Length \d+", pdf)
        patched = pdf[: m.start()] + b"/Length 123 0 R" + pdf[m.end() :]
        assert extract_pdf_text(patched) == pages

    def test_dataframe_pass_and_mime_routing(self, spark):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_pdf_text,
            pdf_extract_text,
        )
        from openaq_data_pipeline_spark.operators.text import sniff_mime

        rows = [
            (1, encode_pdf_text(["Doc one text."])),
            (2, encode_pdf_text(["Page A.", "Page B."])),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "id long, payload binary")
        routed = df.withColumn("mime", sniff_mime(F.col("payload")))
        assert {
            r.id: r.mime for r in routed.collect()
        } == {1: "application/pdf", 2: "application/pdf", 3: None}
        out = {
            r.id: r.text
            for r in pdf_extract_text(routed, "payload").collect()
        }
        assert out[1] == "Doc one text."
        assert out[2] == "Page A.\fPage B."
        assert out[3] is None


class TestWebPHeader:
    """WebP header walk (r13, VERDICT r12 missing #2): dims + flags
    from VP8/VP8L/VP8X headers, header-only — no pixel decode
    exists, so the stats must come from fixed-offset header fields
    and corrupt bytes must degrade, not fail."""

    def test_all_three_bitstreams_roundtrip(self):
        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_webp_header,
            webp_header_stats,
        )

        assert webp_header_stats(
            encode_webp_header(320, 240, kind="VP8 ")
        ) == ("VP8 ", 320, 240, False, False)
        assert webp_header_stats(
            encode_webp_header(16383, 1, kind="VP8L", alpha=True)
        ) == ("VP8L", 16383, 1, True, False)
        assert webp_header_stats(
            encode_webp_header(4000, 3000, kind="VP8X", alpha=True,
                               animated=True)
        ) == ("VP8X", 4000, 3000, True, True)

    def test_corrupt_and_foreign_bytes_raise(self):
        import pytest

        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_webp_header,
            webp_header_stats,
        )

        with pytest.raises(ValueError):
            webp_header_stats(b"RIFF\x00\x00\x00\x00WAVEfmt ")
        with pytest.raises(ValueError):
            webp_header_stats(b"\x89PNG\r\n\x1a\n")
        # VP8L with a clobbered signature byte
        blob = bytearray(encode_webp_header(8, 8, kind="VP8L"))
        blob[20] = 0x00
        with pytest.raises(ValueError):
            webp_header_stats(bytes(blob))

    def test_webp_features_lenient_degrades(self, spark):
        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_webp_header,
            webp_features,
        )

        df = spark.createDataFrame(
            [
                (0, encode_webp_header(64, 32, kind="VP8L")),
                (1, b"junk not webp"),
                (2, None),
            ],
            "media_id long, content binary",
        )
        rows = {r.media_id: r for r in webp_features(
            df, lenient=True
        ).collect()}
        assert (rows[0].format, rows[0].width, rows[0].height) == (
            "VP8L", 64, 32)
        assert rows[1].format is None and rows[1].width is None
        assert rows[2].format is None


class TestGifAnimation:
    """Animated GIF decode (r13, VERDICT r12 missing #3): every
    frame composited with the GIF89a animation model — disposal
    0/1 leaves, 2 restores-to-background, 3 restores-previous —
    and the per-frame batch op mirrors sample_video_frames."""

    @staticmethod
    def _fixtures():
        import numpy as np

        base = np.full((6, 8, 3), 200, np.uint8)
        patch = np.full((2, 2, 3), 50, np.uint8)
        dot = np.full((1, 1, 3), 120, np.uint8)
        return base, patch, dot

    def test_full_frame_roundtrip_and_first_frame_identity(self):
        import numpy as np

        from openaq_data_pipeline_spark.operators.multimodal import (
            decode_gif,
            decode_gif_frames,
            encode_gif_animation,
            gif_frame_count,
        )

        f0 = np.full((6, 8, 3), 200, np.uint8)
        f0[0, 0] = (10, 20, 30)
        f1 = np.full((6, 8, 3), 50, np.uint8)
        f2 = np.zeros((6, 8, 3), np.uint8)
        f2[:, :, 0] = 255
        blob = encode_gif_animation([f0, f1, f2])
        frames = decode_gif_frames(blob)
        assert len(frames) == 3 == gif_frame_count(blob)
        for got, want in zip(frames, (f0, f1, f2)):
            assert np.array_equal(got, want)
        # decode_gif stays the first-frame face
        assert np.array_equal(decode_gif(blob), f0)

    def test_disposal_background_and_previous(self):
        import numpy as np

        from openaq_data_pipeline_spark.operators.multimodal import (
            decode_gif_frames,
            encode_gif_animation,
        )

        base, patch, dot = self._fixtures()
        mk = lambda disp: encode_gif_animation(
            [base, patch, dot], screen=(6, 8),
            offsets=[(0, 0), (1, 1), (6, 4)], disposals=[0, disp, 0],
        )
        # disposal 2: the patch rectangle restores to the BACKGROUND
        # (= palette[0], the union's lexicographic minimum = the
        # patch gray 50) before frame 2 renders
        fr = decode_gif_frames(mk(2))
        exp1 = base.copy()
        exp1[1:3, 1:3] = 50
        assert np.array_equal(fr[1], exp1)
        exp2 = base.copy()
        exp2[1:3, 1:3] = 50  # background == 50 here
        exp2[4, 6] = 120
        assert np.array_equal(fr[2], exp2)
        # disposal 3: the pre-frame pixels come back
        fr3 = decode_gif_frames(mk(3))
        exp3 = base.copy()
        exp3[4, 6] = 120
        assert np.array_equal(fr3[2], exp3)

    def test_sample_gif_frames_stride_and_stats(self, spark):
        import numpy as np

        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_gif_animation,
            sample_gif_frames,
        )

        frames = [
            np.full((4, 4, 3), v, np.uint8) for v in (10, 20, 30, 40, 50)
        ]
        df = spark.createDataFrame(
            [(7, encode_gif_animation(frames))],
            "media_id long, content binary",
        )
        rows = {
            r.frame_idx: r
            for r in sample_gif_frames(df, stride=2).collect()
        }
        assert set(rows) == {0, 2, 4}
        for f, v in ((0, 10), (2, 30), (4, 50)):
            assert rows[f].n_frames == 5
            assert (rows[f].width, rows[f].height) == (4, 4)
            assert rows[f].px_sum == v * 4 * 4 * 3
            assert rows[f].mean_px == float(v)


class TestTiff:
    """TIFF (r13, LZW r14): IFD header walk for any compression + a
    real chunky-RGB codec — uncompressed and TIFF-LZW with the
    horizontal predictor (II and MM byte orders) — and the
    image-plane fallback split (decode pixels when possible, header
    dims when not)."""

    def test_roundtrip_both_byte_orders(self):
        import numpy as np

        from openaq_data_pipeline_spark.operators.multimodal import (
            decode_tiff_rgb,
            encode_tiff_rgb,
            tiff_header_stats,
        )

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
        for be in (False, True):
            blob = encode_tiff_rgb(img, big_endian=be)
            assert np.array_equal(decode_tiff_rgb(blob), img)
            assert tiff_header_stats(blob) == (17, 13, 8, 1, 1)

    def test_compressed_walks_header_only(self):
        import struct

        import numpy as np
        import pytest

        from openaq_data_pipeline_spark.operators.multimodal import (
            decode_tiff_rgb,
            encode_tiff_rgb,
            tiff_header_stats,
        )

        img = np.zeros((4, 4, 3), np.uint8)
        off = 8 + 2 + 12 * 3 + 8  # compression entry's value field
        # JPEG-in-TIFF (7): outside the decode subset, header walks
        blob = bytearray(encode_tiff_rgb(img))
        blob[off : off + 2] = struct.pack("<H", 7)
        assert tiff_header_stats(bytes(blob))[3] == 7
        with pytest.raises(ValueError, match="uncompressed/LZW"):
            decode_tiff_rgb(bytes(blob))
        # CLAIMED LZW over a raw strip: LZW has no magic, but every
        # conforming writer opens with a Clear code — the gate turns
        # would-be silent garbage into the header-stats fallback
        blob = bytearray(encode_tiff_rgb(np.full((4, 4, 3), 50, np.uint8)))
        blob[off : off + 2] = struct.pack("<H", 5)
        with pytest.raises(ValueError, match="Clear"):
            decode_tiff_rgb(bytes(blob))

    def test_lzw_roundtrip_and_predictor(self):
        """TIFF-LZW (r14, VERDICT r13 missing #4): the MSB-first
        early-change variant round-trips, horizontal differencing
        (tag 317=2) inverts, and the predictor genuinely shrinks a
        gradient's LZW output."""
        import numpy as np

        from openaq_data_pipeline_spark.operators.multimodal import (
            decode_tiff_rgb,
            encode_tiff_rgb,
            tiff_header_stats,
        )

        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
        for kw in (
            {"lzw": True},
            {"lzw": True, "big_endian": True},
            {"lzw": True, "predictor": True},
            {"lzw": True, "predictor": True, "big_endian": True},
        ):
            blob = encode_tiff_rgb(img, **kw)
            assert np.array_equal(decode_tiff_rgb(blob), img), kw
            assert tiff_header_stats(blob)[3] == 5
        y, x = np.mgrid[0:32, 0:48]
        grad = np.stack(
            [(x * 3) % 256, (x * 3 + 40) % 256, (x * 3 + 90) % 256], -1
        ).astype(np.uint8)
        plain = encode_tiff_rgb(grad, lzw=True)
        pred = encode_tiff_rgb(grad, lzw=True, predictor=True)
        assert len(pred) < len(plain) < grad.nbytes

    def test_tiff_deflate(self):
        """TIFF Deflate (r15, VERDICT r14 next #4): compression=8
        round-trips (II/MM, with/without predictor), legacy 32946
        decodes, the row-bounded cap refuses an over-long strip, and
        corrupt zlib raises — the lenient plane keeps header rows."""
        import struct

        import numpy as np
        import pytest

        from openaq_data_pipeline_spark.operators.multimodal import (
            decode_tiff_rgb,
            encode_tiff_rgb,
            tiff_header_stats,
        )

        rng = np.random.default_rng(15)
        img = rng.integers(0, 256, (11, 19, 3), dtype=np.uint8)
        for kw in (
            {"deflate": True},
            {"deflate": True, "big_endian": True},
            {"deflate": True, "predictor": True},
            {"deflate": True, "predictor": True, "big_endian": True},
        ):
            blob = encode_tiff_rgb(img, **kw)
            assert np.array_equal(decode_tiff_rgb(blob), img), kw
            assert tiff_header_stats(blob)[3] == 8
        # predictor helps a horizontal gradient under Deflate too
        y, x = np.mgrid[0:32, 0:48]
        grad = np.stack(
            [(x * 3) % 256, (x * 5) % 256, (x * 7) % 256], -1
        ).astype(np.uint8)
        assert len(
            encode_tiff_rgb(grad, deflate=True, predictor=True)
        ) < len(encode_tiff_rgb(grad, deflate=True))
        # legacy code 32946 decodes identically
        legacy = bytearray(encode_tiff_rgb(img, deflate=True))
        off = 8 + 2 + 12 * 3 + 8  # 4th IFD entry's value slot
        assert struct.unpack_from("<H", legacy, off)[0] == 8
        struct.pack_into("<H", legacy, off, 32946 & 0xFFFF)
        # 32946 > uint16: the tag is SHORT-typed, so patch the type
        # to LONG instead for the legacy fixture
        legacy = bytearray(encode_tiff_rgb(img, deflate=True))
        struct.pack_into("<H", legacy, off - 8 + 2, 4)  # type LONG
        struct.pack_into("<I", legacy, off, 32946)
        assert np.array_equal(decode_tiff_rgb(bytes(legacy)), img)
        # an over-long strip (more pixels than declared rows) refuses
        import zlib

        over = bytearray(encode_tiff_rgb(img, deflate=True))
        strip = zlib.compress(bytes(img.tobytes()) + b"\x00" * 64)
        # rebuild with the oversized strip appended at the same offset
        base = encode_tiff_rgb(img, deflate=True)
        data_off = base.index(zlib.compress(img.tobytes(), 6))
        over = bytearray(base[:data_off]) + strip
        # strip_counts value slot (entry index 8 since r16 added the
        # photometric tag at index 4)
        cnt_off = 8 + 2 + 12 * 8 + 8
        struct.pack_into("<I", over, cnt_off, len(strip))
        with pytest.raises(ValueError, match="exceeds|corrupt"):
            decode_tiff_rgb(bytes(over))
        # corrupt zlib stream raises the codec's ValueError
        bad = bytearray(encode_tiff_rgb(img, deflate=True))
        bad[-10] ^= 0xFF
        with pytest.raises(ValueError):
            decode_tiff_rgb(bytes(bad))
        # param contract
        with pytest.raises(ValueError, match="pick one"):
            encode_tiff_rgb(img, lzw=True, deflate=True)

    def test_lzw_width_boundaries_and_hand_stream(self):
        """The early-change width ladder: inputs long enough to cross
        9→10→11→12 bits and force the 4094 table refill round-trip;
        a hand-built 9-bit stream pins the bit packing byte-exactly
        (Clear, 'a', 'b', EOI at 9 bits MSB-first)."""
        import numpy as np

        from openaq_data_pipeline_spark.operators.multimodal import (
            _tiff_lzw_decode,
            _tiff_lzw_encode,
        )

        rng = np.random.default_rng(3)
        for data in (
            b"",
            b"TOBEORNOTTOBEORTOBEORNOT",
            bytes(rng.integers(0, 256, 2000)),   # 9 -> 10 bits
            bytes(rng.integers(0, 256, 9000)),   # 10 -> 11
            bytes(rng.integers(0, 256, 40000)),  # refill/clear
            bytes(rng.integers(0, 4, 30000)),    # deep dictionary
        ):
            assert _tiff_lzw_decode(_tiff_lzw_encode(data)) == data
        bits = "".join(format(c, "09b") for c in (256, 97, 98, 257))
        bits += "0" * ((8 - len(bits) % 8) % 8)
        raw = bytes(
            int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)
        )
        assert _tiff_lzw_encode(b"ab") == raw
        assert _tiff_lzw_decode(raw) == b"ab"

    def test_image_plane_split(self, spark):
        import struct

        import numpy as np

        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_tiff_rgb,
            extract_features,
        )
        from openaq_data_pipeline_spark.operators.router import (
            route_crawl_payloads,
        )

        img = np.full((4, 6, 3), 50, np.uint8)
        lzw = bytearray(encode_tiff_rgb(img))
        off = 8 + 2 + 12 * 3 + 8
        lzw[off : off + 2] = struct.pack("<H", 5)
        df = spark.createDataFrame(
            [(0, encode_tiff_rgb(img)), (1, bytes(lzw))],
            "id long, payload binary",
        )
        routed = route_crawl_payloads(df, "payload")
        assert {
            (r.mime, r.route) for r in routed.collect()
        } == {("image/tiff", "image")}
        feats = {
            r.id: r
            for r in extract_features(
                routed, "payload", id_col="id", decode="real",
                lenient=True,
            ).collect()
        }
        assert feats[0].px_sum == 50 * 4 * 6 * 3  # real decode
        assert (feats[1].width, feats[1].height) == (6, 4)
        assert feats[1].px_sum is None  # header-only fallback


class TestAvif:
    """AVIF header walk (r14): ftyp-brand detection ahead of the
    generic ISO-BMFF video arm, ispe dims, auxC alpha, avis
    animation; AV1 payloads never decode (header-only posture)."""

    def test_walk_and_refusals(self):
        import pytest

        from openaq_data_pipeline_spark.operators.multimodal import (
            avif_header_stats,
            encode_avif_header,
            encode_mp4_stub,
        )

        for w, h, a, anim in (
            (320, 200, False, False),
            (64, 64, True, False),
            (128, 96, True, True),
        ):
            blob = encode_avif_header(w, h, has_alpha=a, animated=anim)
            assert avif_header_stats(blob) == (w, h, a, anim)
        with pytest.raises(ValueError, match="not AVIF"):
            avif_header_stats(encode_mp4_stub(2, 8, 8))
        good = encode_avif_header(8, 8)
        with pytest.raises(ValueError, match="meta"):
            avif_header_stats(good[: good.index(b"meta") - 4])

    def test_sniff_routes_image_not_video(self, spark):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_avif_header,
            encode_mp4_stub,
            extract_features,
        )
        from openaq_data_pipeline_spark.operators.router import (
            route_crawl_payloads,
        )

        df = spark.createDataFrame(
            [
                (0, encode_avif_header(24, 16)),
                (1, encode_mp4_stub(2, 8, 8)),
            ],
            "id long, payload binary",
        )
        routed = {
            r.id: (r.mime, r.route)
            for r in route_crawl_payloads(df, "payload").collect()
        }
        assert routed[0] == ("image/avif", "image")
        assert routed[1] == ("video/mp4", "video")
        # the lenient image pass keeps header dims, NULL pixel stats
        feats = extract_features(
            df.where(F.col("id") == 0), "payload", id_col="id",
            decode="real", lenient=True,
        ).first()
        assert (feats.width, feats.height) == (24, 16)
        assert feats.px_sum is None


class TestCompressedAudioHeaders:
    """MP3/FLAC/OGG header walks (r14): codec/rate/channels/duration
    from public header layouts, no sample ever decoded; the audio
    plane's lenient pass keeps header stats beside NULL PCM stats
    (the image plane's header-dims posture)."""

    def test_mp3_walk(self):
        import pytest

        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_mp3_stub,
            mp3_header_stats,
        )

        for nf, bi, si, mono, id3 in (
            (10, 9, 0, False, False),
            (3, 14, 1, True, True),   # ID3v2 skip + trailing TAG
            (1, 1, 2, False, False),
        ):
            rate, ch, n, ms, kbps = mp3_header_stats(
                encode_mp3_stub(nf, bi, si, mono, id3)
            )
            exp_rate = (44100, 48000, 32000)[si]
            assert (rate, ch, n) == (exp_rate, 1 if mono else 2, nf)
            assert ms == nf * 1152 * 1000 // exp_rate
        with pytest.raises(ValueError, match="subset boundary"):
            mp3_header_stats(b"\xff\xe2\x90\x00")  # MPEG-2.5
        with pytest.raises(ValueError, match="sync lost"):
            mp3_header_stats(encode_mp3_stub(2) + b"trailing junk!")
        # ADVICE r14: a <128-byte stream whose NEGATIVE-wrapped
        # blob[end-128:end-125] happens to read 'TAG' must not
        # mis-trim 128 bytes — the single real frame still walks.
        # Hand-built 104-byte MPEG-1 Layer III frame (32 kbps,
        # 44.1 kHz: 144*32000//44100 = 104) with 'TAG' planted at
        # the wrapped slice blob[-24:-21].
        frame = bytearray(b"\xff\xfb\x10\x00" + b"\x00" * 100)
        frame[104 - 24 : 104 - 21] = b"TAG"
        rate, ch, n, ms, kbps = mp3_header_stats(bytes(frame))
        assert (rate, n, kbps) == (44100, 1, 32)

    def test_flac_and_ogg_walks(self):
        import pytest

        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_flac_stub,
            encode_ogg_stub,
            flac_header_stats,
            ogg_header_stats,
        )

        assert flac_header_stats(
            encode_flac_stub(96000, 2, 24, 12345678)
        ) == (96000, 2, 24, 12345678, 12345678 * 1000 // 96000)
        codec, rate, ch, n_pages, ms = ogg_header_stats(
            encode_ogg_stub("vorbis", 44100, 2, 441000)
        )
        assert (codec, rate, ch, n_pages, ms) == (
            "vorbis", 44100, 2, 2, 10000,
        )
        # Opus: output clock is 48 kHz and the pre-skip subtracts
        codec, rate, ch, _, ms = ogg_header_stats(
            encode_ogg_stub("opus", 48000, 1, 48000)
        )
        assert (codec, rate, ch, ms) == ("opus", 48000, 1, 1000)
        with pytest.raises(ValueError, match="STREAMINFO"):
            flac_header_stats(b"fLaC\x7f\x00\x00\x22" + b"\x00" * 34)
        with pytest.raises(ValueError, match="neither Vorbis nor Opus"):
            ogg_header_stats(
                encode_ogg_stub("vorbis", 44100, 2, 1)
                .replace(b"\x01vorbis", b"\x01theora")
            )

    def test_audio_plane_composition(self, spark):
        """Compressed audio routes to the audio plane and keeps
        header stats beside NULL PCM stats; WAV still fully
        decodes next to it."""
        import numpy as np
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_flac_stub,
            encode_mp3_stub,
            encode_wav_pcm16,
        )
        from openaq_data_pipeline_spark.operators.router import (
            crawl_route_planes,
            route_crawl_payloads,
        )

        t = np.arange(160)
        wav = encode_wav_pcm16(
            (1000 * np.sin(t / 5.0)).astype(np.int16), 8000
        )
        df = spark.createDataFrame(
            [
                (0, wav),
                (1, encode_mp3_stub(4, 9, 0)),
                (2, encode_flac_stub(44100, 2, 16, 44100)),
            ],
            "id long, payload binary",
        )
        routed = route_crawl_payloads(df, "payload").localCheckpoint()
        assert {
            (r.id, r.route) for r in routed.collect()
        } == {(0, "audio"), (1, "audio"), (2, "audio")}
        feats = {
            r.id: r
            for r in crawl_route_planes(routed, "payload", "id")[
                "audio"
            ].collect()
        }
        assert feats[0].sum_abs is not None  # real PCM decode
        assert feats[1].sample_rate == 44100
        assert feats[1].duration_ms == 4 * 1152 * 1000 // 44100
        assert feats[1].sum_abs is None  # header-only
        assert feats[2].sample_rate == 44100
        assert feats[2].n_samples == 44100
        assert feats[2].duration_ms == 1000
        assert feats[2].sum_abs is None


class TestExif:
    """EXIF metadata (r14): APP1-segment scan on JPEG, direct IFD0
    on TIFF, inline and out-of-line ASCII values, the lenient
    feature pass for EXIF-less rows; the injected segment leaves
    the JPEG pixel-decodable."""

    def test_walk_injection_and_plane(self, spark):
        import numpy as np
        import pytest

        from openaq_data_pipeline_spark.operators.multimodal import (
            decode_jpeg_baseline,
            encode_jpeg_baseline,
            encode_tiff_rgb,
            exif_features,
            exif_stats,
            inject_jpeg_exif,
        )

        img = np.full((8, 8, 3), 100, np.uint8)
        j = encode_jpeg_baseline(img)
        je = inject_jpeg_exif(
            j, orientation=6, make="ACME",
            model="Cam 2000 Pro Max", datetime="2026:08:16 12:00:00",
        )
        assert exif_stats(je) == (
            6, "ACME", "Cam 2000 Pro Max", "2026:08:16 12:00:00",
        )
        # short strings take the inline 4-byte value path
        assert exif_stats(
            inject_jpeg_exif(j, orientation=1, make="AB", model="XYZ")
        ) == (1, "AB", "XYZ", None)
        # the injected segment does not disturb pixel decode
        assert np.array_equal(
            decode_jpeg_baseline(je), decode_jpeg_baseline(j)
        )
        with pytest.raises(ValueError, match="no Exif"):
            exif_stats(j)
        # a plain TIFF walks its own IFD0 (no exif tags -> Nones)
        assert exif_stats(encode_tiff_rgb(img)) == (
            None, None, None, None,
        )
        rows = {
            r.id: r
            for r in exif_features(
                spark.createDataFrame(
                    [(0, je), (1, j), (2, b"not an image")],
                    "id long, payload binary",
                ),
                "payload", id_col="id", lenient=True,
            ).collect()
        }
        assert rows[0].orientation == 6 and rows[0].make == "ACME"
        assert rows[1].orientation is None
        assert rows[2].orientation is None


class TestId3:
    """ID3v2 metadata (r14): v2.3/v2.4 frame walks, UTF-8 and
    UTF-16 text encodings, tagless refusal, the lenient feature
    pass, and composition with the MP3 frame-duration walk."""

    def test_walk_and_plane(self, spark):
        import pytest

        from openaq_data_pipeline_spark.operators.multimodal import (
            encode_id3v2,
            encode_mp3_stub,
            id3_features,
            id3_stats,
            mp3_header_stats,
        )

        tag = encode_id3v2(
            title="Song T", artist="Artist A", album="Album B"
        )
        blob = tag + encode_mp3_stub(3)
        assert id3_stats(blob) == ("Song T", "Artist A", "Album B")
        # the mp3 frame walk skips the populated tag
        assert mp3_header_stats(blob)[2] == 3
        # v2.3 plain frame sizes + UTF-16 with BOM
        t16 = encode_id3v2(title="Tïtle ünïcode",
                           version=3, utf16=True)
        assert id3_stats(t16 + encode_mp3_stub(1)) == (
            "Tïtle ünïcode", None, None,
        )
        with pytest.raises(ValueError, match="no leading ID3v2"):
            id3_stats(encode_mp3_stub(2))
        with pytest.raises(ValueError, match="outside the subset"):
            id3_stats(b"ID3\x02\x00\x00\x00\x00\x00\x00")
        rows = {
            r.id: r
            for r in id3_features(
                spark.createDataFrame(
                    [(0, blob), (1, encode_mp3_stub(2))],
                    "id long, payload binary",
                ),
                "payload", id_col="id", lenient=True,
            ).collect()
        }
        assert rows[0].title == "Song T" and rows[0].album == "Album B"
        assert rows[1].title is None


class TestSvgPlane:
    """SVG header walk (r15): dims from attributes / px-float units /
    viewBox, dimension-less roots keep their element count, the
    sniffer routes SVG ahead of the printability arm, and HTML with
    inline <svg> still sniffs as HTML."""

    def test_header_stats(self):
        from openaq_data_pipeline_spark.operators.multimodal import (
            svg_header_stats,
        )

        assert svg_header_stats(
            b'<svg width="120" height="80"><rect/><path d="M0 0"/></svg>'
        ) == (120, 80, 2)
        assert svg_header_stats(
            b'<?xml version="1.0"?>\n<svg width="33.7px" '
            b'height="21px"><circle/></svg>'
        ) == (33, 21, 1)
        assert svg_header_stats(
            b'<svg viewBox="0 0 640 480"><text>t</text></svg>'
        ) == (640, 480, 1)
        assert svg_header_stats(
            b'<svg xmlns="http://www.w3.org/2000/svg"><line/></svg>'
        ) == (None, None, 1)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="svg"):
            svg_header_stats(b"<html><body>no</body></html>")

    def test_sniff_and_route(self, spark):
        import struct as _struct

        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.router import (
            route_for_mime,
        )
        from openaq_data_pipeline_spark.operators.text import sniff_mime

        rows = [
            (0, b'<svg width="3" height="3"></svg>'),
            (1, b'<?xml version="1.0" encoding="UTF-8"?><svg/>'),
            (2, b"<!doctype html><html><svg></svg></html>"),  # html wins
            (3, b"plain words only"),
        ]
        df = spark.createDataFrame(rows, "id long, payload binary")
        got = {
            r.id: (r.m, r.route)
            for r in df.select(
                "id",
                sniff_mime(F.col("payload")).alias("m"),
            ).withColumn("route", route_for_mime(F.col("m"))).collect()
        }
        assert got[0] == ("image/svg+xml", "image")
        assert got[1] == ("image/svg+xml", "image")
        assert got[2] == ("text/html", "text")
        assert got[3] == ("text/plain", "text")

    def test_lenient_image_plane_dims(self, spark):
        from openaq_data_pipeline_spark.operators.multimodal import (
            extract_features,
        )

        df = spark.createDataFrame(
            [(0, b'<svg width="9" height="4"><rect/></svg>')],
            "id long, payload binary",
        )
        r = extract_features(
            df, "payload", id_col="id", decode="real", lenient=True
        ).first()
        assert (r.width, r.height) == (9, 4)
        from openaq_data_pipeline_spark.operators import svg_native

        if svg_native.available():
            # r16: the gated librsvg binding rasterizes SVG rows —
            # an empty rect over the white underlay is all-255
            assert r.px_sum == 9 * 4 * 3 * 255
        else:
            assert r.px_sum is None  # no rasterizer: dims-only tier
