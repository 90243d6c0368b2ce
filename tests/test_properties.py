"""Property-based tests (hypothesis) for the engine's exact
cross-engine arithmetic and key functions — the pieces every oracle
hash depends on. Pure-Python models are checked against the Spark
column implementations over generated inputs."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.catalog import exact_avg_spark, exact_ratio_spark
from openaq_data_pipeline_spark.functions.keys import NULL_SENTINEL, surrogate_key

# 2-decimal non-negative fixtures, the shape of measurement values
cents = st.integers(min_value=0, max_value=10**6).map(lambda c: c / 100)

SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_round_half_up_avg(vals: list[float], out_scale: int = 2) -> float:
    total = sum(Decimal(str(v)) for v in vals)
    avg = total / len(vals)
    q = Decimal(1).scaleb(-out_scale)
    return float(avg.quantize(q, rounding=ROUND_HALF_UP))


class TestExactAvg:
    @SETTINGS
    @given(st.lists(cents, min_size=1, max_size=30))
    def test_matches_decimal_half_up(self, spark, vals):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = df.agg(exact_avg_spark(F.col("v")).alias("a")).first()["a"]
        assert got == pytest.approx(_py_round_half_up_avg(vals), abs=0)

    @SETTINGS
    @given(st.lists(cents, min_size=1, max_size=20))
    def test_empty_condition_yields_null(self, spark, vals):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = df.agg(
            exact_avg_spark(F.col("v"), cond=F.col("v") < -1).alias("a")
        ).first()["a"]
        assert got is None


class TestExactRatio:
    @SETTINGS
    @given(
        st.integers(min_value=0, max_value=10**9),
        st.integers(min_value=1, max_value=10**9),
    )
    def test_matches_decimal_half_up(self, spark, num, den):
        df = spark.createDataFrame([(num, den)], "n long, d long")
        got = df.select(
            exact_ratio_spark(F.col("n"), F.col("d"), out_scale=4).alias("r")
        ).first()["r"]
        expected = float(
            (Decimal(num) / Decimal(den)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        assert got == pytest.approx(expected, abs=0)


class TestSurrogateKey:
    def test_null_sentinel_matches_dbt_utils(self, spark):
        """F13: NULL inputs hash as the dbt_utils sentinel string —
        md5('1-_dbt_utils_surrogate_key_null_') exactly."""
        import hashlib

        df = spark.createDataFrame([("1", None)], "a string, b string")
        got = df.select(surrogate_key(F.col("a"), F.col("b")).alias("k")).first()["k"]
        expected = hashlib.md5(f"1-{NULL_SENTINEL}".encode()).hexdigest()
        assert got == expected

    @SETTINGS
    @given(st.text(min_size=0, max_size=20), st.text(min_size=0, max_size=20))
    def test_injective_on_delimited_parts(self, spark, a, b):
        """Same concatenation ⇒ same key; the '-' delimiter means
        ('x-','y') and ('x','-y') collide by design (dbt_utils
        semantics — documented, not defended)."""
        df = spark.createDataFrame([(a, b)], "a string, b string")
        k1 = df.select(surrogate_key(F.col("a"), F.col("b")).alias("k")).first()["k"]
        import hashlib

        assert k1 == hashlib.md5(f"{a}-{b}".encode()).hexdigest()


class TestCurationProperties:
    """Invariants of the curation operators over generated inputs."""

    @given(
        st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=40),
        st.integers(min_value=50, max_value=400),
    )
    @SETTINGS
    def test_pack_sequences_overflow_bound(self, spark, tokens, cap):
        """Each pack's token total stays below capacity + its largest
        member (contiguous greedy fill) and pack ids are nondecreasing
        in id order starting at 0 (not dense: a doc larger than the
        capacity strides over bucket indices)."""
        from openaq_data_pipeline_spark.operators.curation import pack_sequences

        rows = [(i, "g", t) for i, t in enumerate(tokens)]
        df = spark.createDataFrame(rows, "doc_id long, grp string, n long")
        out = pack_sequences(df, "grp", "doc_id", F.col("n"), cap)
        got = sorted(
            ((r.doc_id, r.pack_id, r["__tokens"]) for r in out.collect())
        )
        cum = 0
        per_pack: dict[int, int] = {}
        for (i, pack, n), t in zip(got, tokens):
            assert n == t
            assert pack == cum // cap
            cum += t
            per_pack[pack] = per_pack.get(pack, 0) + t
        packs_in_order = [p for _, p, _ in got]
        assert packs_in_order[0] == 0
        assert packs_in_order == sorted(packs_in_order)
        for pack, total in per_pack.items():
            assert total < cap + max(tokens)

    @given(st.text(alphabet="abc @.-019", min_size=0, max_size=60))
    @SETTINGS
    def test_pii_redaction_is_idempotent(self, spark, text):
        """Scanning already-redacted text finds nothing: redaction
        placeholders contain no match for either pattern, so a second
        pass is a no-op (is_clean=True everywhere)."""
        from openaq_data_pipeline_spark.operators.curation import pii_scan

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        first = pii_scan(df, "text", "doc_id").collect()[0]
        # rebuild the redacted text the operator fingerprinted
        import re as _re

        from openaq_data_pipeline_spark.operators.curation import EMAIL_RE, PHONE_RE

        redacted = _re.sub(PHONE_RE, "<PHONE>", _re.sub(EMAIL_RE, "<EMAIL>", text))
        import hashlib

        assert first.redacted_fp == hashlib.md5(redacted.encode()).hexdigest()
        df2 = spark.createDataFrame([(1, redacted)], "doc_id long, text string")
        second = pii_scan(df2, "text", "doc_id").collect()[0]
        assert second.is_clean


class TestSimhashBandedCompleteness:
    """The pigeonhole guarantee behind simhash_near_dup_pairs: over a
    random corpus, the banded search must return EXACTLY the pairs a
    brute-force Hamming scan of the same fingerprints finds at radius
    ≤ 3 — no false negatives (completeness is the whole point of the
    4-band split) and no false positives (the bit_count verify)."""

    def test_banded_equals_bruteforce_at_radius_3(self, spark):
        import itertools
        import random

        from openaq_data_pipeline_spark.operators.dedup import (
            simhash64,
            simhash_near_dup_pairs,
        )

        rng = random.Random(7)
        vocab = [f"t{i}" for i in range(30)]
        docs = []
        for did in range(60):
            base = rng.sample(vocab, rng.randint(5, 12))
            docs.append((did, " ".join(base)))
            # clones with tiny edits create a dense near-dup band
            if did % 3 == 0:
                docs.append((did + 1000, " ".join(base + [f"x{did}"])))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        fp = {r.doc_id: (r.b0, r.b1, r.b2, r.b3)
              for r in simhash64(df, "text", "doc_id").collect()}
        brute = {}
        for a, b in itertools.combinations(sorted(fp), 2):
            ham = sum(bin(x ^ y).count("1") for x, y in zip(fp[a], fp[b]))
            if ham <= 3:
                brute[(a, b)] = ham
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_near_dup_pairs(
                simhash64(df, "text", "doc_id"), "doc_id"
            ).collect()
        }
        assert got == brute, (
            f"banded != brute force: missing={set(brute) - set(got)}, "
            f"extra={set(got) - set(brute)}"
        )


# --- hybrid connected components vs pure-Python union-find --------------


def _py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference: plain union-find, label = min member id."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


class TestConnectedComponentsProperty:
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=40),
                st.integers(min_value=0, max_value=40),
            ).filter(lambda e: e[0] != e[1]),
            min_size=1,
            max_size=60,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_fast_path_matches_reference(self, spark, edges):
        """Single-partition union-find path (the default for every
        bench-scale graph) labels exactly like the reference."""
        from openaq_data_pipeline_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r.node: r.component_id for r in connected_components(pairs).collect()
        }
        assert got == _py_components(edges)

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=25),
                st.integers(min_value=0, max_value=25),
            ).filter(lambda e: e[0] != e[1]),
            min_size=4,
            max_size=40,
        )
    )
    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_multi_partition_merge_matches_reference(self, spark, edges):
        """Forcing the edges-per-partition budget down drives the
        union-find-seeded iterative merge across partition
        boundaries; labels must still be exact."""
        import openaq_data_pipeline_spark.operators.dedup as dd

        old = dd.CC_EDGES_PER_PARTITION
        dd.CC_EDGES_PER_PARTITION = 3
        try:
            pairs = spark.createDataFrame(edges, "id_a long, id_b long")
            got = {
                r.node: r.component_id
                for r in dd.connected_components(pairs).collect()
            }
            assert got == _py_components(edges)
        finally:
            dd.CC_EDGES_PER_PARTITION = old


# --- BM25 fixed-point scoring vs Fraction-exact reference ---------------


def _py_bm25(words_by_doc: dict[int, list[str]], qterms: list[str], k10=10**6):
    from fractions import Fraction

    docs = {d: ws for d, ws in words_by_doc.items()}
    n = len(docs)
    s = sum(len(ws) for ws in docs.values())
    tf = {d: {} for d in docs}
    for d, ws in docs.items():
        for w in ws:
            tf[d][w] = tf[d].get(w, 0) + 1
    df = {}
    for d in docs:
        for w in tf[d]:
            df[w] = df.get(w, 0) + 1
    scores = {}
    for d, ws in docs.items():
        dl = len(ws)
        total = 0
        for t in set(qterms):
            if t not in tf[d]:
                continue
            num = (2 * n - 2 * df[t] + 1) * (22 * tf[d][t] * s)
            den = (2 * df[t] + 1) * (10 * tf[d][t] * s + 3 * s + 9 * dl * n)
            # round-half-up(num/den * k10) in exact integer math
            total += (2 * num * k10 + den) // (2 * den)
        if total:
            scores[d] = total
    return scores


class TestBM25Property:
    @given(
        st.dictionaries(
            st.integers(min_value=0, max_value=9),
            st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8),
            min_size=1,
            max_size=6,
        ),
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=3),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_scores_match_integer_reference(self, spark, words_by_doc, qterms):
        from openaq_data_pipeline_spark.operators.retrieval import bm25_topk

        corpus = spark.createDataFrame(
            [(d, " ".join(ws)) for d, ws in words_by_doc.items()],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(0, " ".join(qterms))], "query_id long, q_text string"
        )
        got = {
            r.doc_id: r.score_fp
            for r in bm25_topk(
                corpus, queries, "text", "doc_id", "q_text", k=100
            ).collect()
        }
        assert got == _py_bm25(words_by_doc, qterms)


# --- bigram-LM fixed-point scoring vs integer reference -----------------


def _py_lm_score(train: dict[int, list[str]], cand: dict[int, list[str]]):
    k = 10**6
    c12: dict = {}
    c1: dict = {}
    succ = set()
    for ws in train.values():
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
            succ.add(b)
    v = len(succ)
    out = {}
    for d, ws in cand.items():
        if len(ws) < 2:
            continue
        total = n = 0
        for a, b in zip(ws, ws[1:]):
            num = c12.get((a, b), 0) + 1
            den = c1.get(a, 0) + v
            total += (num * 2 * k + den) // (2 * den)
            n += 1
        # avg = round-half-up(total / (n*k), 4)
        d2 = n * k
        t = total * 2 * 10**4 + d2
        out[d] = (n, ((t - t % (2 * d2)) // (2 * d2)) / 10**4)
    return out


class TestBigramLMProperty:
    @given(
        st.dictionaries(
            st.integers(min_value=0, max_value=4),
            st.lists(st.sampled_from("abcd"), min_size=2, max_size=8),
            min_size=1,
            max_size=4,
        ),
        st.dictionaries(
            st.integers(min_value=10, max_value=14),
            st.lists(st.sampled_from("abcdx"), min_size=1, max_size=8),
            min_size=1,
            max_size=4,
        ),
    )
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_scores_match_integer_reference(self, spark, train, cand):
        from openaq_data_pipeline_spark.operators.lm import (
            score_bigram_lm,
            train_bigram_lm,
        )

        tdf = spark.createDataFrame(
            [(d, " ".join(ws)) for d, ws in train.items()],
            "doc_id long, text string",
        )
        cdf = spark.createDataFrame(
            [(d, " ".join(ws)) for d, ws in cand.items()],
            "doc_id long, text string",
        )
        c12, c1, v = train_bigram_lm(tdf, "text", "doc_id")
        got = {
            r.doc_id: (r.n_bigrams, r.avg_prob)
            for r in score_bigram_lm(cdf, "text", "doc_id", c12, c1, v).collect()
        }
        assert got == _py_lm_score(train, cand)


class TestRrfFuseProperties:
    """rrf_fuse (r8): the fused scores equal the pure-Python integer
    model for generated rankings, independent of input row order."""

    @SETTINGS
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 2),          # query
                st.integers(0, 9),          # doc
                st.integers(1, 15),         # rank
            ),
            min_size=1,
            max_size=25,
            unique_by=lambda t: (t[0], t[1], t[2]),
        ),
        st.randoms(),
    )
    def test_matches_integer_model_any_order(self, spark, rows, rnd):
        from openaq_data_pipeline_spark.operators.retrieval import rrf_fuse

        shuffled = list(rows)
        rnd.shuffle(shuffled)
        df = spark.createDataFrame(
            shuffled, "query_id long, doc_id long, rank long"
        )
        got = {
            (r.query_id, r.doc_id): (r.rrf_score, r.n_systems)
            for r in rrf_fuse([df]).collect()
        }
        model: dict = {}
        for q, d, rk in rows:
            sc, n = model.get((q, d), (0, 0))
            model[(q, d)] = (sc + 10**12 // (60 + rk), n + 1)
        assert got == model


class TestPpsProperties:
    """pps_systematic_sample (r8): selected rows are exactly those
    whose weight segment covers a selection point; the sample size is
    k minus multi-point collapses."""

    @SETTINGS
    @given(
        st.lists(st.integers(0, 50), min_size=3, max_size=40).filter(
            lambda ws: sum(ws) > 0
        ),
        st.integers(1, 12),
    )
    def test_matches_integer_model(self, spark, weights, k):
        from openaq_data_pipeline_spark.operators.curation import (
            pps_systematic_sample,
        )

        rows = [(i, w) for i, w in enumerate(weights)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = {
            r.doc_id: r.pick_no
            for r in pps_systematic_sample(df, "w", "doc_id", k=k).collect()
        }
        total = sum(weights)
        cum, model = 0, {}
        for i, w in rows:
            lo = (cum * k) // total
            cum += w
            hi = (cum * k) // total
            if hi > lo:
                model[i] = hi
        assert got == model
        assert len(got) <= k


class TestByteFallbackProperties:
    """Byte-fallback totality (r9, VERDICT r8 #6): under
    byte_fallback=True ANY UTF-8 string encodes with zero UNK in all
    three tokenizer families, and the ids round-trip — vocabulary
    ids map back through the artifact, byte ids (−2−b) decode as
    UTF-8 byte runs — to the normalized text (normalization and
    tokenization as SPARK computes them, so unicode case/whitespace
    semantics are the engine's own)."""

    TRAIN = [(1, "low lower lowest low low"), (2, "new newer newest new")]
    _artifacts: dict = {}

    FALLBACK_SETTINGS = settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )

    @staticmethod
    def _decode(ids, id_to_piece):
        out, buf = [], bytearray()
        for i in ids:
            if i <= -2:
                buf.append(-(i) - 2)
                continue
            if buf:
                out.append(buf.decode("utf-8"))
                buf = bytearray()
            out.append(id_to_piece[i])
        if buf:
            out.append(buf.decode("utf-8"))
        return "".join(out)

    def _spark_words(self, spark, text):
        from openaq_data_pipeline_spark.operators.text import (
            normalize,
            tokens,
        )

        df = spark.createDataFrame([(text,)], "t string")
        arr = df.select(tokens(normalize(F.col("t"))).alias("w")).first()["w"]
        return [w for w in (arr or []) if w]

    def _trained(self, spark):
        if not self._artifacts:
            from openaq_data_pipeline_spark.operators.tokenizer import (
                bpe_symbol_ids,
                bpe_train_merges,
                unigram_piece_ids,
                unigram_train,
                wordpiece_ids,
                wordpiece_train,
            )

            train = spark.createDataFrame(
                self.TRAIN, "doc_id long, text string"
            )
            pieces = unigram_train(train, "text", vocab_size=12, n_iters=1)
            vocab = wordpiece_train(train, "text", vocab_size=16)
            merges = bpe_train_merges(train, "text", "doc_id", n_merges=4)
            sym_ids = bpe_symbol_ids(train, "text", merges)
            self._artifacts.update(
                pieces=pieces,
                uni_rev={v: k for k, v in unigram_piece_ids(pieces).items()},
                vocab=vocab,
                wp_rev={
                    v: (k[2:] if k.startswith("##") else k)
                    for k, v in wordpiece_ids(vocab).items()
                },
                merges=merges.localCheckpoint(eager=True),
                sym_ids=sym_ids.localCheckpoint(eager=True),
                bpe_rev={
                    r["tid"]: r["sym"] for r in sym_ids.collect()
                },
            )
        return self._artifacts

    @given(st.text(min_size=1, max_size=30))
    @FALLBACK_SETTINGS
    def test_unigram_total_and_round_trips(self, spark, text):
        import hypothesis

        from openaq_data_pipeline_spark.operators.tokenizer import (
            unigram_encode,
        )

        words = self._spark_words(spark, text)
        hypothesis.assume(words)
        art = self._trained(spark)
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = unigram_encode(
            df, "text", "doc_id", art["pieces"], byte_fallback=True
        ).collect()
        ids = list(rows[0]["token_ids"])
        assert all(i != -1 for i in ids)  # zero UNK — encode is total
        assert self._decode(ids, art["uni_rev"]) == "".join(words)

    @given(st.text(min_size=1, max_size=30))
    @FALLBACK_SETTINGS
    def test_wordpiece_total_and_round_trips(self, spark, text):
        import hypothesis

        from openaq_data_pipeline_spark.operators.tokenizer import (
            wordpiece_encode,
        )

        words = self._spark_words(spark, text)
        hypothesis.assume(words)
        art = self._trained(spark)
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = wordpiece_encode(
            df, "text", "doc_id", art["vocab"], byte_fallback=True
        ).collect()
        ids = list(rows[0]["token_ids"])
        assert all(i != -1 for i in ids)
        assert self._decode(ids, art["wp_rev"]) == "".join(words)

    @given(st.text(min_size=1, max_size=24))
    @FALLBACK_SETTINGS
    def test_bpe_total_and_round_trips(self, spark, text):
        import hypothesis

        from openaq_data_pipeline_spark.operators.tokenizer import (
            bpe_encode,
        )

        words = self._spark_words(spark, text)
        hypothesis.assume(words)
        art = self._trained(spark)
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = bpe_encode(
            df, "text", "doc_id", art["merges"],
            symbol_ids=art["sym_ids"], byte_fallback=True,
        ).collect()
        ids = list(rows[0]["token_ids"])
        assert all(i != -1 for i in ids)
        assert self._decode(ids, art["bpe_rev"]) == "".join(words)

    def test_byte_id_space_is_disjoint_and_exact(self):
        from openaq_data_pipeline_spark.operators.tokenizer import (
            byte_fallback_ids_py,
        )

        assert byte_fallback_ids_py("A") == [-(2 + 0x41)]
        assert byte_fallback_ids_py("é") == [-(2 + 0xC3), -(2 + 0xA9)]
        assert byte_fallback_ids_py("€") == [-(2 + b) for b in "€".encode()]
        assert byte_fallback_ids_py("𝄞") == [-(2 + b) for b in "𝄞".encode()]
        # the whole byte range sits strictly below the UNK sentinel
        ids = [i for b in range(256) for i in [-(2 + b)]]
        assert max(ids) == -2 and min(ids) == -257


class TestRobotsPercentNormalizeProperties:
    """The RFC 9309 percent-normalization runs twice — Python at rule
    parse time, codegen on the URL target — and matching is only
    correct if the two agree octet-for-octet. Pin equivalence over
    generated inputs (ASCII + percent-escape soup; the URL side's
    contract excludes raw non-ASCII, which arrives transport-encoded)."""

    ALPHABET = "abzAZ09-._~/?=&%24fF*$ #"

    @given(st.text(alphabet=ALPHABET, min_size=0, max_size=24))
    @SETTINGS
    def test_codegen_equals_python(self, spark, s):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.frontier import (
            _pct_normalize_col,
            _pct_normalize_py,
        )

        got = (
            spark.createDataFrame([(s,)], "s string")
            .select(_pct_normalize_col(F.col("s")).alias("n"))
            .first()["n"]
        )
        assert got == _pct_normalize_py(s, extra="*$")


class TestBfdPackingProperties:
    """Best-fit-decreasing invariants over random inputs: hard
    capacity bound (oversized docs isolate), every doc assigned
    exactly once, and bin count at the information floor's constant
    envelope (BFD ≤ 11/9·OPT + 1 with OPT ≥ ceil(total/cap))."""

    @given(
        st.lists(st.integers(min_value=1, max_value=180), min_size=1,
                 max_size=25),
        st.integers(min_value=60, max_value=200),
    )
    @SETTINGS
    def test_invariants(self, spark, tokens, cap):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.curation import (
            pack_sequences_bfd,
        )

        rows = [("g", i, int(t)) for i, t in enumerate(tokens)]
        df = spark.createDataFrame(rows, "grp string, doc_id long, n long")
        got = pack_sequences_bfd(df, "grp", "doc_id", F.col("n"), cap).collect()
        assert sorted(r.doc_id for r in got) == list(range(len(tokens)))
        per_pack: dict = {}
        for r in got:
            per_pack.setdefault(r.pack_id, []).append(int(r["__tokens"]))
        for ts in per_pack.values():
            if len(ts) > 1:
                assert sum(ts) <= cap
            else:
                assert ts[0] <= cap or len(ts) == 1  # oversized isolates
        import math

        n_over = sum(1 for t in tokens if t > cap)
        opt_floor = math.ceil(sum(t for t in tokens if t <= cap) / cap)
        assert len(per_pack) <= n_over + max(
            1, math.ceil(11 * opt_floor / 9) + 1
        )


class TestGifCodecProperty:
    """GIF encode→decode is identity for ANY palette image the
    encoder accepts (≤256 colors), plain and interlaced — the LZW
    dictionary growth, 12-bit reset, KwKwK and deinterlace paths are
    all reachable from random inputs. Pure-Python property (no
    Spark): the codec is the same code the Arrow image plane runs."""

    @SETTINGS
    @given(
        st.integers(1, 24),
        st.integers(1, 24),
        st.integers(1, 17),
        st.integers(0, 2**32 - 1),
        st.booleans(),
    )
    def test_round_trip(self, h, w, ncol, seed, interlace):
        import numpy as np

        from openaq_data_pipeline_spark.operators.multimodal import (
            decode_gif,
            encode_gif,
            gif_frame_count,
        )

        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, (h, w))]
        blob = encode_gif(img, interlace=interlace)
        assert (decode_gif(blob) == img).all()
        assert gif_frame_count(blob) == 1


class TestPhraseOccurrencesProperty:
    """Phrase counting equals the obvious token-list scan for random
    token streams over a tiny alphabet (maximizes adjacency and
    self-overlap edge cases). The oracle counts NON-overlapping
    sequence matches left-to-right — the operator's documented
    string-count convention."""

    @SETTINGS
    @given(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=24),
        st.lists(st.sampled_from("ab"), min_size=1, max_size=3),
    )
    def test_matches_token_scan(self, spark, doc_toks, phrase_toks):
        from openaq_data_pipeline_spark.operators.retrieval import (
            phrase_occurrences,
        )

        text = " ".join(doc_toks)
        phrase = " ".join(phrase_toks)
        expect, i = 0, 0
        while i + len(phrase_toks) <= len(doc_toks):
            if doc_toks[i : i + len(phrase_toks)] == phrase_toks:
                expect += 1
                i += len(phrase_toks)
            else:
                i += 1
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = phrase_occurrences(df, "text", "doc_id", phrase).collect()
        got = rows[0].n_hits if rows else 0
        assert got == expect, (text, phrase, got, expect)


class TestVp8lRoundTripProperty:
    """Property: ANY small uint8 RGB image survives the VP8L
    encode→decode round trip channel-exactly, in every encoder mode
    its color count admits (r13 codec)."""

    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.sampled_from(["plain", "subtract_green", "palette"]),
    )
    @SETTINGS
    def test_roundtrip(self, h, w, seed, mode):
        import numpy as np

        from openaq_data_pipeline_spark.operators.vp8l import (
            decode_webp_lossless,
            encode_webp_lossless,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        kwargs = {}
        if mode == "subtract_green":
            kwargs["subtract_green"] = True
        elif mode == "palette":
            flat = img.reshape(-1, 3)
            if len(np.unique(flat, axis=0)) > 256:
                return  # palette mode inapplicable for this draw
            kwargs["palette"] = True
        blob = encode_webp_lossless(img, **kwargs)
        assert np.array_equal(decode_webp_lossless(blob), img)


class TestVp8lTransformRoundTripProperty:
    """Property (r14): the predictor and color-transform encoder
    modes round-trip channel-exactly for ANY small image, mode and
    multiplier draw."""

    @given(
        st.integers(min_value=1, max_value=10),
        st.integers(min_value=1, max_value=10),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.integers(min_value=0, max_value=13),
        st.tuples(
            st.integers(min_value=-128, max_value=127),
            st.integers(min_value=-128, max_value=127),
            st.integers(min_value=-128, max_value=127),
        ),
        st.booleans(),
    )
    @SETTINGS
    def test_roundtrip(self, h, w, seed, mode, ct, use_predictor):
        import numpy as np

        from openaq_data_pipeline_spark.operators.vp8l import (
            decode_webp_lossless,
            encode_webp_lossless,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        kwargs = (
            {"predictor_mode": mode}
            if use_predictor
            else {"color_transform": ct}
        )
        blob = encode_webp_lossless(img, **kwargs)
        assert np.array_equal(decode_webp_lossless(blob), img)


class TestFlacRoundTripProperty:
    """Property (r14): ANY small int16 multi-channel signal survives
    the FLAC encode→decode round trip sample-exactly in every
    fixture subframe kind (and libFLAC-shaped CRCs verify along the
    way)."""

    @given(
        st.integers(min_value=1, max_value=400),
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.sampled_from(["auto", "verbatim", "fixed2"]),
        st.sampled_from([8000, 44100, 48000]),
    )
    @SETTINGS
    def test_roundtrip(self, n, channels, seed, kind, rate):
        import numpy as np

        from openaq_data_pipeline_spark.operators.flac import (
            decode_flac,
            encode_flac,
        )

        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, (n, channels), dtype=np.int32)
        blob = encode_flac(
            s, rate, block_size=192, subframe=kind
        )
        out, got_rate = decode_flac(blob)
        assert got_rate == rate
        assert np.array_equal(out, s)
