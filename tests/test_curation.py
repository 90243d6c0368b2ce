"""Behavior tests for the corpus-curation operators beyond hash
parity: packing respects the token-budget invariant, PII injection is
found and redacted exactly, sampling is deterministic and roughly
rate-proportional, decontamination flags a fully-contaminated doc."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators import text as X
from openaq_data_pipeline_spark.operators.curation import (
    pack_sequences,
    pii_scan,
    stratified_sample,
    train_eval_overlap,
)

SF_DIR = "/root/testdata/sf0.001"


class TestSequencePacking:
    def test_pack_budget_invariant(self, spark):
        """Every pack except a group's last holds ≥ capacity tokens
        only by its final doc (contiguous greedy fill): tokens-before-
        last-doc < capacity ≤ tokens-through-last-doc, and packs are
        contiguous id ranges."""
        cap = 256
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        packed = pack_sequences(
            d.select("doc_id", "lang", "text"),
            "lang", "doc_id", X.token_count(F.col("text")), cap,
        )
        rows = packed.select("lang", "doc_id", "pack_id", "__tokens").collect()
        by_group: dict[str, list] = {}
        for r in sorted(rows, key=lambda r: (r.lang, r.doc_id)):
            by_group.setdefault(r.lang, []).append(r)
        for lang, grp in by_group.items():
            cum = 0
            for r in grp:
                assert r.pack_id == cum // cap, (lang, r.doc_id)
                cum += r["__tokens"]
            # pack ids are nondecreasing and start at 0
            ids = [r.pack_id for r in grp]
            assert ids[0] == 0 and ids == sorted(ids)

    def test_single_shuffle_plan(self, spark):
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        packed = pack_sequences(
            d.select("doc_id", "lang", "text"),
            "lang", "doc_id", X.token_count(F.col("text")), 256,
        )
        plan = packed._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1  # one shuffle: the window partition


class TestPiiScan:
    def test_injected_pii_found_and_redacted(self, spark):
        d = spark.createDataFrame(
            [
                (1, "plain words only"),
                (2, "reach me at bob7@mail.com or 555-1234 thanks"),
                (3, "two mails a@b.io c9@d.net and 555-0000 555-9999"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in pii_scan(d, "text", "doc_id").collect()}
        assert out[1].is_clean and out[1].n_emails == 0 and out[1].n_phones == 0
        assert (out[2].n_emails, out[2].n_phones) == (1, 1)
        assert (out[3].n_emails, out[3].n_phones) == (2, 2)
        # redaction fingerprint = md5 of placeholder-substituted text
        import hashlib

        expected = hashlib.md5(
            "reach me at <EMAIL> or <PHONE> thanks".encode()
        ).hexdigest()
        assert out[2].redacted_fp == expected


class TestStratifiedSample:
    def test_deterministic_and_rate_proportional(self, spark):
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        rates = {"en": "80", "es": "40", "de": "40", "fr": "20"}
        s1 = stratified_sample(d.select("doc_id", "lang"), "doc_id", "lang", rates)
        s2 = stratified_sample(d.select("doc_id", "lang"), "doc_id", "lang", rates)
        ids1 = {r.doc_id for r in s1.collect()}
        ids2 = {r.doc_id for r in s2.collect()}
        assert ids1 == ids2  # no RNG anywhere
        # en keeps ~50%: loose bound for a small corpus
        n_en = d.filter(F.col("lang") == "en").count()
        k_en = s1.filter(F.col("lang") == "en").count()
        assert 0.25 <= k_en / n_en <= 0.75

    def test_rejects_malformed_thresholds(self, spark):
        """Uppercase / wrong-length thresholds silently skew keep rates
        (raw byte-order comparison) — they must error instead."""
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        for bad in ("A0", "8", "100", ""):
            with pytest.raises(ValueError, match="threshold"):
                stratified_sample(
                    d.select("doc_id", "lang"), "doc_id", "lang", {"en": bad}
                )
        with pytest.raises(ValueError, match="default"):
            stratified_sample(
                d.select("doc_id", "lang"), "doc_id", "lang", {},
                default_threshold="ZZ",
            )


class TestDecontamination:
    def test_exact_copy_of_eval_doc_is_dropped(self, spark):
        # doc 10 is eval (10 % 10 == 0); doc 11 is its verbatim copy →
        # 100% shingle overlap → drop. doc 12 shares nothing → keep.
        d = spark.createDataFrame(
            [
                (10, "alpha beta gamma delta epsilon zeta"),
                (11, "alpha beta gamma delta epsilon zeta"),
                (12, "one two three four five six seven"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in train_eval_overlap(d, "text", "doc_id").collect()}
        assert set(out) == {11, 12}  # eval docs are not scored
        assert out[11].verdict == "drop" and out[11].n_shared == out[11].n_shingles
        assert out[12].verdict == "keep" and out[12].n_shared == 0


class TestChunking:
    def test_chunk_boundaries_overlap_and_totality(self, spark):
        """chunk k starts at 1 + k·stride; consecutive chunks share
        exactly `overlap` tokens (except the trailing window, which
        ends at the doc end); every token appears in >=1 chunk and
        the concatenation of stride-prefixes + last chunk rebuilds
        the document."""
        from openaq_data_pipeline_spark.operators.curation import chunk_documents

        words = [f"w{i}" for i in range(50)]
        df = spark.createDataFrame(
            [(1, " ".join(words)), (2, "short doc only")],
            "doc_id long, text string",
        )
        out = chunk_documents(df, "text", "doc_id", chunk_tokens=20, overlap=5)
        rows = sorted(
            ((r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens) for r in out.collect())
        )
        doc1 = [r for r in rows if r[0] == 1]
        # 50 tokens, chunk 20, stride 15 -> 1 + ceil(30/15) = 3 chunks
        assert [r[1] for r in doc1] == [0, 1, 2]
        c0, c1, c2 = (r[2].split(" ") for r in doc1)
        assert c0 == words[0:20] and c1 == words[15:35] and c2 == words[30:50]
        assert c0[-5:] == c1[:5]  # exact overlap
        assert [r[3] for r in doc1] == [20, 20, 20]
        # union covers every token in order
        rebuilt = c0[:15] + c1[:15] + c2
        assert rebuilt == words
        # short doc: single chunk, true token count
        doc2 = [r for r in rows if r[0] == 2]
        assert len(doc2) == 1 and doc2[0][2] == "short doc only" and doc2[0][3] == 3

    def test_trailing_window_ends_at_doc_end(self, spark):
        from openaq_data_pipeline_spark.operators.curation import chunk_documents

        words = [f"t{i}" for i in range(23)]  # 23 tokens, chunk 10, stride 7
        df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
        rows = sorted(
            (r.chunk_id, r.chunk_text.split(" "), r.n_tokens)
            for r in chunk_documents(
                df, "text", "doc_id", chunk_tokens=10, overlap=3
            ).collect()
        )
        # 1 + ceil(13/7) = 3 chunks; last starts at 15 (1-based) -> 9 tokens
        assert [r[0] for r in rows] == [0, 1, 2]
        assert rows[2][1] == words[14:23] and rows[2][2] == 9
        assert rows[2][1][-1] == words[-1]  # nothing dropped

    def test_overlap_must_be_smaller_than_chunk(self, spark):
        import pytest as _pytest

        from openaq_data_pipeline_spark.operators.curation import chunk_documents

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="stride"):
            chunk_documents(df, "text", "doc_id", chunk_tokens=8, overlap=8)
        with _pytest.raises(ValueError, match="unit"):
            chunk_documents(df, "text", "doc_id", unit="chars")

    def test_bpe_budgeted_chunks_respect_the_budget(self, spark):
        """VERDICT r4 #7: with unit='bpe' every chunk holds at most
        chunk_tokens BPE-ish tokens — the budget a model context is
        measured in, NOT whitespace words (symbol-dense text blows a
        whitespace budget: 'a,b.c' is 1 word but 5 BPE tokens) — and
        re-tokenizing the emitted chunk_text reproduces the counted
        budget exactly (the rejoin is round-trip safe)."""
        from openaq_data_pipeline_spark.operators.curation import chunk_documents
        from openaq_data_pipeline_spark.operators.text import bpe_token_count

        # 12 words, each 'x10,y20.' → 6 BPE tokens (x, 10, ',', y,
        # 20, '.') = 72 BPE tokens total but only 12 whitespace words
        word = "x10,y20."
        df = spark.createDataFrame(
            [(1, " ".join([word] * 12)), (2, "plain words only here")],
            "doc_id long, text string",
        )
        out = chunk_documents(
            df, "text", "doc_id", chunk_tokens=20, overlap=5, unit="bpe"
        )
        recount = out.withColumn("n_again", bpe_token_count(F.col("chunk_text")))
        rows = sorted(
            (r.doc_id, r.chunk_id, r.n_tokens, r.n_again)
            for r in recount.collect()
        )
        doc1 = [r for r in rows if r[0] == 1]
        # 72 BPE tokens, chunk 20, stride 15 → 1 + ceil(52/15) = 5
        assert [r[1] for r in doc1] == [0, 1, 2, 3, 4]
        assert all(r[2] <= 20 for r in doc1), "budget exceeded"
        assert all(r[2] == r[3] for r in rows), "rejoin broke the count"
        # a whitespace budget of 20 would have emitted ONE chunk —
        # the unit observably changes the slicing
        ws = chunk_documents(df, "text", "doc_id", chunk_tokens=20, overlap=5)
        assert ws.filter("doc_id = 1").count() == 1
        # totality: stride prefixes + last chunk rebuild the stream
        texts = {
            r.chunk_id: r.chunk_text.split(" ")
            for r in out.filter("doc_id = 1").collect()
        }
        rebuilt = sum((texts[k][:15] for k in range(4)), []) + texts[4]
        import re as _re

        from openaq_data_pipeline_spark.operators.text import BPE_TOKEN_RE

        assert rebuilt == _re.findall(BPE_TOKEN_RE, " ".join([word] * 12))


class TestFuzzyDecontamination:
    def test_cross_corpus_pairs_only(self, spark):
        """A train doc and its lightly-truncated eval copy pair up
        with exact Jaccard; two near-identical TRAIN docs never
        produce a pair (train-by-train is dedup's job); clean eval
        docs match nothing."""
        from openaq_data_pipeline_spark.operators.curation import fuzzy_decontaminate
        from pyspark.sql import functions as F

        base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
        rows = [
            (1, base),                                  # train original
            (2, base + " kilo"),                        # train near-dup of 1
            (100, base[: base.rfind(" ")]),             # eval: 1 truncated
            (101, "totally different words here now"),  # clean eval
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            (r.train_id, r.eval_id): (r.n_common, r.n_train, r.n_eval, r.jaccard)
            for r in fuzzy_decontaminate(
                df, is_eval=F.col("doc_id") >= 100, min_jaccard=0.5
            ).collect()
        }
        # doc 1: 8 shingles; eval copy drops the last word -> 7 shared
        assert (1, 100) in out
        n_common, n_train, n_eval, jac = out[(1, 100)]
        assert (n_common, n_train, n_eval) == (7, 8, 7)
        assert jac == round(7 / 8, 4)
        # train 2 also near-dups the eval copy (shares 6 of its 9)
        assert all(k[1] != 101 for k in out), "clean eval doc matched"
        assert all(k[0] < 100 and k[1] >= 100 for k in out), (
            "non-cross pair emitted"
        )

    def test_threshold_filters_weak_overlap(self, spark):
        from openaq_data_pipeline_spark.operators.curation import fuzzy_decontaminate
        from pyspark.sql import functions as F

        rows = [
            (1, "one two three four five six seven eight nine ten"),
            (100, "one two three four entirely different tail words here"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        hits = fuzzy_decontaminate(
            df, is_eval=F.col("doc_id") >= 100, min_jaccard=0.5
        ).collect()
        assert hits == []  # only 2 of 8/8 shingles shared -> jaccard ~0.14

    def test_dropped_bucket_observability(self, spark):
        """A mass-duplicate class exceeding the cap is DROPPED by the
        pair generator and surfaced by fuzzy_decon_dropped_buckets
        with its train/eval split — the r4 #4 observability contract
        extended to the fuzzy tier."""
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.curation import (
            fuzzy_decon_dropped_buckets,
            fuzzy_decontaminate,
        )

        text = "same exact boilerplate text repeated across the corpus"
        rows = [(i, text) for i in range(30)]  # ids 0..29; >=100 eval
        rows += [(100 + i, text) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ev = F.col("doc_id") >= 100
        # cap below the class size -> every bucket dropped, no pairs
        pairs = fuzzy_decontaminate(df, is_eval=ev, max_bucket=10).collect()
        assert pairs == []
        dropped = fuzzy_decon_dropped_buckets(
            df, is_eval=ev, max_bucket=10
        ).collect()
        assert len(dropped) > 0
        assert all((r.n_train, r.n_eval) == (30, 10) for r in dropped)
        # cap raised -> pairs flow and nothing reports dropped
        assert (
            fuzzy_decon_dropped_buckets(df, is_eval=ev, max_bucket=2048).count()
            == 0
        )
        assert len(fuzzy_decontaminate(df, is_eval=ev).collect()) > 0


class TestGopherRules:
    """Gopher quality battery (r8): each rule fails on a crafted
    document and the conjunction verdict composes them."""

    def _run(self, spark, docs, **kw):
        from openaq_data_pipeline_spark.operators.text import gopher_rules

        df = spark.createDataFrame(docs, "doc_id long, text string")
        return {r.doc_id: r for r in gopher_rules(df, "text", "doc_id", **kw).collect()}

    def test_each_rule_fires(self, spark):
        good = "the quick brown fox jumps over the lazy dog and then " * 5
        docs = [
            (0, good),                                  # passes everything
            (1, "the and short"),                       # word count < 50
            (2, ("a " * 60).strip()),                   # mean word len < 3
            (3, good + " " + "#" * 1 + " #" * 9),       # symbol ratio
            (4, good + "\n- bullet" * 10),              # bullet lines 10/11 > 90%
            (5, good + ("\nmore text follows..." * 2)), # ellipsis 2/3 lines
            (6, ("42 " * 60 + "the and be of") ),       # alpha words < 80%
            (7, ("word " * 60).strip()),                # no required stops
        ]
        got = self._run(spark, docs)
        assert got[0].keep
        assert not got[1].r_word_count and not got[1].keep
        assert not got[2].r_mean_word_len and not got[2].keep
        assert not got[3].r_symbol_ratio and not got[3].keep
        assert not got[4].r_bullet_lines and not got[4].keep
        assert not got[5].r_ellipsis_lines and not got[5].keep
        assert not got[6].r_alpha_words and not got[6].keep
        assert not got[7].r_stopwords and not got[7].keep

    def test_bullet_threshold_is_papers_90pct(self, spark):
        # Rae et al. 2021 Appendix A removes documents with MORE than
        # 90% bullet-starting lines — a 75% bullet document survives.
        good = "the quick brown fox jumps over the lazy dog and then " * 5
        got = self._run(spark, [(0, good + "\n- bullet\n- bullet\n- b")])
        assert got[0].r_bullet_lines and got[0].keep

    def test_empty_document_fails_closed(self, spark):
        got = self._run(spark, [(0, ""), (1, "   ")])
        assert not got[0].keep and not got[1].keep
        assert got[0].n_words == 0 and got[1].n_words == 0

    def test_custom_required_stopword_set(self, spark):
        text = ("foo bar baz qux " * 15).strip()
        default = self._run(spark, [(0, text)])
        custom = self._run(
            spark, [(0, text)], required_stopwords=["foo", "bar"]
        )
        assert not default[0].r_stopwords
        assert custom[0].r_stopwords


class TestCurationPipelineEndToEnd:
    """The whole training-data pipeline composed (r8): raw docs →
    Gopher structural filter → exact + fuzzy incremental dedup
    funnel → systematic PPS sample → unigram-tokenized sharded
    export. Every stage is an already-tested operator; this pins
    that they COMPOSE — schemas line up, survivors flow through,
    and the export is deterministic end-to-end."""

    def test_pipeline_composes(self, spark, tmp_path):
        import glob

        from openaq_data_pipeline_spark.operators.curation import (
            pps_systematic_sample,
            write_shards,
        )
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            incremental_exact_dedup,
            temp_exact_index,
        )
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            incremental_fuzzy_matches,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.operators.text import gopher_rules
        from openaq_data_pipeline_spark.operators.tokenizer import (
            unigram_encode,
            unigram_train,
        )

        def body(i):
            # ≥50 words, distinct across docs (only the/and shared) so
            # organic pairs are NOT near-dups of each other
            return " ".join(
                ["the"] + [f"w{i}x{j}" for j in range(50)] + ["and"]
            )

        docs = [(i, body(i)) for i in range(40)]
        docs += [(100, docs[0][1])]               # exact dup of 0
        docs += [(101, docs[1][1] + " extra")]    # near dup of 1
        docs += [(102, "x")]                      # fails gopher
        df = spark.createDataFrame(docs, "doc_id long, text string")

        # 1. structural quality gate
        verdicts = gopher_rules(
            df, "text", "doc_id", required_stopwords=["the", "and"]
        )
        kept = df.join(
            verdicts.filter("keep").select("doc_id"), "doc_id"
        )
        assert kept.count() == 42  # 102 dropped

        # 2. dedup funnel: history = first 20 docs, batch = the rest
        hist = kept.filter("doc_id < 20")
        batch = kept.filter("doc_id >= 20")
        with temp_exact_index(n_buckets=4) as eidx, temp_fuzzy_index(
            n_buckets=4
        ) as fidx:
            build_exact_index(hist, "text", "doc_id", eidx)
            build_fuzzy_index(hist, "text", "doc_id", fidx)
            disp = incremental_exact_dedup(batch, "text", "doc_id", eidx)
            exact_kept = batch.join(
                disp.filter("kept").select("doc_id"), "doc_id"
            )
            m = incremental_fuzzy_matches(
                exact_kept, "text", "doc_id", fidx
            )
            fuzzy_dropped = m.select(
                F.col("eval_id").alias("doc_id")
            ).distinct()
            survivors = exact_kept.join(
                fuzzy_dropped, "doc_id", "left_anti"
            ).localCheckpoint(eager=True)  # outlive the index drop
            surv_ids = {r.doc_id for r in survivors.select("doc_id").collect()}
        assert 100 not in surv_ids       # exact dup caught
        assert 101 not in surv_ids       # near dup caught via index
        assert {20, 21, 39} <= surv_ids

        # 3. weighted downsample (weight = length)
        weighted = survivors.withColumn(
            "w", F.length("text").cast("long")
        )
        sample = pps_systematic_sample(
            weighted.select("doc_id", "w", "text"), "w", "doc_id", k=10
        )
        n_sample = sample.count()
        assert 1 <= n_sample <= 10

        # 4. tokenize + sharded export
        pieces = unigram_train(hist, "text", vocab_size=60, n_iters=1)
        toks = unigram_encode(sample, "text", "doc_id", pieces)
        out = str(tmp_path / "shards")
        write_shards(
            toks.select("doc_id", "token_ids", "n_tokens"),
            out,
            "doc_id",
            n_shards=2,
        )
        files = glob.glob(f"{out}/shard_id=*/*")
        assert files
        back = spark.read.json(f"{out}/shard_id=*")
        assert back.count() == n_sample
        assert {"doc_id", "token_ids", "n_tokens"} <= set(back.columns)


class TestLeakageSafeSplit:
    """leakage_safe_split (r8): near-dup clusters never straddle
    splits; fractions hold approximately; deterministic under salt."""

    def _split(self, spark, n_docs, pairs, fractions, salt=""):
        from openaq_data_pipeline_spark.operators.curation import (
            leakage_safe_split,
        )

        docs = spark.createDataFrame(
            [(i,) for i in range(n_docs)], "doc_id long"
        )
        pdf = spark.createDataFrame(pairs, "a_id long, b_id long")
        return {
            r.doc_id: (r.cluster_rep, r.split)
            for r in leakage_safe_split(
                docs, pdf, "doc_id", fractions, salt=salt
            ).collect()
        }

    def test_clusters_stay_together(self, spark):
        # chain 0-1-2 one cluster; 5-6 another; rest singletons
        pairs = [(0, 1), (1, 2), (5, 6)]
        got = self._split(
            spark, 20, pairs, {"train": 8, "val": 1, "test": 1}
        )
        assert got[0] == got[1] == got[2]
        assert got[5] == got[6]
        assert got[0][0] == 0 and got[5][0] == 5
        # every doc assigned to a named split
        assert {s for _, s in got.values()} <= {"train", "val", "test"}

    def test_fractions_roughly_hold_on_singletons(self, spark):
        got = self._split(spark, 400, [(0, 1)], {"train": 3, "test": 1})
        n_train = sum(1 for _, s in got.values() if s == "train")
        assert 0.6 < n_train / 400 < 0.9

    def test_salt_changes_assignment_deterministically(self, spark):
        a = self._split(spark, 50, [(0, 1)], {"train": 1, "test": 1})
        b = self._split(spark, 50, [(0, 1)], {"train": 1, "test": 1})
        c = self._split(
            spark, 50, [(0, 1)], {"train": 1, "test": 1}, salt="s2"
        )
        assert a == b
        assert a != c

    def test_bad_fractions_rejected(self, spark):
        import pytest as _p

        with _p.raises(ValueError):
            self._split(spark, 5, [(0, 1)], {"train": 0})


class TestHtmlExtract:
    """HTML → text extraction (r8): the crawl front door as a codegen
    regexp chain — non-content blocks vanish with their contents,
    paragraph structure survives as newlines, common entities decode
    (&amp; last, so double-escapes stay literal), plain text is a
    fixed point, NULL passes through."""

    HTML = (
        '<!DOCTYPE html><html><head><title>My &amp; Page</title>'
        "<style>p{color:red}</style></head>"
        '<body><!-- note --><script>var x = "<p>hi</p>";</script>'
        "<h1>Header</h1><p>First &lt;b&gt; paragraph&nbsp;here.</p>"
        "<div>Second<br>line</div>tail &amp;lt; text</body></html>"
    )

    def _run(self, spark, rows):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.text import (
            html_extract,
            html_title,
        )

        df = spark.createDataFrame(rows, "id long, html string")
        return {
            r.id: (r.t, r.title)
            for r in df.select(
                "id",
                html_extract(F.col("html")).alias("t"),
                html_title(F.col("html")).alias("title"),
            ).collect()
        }

    def test_extraction_structure_entities_and_blocks(self, spark):
        got = self._run(spark, [(1, self.HTML)])
        text, title = got[1]
        assert title == "My & Page"
        # script/style/comment contents are GONE (not just the tags)
        assert "color:red" not in text and "var x" not in text
        assert "note" not in text
        # paragraph structure survives; entities decode; &amp;lt;
        # double-escape stays literal
        assert text == (
            "Header\n\nFirst <b> paragraph here.\n\nSecond\nline\n"
            "tail &lt; text"
        )

    def test_plain_text_fixed_point_and_null(self, spark):
        got = self._run(
            spark, [(1, "plain text only"), (2, None), (3, "  spaced\n\n\n\nout  ")]
        )
        assert got[1] == ("plain text only", None)
        assert got[2] == (None, None)
        # whitespace collapses even without markup
        assert got[3][0] == "spaced\n\nout"

    # a boilerplate-heavy page: nav menu, cookie banner, share strip
    # and footer around one real article. The regex chain keeps ALL
    # visible text; the density extractor must keep only the article.
    BOILERPLATE_HTML = (
        "<html><head><title>T</title></head><body>"
        '<nav><a href="/">Home</a> <a href="/news">News</a> '
        '<a href="/about">About</a> <a href="/contact">Contact</a></nav>'
        "<div>Accept cookies?</div>"
        "<article><h2>Rivers of the Valley</h2>"
        "<p>The calm river flows through the old valley and past the "
        "mill, carrying silt from the spring thaw toward the delta "
        "where the herons wait.</p>"
        "<p>See also</p>"
        "<p>Every autumn the water slows, and the village downstream "
        "measures the change with the same brass gauge it has used "
        "for eighty years.</p></article>"
        '<div><a href="/share/t">Tweet</a> <a href="/share/f">Share</a> '
        '<a href="/share/l">Post</a></div>'
        '<footer><a href="/privacy">Privacy</a> · '
        '<a href="/terms">Terms</a> · © 2026 Example Corp</footer>'
        "</body></html>"
    )

    def test_density_extractor_drops_boilerplate_regex_chain_keeps_it(
        self, spark
    ):
        """VERDICT r8 #4: on a boilerplate-heavy page the regex chain
        keeps nav/footer text while block-level text-density
        extraction (jusText/Arc90 heuristics: length + link density +
        short-block context propagation) keeps the article alone —
        headings and short connector paragraphs surviving through
        their content-dense neighbors."""
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.text import (
            html_extract,
            html_extract_density,
        )

        df = spark.createDataFrame(
            [(1, self.BOILERPLATE_HTML)], "id long, html string"
        )
        chain = df.select(
            html_extract(F.col("html")).alias("t")
        ).collect()[0]["t"]
        assert "Home" in chain and "Privacy" in chain  # chain keeps all
        dense = {
            r.id: r.text for r in html_extract_density(df, "html").collect()
        }[1]
        # article survives, including the heading and the short
        # "See also" paragraph between two good blocks
        assert "calm river flows" in dense
        assert "brass gauge" in dense
        assert "Rivers of the Valley" in dense
        assert "See also" in dense
        # boilerplate dies: nav, cookie banner, share strip, footer
        for junk in ("Home", "Accept cookies", "Tweet", "Privacy",
                     "Example Corp"):
            assert junk not in dense, junk
        # schema: input columns preserved, text appended
        out = html_extract_density(df, "html")
        assert out.columns == ["id", "html", "text"]

    def test_density_null_and_no_content_page(self, spark):
        from openaq_data_pipeline_spark.operators.text import (
            html_extract_density,
        )

        df = spark.createDataFrame(
            [(1, None),
             (2, '<nav><a href="/">Home</a> <a href="/x">X</a></nav>')],
            "id long, html string",
        )
        got = {r.id: r.text for r in html_extract_density(df, "html").collect()}
        assert got[1] is None
        assert got[2] == ""

    def test_density_py_core_is_deterministic_and_tag_robust(self):
        from openaq_data_pipeline_spark.operators.text import (
            density_extract_py,
        )

        page = self.BOILERPLATE_HTML
        assert density_extract_py(page) == density_extract_py(page)
        # unclosed tags and stray brackets don't crash the tokenizer
        assert density_extract_py("<p>" + "a sentence of words " * 5) != ""
        assert density_extract_py("<div><p>x <b>y") is not None

    def test_composes_with_quality_signals(self, spark):
        """The intended pipeline position: html_extract feeds the
        text tier directly."""
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.text import (
            html_extract,
            token_count,
        )

        df = spark.createDataFrame([(1, self.HTML)], "id long, html string")
        n = df.select(
            token_count(html_extract(F.col("html"))).alias("n")
        ).collect()[0]["n"]
        # Header · First · <b> · paragraph · here. · Second · line ·
        # tail · &lt; · text
        assert n == 10


class TestWebdatasetShards:
    """WebDataset tar export (r8): member layout and ordering, string
    vs binary encoding, NULL-member omission, byte-determinism across
    runs (the retry-convergence contract), manifest accuracy, no torn
    temp files."""

    def _df(self, spark):
        from pyspark.sql import functions as F

        return spark.range(10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
            F.when(
                F.col("id") % 3 != 0,
                F.encode(F.concat(F.lit("img"), F.col("id").cast("string")), "utf-8"),
            ).alias("img"),
        )

    def _export(self, spark, out):
        from openaq_data_pipeline_spark.operators.curation import (
            write_webdataset_shards,
        )

        manifest = write_webdataset_shards(
            self._df(spark), out, "doc_id",
            {"txt": "text", "jpg": "img"}, n_shards=3,
        ).collect()
        return sorted((r.shard_id, r.n_samples, r.n_bytes, r.tar_path)
                      for r in manifest)

    def test_layout_encoding_and_manifest(self, spark, tmp_path):
        import glob
        import tarfile

        out = str(tmp_path / "wds")
        manifest = self._export(spark, out)
        assert sum(m[1] for m in manifest) == 10
        assert sorted(glob.glob(f"{out}/*.tar")) == [m[3] for m in manifest]
        assert glob.glob(f"{out}/*.__tmp") == []
        seen_txt, seen_jpg = [], []
        for shard_id, n, n_bytes, tar_path in manifest:
            import os

            assert os.path.getsize(tar_path) == n_bytes
            with tarfile.open(tar_path) as tar:
                names = tar.getnames()
                # members lay down in shard_pos order, sample-major
                keys = [nm.rsplit(".", 1)[0] for nm in names]
                assert keys == sorted(keys)
                for nm in names:
                    data = tar.extractfile(nm).read()
                    doc = int(nm.rsplit(".", 1)[0].split("_")[1])
                    if nm.endswith(".txt"):
                        assert data == f"text-{doc}".encode()
                        seen_txt.append(doc)
                    else:
                        assert data == f"img{doc}".encode()
                        seen_jpg.append(doc)
        assert sorted(seen_txt) == list(range(10))
        # NULL members (ids ≡ 0 mod 3) are omitted, not empty
        assert sorted(seen_jpg) == [i for i in range(10) if i % 3 != 0]

    def test_byte_deterministic_across_runs(self, spark, tmp_path):
        out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
        m1, m2 = self._export(spark, out1), self._export(spark, out2)
        assert [(s, n, b) for s, n, b, _ in m1] == [
            (s, n, b) for s, n, b, _ in m2
        ]
        for (_, _, _, p1), (_, _, _, p2) in zip(m1, m2):
            assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_empty_members_raises(self, spark, tmp_path):
        import pytest as _pytest

        from openaq_data_pipeline_spark.operators.curation import (
            write_webdataset_shards,
        )

        with _pytest.raises(ValueError, match="at least one"):
            write_webdataset_shards(
                self._df(spark), str(tmp_path), "doc_id", {}, 2
            )

    def test_read_round_trips_write(self, spark, tmp_path):
        """r12: the reader face — write → read is identity on every
        sample (string member decoded, binary member passed through,
        NULL members come back NULL), distributed per-shard with
        small Arrow flush batches (batch_rows=3 forces mid-tar
        flushes)."""
        from openaq_data_pipeline_spark.operators.curation import (
            read_webdataset_shards,
        )

        out = str(tmp_path / "wds")
        self._export(spark, out)
        back = read_webdataset_shards(
            spark, out, {"txt": "text", "jpg": "img"},
            string_members={"txt"}, batch_rows=3,
        )
        rows = {
            int(r.key.split("_")[1]): r for r in back.collect()
        }
        assert set(rows) == set(range(10))
        for i, r in rows.items():
            assert r.text == f"text-{i}"
            if i % 3 == 0:
                assert r.img is None  # omitted member → NULL
            else:
                assert bytes(r.img) == f"img{i}".encode()
        # shard-level parallelism: one input partition per tar
        assert back.rdd.getNumPartitions() == 3

    def test_read_skips_unknown_extensions_and_missing_dir(
        self, spark, tmp_path
    ):
        import pytest as _pytest

        from openaq_data_pipeline_spark.operators.curation import (
            read_webdataset_shards,
        )

        out = str(tmp_path / "wds")
        self._export(spark, out)
        # a loader reads only the keys it knows: jpg ignored
        back = read_webdataset_shards(
            spark, out, {"txt": "text"}, string_members={"txt"}
        )
        assert sorted(
            int(r.key.split("_")[1]) for r in back.collect()
        ) == list(range(10))
        with _pytest.raises(ValueError, match="no .tar"):
            read_webdataset_shards(
                spark, str(tmp_path / "nope"), {"txt": "text"}
            )


class TestCanonicalizeUrl:
    """URL canonicalization (r8): the crawl-frontier dedup key — one
    spelling per resource. Codegen-only (try_parse_url + array ops)."""

    def _canon(self, spark, urls):
        from openaq_data_pipeline_spark.operators.text import canonicalize_url

        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "id long, u string"
        )
        rows = df.select("id", canonicalize_url(F.col("u")).alias("c")).collect()
        return [r.c for r in sorted(rows, key=lambda r: r.id)]

    def test_variants_collapse_to_one_spelling(self, spark):
        got = self._canon(spark, [
            "HTTPS://Example.COM:443/Path/Page?b=2&utm_source=x&a=1#frag",
            "https://example.com/Path/Page?a=1&b=2",
            "https://example.com/Path/Page?b=2&a=1&fbclid=zzz",
        ])
        assert len(set(got)) == 1
        assert got[0] == "https://example.com/Path/Page?a=1&b=2"

    def test_ports_paths_and_case(self, spark):
        got = self._canon(spark, [
            "http://example.com",                 # empty path → /
            "http://example.com:80/",             # default port stripped
            "http://example.com:8080/x?gclid=1",  # non-default kept
            "http://EXAMPLE.com/CaseSensitive",   # path case preserved
        ])
        assert got[0] == got[1] == "http://example.com/"
        assert got[2] == "http://example.com:8080/x"
        assert got[3] == "http://example.com/CaseSensitive"

    def test_unparseable_is_null(self, spark):
        got = self._canon(spark, ["not a url", "ftp//broken", ""])
        assert got == [None, None, None]

    def test_url_host_and_custom_tracking(self, spark):
        from openaq_data_pipeline_spark.operators.text import (
            canonicalize_url,
            url_host,
        )

        df = spark.createDataFrame(
            [(1, "https://WWW.Ex.org/a?sid=1&x=2")], "id long, u string"
        )
        r = df.select(
            url_host(F.col("u")).alias("h"),
            canonicalize_url(F.col("u"), tracking=["sid"]).alias("c"),
        ).collect()[0]
        assert r.h == "www.ex.org"
        assert r.c == "https://www.ex.org/a?x=2"


class TestCrawlFrontDoorComposition:
    """End-to-end crawl intake (r8): robots gate → canonical-URL
    dedup → politeness schedule → html_extract → Gopher gate →
    denylist gate → exact-dedup index — the front-door operators
    composed with the existing funnel. One survivor per RESOURCE and
    none that is robots-disallowed, blocked, low-quality, or a
    re-crawl of history."""

    import pytest as _pytest

    @_pytest.mark.parametrize("extractor", ["regex_chain", "density"])
    def test_pipeline(self, spark, extractor):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            incremental_exact_dedup,
            temp_exact_index,
        )
        from openaq_data_pipeline_spark.operators.retraction import (
            add_to_denylist,
            denylist_gate,
            temp_denylist,
        )
        from openaq_data_pipeline_spark.operators.text import (
            canonicalize_url,
            gopher_rules,
            html_extract,
        )
        from pyspark.sql import Window

        body = (
            "<p>" + "the quick brown fox jumps over the lazy dog and then "
            * 5 + "</p>"
        )
        body6 = (
            "<p>" + "a calm river flows through the old valley and the town "
            * 5 + "</p>"
        )
        blocked_body = (
            "<p>" + "never ship this the and of to is it that for words "
            * 6 + "</p>"
        )
        pages = [
            # same resource, three spellings → ONE survives url-dedup
            (1, "https://A.com/x?utm_source=tw", f"<html>{body}</html>"),
            (2, "https://a.com:443/x", f"<html>{body}</html>"),
            (3, "https://a.com/x", f"<html>{body}</html>"),
            # quality reject: too short after extraction
            (4, "https://a.com/short", "<p>tiny</p>"),
            # blocked content under a fresh URL
            (5, "https://b.com/bad", f"<html>{blocked_body}</html>"),
            # fresh good page
            (6, "https://c.com/ok", f"<html><div>{body6}</div></html>"),
            # robots-disallowed path (content would otherwise pass)
            (7, "https://a.com/private/x", f"<html>{body6}</html>"),
        ]
        df = spark.createDataFrame(pages, "page_id long, url string, html string")

        # 0. robots gate: a.com disallows /private/
        from openaq_data_pipeline_spark.operators.frontier import (
            apply_robots,
            frontier_schedule,
            parse_robots,
        )

        robots = spark.createDataFrame(
            [("a.com", "User-agent: *\nDisallow: /private/")],
            "host string, content string",
        )
        verdicts = apply_robots(
            df, "url", "page_id", parse_robots(robots, "host", "content")
        )
        df = df.join(
            verdicts.where("allowed").select("page_id"), "page_id"
        )
        # politeness schedule covers every fetchable row (spacing
        # semantics pinned in TestFrontierSchedule)
        assert frontier_schedule(df, "url", "page_id").count() == df.count()

        # 1. canonical-URL dedup: keep min page_id per resource
        canon = df.withColumn("curl", canonicalize_url(F.col("url")))
        w = Window.partitionBy("curl").orderBy("page_id")
        one_per_url = (
            canon.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        # 2. extract text
        # 2. extract text — either the keep-everything regex chain or
        # the r9 content-density extractor (both compose here; the
        # density path additionally drops nav/footer boilerplate,
        # pinned in TestHtmlExtract)
        if extractor == "regex_chain":
            texts = one_per_url.select(
                "page_id", html_extract(F.col("html")).alias("text")
            )
        else:
            from openaq_data_pipeline_spark.operators.text import (
                html_extract_density,
            )

            texts = html_extract_density(
                one_per_url, "html", out_col="text"
            ).select("page_id", "text")
        # 3. Gopher gate
        keep_ids = gopher_rules(texts, "text", "page_id").where("keep")
        gated = texts.join(keep_ids.select("page_id"), "page_id")
        with temp_denylist() as dl, temp_exact_index(n_buckets=4) as idx:
            # 4. denylist gate (extracted TEXT of the blocked page)
            add_to_denylist(
                texts.where(F.col("page_id") == 5).select("text"), "text", dl
            )
            passed = denylist_gate(gated, "text", "page_id", dl).where(
                ~F.col("blocked")
            )
            # 5. exact-dedup against crawl history (page 6's body text
            # crawled before under doc 100)
            hist_text = texts.where(F.col("page_id") == 6).collect()[0]["text"]
            build_exact_index(
                spark.createDataFrame([(100, hist_text)], "page_id long, text string"),
                "text", "page_id", idx,
            )
            disp = incremental_exact_dedup(
                passed.select("page_id", "text"), "text", "page_id", idx,
                update_index=False,
            )
            survivors = sorted(
                r.page_id for r in disp.where("kept").collect()
            )
        # page 1 (min id of the a.com/x resource) is the only survivor:
        # 4 failed quality, 5 is blocked, 6 is a re-crawl of history
        assert survivors == [1]


class TestFrontierSchedule:
    """Politeness scheduling (r8): the spacing invariant (same-host
    fetches always ≥ n_hosts−1 slots apart), slot uniqueness,
    determinism, and the unfetchable-row drop."""

    def _urls(self, spark):
        return spark.range(40).selectExpr(
            "id AS doc_id",
            "concat('https://h', CAST(id % 4 AS STRING), '.org/p/', id) AS url",
        )

    def test_spacing_invariant_and_uniqueness(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            frontier_schedule,
        )

        rows = frontier_schedule(self._urls(spark), "url", "doc_id").collect()
        slots = [r.fetch_slot for r in rows]
        assert len(slots) == len(set(slots)) == 40
        by_host: dict = {}
        for r in rows:
            by_host.setdefault(r.host, []).append(r.fetch_slot)
        n_hosts = len(by_host)
        assert n_hosts == 4
        for host, s in by_host.items():
            s = sorted(s)
            assert all(b - a == n_hosts for a, b in zip(s, s[1:])), host

    def test_deterministic_and_drops_unfetchable(self, spark):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.frontier import (
            frontier_schedule,
        )

        urls = self._urls(spark).unionByName(
            spark.createDataFrame(
                [(999, "not a url")], "doc_id long, url string"
            )
        )
        a = sorted(map(tuple, frontier_schedule(urls, "url", "doc_id").collect()))
        b = sorted(map(tuple, frontier_schedule(urls, "url", "doc_id").collect()))
        assert a == b
        assert all(r[0] != 999 for r in a)
        assert len(a) == 40


class TestRobotsPolicy:
    """robots.txt fetch policy (r9, full RFC 9309): group selection
    with specific-agent precedence over '*', most-octets rule
    precedence with Allow winning ties, '*' wildcards and the '$'
    anchor evaluated (not just flagged), path+query matching, the
    RFC's percent-encoding normalization, hosts without rules
    allowed."""

    ROBOTS_A = """
# comments and blanks are ignored
User-agent: *
Disallow: /private/
Allow: /private/public/
Disallow: /tmp

User-agent: specialbot
Disallow: /
"""
    ROBOTS_B = """
User-agent: *
Disallow: /wild*card
Disallow:
"""

    def _rules(self, spark, agent="*"):
        from openaq_data_pipeline_spark.operators.frontier import parse_robots

        robots = spark.createDataFrame(
            [("a.org", self.ROBOTS_A), ("b.org", self.ROBOTS_B)],
            "host string, content string",
        )
        return parse_robots(robots, "host", "content", user_agent=agent)

    def test_parse_groups_and_rule_compilation(self, spark):
        rows = {
            (r.host, r.rule_path): (r.allow, r.rule_regex, r.rule_len)
            for r in self._rules(spark).collect()
        }
        assert rows[("a.org", "/private/")] == (False, "^/private/", 9)
        assert rows[("a.org", "/private/public/")] == (
            True, "^/private/public/", 16,
        )
        assert rows[("a.org", "/tmp")] == (False, "^/tmp", 4)
        # '*' group only — specialbot's rules excluded for agent '*'
        assert ("a.org", "/") not in rows
        # wildcard rule compiled, not flagged; empty Disallow dropped
        assert rows[("b.org", "/wild*card")] == (
            False, "^/wild.*card", 10,
        )
        assert len([h for h, _ in rows if h == "b.org"]) == 1

    def test_binary_content_decodes(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import parse_robots

        robots = spark.createDataFrame(
            [("a.org", self.ROBOTS_A.encode())], "host string, content binary"
        )
        rows = {
            r.rule_path: r.allow
            for r in parse_robots(robots, "host", "content").collect()
        }
        assert rows == {"/private/": False, "/private/public/": True,
                        "/tmp": False}

    def test_specific_agent_group_wins(self, spark):
        rows = {
            (r.host, r.rule_path): r.allow
            for r in self._rules(spark, agent="specialbot").collect()
            if r.host == "a.org"
        }
        assert rows == {("a.org", "/"): False}

    def test_longest_match_and_allow_tiebreak(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import apply_robots

        urls = spark.createDataFrame(
            [
                (1, "https://a.org/private/secret.html"),   # blocked
                (2, "https://a.org/private/public/x.html"), # longer Allow wins
                (3, "https://a.org/tmpfile"),               # prefix match blocks
                (4, "https://a.org/open/page"),             # no rule → allowed
                (5, "https://b.org/wildXcard"),             # wildcard rule fires
                (6, "https://norules.org/anything"),        # host without rules
                (7, "https://a.org"),                       # empty path → '/'
                (8, "https://b.org/wilder"),                # wildcard needs 'card'
            ],
            "doc_id long, url string",
        )
        got = {
            r.doc_id: r.allowed
            for r in apply_robots(urls, "url", "doc_id", self._rules(spark)).collect()
        }
        assert got == {1: False, 2: True, 3: False, 4: True, 5: False,
                       6: True, 7: True, 8: True}

    def test_rfc9309_wildcard_anchor_query_and_percent_rules(self, spark):
        """The §2.2.2/§2.2.3 battery: '$' anchors the end, '*' spans
        octets, rules constrain path+query, unreserved %XX decodes on
        both sides, reserved escapes match only their encoded form,
        and %2A in a rule means a literal '*'."""
        from openaq_data_pipeline_spark.operators.frontier import (
            apply_robots,
            parse_robots,
        )

        robots = spark.createDataFrame(
            [(
                "a.org",
                "User-agent: *\n"
                "Disallow: /fish*.php$\n"
                "Disallow: /search?q=\n"
                "Allow: /search?q=public\n"
                "Disallow: /%62%61%7A\n"          # decodes to /baz
                "Disallow: /lit-%2A.html\n"       # literal '*'
                "Disallow: /id%2Fsub\n",          # reserved %2F stays encoded
            )],
            "host string, content string",
        )
        rules = parse_robots(robots, "host", "content")
        urls = spark.createDataFrame(
            [
                (1, "https://a.org/fish-page.php"),         # wildcard+$ fires
                (2, "https://a.org/fish.php?x=1"),          # not at end → allowed
                (3, "https://a.org/search?q=hello"),        # query rule fires
                (4, "https://a.org/search?q=public-data"),  # longer Allow wins
                (5, "https://a.org/baz"),                   # decoded rule fires
                (6, "https://a.org/%62%61%7a"),             # encoded URL spelling too
                (7, "https://a.org/lit-*.html"),            # literal '*' target
                (8, "https://a.org/lit-x.html"),            # %2A is NOT a wildcard
                (9, "https://a.org/id%2Fsub"),              # encoded '/' matches
                (10, "https://a.org/id/sub"),               # raw '/' is a different URI
            ],
            "doc_id long, url string",
        )
        got = {
            r.doc_id: r.allowed
            for r in apply_robots(urls, "url", "doc_id", rules).collect()
        }
        assert got == {1: False, 2: True, 3: False, 4: True, 5: False,
                       6: False, 7: False, 8: True, 9: False, 10: True}

    def test_raw_utf8_rule_matches_encoded_url(self, spark):
        """RFC 9309's ツ example: a robots.txt carrying raw UTF-8 in
        a rule must match the transport-encoded URL spelling."""
        from openaq_data_pipeline_spark.operators.frontier import (
            apply_robots,
            parse_robots,
        )

        robots = spark.createDataFrame(
            [("a.org", "User-agent: *\nDisallow: /foo/bar/ツ")],
            "host string, content string",
        )
        rules = parse_robots(robots, "host", "content")
        urls = spark.createDataFrame(
            [(1, "https://a.org/foo/bar/%E3%83%84"),
             (2, "https://a.org/foo/bar/%e3%83%84"),
             (3, "https://a.org/foo/bar/other")],
            "doc_id long, url string",
        )
        got = {
            r.doc_id: r.allowed
            for r in apply_robots(urls, "url", "doc_id", rules).collect()
        }
        assert got == {1: False, 2: False, 3: True}


class TestSitemapAndBudget:
    """Sitemap seed discovery + the per-host crawl budget: locs
    extracted and entity-decoded, index files flagged for the next
    fetch round, and max_per_host deterministically defers overflow."""

    SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://a.org/page1 </loc><lastmod>2026-01-01</lastmod></url>
  <url><loc>https://a.org/p?x=1&amp;y=2</loc></url>
</urlset>"""
    INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.org/sitemap-1.xml</loc></sitemap>
  <sitemap><loc>https://a.org/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""

    def test_parse_locs_entities_and_index_flag(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            parse_sitemaps,
        )

        df = spark.createDataFrame(
            [("s1", self.SITEMAP), ("s2", self.INDEX)],
            "src string, content string",
        )
        got = sorted(
            (r.source, r.url, r.from_index, r.lastmod)
            for r in parse_sitemaps(df, "content", "src").collect()
        )
        assert got == [
            ("s1", "https://a.org/p?x=1&y=2", False, None),
            ("s1", "https://a.org/page1", False, "2026-01-01"),
            ("s2", "https://a.org/sitemap-1.xml", True, None),
            ("s2", "https://a.org/sitemap-2.xml", True, None),
        ]

    def test_max_per_host_defers_deterministically(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            frontier_schedule,
        )

        urls = spark.range(30).selectExpr(
            "id AS doc_id",
            "concat('https://h', CAST(id % 3 AS STRING), '.org/p/', id) AS url",
        )
        capped = frontier_schedule(urls, "url", "doc_id", max_per_host=4)
        rows = capped.collect()
        per_host: dict = {}
        for r in rows:
            per_host.setdefault(r.host, []).append(r)
        assert all(len(v) == 4 for v in per_host.values())
        assert all(r.pos_in_host < 4 for r in rows)
        # the capped schedule is the PREFIX of the uncapped one: same
        # docs at the same slots (deterministic deferral)
        full = {
            r.doc_id: r.fetch_slot
            for r in frontier_schedule(urls, "url", "doc_id").collect()
        }
        assert all(full[r.doc_id] == r.fetch_slot for r in rows)


class TestCanonicalizeUrlIdempotence:
    """canonicalize ∘ canonicalize == canonicalize over a component
    cross-product (schemes × host spellings × ports × paths × queries
    × fragments): a canonical form that isn't a fixed point would make
    URL-ledger keys unstable across re-canonicalization."""

    def test_fixed_point_over_component_grid(self, spark):
        import itertools

        from openaq_data_pipeline_spark.operators.text import canonicalize_url

        urls = [
            f"{s}://{h}{p}{path}{q}{frag}"
            for s, h, p, path, q, frag in itertools.product(
                ["http", "HTTPS"],
                ["Ex.COM", "sub.ex.org"],
                ["", ":443", ":8080"],
                ["", "/", "/A/b"],
                ["", "?b=2&utm_source=x&a=1", "?z"],
                ["", "#frag"],
            )
        ]
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "id long, u string"
        )
        once = df.select("id", canonicalize_url(F.col("u")).alias("c1"))
        twice = once.select(
            "id", "c1", canonicalize_url(F.col("c1")).alias("c2")
        )
        rows = twice.collect()
        assert len(rows) == len(urls)
        bad = [(r.c1, r.c2) for r in rows if r.c1 != r.c2]
        assert bad == [], bad[:5]
        # every canonical form is non-null on this grid (all inputs
        # carry a parseable scheme+host)
        assert all(r.c1 is not None for r in rows)


class TestUrlLedgerGate:
    """Cross-batch seen-URL dedup (r9): spelling variants collapse,
    case-sensitive paths stay distinct, the ledger persists across
    batches, and unfetchable rows are excluded."""

    def test_variants_collapse_case_stays_cross_batch_drops(
        self, spark
    ):
        from openaq_data_pipeline_spark.operators.frontier import (
            url_ledger_gate,
        )
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            temp_exact_index,
        )

        b1 = spark.createDataFrame(
            [
                (1, "https://A.com/x?utm_source=tw"),   # variants of one
                (2, "https://a.com:443/x"),             # resource → min id
                (3, "https://a.com/Page"),              # case-sensitive path
                (4, "https://a.com/page"),              # distinct resource
                (5, "not a url"),                       # unfetchable
            ],
            "doc_id long, url string",
        )
        b2 = spark.createDataFrame(
            [
                (10, "https://a.com/x"),                # seen in batch 1
                (11, "https://a.com/fresh"),            # new
                (12, "https://a.com/Page?utm_id=9"),    # seen (variant)
            ],
            "doc_id long, url string",
        )
        with temp_exact_index(n_buckets=4) as idx:
            d1 = {
                r.doc_id: (r.kept, r.dup_of, r.canon_url)
                for r in url_ledger_gate(b1, "url", "doc_id", idx).collect()
            }
            assert set(d1) == {1, 2, 3, 4}  # 5 is unfetchable
            assert d1[1][:2] == (True, None)
            assert d1[2][:2] == (False, 1)
            assert d1[1][2] == d1[2][2] == "https://a.com/x"
            # /Page and /page are DIFFERENT resources
            assert d1[3][:2] == (True, None) and d1[4][:2] == (True, None)
            d2 = {
                r.doc_id: (r.kept, r.dup_of)
                for r in url_ledger_gate(b2, "url", "doc_id", idx).collect()
            }
            assert d2 == {10: (False, 1), 11: (True, None), 12: (False, 3)}

    def test_read_only_probe_leaves_ledger_unchanged(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            url_ledger_gate,
        )
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            temp_exact_index,
        )

        b = spark.createDataFrame(
            [(1, "https://a.com/x")], "doc_id long, url string"
        )
        probe = spark.createDataFrame(
            [(2, "https://a.com/y")], "doc_id long, url string"
        )
        with temp_exact_index(n_buckets=4) as idx:
            url_ledger_gate(b, "url", "doc_id", idx).collect()
            n = spark.table(idx.hashes_table).count()
            got = url_ledger_gate(
                probe, "url", "doc_id", idx, update_index=False
            ).collect()
            assert got[0].kept is True
            assert spark.table(idx.hashes_table).count() == n


class TestCrawlDelay:
    """Crawl-delay (r9): the de-facto-standard per-host fetch
    interval, read with the SAME group selection as the rule parser
    and folded into the schedule as a time floor."""

    ROBOTS = """
User-agent: fastbot
Crawl-delay: 0.5

User-agent: *
Disallow: /tmp
Crawl-delay: 10
Sitemap: https://a.org/sitemap.xml
"""

    def test_group_selection_and_conservative_pick(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            parse_crawl_delays,
        )

        robots = spark.createDataFrame(
            [("a.org", self.ROBOTS),
             ("b.org", "User-agent: *\nDisallow: /x"),       # no delay
             ("c.org", "User-agent: *\nCrawl-delay: nope")],  # unparseable
            "host string, content string",
        )
        star = {
            r.host: r.crawl_delay_sec
            for r in parse_crawl_delays(robots, "host", "content").collect()
        }
        assert star == {"a.org": 10.0}
        fast = {
            r.host: r.crawl_delay_sec
            for r in parse_crawl_delays(
                robots, "host", "content", user_agent="fastbot"
            ).collect()
        }
        assert fast == {"a.org": 0.5}

    def test_sitemap_line_does_not_split_groups(self, spark):
        """An interleaved non-rule line between a group's directives
        must not terminate the group (RFC 9309 graceful handling)."""
        from openaq_data_pipeline_spark.operators.frontier import (
            parse_robots,
        )

        robots = spark.createDataFrame(
            [("a.org",
              "User-agent: one\nSitemap: https://a.org/s.xml\n"
              "User-agent: two\nDisallow: /x")],
            "host string, content string",
        )
        rows = parse_robots(
            robots, "host", "content", user_agent="one"
        ).collect()
        # agent 'one' still governs the /x rule: the Sitemap line did
        # not close its agent cluster
        assert [(r.rule_path, r.allow) for r in rows] == [("/x", False)]

    def test_schedule_time_floor(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            frontier_schedule,
            parse_crawl_delays,
        )

        urls = spark.range(12).selectExpr(
            "id AS doc_id",
            "concat('https://', CASE WHEN id % 2 = 0 THEN 'a.org' "
            "ELSE 'b.org' END, '/p/', id) AS url",
        )
        robots = spark.createDataFrame(
            [("a.org", "User-agent: *\nCrawl-delay: 10")],
            "host string, content string",
        )
        delays = parse_crawl_delays(robots, "host", "content")
        rows = frontier_schedule(
            urls, "url", "doc_id", crawl_delays=delays,
            default_delay_sec=2.0,
        ).collect()
        for r in rows:
            want = r.pos_in_host * (10.0 if r.host == "a.org" else 2.0)
            assert r.not_before_sec == want, r
        # without delays the column is absent — schema unchanged
        bare = frontier_schedule(urls, "url", "doc_id")
        assert "not_before_sec" not in bare.columns


class TestPackSequencesBfd:
    """Best-fit-decreasing packing (r9): capacity is a hard bound
    (except oversized singletons), waste never exceeds the
    contiguous-greedy packer's, assignments are deterministic and
    group-isolated."""

    def _run(self, spark, tokens, cap, groups=None):
        from openaq_data_pipeline_spark.operators.curation import (
            pack_sequences_bfd,
        )

        rows = [
            (groups[i] if groups else "g", i, int(t))
            for i, t in enumerate(tokens)
        ]
        df = spark.createDataFrame(rows, "grp string, doc_id long, n long")
        return pack_sequences_bfd(
            df, "grp", "doc_id", F.col("n"), cap
        ).collect()

    def test_capacity_is_hard_and_all_assigned(self, spark):
        tokens = [300, 120, 100, 90, 80, 60, 50, 40, 30, 10]
        cap = 256
        got = self._run(spark, tokens, cap)
        assert sorted(r.doc_id for r in got) == list(range(len(tokens)))
        per_pack: dict = {}
        for r in got:
            per_pack.setdefault(r.pack_id, []).append(r["__tokens"])
        for pid, ts in per_pack.items():
            if len(ts) > 1:
                assert sum(ts) <= cap, (pid, ts)
            else:  # a singleton may be the oversized doc
                assert ts[0] <= cap or ts[0] == 300
        # the oversized doc sits alone
        big_pack = [r.pack_id for r in got if r["__tokens"] == 300][0]
        assert len(per_pack[big_pack]) == 1

    def test_beats_capacity_respecting_next_fit(self, spark):
        """Contiguous greedy (`pack_sequences`) hits the minimum bin
        count only by OVERSHOOTING capacity (its packs get truncated
        downstream); the fair baseline among capacity-respecting
        packers is next-fit in arrival order — BFD must never use
        more bins and wins outright on this fixture."""
        tokens = [130, 130, 126, 126, 120, 100, 6, 6, 4, 4]
        cap = 256
        bfd = self._run(spark, tokens, cap)
        n_bfd = len({r.pack_id for r in bfd})

        def next_fit(ts, c):
            bins, cur = 0, c + 1  # force-open on first doc
            for t in ts:
                if cur + t > c:
                    bins, cur = bins + 1, t
                else:
                    cur += t
            return bins

        n_nf = next_fit(tokens, cap)
        assert n_bfd <= n_nf
        assert n_bfd < n_nf, (n_bfd, n_nf)
        # BFD reaches the arithmetic floor here
        assert n_bfd == -(-sum(tokens) // cap)

    def test_deterministic_and_group_isolated(self, spark):
        tokens = [90, 80, 70, 60, 50, 40]
        groups = ["a", "b", "a", "b", "a", "b"]
        a = sorted(map(tuple, self._run(spark, tokens, 128, groups)))
        b = sorted(map(tuple, self._run(spark, tokens, 128, groups)))
        assert a == b
        by_grp: dict = {}
        for grp, doc, t, pid in a:
            by_grp.setdefault(grp, set()).add(pid)
        # pack ids are per-group namespaces (both groups start at 0)
        assert 0 in by_grp["a"] and 0 in by_grp["b"]


class TestFrontierReviewRegressions:
    """r9 review findings on the crawl plane."""

    def test_duplicate_delay_rows_do_not_duplicate_schedule(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            frontier_schedule,
        )

        urls = spark.range(8).selectExpr(
            "id AS doc_id", "concat('https://a.org/p/', id) AS url"
        )
        # a delays table accumulated over two robots fetch rounds
        delays = spark.createDataFrame(
            [("a.org", 2.0), ("a.org", 10.0)],
            "host string, crawl_delay_sec double",
        )
        rows = frontier_schedule(
            urls, "url", "doc_id", crawl_delays=delays
        ).collect()
        assert len(rows) == 8  # no row duplication
        slots = [r.fetch_slot for r in rows]
        assert len(slots) == len(set(slots))
        # the most conservative delay wins
        for r in rows:
            assert r.not_before_sec == r.pos_in_host * 10.0

    def test_sitemap_entry_attributes_and_bare_locs(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            parse_sitemaps,
        )

        with_attrs = (
            '<urlset><url changefreq="daily"><loc>https://a.org/p1</loc>'
            "<lastmod>2026-02-02</lastmod></url></urlset>"
        )
        bare = "<urlset><loc>https://b.org/q1</loc><loc>https://b.org/q2</loc></urlset>"
        df = spark.createDataFrame(
            [("s1", with_attrs), ("s2", bare)], "src string, content string"
        )
        got = sorted(
            (r.source, r.url, r.lastmod)
            for r in parse_sitemaps(df, "content", "src").collect()
        )
        assert got == [
            ("s1", "https://a.org/p1", "2026-02-02"),
            ("s2", "https://b.org/q1", None),
            ("s2", "https://b.org/q2", None),
        ]

    def test_partially_malformed_sitemap_keeps_both_kinds(self, spark):
        """A document with one wrapped <url> entry AND one orphan
        bare <loc> keeps both — the all-or-nothing fallback lost the
        orphan (r9 review finding)."""
        from openaq_data_pipeline_spark.operators.frontier import (
            parse_sitemaps,
        )

        mixed = (
            "<urlset><url><loc>https://a.org/p1</loc>"
            "<lastmod>2026-03-03</lastmod></url>"
            "<loc>https://a.org/orphan</loc></urlset>"
        )
        df = spark.createDataFrame([("s", mixed)], "src string, content string")
        got = sorted(
            (r.url, r.lastmod)
            for r in parse_sitemaps(df, "content", "src").collect()
        )
        assert got == [
            ("https://a.org/orphan", None),
            ("https://a.org/p1", "2026-03-03"),
        ]


class TestC4Rules:
    """C4 battery (Raffel et al. 2020 §2.2): line filters build
    clean_text; page gates conjoin into keep."""

    def _run(self, spark, rows, **kw):
        from openaq_data_pipeline_spark.operators.text import c4_rules

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r.doc_id: r for r in c4_rules(df, "text", "doc_id", **kw).collect()}

    def test_line_filters_and_clean_text(self, spark):
        text = (
            "A good long sentence here.\n"      # kept
            "short.\n"                          # <3 words
            "no terminal punctuation\n"         # no punct
            "A javascript warning line here.\n" # javascript
            "Ends with a question mark?\n"      # kept
            'He said "stop right there."\n'     # kept (quote after .)
            "Another full sentence follows!\n"  # kept
            "One more proper sentence ends."    # kept
        )
        got = self._run(spark, [(1, text)])[1]
        assert got.n_lines == 8
        assert got.n_kept_lines == 5
        assert got.clean_text.splitlines() == [
            "A good long sentence here.",
            "Ends with a question mark?",
            'He said "stop right there."',
            "Another full sentence follows!",
            "One more proper sentence ends.",
        ]
        assert got.n_sentences == 5 and got.r_min_sentences
        assert got.keep

    def test_page_gates(self, spark):
        five = (
            "First proper sentence here. Second one follows. "
            "Third one too. Fourth sentence lands. Fifth closes it."
        )
        rows = [
            (1, five),                               # keeps
            (2, five + "\nlorem IPSUM dolor."),      # lorem (any case)
            (3, five + " And a { brace."),           # brace
            (4, "Too few sentences here."),          # <5 sentences
        ]
        got = self._run(spark, rows)
        assert got[1].keep
        assert not got[2].keep and not got[2].r_no_lorem
        assert not got[3].keep and not got[3].r_no_brace
        assert not got[4].keep and not got[4].r_min_sentences

    def test_badwords_parameter(self, spark):
        five = (
            "First proper sentence here. Second one follows. "
            "Third one too. Fourth sentence lands. Fifth closes it."
        )
        rows = [(1, five), (2, five.replace("Third", "Vexword"))]
        # default: no list, rule passes
        got = self._run(spark, rows)
        assert got[2].r_no_badwords and got[2].keep
        got = self._run(spark, rows, bad_words=["vexword"])
        assert got[1].keep
        assert not got[2].keep and not got[2].r_no_badwords

    def test_null_and_empty(self, spark):
        got = self._run(spark, [(1, None), (2, "")])
        assert got[1].keep is None
        assert got[2].n_kept_lines == 0 and got[2].keep is False

    def test_badwords_metachars_match_literally(self, spark):
        """A bad word containing regex metacharacters must match the
        literal word, not act as a pattern: unescaped, 'c.t' flags
        'cat' and never flags only the literal (r10 ADVICE)."""
        five = (
            "First proper sentence here. Second one follows. "
            "Third one too. Fourth sentence lands. Fifth closes it."
        )
        rows = [
            (1, five.replace("Third", "Cat")),   # must NOT flag
            (2, five.replace("Third", "C.t")),   # must flag
        ]
        got = self._run(spark, rows, bad_words=["c.t"])
        assert got[1].keep and got[1].r_no_badwords
        assert not got[2].keep and not got[2].r_no_badwords

    def test_badwords_embedded_backslash_e(self, spark):
        r"""A bad word containing the two-char sequence '\E' must not
        break the whole pattern: naive \Q…\E quoting ends early there
        and the orphan \E later makes the regex INVALID, killing the
        other list entries too (r11 ADVICE). Pattern.quote semantics:
        split on \E and re-quote each piece."""
        five = (
            "First proper sentence here. Second one follows. "
            "Third one too. Fourth sentence lands. Fifth closes it."
        )
        rows = [(1, five), (2, five.replace("Third", "Vexword"))]
        got = self._run(spark, rows, bad_words=[r"x\Ey", "vexword"])
        assert got[1].keep and got[1].r_no_badwords
        assert not got[2].keep and not got[2].r_no_badwords

    def test_quote_literal_matches_pattern_quote(self, spark):
        r"""_quote_literal on an \E-containing word still matches the
        literal bytes (checked against Spark's own regex engine, no
        lowering in the way)."""
        from openaq_data_pipeline_spark.operators.text import (
            _quote_literal,
        )

        pat = _quote_literal(r"a\Eb.c")
        df = spark.createDataFrame(
            [(1, r"a\Eb.c"), (2, r"a\Ebzc")], "i long, s string"
        )
        got = {
            r.i: r.m
            for r in df.select(
                "i", F.col("s").rlike(pat).alias("m")
            ).collect()
        }
        assert got == {1: True, 2: False}


class TestEpochUpsample:
    """Per-domain epoch repetition: copies = floor(e) (+1 on the MD5
    bucket for the fractional part), unlisted strata = 1 epoch,
    0-copy rows drop, replicas carry copy_idx."""

    def _df(self, spark, n=400):
        rows = [(i, "a" if i % 2 == 0 else "b") for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, src string")

    def test_integer_epochs_exact(self, spark):
        from openaq_data_pipeline_spark.operators.curation import (
            epoch_upsample,
        )

        out = epoch_upsample(
            self._df(spark), "doc_id", "src", {"a": 3_000_000}
        )
        counts = {r.src: r["count"] for r in out.groupBy("src").count().collect()}
        assert counts == {"a": 600, "b": 200}  # 3x for a, 1x passthrough
        idx = (
            out.where("src = 'a' AND doc_id = 0")
            .select("copy_idx")
            .collect()
        )
        assert sorted(r.copy_idx for r in idx) == [0, 1, 2]

    def test_fractional_epochs_hit_bucket_measure(self, spark):
        from openaq_data_pipeline_spark.operators.curation import (
            epoch_upsample,
        )

        out = epoch_upsample(
            self._df(spark, 2000), "doc_id", "src",
            {"a": 1_500_000, "b": 400_000},
        )
        counts = {r.src: r["count"] for r in out.groupBy("src").count().collect()}
        # 1000 rows per stratum; e=1.5 -> ~1500, e=0.4 -> ~400 (hash
        # measure, not exact — generous tolerance, but deterministic)
        assert 1350 <= counts["a"] <= 1650
        assert 320 <= counts["b"] <= 480

    def test_zero_epochs_drop_and_determinism(self, spark):
        from openaq_data_pipeline_spark.operators.curation import (
            epoch_upsample,
        )

        out = epoch_upsample(
            self._df(spark), "doc_id", "src", {"a": 0}
        )
        assert out.where("src = 'a'").count() == 0
        a = sorted(map(tuple, out.collect()))
        b = sorted(map(tuple, out.collect()))
        assert a == b

    def test_replicas_spread_across_shards(self, spark):
        """The docstring contract: downstream shard steps fold
        copy_idx into their key, so an up-sampled document's replicas
        land in different shards instead of stacking in one."""
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.curation import (
            epoch_upsample,
            shard_assignments,
        )

        up = epoch_upsample(
            self._df(spark, 100), "doc_id", "src", {"a": 4_000_000}
        )
        keyed = up.select(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("#"),
                F.col("copy_idx").cast("string"),
            ).alias("rep_key"),
            "doc_id",
        )
        shards = shard_assignments(keyed, "rep_key", 8)
        per_doc = (
            shards.select(
                F.split("rep_key", "#")[0].alias("doc"), "shard_id"
            )
            .groupBy("doc")
            .agg(F.countDistinct("shard_id").alias("n_shards"))
        )
        # stratum 'a' (even doc_ids) has 4 replicas over 8 shards:
        # expected ~3.2 distinct shards per doc; the MD5 key makes
        # the spread deterministic, so pin the global property
        avg = (
            per_doc.where(F.col("doc").cast("long") % 2 == 0)
            .agg(F.avg("n_shards"))
            .collect()[0][0]
        )
        assert avg > 2.5


class TestTemperatureMixture:
    """Temperature-based source sampling (r11): alpha=1 keeps natural
    proportions (everything survives), alpha<1 flattens — small
    sources keep a larger fraction than big ones — and the realized
    composition matches the sqrt-weight mixture exactly."""

    def _corpus(self, spark, sizes):
        rows = []
        i = 0
        for src, n in sizes.items():
            for _ in range(n):
                rows.append((i, src))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, src string")

    def test_alpha_one_is_natural_proportions(self, spark):
        from openaq_data_pipeline_spark.operators.curation import (
            temperature_mixture,
        )

        df = self._corpus(spark, {"a": 400, "b": 100, "c": 25})
        kept = temperature_mixture(df, "doc_id", "src", alpha=1.0)
        # weights ∝ n exactly → the whole corpus is the largest
        # matching mixture — nothing drops
        assert kept.count() == 525

    def test_alpha_half_flattens_toward_small_sources(self, spark):
        from openaq_data_pipeline_spark.operators.curation import (
            temperature_mixture,
            temperature_mixture_weights,
        )

        sizes = {"a": 400, "b": 100, "c": 25}
        df = self._corpus(spark, sizes)
        w = temperature_mixture_weights(df, "src", alpha=0.5)
        # sqrt weights: 20 : 10 : 5 (×1e6)
        assert w == {"a": 20_000_000, "b": 10_000_000, "c": 5_000_000}
        kept = {
            r.src: r.n
            for r in temperature_mixture(df, "doc_id", "src", alpha=0.5)
            .groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        # binding stratum (smallest after flattening) kept whole
        assert kept["c"] == 25
        # target composition 20:10:5 → a ≈ 100, b ≈ 50 (hash-bucket
        # realization: binomial std ≈ 9 / 5 at these sizes — allow 3σ)
        assert abs(kept["a"] - 100) <= 27 and abs(kept["b"] - 50) <= 15
        # flattening: keep-RATE rises as source size falls
        rates = {s: kept[s] / n for s, n in sizes.items()}
        assert rates["c"] > rates["b"] > rates["a"]

    def test_bad_alpha_raises(self, spark):
        import pytest

        from openaq_data_pipeline_spark.operators.curation import (
            temperature_mixture_weights,
        )

        df = self._corpus(spark, {"a": 4})
        with pytest.raises(ValueError, match="alpha"):
            temperature_mixture_weights(df, "src", alpha=0.0)


class TestSentenceChunking:
    """Sentence-boundary chunking (r12): greedy packing of whole
    sentences under a token budget — the retrieval-grade complement
    of chunk_documents' fixed windows. No sentence is ever cut; an
    oversized sentence becomes its own oversized chunk (nothing
    silent)."""

    def test_greedy_packing_and_abbreviation_guards(self, spark):
        from openaq_data_pipeline_spark.operators.curation import (
            chunk_by_sentences,
        )

        rows = [
            (1, "One two three. Four five six! Seven eight? Nine ten."),
            (2, "Dr. Smith saw Mr. Jones. They met e.g. at noon."),
            (3, "a b c d e f g h i j k l"),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = sorted(
            chunk_by_sentences(df, "text", "doc_id", max_tokens=6)
            .collect(),
            key=lambda r: (r.doc_id, r.chunk_id),
        )
        got = [
            (r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens) for r in out
        ]
        assert got == [
            (1, 0, "One two three. Four five six!", 6),
            (1, 1, "Seven eight? Nine ten.", 4),
            # 'Dr.' / 'Mr.' / 'e.g.' never split; the two real
            # sentences exceed the budget together → two chunks
            (2, 0, "Dr. Smith saw Mr. Jones.", 5),
            (2, 1, "They met e.g. at noon.", 5),
            # oversized single sentence: one whole oversized chunk
            (3, 0, "a b c d e f g h i j k l", 12),
        ]

    def test_no_token_lost_or_duplicated(self, spark):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.curation import (
            chunk_by_sentences,
        )

        text = (
            "Alpha beta gamma delta. Epsilon zeta. Eta theta iota "
            "kappa lambda. Mu nu! Xi omicron pi rho? Sigma."
        )
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        chunks = chunk_by_sentences(df, "text", "doc_id", max_tokens=5)
        rebuilt = (
            chunks.orderBy("chunk_id")
            .agg(F.concat_ws(" ", F.collect_list("chunk_text")))
            .first()[0]
        )
        assert rebuilt == text


class TestLearnedAbbreviations:
    """Punkt-core corpus abbreviation learning (r13, VERDICT r12
    missing #5): a token type that overwhelmingly appears with a
    trailing period is learned as an abbreviation and guards the
    sentence split; tokens that end sentences (bare occurrences
    elsewhere) are not."""

    TEXT = (
        "alpha met Qz. beta today. today beta felt calm. "
        "calm Qz. beta alpha."
    )

    def test_learning_and_guarded_split(self, spark):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.curation import (
            learn_abbreviations,
            split_sentences,
        )

        docs = spark.createDataFrame(
            [(i, self.TEXT) for i in range(4)], "doc_id long, text string"
        )
        learned = learn_abbreviations(docs, "text").collect()
        # Qz: always period-attached -> learned; today/calm/alpha end
        # sentences but also occur bare -> ratio 0.5 < 0.6, excluded
        assert [(r.token, r.ratio_ppm) for r in learned] == [
            ("qz", 1_000_000)
        ]
        guards = ["qz", "Qz"]
        split = docs.select(
            split_sentences(F.col("text"), abbreviations=guards).alias("s")
        ).first().s
        assert split == [
            "alpha met Qz. beta today.",
            "today beta felt calm.",
            "calm Qz. beta alpha.",
        ]
        # without the learned guard the same text over-splits at Qz.
        base = docs.select(
            split_sentences(F.col("text")).alias("s")
        ).first().s
        assert len(base) == 5

    def test_injection_guard(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.curation import (
            split_sentences,
        )

        with pytest.raises(ValueError, match="plain word token"):
            split_sentences(F.lit("x"), abbreviations=[")("])

    def test_chunking_threads_the_guards(self, spark):
        from openaq_data_pipeline_spark.operators.curation import (
            chunk_by_sentences,
        )

        docs = spark.createDataFrame(
            [(0, self.TEXT)], "doc_id long, text string"
        )
        rows = chunk_by_sentences(
            docs, "text", "doc_id", max_tokens=5, abbreviations=["Qz"]
        ).collect()
        # each guarded sentence (5 tokens) is its own chunk
        assert [r.chunk_text for r in sorted(rows, key=lambda r: r.chunk_id)] == [
            "alpha met Qz. beta today.",
            "today beta felt calm.",
            "calm Qz. beta alpha.",
        ]


class TestCollocationsAndStarters:
    """The two remaining Kiss & Strunk corpus statistics (r14,
    VERDICT r13 missing #5 / next #5): collocation pairs suppress a
    false split the abbreviation ratio alone misses, and frequent
    sentence starters override a learned-abbreviation guard."""

    # 'zk' occurs bare twice and period-attached twice per doc: the
    # abbreviation ratio (0.5 < 0.6) misses it — but 'zk. Smith'
    # accounts for ALL its period-attached occurrences ('vs' itself
    # sits in the static guard list; the learned pair covers the
    # domain tokens that list can never know)
    VS_TEXT = (
        "the case went alpha zk beta in court room nine. "
        "we saw gamma zk delta again on the day. "
        "the ruling of Jones zk. Smith held firm. "
        "later Roe zk. Smith was cited by the clerk."
    )

    def test_collocation_stops_false_split(self, spark):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.curation import (
            learn_abbreviations,
            learn_collocations,
            split_sentences,
        )

        docs = spark.createDataFrame(
            [(i, self.VS_TEXT) for i in range(4)],
            "doc_id long, text string",
        )
        # the abbreviation signal alone misses 'zk'
        assert "zk" not in {
            r.token for r in learn_abbreviations(docs, "text").collect()
        }
        col = {
            (r.token, r.next_token): r
            for r in learn_collocations(docs, "text").collect()
        }
        assert ("zk", "smith") in col
        assert col[("zk", "smith")].attach_ppm == 1_000_000
        split = docs.select(
            split_sentences(
                F.col("text"), collocations=[("zk", "smith")]
            ).alias("s")
        ).first().s
        assert split == [
            "the case went alpha zk beta in court room nine.",
            "we saw gamma zk delta again on the day.",
            "the ruling of Jones zk. Smith held firm.",
            "later Roe zk. Smith was cited by the clerk.",
        ]
        # without the collocation guard the same text over-splits
        base = docs.select(
            split_sentences(F.col("text")).alias("s")
        ).first().s
        assert len(base) == 6

    def test_starter_overrides_learned_guard(self, spark):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.curation import (
            learn_sentence_starters,
            split_sentences,
        )

        text = (
            "we met Qz. beta today! However the rain held on. "
            "calm returned fast? However alpha left early. "
            "then came Qz. However we left the town. "
            "beta saw Qz. gamma in the barn yard."
        )
        docs = spark.createDataFrame(
            [(i, text) for i in range(4)], "doc_id long, text string"
        )
        starters = {
            r.token: r
            for r in learn_sentence_starters(docs, "text").collect()
        }
        # 'However' follows !/? boundaries; lowercase followers and
        # mid-sentence words do not qualify
        assert set(starters) == {"however"}
        with_st = docs.select(
            split_sentences(
                F.col("text"), abbreviations=["qz"],
                starters=["however"],
            ).alias("s")
        ).first().s
        # the Qz. guard holds before 'gamma' but yields to 'However'
        assert "then came Qz." in with_st
        assert any(
            s.startswith("However we left") for s in with_st
        )
        assert any("Qz. gamma in the barn" in s for s in with_st)
        without = docs.select(
            split_sentences(
                F.col("text"), abbreviations=["qz"]
            ).alias("s")
        ).first().s
        assert not any(s.startswith("However we left") for s in without)

    def test_injection_guards(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.curation import (
            split_sentences,
        )

        with pytest.raises(ValueError, match="word-token pair"):
            split_sentences(F.lit("x"), collocations=[("a(", "b")])
        with pytest.raises(ValueError, match="plain word token"):
            split_sentences(F.lit("x"), starters=["!bad"])


class TestRobotsSitemapDiscovery:
    """Sitemap: directives extracted from robots.txt (r14): the
    directive sits outside agent groups, may repeat and point
    cross-host; case/indent-insensitive; commented lines and hosts
    without the directive emit nothing."""

    def test_extraction(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            parse_robots_sitemaps,
        )

        robots = spark.createDataFrame(
            [
                ("a.org",
                 "User-agent: *\nDisallow: /private/\n"
                 "Sitemap: https://a.org/sitemap.xml\n"
                 "# Sitemap: https://commented.example/x.xml\n"
                 "Sitemap: https://cdn.a.org/s2.xml.gz\n"),
                ("b.org",
                 "user-agent: bot\nallow: /\n"
                 "  SITEMAP:   https://b.org/map.xml  \n"
                 "User-agent: *\nDisallow:\n"),
                ("c.org", "User-agent: *\nDisallow:\n"),
            ],
            "host string, content string",
        )
        rows = sorted(
            (r.host, r.sitemap_url)
            for r in parse_robots_sitemaps(
                robots, "host", "content"
            ).collect()
        )
        assert rows == [
            ("a.org", "https://a.org/sitemap.xml"),
            ("a.org", "https://cdn.a.org/s2.xml.gz"),
            ("b.org", "https://b.org/map.xml"),
        ]
        # the rules parser still reads the same bodies undisturbed
        from openaq_data_pipeline_spark.operators.frontier import (
            apply_robots,
        )

        urls = spark.createDataFrame(
            [(1, "https://a.org/private/x"), (2, "https://a.org/ok")],
            "page_id long, url string",
        )
        from openaq_data_pipeline_spark.operators.frontier import (
            parse_robots,
        )

        verdicts = {
            r.page_id: r.allowed
            for r in apply_robots(
                urls, "url", "page_id",
                parse_robots(robots, "host", "content"),
            ).collect()
        }
        assert verdicts == {1: False, 2: True}


class TestHtmlToMarkdown:
    """r15: the structure-preserving HTML→Markdown chain."""

    def test_full_conversion(self, spark):
        from openaq_data_pipeline_spark.operators.text import (
            html_to_markdown,
        )

        html = (
            "<html><head><style>p{}</style></head><body>"
            "<h1>Title</h1><h3>Sub</h3>"
            "<p>Text <strong>bo</strong> <em>it</em> "
            '<a href="/r">lnk</a> <code>c()</code></p>'
            "<ul><li>one</li><li>two</li></ul>"
            "<blockquote>quote</blockquote><hr>"
            "<pre>block</pre>"
            "<p>tail &amp; end</p></body></html>"
        )
        df = spark.createDataFrame([(html,)], "html string")
        md = df.select(
            html_to_markdown(F.col("html")).alias("m")
        ).first().m
        assert md == (
            "# Title\n\n### Sub\n\n"
            "Text **bo** *it* [lnk](/r) `c()`\n\n"
            "- one\n- two\n\n"
            "> quote\n\n---\n\n"
            "```\nblock\n```\n\ntail & end"
        )

    def test_fixed_point_null_and_plan(self, spark):
        from openaq_data_pipeline_spark.operators.text import (
            html_to_markdown,
        )

        df = spark.createDataFrame(
            [("plain text stays",), (None,)], "html string"
        )
        rows = df.select(
            html_to_markdown(F.col("html")).alias("m")
        ).collect()
        assert {r.m for r in rows} == {"plain text stays", None}
        plan = (
            df.select(html_to_markdown(F.col("html")))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "ArrowEval" not in plan


class TestLicenseScan:
    """r15: the code-corpus license gate."""

    def _scan(self, spark, text):
        from openaq_data_pipeline_spark.operators.curation import (
            license_scan,
        )

        df = spark.createDataFrame([(0, text)], "id long, src string")
        return license_scan(df, "src", "id").first()

    def test_spdx_wins_over_fingerprint(self, spark):
        r = self._scan(
            spark,
            "// SPDX-License-Identifier: BSD-3-Clause\n"
            "Permission is hereby granted, free of charge...",
        )
        assert (r.spdx_id, r.license_id, r.family, r.keep) == (
            "BSD-3-Clause", "BSD-3-Clause", "permissive", True
        )

    def test_lgpl_beats_gpl_fingerprint(self, spark):
        r = self._scan(
            spark,
            "under the GNU Lesser General Public License v2.1",
        )
        assert r.license_id == "LGPL-2.1-only"
        assert r.family == "weak-copyleft" and not r.keep

    def test_gpl_is_copyleft(self, spark):
        r = self._scan(
            spark, "under the GNU General Public License v3"
        )
        assert (r.license_id, r.family, r.keep) == (
            "GPL-3.0-only", "copyleft", False
        )

    def test_copyright_only_is_unknown(self, spark):
        r = self._scan(spark, "Copyright (c) 2026 Example")
        assert r.license_id is None
        assert r.family == "unknown"
        assert r.has_copyright and not r.keep

    def test_unmarked_makes_no_claim(self, spark):
        r = self._scan(spark, "def f():\n    return 1\n")
        assert r.license_id is None and r.family is None
        assert not r.has_copyright and not r.keep
