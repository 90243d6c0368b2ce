"""Substring-span dedup (operators/spans.py): exactness vs a pure-
Python reference, edge cases, and removal invariants."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.spans import (
    duplicated_spans,
    duplicated_windows,
    remove_duplicated_spans,
    word_shingles,
)


def _ref_spans(docs: list[tuple[int, str]], k: int, min_docs: int):
    """Reference: brute-force duplicated k-windows, merged to maximal
    half-open spans."""
    words = {d: t.split(" ") for d, t in docs}
    occ: dict[str, set[int]] = {}
    for d, w in words.items():
        for i in range(len(w) - k + 1):
            occ.setdefault(" ".join(w[i : i + k]), set()).add(d)
    dup = {s for s, ds in occ.items() if len(ds) >= min_docs}
    out = set()
    for d, w in words.items():
        pos = [
            i
            for i in range(len(w) - k + 1)
            if " ".join(w[i : i + k]) in dup
        ]
        cur = None
        for p in pos:
            if cur is None or p > cur[1]:
                if cur:
                    out.add((d, cur[0], cur[1]))
                cur = [p, p + k]
            else:
                cur[1] = max(cur[1], p + k)
        if cur:
            out.add((d, cur[0], cur[1]))
    return out


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


class TestDuplicatedSpans:
    def test_planted_phrase(self, spark):
        shared = "alpha beta gamma delta epsilon zeta"
        docs = [
            (1, f"one two {shared} three four"),
            (2, f"{shared} five six seven eight nine"),
            (3, "ten eleven twelve thirteen fourteen fifteen sixteen"),
        ]
        got = {
            tuple(r)
            for r in duplicated_spans(_df(spark, docs), k=6).collect()
        }
        # the 6-word phrase starts at word 2 in doc 1, word 0 in doc 2
        assert got == {(1, 2, 8), (2, 0, 6)}

    def test_overlapping_windows_merge_to_one_maximal_span(self, spark):
        # 8 shared words → three duplicated 6-windows (0,1,2) in each
        # doc, merging to ONE span of length 8
        shared = "a b c d e f g h"
        docs = [(1, f"{shared} x y"), (2, f"p q {shared}")]
        got = {
            tuple(r)
            for r in duplicated_spans(_df(spark, docs), k=6).collect()
        }
        assert got == {(1, 0, 8), (2, 2, 10)}

    def test_within_doc_repeat_not_flagged_cross_doc(self, spark):
        # the phrase repeats only inside doc 1 — min_docs=2 counts
        # DISTINCT docs, so nothing is flagged
        docs = [
            (1, "u v w x y z u v w x y z"),
            (2, "a b c d e f g h i j k l"),
        ]
        assert duplicated_spans(_df(spark, docs), k=6).count() == 0

    def test_docs_shorter_than_k(self, spark):
        docs = [(1, "a b c"), (2, "a b c"), (3, "a b c d e f")]
        # 3-word docs yield no 6-windows at all
        assert word_shingles(_df(spark, docs), k=6).count() == 1
        assert duplicated_spans(_df(spark, docs), k=6).count() == 0

    def test_matches_reference_on_random_corpus(self, spark):
        rng = random.Random(8)
        vocab = [f"w{i}" for i in range(12)]
        phrases = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 12)))
            for _ in range(4)
        ]
        docs = []
        for d in range(40):
            parts = [rng.choice(vocab) for _ in range(rng.randint(3, 20))]
            for ph in phrases:
                if rng.random() < 0.3:
                    at = rng.randint(0, len(parts))
                    parts[at:at] = ph.split(" ")
            docs.append((d, " ".join(parts)))
        for k, min_docs in [(4, 2), (6, 2), (6, 3)]:
            got = {
                tuple(r)
                for r in duplicated_spans(
                    _df(spark, docs), k=k, min_docs=min_docs
                ).collect()
            }
            assert got == _ref_spans(docs, k, min_docs), (k, min_docs)

    def test_windows_are_subset_of_spans(self, spark):
        docs = [
            (1, "m n o p q r s t u v"),
            (2, "z z m n o p q r s t u v"),
        ]
        df = _df(spark, docs)
        wins = duplicated_windows(df, k=6).collect()
        spans = duplicated_spans(df, k=6).collect()
        cover = {
            (r["doc_id"], p)
            for r in spans
            for p in range(r["span_start"], r["span_end"])
        }
        for r in wins:
            for p in range(r["pos"], r["pos"] + 6):
                assert (r["doc_id"], p) in cover

    def test_k_validation(self, spark):
        with pytest.raises(ValueError):
            word_shingles(_df(spark, [(1, "a b")]), k=0)


class TestRemoveDuplicatedSpans:
    def test_excises_exactly_the_spans(self, spark):
        shared = "alpha beta gamma delta epsilon zeta"
        docs = [
            (1, f"one two {shared} three four"),
            (2, f"{shared} five six seven eight nine"),
            (3, "solo text with nothing shared at all"),
        ]
        out = {
            r["doc_id"]: r
            for r in remove_duplicated_spans(_df(spark, docs), k=6).collect()
        }
        assert out[1]["clean_text"] == "one two three four"
        assert out[1]["n_words_removed"] == 6 and out[1]["n_spans"] == 1
        assert out[2]["clean_text"] == "five six seven eight nine"
        assert out[3]["clean_text"] == docs[2][1]
        assert out[3]["n_words_removed"] == 0 and out[3]["n_spans"] == 0

    def test_counters_consistent_with_spans(self, spark):
        rng = random.Random(88)
        vocab = [f"w{i}" for i in range(10)]
        ph = " ".join(rng.choice(vocab) for _ in range(9))
        docs = []
        for d in range(30):
            parts = [rng.choice(vocab) for _ in range(rng.randint(2, 15))]
            if d % 3 == 0:
                parts[1:1] = ph.split(" ")
            docs.append((d, " ".join(parts)))
        df = _df(spark, docs)
        spans = duplicated_spans(df, k=6).collect()
        removed_by_doc: dict[int, int] = {}
        for r in spans:
            removed_by_doc[r["doc_id"]] = removed_by_doc.get(
                r["doc_id"], 0
            ) + (r["span_end"] - r["span_start"])
        n_spans_by_doc: dict[int, int] = {}
        for r in spans:
            n_spans_by_doc[r["doc_id"]] = n_spans_by_doc.get(r["doc_id"], 0) + 1
        out = remove_duplicated_spans(df, k=6).collect()
        assert len(out) == len(docs)
        for r in out:
            assert r["n_words_removed"] == removed_by_doc.get(r["doc_id"], 0)
            assert r["n_spans"] == n_spans_by_doc.get(r["doc_id"], 0)
            kept = r["clean_text"].split(" ") if r["clean_text"] else []
            assert len(kept) == r["n_words"] - r["n_words_removed"]

    def test_plan_has_no_cartesian_or_python_udf(self, spark):
        docs = [(d, "a b c d e f g h") for d in range(4)]
        out = remove_duplicated_spans(_df(spark, docs), k=6)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Cartesian" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
