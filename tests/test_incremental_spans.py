"""Incremental (cross-batch) span dedup (operators/spans.SpanIndex):
probe == from-scratch whole-corpus recompute restricted to batch
docs, multi-batch count accumulation, bucket-local index plan, and
the history-text-never-re-shingled pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.spans import (
    build_span_index,
    duplicated_spans,
    incremental_duplicated_spans,
    temp_span_index,
)

K = 4
SCHEMA = "doc_id long, text string"

HISTORY = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "sphinx of black quartz judge my vow today"),
]
# 10 copies history-0's opening (cross-batch span), 11 is fresh, and
# 11+12 share a batch-internal phrase
BATCH1 = [
    (10, "intro words the quick brown fox jumps away"),
    (11, "totally fresh content alpha beta gamma delta epsilon"),
    (12, "prefix alpha beta gamma delta epsilon suffix end"),
]
# 20 duplicates a BATCH1 phrase — only catchable through the index
BATCH2 = [
    (20, "zz alpha beta gamma delta epsilon yy ww"),
    (21, "completely unrelated words nothing shared here at all"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _expected(spark, corpus_rows, batch_rows):
    """From-scratch whole-corpus spans, restricted to batch docs."""
    full = duplicated_spans(_df(spark, corpus_rows), K)
    batch_ids = {d for d, _ in batch_rows}
    return {
        tuple(r)
        for r in full.collect()
        if r["doc_id"] in batch_ids
    }


class TestIncrementalSpans:
    def test_probe_equals_recompute(self, spark):
        with temp_span_index(K, n_buckets=4) as idx:
            build_span_index(_df(spark, HISTORY), idx)
            got1 = {
                tuple(r)
                for r in incremental_duplicated_spans(
                    _df(spark, BATCH1), idx
                ).collect()
            }
            assert got1 == _expected(spark, HISTORY + BATCH1, BATCH1)
            assert got1  # non-trivial fixture
            # batch 2 probes against history + batch 1 via the index
            got2 = {
                tuple(r)
                for r in incremental_duplicated_spans(
                    _df(spark, BATCH2), idx
                ).collect()
            }
            assert got2 == _expected(
                spark, HISTORY + BATCH1 + BATCH2, BATCH2
            )
            # 20's shared phrase with 11/12 must be present
            assert any(r[0] == 20 for r in got2)
            assert not any(r[0] == 21 for r in got2)

    def test_update_index_false_leaves_counts(self, spark):
        with temp_span_index(K, n_buckets=4) as idx:
            build_span_index(_df(spark, HISTORY), idx)
            before = sorted(
                tuple(r) for r in spark.table(idx.windows_table).collect()
            )
            incremental_duplicated_spans(
                _df(spark, BATCH1), idx, update_index=False
            ).collect()
            after = sorted(
                tuple(r) for r in spark.table(idx.windows_table).collect()
            )
            assert after == before

    def test_index_reaggregation_is_bucket_local(self, spark):
        with temp_span_index(K, n_buckets=4) as idx:
            build_span_index(_df(spark, HISTORY), idx)
            incremental_duplicated_spans(_df(spark, BATCH1), idx).collect()
            hist = (
                spark.table(idx.windows_table)
                .groupBy("h")
                .agg(F.sum("n_docs").alias("n"))
            )
            hist.collect()
            plan = hist._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "Bucketed: true" in plan, plan

    def test_probe_never_reshingles_history(self, spark, tmp_path):
        hist_path = str(tmp_path / "hist")
        batch_path = str(tmp_path / "batch")
        _df(spark, HISTORY).write.parquet(hist_path)
        _df(spark, BATCH1).write.parquet(batch_path)
        with temp_span_index(K, n_buckets=4) as idx:
            build_span_index(spark.read.parquet(hist_path), idx)
            out = incremental_duplicated_spans(
                spark.read.parquet(batch_path), idx, update_index=False
            )
            files = out.inputFiles()
            # the batch side sits behind the shingle localCheckpoint
            # (LogicalRDD — no file provenance), so the live plan's
            # inputs are exactly the index tables; history TEXT would
            # only enter through a live scan and must be absent
            assert any(idx.location in f for f in files), files
            assert not any(hist_path in f for f in files), (
                "incremental span probe re-reads history text"
            )

    def test_min_docs_threshold(self, spark):
        with temp_span_index(K, min_docs=3, n_buckets=4) as idx:
            build_span_index(_df(spark, HISTORY), idx)
            # the 10↔0 phrase exists in only TWO docs → below min_docs=3
            got = incremental_duplicated_spans(
                _df(spark, [BATCH1[0]]), idx
            ).collect()
            assert got == []


class TestSpanIndexCompaction:
    def test_compact_index_covers_span_index(self, spark):
        """N blind appends fragment the window-count table;
        compact_index heals it to 1 file/bucket with probe results
        unchanged (the compactor's duck-typing covers *_table)."""
        from openaq_data_pipeline_spark.sources.maintenance import (
            bucket_file_stats,
            compact_index,
        )

        with temp_span_index(K, n_buckets=4) as idx:
            build_span_index(_df(spark, HISTORY), idx)
            for i in range(4):
                batch = [
                    (100 + 10 * i + j, t) for j, (d, t) in enumerate(BATCH1)
                ]
                incremental_duplicated_spans(_df(spark, batch), idx).collect()
            frag = {
                r["bucket_id"]: r["n_files"]
                for r in bucket_file_stats(spark, idx.windows_table).collect()
            }
            assert max(frag.values()) >= 4
            before = {
                tuple(r)
                for r in incremental_duplicated_spans(
                    _df(spark, BATCH2), idx, update_index=False
                ).collect()
            }
            assert compact_index(spark, idx, max_files=1) == [
                idx.windows_table
            ]
            healed = {
                r["bucket_id"]: r["n_files"]
                for r in bucket_file_stats(spark, idx.windows_table).collect()
            }
            assert all(n == 1 for n in healed.values())
            after = {
                tuple(r)
                for r in incremental_duplicated_spans(
                    _df(spark, BATCH2), idx, update_index=False
                ).collect()
            }
            assert after == before
