"""Substring-level (span) deduplication: find and remove maximal
duplicated word-n-gram spans ACROSS documents — the ExactSubstr
filter of Lee et al., "Deduplicating Training Data Makes Language
Models Better" (ACL 2022), re-expressed Spark-first.

Whole-document dedup (operators/dedup.py) misses the dominant
duplication mode in web corpora: long verbatim passages (licenses,
boilerplate paragraphs, quoted articles) embedded in otherwise
distinct documents. The paper's suffix-array formulation is a
single-machine algorithm; the distributed re-expression here is the
shingle-equivalent: a length-``k`` duplicated substring exists iff
every one of its ``k``-word windows is duplicated, so

1. shingle every document into its k-word windows with positions
   (one corpus-sized projection, no shuffle — ``transform`` over
   ``sequence`` builds all windows per row, then one ``posexplode``);
2. find window hashes occurring in ≥ ``min_docs`` distinct documents
   (one hash-keyed shuffle with partial aggregation — the two-phase
   ``countDistinct`` plan — so hot shingles combine map-side);
3. tag each document's duplicated window positions (one hash-keyed
   join; the duplicated-hash side is aggregation output and usually
   small → AQE broadcasts it, and AQE skew-split covers the
   pathological "same sentence in a million docs" key);
4. merge overlapping/adjacent duplicated windows into MAXIMAL spans
   per document — the classic gaps-and-islands fold: one doc-keyed
   shuffle, then a linear window scan (running max of span ends
   decides island breaks, a running sum numbers the islands).

Every step is whole-stage-codegen DataFrame ops — no UDF, no driver
collect, no cartesian. Cost at 100 TB: ~n_words intermediate rows
(the same footprint as the Jaccard posting lists in dedup.py) and
three keyed exchanges.

Positions are 0-based word indices; a span is the half-open interval
``[span_start, span_end)`` such that every k-window inside it is
duplicated and neither extension is. ``remove_duplicated_spans``
drops exactly the words covered by the spans (the paper's removal
policy) using an index-aware ``filter`` lambda — array ops, not
Python.

No counterpart exists in the reference (its surface stops at
air-quality marts; see SURVEY.md §2 EXT rows).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_shingles(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, h): every k-word window of every document, as an
    md5 over the space-joined window. Documents shorter than ``k``
    words contribute nothing. Pure projection — no shuffle."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.split(F.col(text_col), " ")
    # sequence(0, size-k) would yield [0, -1] for a too-short doc
    # (Spark's sequence steps DOWN when stop < start) — guard it.
    idx = F.when(
        F.size(w) >= k, F.sequence(F.lit(0), F.size(w) - k)
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(
        idx,
        lambda i: F.md5(F.array_join(F.slice(w, i + F.lit(1), F.lit(k)), " ")),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(shingles).alias("pos", "h"),
    )


def duplicated_windows(
    docs: DataFrame,
    k: int,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos) of every k-window whose text occurs in at least
    ``min_docs`` DISTINCT documents. Two shuffles: the countDistinct
    aggregate (partial-agg combines hot shingles map-side) and the
    tag join (aggregation output is small → AQE broadcast)."""
    sh = word_shingles(docs, k, id_col, text_col)
    dup = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    return sh.join(dup, "h").select("doc_id", "pos")


def _merge_windows(occ: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands merge of (doc_id, pos) duplicated k-windows
    into maximal half-open spans: ordered per doc, a window starts a
    new island iff its position lies beyond the running max span end
    of everything before it; islands are numbered by a running sum of
    those breaks and collapsed with min/max. One doc-keyed exchange +
    linear window scans. Shared by the whole-corpus and incremental
    span tiers — identical merge, different window sources."""
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + k).over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = occ.withColumn(
        "new_island",
        F.when(F.col("pos") > F.coalesce(prev_max_end, F.lit(-1)), 1).otherwise(0),
    )
    grouped = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            by_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return grouped.groupBy("doc_id", "island").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + k).cast("long").alias("span_end"),
    ).select("doc_id", "span_start", "span_end")


def duplicated_spans(
    docs: DataFrame,
    k: int,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, span_start, span_end): maximal half-open word-index
    intervals in which every k-window is duplicated across ≥
    ``min_docs`` documents (whole-corpus tier; see
    :func:`incremental_duplicated_spans` for the cross-batch one)."""
    occ = duplicated_windows(docs, k, min_docs, id_col, text_col)
    return _merge_windows(occ, k)


def remove_duplicated_spans(
    docs: DataFrame,
    k: int,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents with every duplicated span excised (the paper's
    removal policy: drop the duplicated bytes, keep the remainder).
    Returns (doc_id, clean_text, n_words, n_words_removed, n_spans);
    docs with no duplicated span pass through with zero counters.

    The spans for each doc collapse to ONE array row (spans per doc
    are few — they're maximal and non-overlapping by construction),
    then a left join brings them beside the document and an
    index-aware ``filter`` lambda keeps exactly the uncovered words.
    One extra doc-keyed exchange over :func:`duplicated_spans`; the
    heavy side (documents) shuffles once."""
    spans = duplicated_spans(docs, k, min_docs, id_col, text_col)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    w = F.split(F.col(text_col), " ")
    joined = docs.select(
        F.col(id_col).alias("doc_id"), w.alias("words")
    ).join(per_doc, "doc_id", "left")
    spans_col = F.coalesce(
        F.col("spans"),
        F.array().cast("array<struct<span_start:long,span_end:long>>"),
    )
    kept = F.filter(
        F.col("words"),
        lambda word, i: ~F.exists(
            spans_col,
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size("words").cast("long").alias("n_words"),
        (F.size("words") - F.size(kept)).cast("long").alias("n_words_removed"),
        F.coalesce(F.size("spans"), F.lit(0)).cast("long").alias("n_spans"),
    )


# --- incremental (cross-batch) span tier -------------------------------


@dataclass(frozen=True)
class SpanIndex:
    """Handle for the span tier's persisted window-count index: ONE
    bucketed table ``{name}_windows`` (h, n_docs) of shingle hash →
    how many distinct documents have shipped that k-window. Counts
    are SUM-reaggregatable, so appends are blind (each batch appends
    its own per-window doc counts) and the probe re-aggregates
    bucket-locally — the same append-only discipline as ExactIndex's
    min-reaggregated survivors (operators/incremental_dedup.py).

    Contract: doc ids are globally unique across batches (shared with
    every incremental tier); re-ingesting the same document double-
    counts its windows."""

    name: str
    k: int
    min_docs: int = 2
    n_buckets: int = 32
    location: str | None = None

    @property
    def windows_table(self) -> str:
        return f"{self.name}_windows"

    def drop(self, spark=None) -> None:
        import shutil

        from pyspark.sql import SparkSession

        spark = spark or SparkSession.getActiveSession()
        if spark is not None:
            spark.sql(f"DROP TABLE IF EXISTS {self.windows_table}")
        if self.location:
            shutil.rmtree(self.location, ignore_errors=True)

    def __enter__(self) -> "SpanIndex":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.drop()


def _window_counts(
    docs: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    return (
        word_shingles(docs, k, id_col, text_col)
        .groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )


def build_span_index(
    corpus: DataFrame,
    index: SpanIndex,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Batch-0 bootstrap: per-window distinct-doc counts, bucketed on
    the window hash."""
    from openaq_data_pipeline_spark.sources.tables import save_bucketed

    save_bucketed(
        _window_counts(corpus, index.k, id_col, text_col),
        index.windows_table,
        "h",
        index.n_buckets,
        mode="overwrite",
        path=(f"{index.location}/windows" if index.location else None),
    )


def incremental_duplicated_spans(
    new_batch: DataFrame,
    index: SpanIndex,
    id_col: str = "doc_id",
    text_col: str = "text",
    update_index: bool = True,
) -> DataFrame:
    """Maximal duplicated spans of the NEW BATCH's documents against
    history + the batch itself — the cross-batch face of
    :func:`duplicated_spans`: a batch window is duplicated iff
    (history docs carrying it) + (batch docs carrying it) ≥
    ``index.min_docs``, which is exactly the whole-corpus count, so
    probe == from-scratch recompute restricted to batch docs (the
    driver oracle proves it).

    History text is NEVER re-shingled: the probe touches only the
    (h, n_docs) counts table, re-aggregated bucket-locally (groupBy
    key == bucket key → no exchange above the index scan). Cost
    scales with the batch and its window overlap, not with history.
    Plan: batch shingling (projection), batch window-count aggregate,
    one bucket-local left join, the tag join, and the shared
    gaps-and-islands merge."""
    spark = new_batch.sparkSession
    sh = word_shingles(
        new_batch, index.k, id_col, text_col
    ).localCheckpoint(eager=False)
    batch_cnt = sh.groupBy("h").agg(
        F.countDistinct("doc_id").alias("__bn")
    ).localCheckpoint(eager=False)
    # bucket-local: groupBy key == the table's bucket key
    hist = (
        spark.table(index.windows_table)
        .groupBy("h")
        .agg(F.sum("n_docs").alias("__hn"))
    )
    dup = (
        batch_cnt.join(hist, "h", "left")
        .filter(
            F.col("__bn") + F.coalesce(F.col("__hn"), F.lit(0))
            >= index.min_docs
        )
        .select("h")
    )
    spans = _merge_windows(sh.join(dup, "h").select("doc_id", "pos"), index.k)
    if update_index:
        from openaq_data_pipeline_spark.sources.tables import save_bucketed

        # pin the probe result BEFORE the append: `spans` reads the
        # index lazily, and the eager save below would otherwise make
        # a later collect() see the batch's own counts as history
        # (every batch window ≥ min_docs → whole docs flagged) — the
        # same self-read hazard incremental_exact_dedup checkpoints
        # against
        spans = spans.localCheckpoint(eager=True)

        save_bucketed(
            batch_cnt.select("h", F.col("__bn").alias("n_docs")),
            index.windows_table,
            "h",
            index.n_buckets,
            mode="append",
            path=(f"{index.location}/windows" if index.location else None),
        )
    return spans


def temp_span_index(
    k: int, min_docs: int = 2, n_buckets: int = 32
) -> SpanIndex:
    """Uniquely-named tempdir-rooted span index; context-manage it."""
    import uuid

    from openaq_data_pipeline_spark.tmproots import session_tmpdir

    return SpanIndex(
        name=f"span_idx_{uuid.uuid4().hex}",
        k=k,
        min_docs=min_docs,
        n_buckets=n_buckets,
        location=session_tmpdir("span_index_"),
    )
