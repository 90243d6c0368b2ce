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


def duplicated_spans(
    docs: DataFrame,
    k: int,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, span_start, span_end): maximal half-open word-index
    intervals in which every k-window is duplicated across ≥
    ``min_docs`` documents. Gaps-and-islands merge of the duplicated
    windows: ordered per doc, a window starts a new island iff its
    position lies beyond the running max span end of everything
    before it; islands are numbered by a running sum of those breaks
    and collapsed with min/max. One doc-keyed exchange + linear
    window scans."""
    occ = duplicated_windows(docs, k, min_docs, id_col, text_col)
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
