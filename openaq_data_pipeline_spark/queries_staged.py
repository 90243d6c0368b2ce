"""Staged driver-query candidates (r8): full DuckDB oracles,
parity-checked every pytest run via the rotated pool, awaiting a free
slot in the capped driver registry (catalog.register_staged). Both
demonstrate this round's crawl-front-door operators end-to-end.

Oracle style note: `html_text_extract`'s oracle is a CLOSED FORM of
the expected extraction (the HTML is synthesized around the document
text, so the right answer is constructible directly) — a stronger
check than replaying the regexp chain, which would just mirror the
implementation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.catalog import load, register_staged
from openaq_data_pipeline_spark.operators.profiling import profile_table
from openaq_data_pipeline_spark.operators.text import html_extract, html_title


@register_staged(
    "html_text_extract",
    "EXT-text — HTML→text extraction (the crawl front door): "
    "documents wrapped in a deterministic HTML template (head/title, "
    "style block, comment, heading, entities incl. a double-escape) "
    "are extracted back to visible text + title by the codegen "
    "regexp chain; the oracle is the CLOSED FORM of the expected "
    "extraction, not a replay of the chain",
    oracle="""
SELECT doc_id,
       'T&' || CAST(doc_id AS VARCHAR) AS title,
       'Heading' || chr(10) || chr(10) || text || ' <tag>'
           || chr(10) || chr(10) || 'tail ' || lang AS extracted
FROM documents
ORDER BY doc_id
""",
)
def q_html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")["documents"]
    html = F.concat(
        F.lit("<html><head><title>T&amp;"),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title><style>p{color:red}</style></head>"
            "<body><!-- hidden --><h1>Heading</h1><p>"
        ),
        F.col("text"),
        F.lit(" &lt;tag&gt;</p><div>tail&nbsp;"),
        F.col("lang"),
        F.lit("</div></body></html>"),
    )
    return (
        d.select("doc_id", html.alias("__h"))
        .select(
            "doc_id",
            html_title(F.col("__h")).alias("title"),
            html_extract(F.col("__h")).alias("extracted"),
        )
        .orderBy("doc_id")
    )


@register_staged(
    "table_profile_exact",
    "EXT-profiling — one-pass table profiling, exact fields: per "
    "column of the documents table, row count, null count and "
    "string-rendered min/max from ONE partial-aggregable aggregation "
    "(the approximate distinct estimate is deliberately out of the "
    "oracle surface — HLL++ is engine-specific)",
    oracle="""
SELECT * FROM (
    SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
           SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS n_nulls,
           CAST(MIN(doc_id) AS VARCHAR) AS min_value,
           CAST(MAX(doc_id) AS VARCHAR) AS max_value
    FROM documents
    UNION ALL
    SELECT 'lang', COUNT(*),
           SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END),
           MIN(lang), MAX(lang) FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(*),
           SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'source', COUNT(*),
           SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
           MIN(source), MAX(source) FROM documents
    UNION ALL
    SELECT 'text', COUNT(*),
           SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END),
           MIN(text), MAX(text) FROM documents
) ORDER BY col_name
""",
)
def q_table_profile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")["documents"]
    return (
        profile_table(d)
        .select(
            F.col("column").alias("col_name"),
            "n_rows",
            "n_nulls",
            "min_value",
            "max_value",
        )
        .orderBy("col_name")
    )
