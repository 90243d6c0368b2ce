"""Corpus-curation queries: benchmark decontamination, deterministic
stratified sampling, sequence packing, PII scan/redaction — the
remaining standard LLM-training-data preparation steps beyond
dedup/similarity/text-analysis (queries_ext.py). Each oracle-paired
with DuckDB SQL; all hash-derived decisions are MD5-based so both
engines agree bit-for-bit.

No counterpart exists in the reference (its surface stops at air-
quality marts); these extend the engine per the BASELINE.json north
star, built on the same documents table as queries_ext.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.catalog import load, register, register_rotated
from openaq_data_pipeline_spark.operators import text as X
from openaq_data_pipeline_spark.operators.curation import (
    EMAIL_RE,
    PHONE_RE,
    chunk_documents,
    pack_sequences,
    pii_scan,
    stratified_sample,
    train_eval_overlap,
)

# DuckDB mirror of operators/dedup.shingles() normalization: lower,
# collapse whitespace, trim, split on single space. The 4000-row
# series bound caps document length (corpus docs are ≤ 99 words).
_DOC_SHINGLES_DUCK = """
words AS (
    SELECT doc_id, doc_id % 10 = 0 AS is_eval,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
    FROM documents
),
shingles AS (
    SELECT DISTINCT doc_id, is_eval,
           w[g.i] || ' ' || w[g.i + 1] || ' ' || w[g.i + 2] AS shingle
    FROM words, generate_series(1, 4000) g(i)
    WHERE g.i <= len(w) - 2
)
"""


@register_rotated(
    "decontamination",
    "EXT-curation — benchmark decontamination: train-split documents "
    "scored by distinct 3-gram overlap with the eval split (broadcast "
    "eval shingle set, ≥20% overlap → drop)",
    oracle=f"""
WITH {_DOC_SHINGLES_DUCK.strip()},
eval_set AS (SELECT DISTINCT shingle FROM shingles WHERE is_eval),
train AS (SELECT doc_id, shingle FROM shingles WHERE NOT is_eval),
totals AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id),
shared AS (
    SELECT t.doc_id, count(*) AS n_shared
    FROM train t JOIN eval_set e USING (shingle)
    GROUP BY t.doc_id
)
SELECT t.doc_id,
       CAST(t.n_shingles AS BIGINT) AS n_shingles,
       CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
       CASE WHEN coalesce(s.n_shared, 0) * 5 >= t.n_shingles
            THEN 'drop' ELSE 'keep' END AS verdict
FROM totals t LEFT JOIN shared s USING (doc_id)
""",
)
def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")["documents"]
    return train_eval_overlap(d, "text", "doc_id", n=3)


# per-stratum keep thresholds on the 256-bucket MD5 hex space:
# en 50%, es/de 25%, fr 12.5%, default (zh, unseen) 6.25%
_SAMPLE_RATES = {"en": "80", "es": "40", "de": "40", "fr": "20"}
_SAMPLE_DEFAULT = "10"
_SAMPLE_CASE_DUCK = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in sorted(_SAMPLE_RATES.items()))
    + f" ELSE '{_SAMPLE_DEFAULT}' END"
)


@register_rotated(
    "stratified_sample",
    "EXT-curation — deterministic hash-threshold stratified sampling "
    "(per-language rates on an MD5 bucket; shuffle-free, seed-free, "
    "resume-safe — unlike RNG sample())",
    oracle=f"""
SELECT doc_id, lang, source,
       substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < {_SAMPLE_CASE_DUCK}
""",
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")["documents"]
    return stratified_sample(
        d.select("doc_id", "lang", "source"),
        "doc_id",
        "lang",
        _SAMPLE_RATES,
        _SAMPLE_DEFAULT,
    )


@register(
    "sequence_packing",
    "EXT-curation — token-budget sequence packing: contiguous greedy "
    "fill to 256-token packs per language via a running-sum window; "
    "per-pack doc counts and token totals",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, lang, n_tokens,
           coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 256
           AS pack_id
    FROM toks
)
SELECT lang, CAST(pack_id AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM packed GROUP BY lang, pack_id
""",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")["documents"]
    packed = pack_sequences(
        d.select("doc_id", "lang", "text"),
        "lang",
        "doc_id",
        X.token_count(F.col("text")),
        capacity=256,
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__tokens").cast("long").alias("pack_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


@register_rotated(
    "doc_chunking",
    "EXT-curation — context-window document chunking: overlapping "
    "32-token windows with stride 24 (the step BEFORE sequence "
    "packing: long docs must be cut to the model context, overlap "
    "preserves cross-boundary n-grams; the trailing window ends "
    "exactly at the doc end so no token is dropped); pure map-side "
    "split+sequence+slice — no shuffle, no UDF, scan-speed at any "
    "scale; chunk count is exact integer math so both engines agree",
    oracle="""
WITH words AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS w
    FROM documents
),
base AS (SELECT doc_id, w, len(w) AS n FROM words),
chunks AS (
    SELECT doc_id, g.k AS chunk_id, 1 + g.k * 24 AS s, w, n
    FROM base, generate_series(0, 4000) g(k)
    WHERE g.k < 1 + (greatest(n - 32, 0) + 23) // 24
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       array_to_string(list_slice(w, s, s + 31), ' ') AS chunk_text,
       CAST(least(32, n - s + 1) AS BIGINT) AS n_tokens
FROM chunks
""",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")["documents"]
    return chunk_documents(d, "text", "doc_id", chunk_tokens=32, overlap=8)


@register_rotated(
    "pii_scan",
    "EXT-curation — PII detection + redaction audit: email/phone "
    "regexp counts and the MD5 of the redacted text, over a corpus "
    "with deterministically injected PII (every 7th doc)",
    oracle=f"""
WITH injected AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com or call 555-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
                ELSE text END AS text
    FROM documents
),
scanned AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
    FROM injected
)
SELECT doc_id, n_emails, n_phones, redacted_fp,
       (n_emails = 0 AND n_phones = 0) AS is_clean
FROM scanned
""",
)
def pii_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")["documents"]
    injected = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" now"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return pii_scan(injected, "text", "doc_id")


@register_rotated(
    "pps_systematic_sample",
    "EXT-sampling — systematic probability-proportional-to-size "
    "sampling (Madow 1949, r8): documents occupy weight-length "
    "segments on a line (weight = n_chars), the sampler picks the "
    "rows covering multiples of W/k — inclusion probability exactly "
    "min(1, k·w/W) with ZERO floating-point randomness; the whole "
    "design is integer arithmetic, bit-reproducible on any engine. "
    "The Spark side computes the global cumulative weight with the "
    "TWO-PHASE partition-offset pattern (operators/ids.py — a "
    "single-partition running-sum window is the canonical 100 TB "
    "scale-killer the oracle is allowed but the engine is not)",
    oracle="""
WITH c AS (
    SELECT doc_id, n_chars,
           CAST(sum(n_chars) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_weight
    FROM documents
),
t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS w FROM documents)
SELECT doc_id, n_chars, cum_weight,
       CAST((cum_weight * 37) // t.w AS BIGINT) AS pick_no
FROM c CROSS JOIN t
WHERE (cum_weight * 37) // t.w > ((cum_weight - n_chars) * 37) // t.w
""",
)
def pps_systematic_sample_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """k=37 (prime, to avoid aliasing against any periodicity in the
    synthetic weights); order = doc_id. Output = the selected rows
    with their covering selection point."""
    from openaq_data_pipeline_spark.operators.curation import (
        pps_systematic_sample,
    )

    d = load(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "n_chars"
    )
    return pps_systematic_sample(d, "n_chars", "doc_id", k=37)


# the driver corpus draws from a synthetic systems vocabulary whose
# only function words are "the" and "a" — the required-stop-word set
# is instantiated per corpus (the operator's default stays the
# paper's eight; Dolma/RefinedWeb ship adapted sets the same way)
_GOPHER_STOPS = ["the", "a"]
_GOPHER_STOP_SQL = " + ".join(
    f"CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') THEN 1 ELSE 0 END"
    for w in _GOPHER_STOPS
)


@register(
    "gopher_quality_rules",
    "EXT-curation — the Gopher quality-heuristic battery (Rae et "
    "al. 2021 Appendix A, r8): word-count bounds, mean-word-length "
    "bounds, symbol ratio, bullet/ellipsis line ratios, "
    "alpha-word share and required-stop-word presence, plus the "
    "conjunction verdict — the published structural filter most "
    "open corpora pass before any model-based gate. Every ratio "
    "threshold is a cross-multiplication (10·n_sym ≤ n_words), so "
    "the battery is one shuffle-free codegen projection and the "
    "verdicts hash bit-identically against the oracle",
    oracle=f"""
WITH n AS (
    SELECT doc_id, text,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
    FROM documents
),
c AS (
    SELECT doc_id, text, norm,
           CASE WHEN norm = '' THEN 0
                ELSE len(string_split(norm, ' ')) END AS n_words,
           len(regexp_extract_all(text, '#'))
             + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym,
           string_split(text, chr(10)) AS lines,
           len(list_filter(string_split(norm, ' '),
                           t -> regexp_matches(t, '[a-z]'))) AS n_alpha_words,
           {_GOPHER_STOP_SQL} AS n_req_stop
    FROM n
),
r AS (
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           n_words BETWEEN 50 AND 100000 AS r_word_count,
           n_words > 0
             AND 3 * n_words <= length(norm) - (n_words - 1)
             AND length(norm) - (n_words - 1) <= 10 * n_words
             AS r_mean_word_len,
           10 * n_sym <= n_words AS r_symbol_ratio,
           10 * len(list_filter(lines,
                l -> regexp_matches(l, '^\\s*[-*•]'))) <= 9 * len(lines)
             AS r_bullet_lines,
           10 * len(list_filter(lines,
                l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) <= 3 * len(lines)
             AS r_ellipsis_lines,
           5 * n_alpha_words >= 4 * n_words AS r_alpha_words,
           n_req_stop >= 2 AS r_stopwords
    FROM c
)
SELECT *,
       n_words > 0 AND r_word_count AND r_mean_word_len
         AND r_symbol_ratio AND r_bullet_lines AND r_ellipsis_lines
         AND r_alpha_words AND r_stopwords AS keep
FROM r
""",
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_spark.operators.text import gopher_rules

    d = load(spark, sf_dir, "documents")["documents"]
    return gopher_rules(
        d, "text", "doc_id", required_stopwords=_GOPHER_STOPS
    )
