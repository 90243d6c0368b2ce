"""openaq_data_pipeline_spark — a PySpark-native analytics engine.

Rebuilds the query / data-processing semantics of the reference ELT
pipeline ``pacomoraless2/openaq-data-pipeline`` (Airflow + Python
extraction + dbt-on-BigQuery; see SURVEY.md) idiomatically on Spark:

- ``sources``   — NDJSON / CSV lake ingestion into a date-partitioned
  Parquet bronze layer with audit columns (SURVEY §2.1 S2–S10, P2).
- ``operators`` — the medallion transformations: staging (JSON
  flattening, surrogate keys, latest-per-key dedup), intermediate
  (validity filters, snapshot-aligned enrichment join), marts (SCD-1
  dimension, hourly conditional-AVG pivot facts), plus the
  large-scale training-data extensions (dedup, similarity search,
  text analysis, multimodal plumbing).
- ``functions`` — scalar helpers kept Catalyst-side (surrogate key,
  coalesce chains, unit conversions).
- ``plans``     — incremental high-watermark MERGE emulation, the
  data-quality test executor, and the batch runner that replaces the
  reference's Airflow DAG logic.
- ``streaming`` — Structured Streaming variant of the marts (tumbling
  hourly windows + watermarks).

Everything is DataFrame/SQL-first: plans are declared lazily and
optimized end-to-end by Catalyst; Python UDFs appear only where the
built-in operators cannot express the semantics (Arrow-vectorized).
"""

from openaq_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
