"""Extraction drivers: REST → audit-enriched NDJSON lake — the
Spark-native restatement of the reference's ingestion entry point
(SURVEY §3.1, ``dags/01_openaq_ingestion.py`` task graph):

1. control CSV → distinct location ids            (S2, A5)
2. per-id REST GET → locations NDJSON             (S3, P2, S6)
3. locations lake → distinct sensor ids           (S5, A5)
4. per-sensor paginated fetch [ds, ds+1) →
   measurements NDJSON                            (S4, P2, S6)

Each extractor returns its row count — the reference branches its
DAG on that count (A6, ``dags/01:104-117``); callers skip the bronze
load when it is 0.

The transport is injectable (no egress in this environment); the
distribution shape is real: ids spread across partitions, one HTTP
session per partition (``mapInPandas``), retry/backoff/dedup
semantics identical per key (sources/rest.py). Lake layout matches
the reference's Hive-style ``YYYY/MM/DD`` date paths and 1000/2000-
row chunks (``gcs_utils.py:80-87``; chunk sizes
``extract_openaq_locations.py:99``, ``extract_measurements.py:179``).

Idempotent re-runs: the reference deletes the run's ``_part*`` files
before re-extracting (``gcs_utils.py:26-44``); ``write_ndjson`` uses
``mode("overwrite")`` on the per-date directory — same contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_spark import schemas
from openaq_data_pipeline_spark.sources.lake import (
    read_control_csv,
    read_ndjson,
    write_ndjson,
)
from openaq_data_pipeline_spark.sources.rest import (
    FetchFn,
    RetryPolicy,
    distinct_keys,
    fetch_paginated_per_key,
    fetch_per_key,
)

LOCATIONS_URL = "https://api.openaq.org/v3/locations/{key}"
MEASUREMENTS_URL = "https://api.openaq.org/v3/sensors/{key}/measurements"
SOURCE_NAME = "OpenAQ API"


def _date_path(base: str, logical_date: str) -> str:
    """F14: Hive-style YYYY/MM/DD partition path (gcs_utils.py:80-87)."""
    return f"{base}/{logical_date.replace('-', '/')}"


def _audit_columns(run_id: str, logical_date: str) -> dict[str, F.Column]:
    """P2: the reference's audit enrichment
    (extract_openaq_locations.py:120-129). The filename column is a
    sink-side property; it is recovered at bronze-load time with
    ``input_file_name()`` (sources/bronze.py)."""
    return {
        "_audit_run_id": F.lit(run_id),
        "_audit_logical_date": F.lit(logical_date),
        "_audit_extracted_at": F.date_format(
            F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ),
        "_audit_source": F.lit(SOURCE_NAME),
    }


def extract_locations(
    spark: SparkSession,
    control_csv_path: str,
    lake_locations_base: str,
    run_id: str,
    logical_date: str,
    fetch: FetchFn | None = None,
    chunk_size: int = 1000,
) -> int:
    """Control CSV ids → per-id GET → locations NDJSON for one
    logical date. 404s become null-data rows (kept, reference
    semantics). Returns the extracted row count (A6)."""
    ids = distinct_keys(read_control_csv(spark, control_csv_path), "control_id")
    raw = fetch_per_key(
        ids,
        LOCATIONS_URL,
        out_schema="key long, payload string",
        row_fn=_location_row,
        fetch=fetch,
        policy=RetryPolicy(backoff="linear"),
    )
    df = raw.select(
        F.from_json("payload", schemas.LOCATION_DATA).alias("data")
    ).withColumns(_audit_columns(run_id, logical_date))
    out = _date_path(lake_locations_base, logical_date)
    return _write_counted(df, out, chunk_size)


def _location_row(key: int, payload: dict | None) -> dict:
    results = (payload or {}).get("results") or [None]
    first = results[0]
    import json

    return {"key": key, "payload": json.dumps(first) if first else None}


def extract_measurements(
    spark: SparkSession,
    lake_locations_glob: str,
    lake_measurements_base: str,
    run_id: str,
    logical_date: str,
    date_to: str,
    fetch: FetchFn | None = None,
    chunk_size: int = 2000,
) -> int:
    """Locations lake → sensor id set → paginated fetch over
    ``[logical_date, date_to)`` → measurements NDJSON. Returns the
    extracted row count (A6)."""
    locations = read_ndjson(spark, lake_locations_glob, schemas.RAW_LOCATIONS)
    sensor_ids = (
        locations.select(F.explode("data.sensors.id").alias("sensor_id"))
        .where(F.col("sensor_id").isNotNull())
        .distinct()
        .select(F.col("sensor_id").alias("key"))
    )
    raw = fetch_paginated_per_key(
        sensor_ids,
        MEASUREMENTS_URL,
        date_from=logical_date,
        date_to=date_to,
        fetch=fetch,
        policy=RetryPolicy(backoff="exponential"),
    )
    df = raw.select(
        F.from_json("payload", schemas.MEASUREMENT_DATA).alias("data"),
        F.col("key").alias("_audit_sensor_id"),
    ).withColumns(_audit_columns(run_id, logical_date))
    out = _date_path(lake_measurements_base, logical_date)
    return _write_counted(df, out, chunk_size)


def _write_counted(df: DataFrame, out: str, chunk_size: int) -> int:
    """Persist → count → write-if-nonzero: one fetch pass total, and
    an empty extraction leaves no files (the reference's branch then
    skips the bronze load — ``dags/01:104-117``)."""
    df = df.persist()
    try:
        n = df.count()
        if n > 0:
            write_ndjson(df, out, rows_per_file=chunk_size)
        return n
    finally:
        df.unpersist()
