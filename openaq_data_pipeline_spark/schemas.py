"""Declared schemas for the bronze layer and payloads.

The reference loads NDJSON with a *fixed* declared schema and
``ignore_unknown_values=True`` (``dags/01_openaq_ingestion.py:131-141,
189-200``) — one semi-structured ``data`` column plus typed audit
columns. Spark equivalent: explicit ``StructType`` handed to
``spark.read.schema(...).json(...)`` in PERMISSIVE mode, which
silently drops unknown fields and nulls malformed ones — the same
drift-tolerance contract (README.md:61 of the reference explains the
JSON-column choice).

The nested payload structs are exactly the JSON paths the reference's
staging SQL reads (``stg_openaq__locations.sql:16-36``,
``stg_openaq__sensors.sql:13-35``, ``stg_openaq__measurements.sql:
13-34``); schema-on-read of unused paths is preserved because
PERMISSIVE mode keeps the declared shape and
``spark.sql.optimizer.nestedSchemaPruning.enabled`` prunes unread
branches out of the parquet scan at plan time.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- payload structs (schema-on-read surface) ---------------------------

PARAMETER_STRUCT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("units", T.StringType()),
    ]
)

SENSOR_STRUCT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("parameter", PARAMETER_STRUCT),
    ]
)

LOCATION_DATA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("locality", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("timezone", T.StringType()),
        T.StructField(
            "country",
            T.StructType(
                [
                    T.StructField("code", T.StringType()),
                    T.StructField("name", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "coordinates",
            T.StructType(
                [
                    T.StructField("latitude", T.DoubleType()),
                    T.StructField("longitude", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "provider",
            T.StructType([T.StructField("name", T.StringType())]),
        ),
        T.StructField("isMobile", T.BooleanType()),
        T.StructField("isMonitor", T.BooleanType()),
        T.StructField("sensors", T.ArrayType(SENSOR_STRUCT)),
    ]
)

MEASUREMENT_DATA = T.StructType(
    [
        T.StructField("value", T.DoubleType()),
        T.StructField("parameter", PARAMETER_STRUCT),
        T.StructField(
            "period",
            T.StructType(
                [
                    T.StructField(
                        "datetimeFrom",
                        T.StructType([T.StructField("utc", T.StringType())]),
                    ),
                    T.StructField(
                        "datetimeTo",
                        T.StructType([T.StructField("utc", T.StringType())]),
                    ),
                    T.StructField("interval", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "flagInfo",
            T.StructType([T.StructField("hasFlags", T.BooleanType())]),
        ),
    ]
)

# --- bronze tables (declared load schemas) ------------------------------
# Audit columns: FIXTURES.md §1-2; reference schema_fields at
# dags/01_openaq_ingestion.py:134-141 (locations) and :193-200
# (measurements). `_audit_logical_date` is the day partition key.

RAW_LOCATIONS = T.StructType(
    [
        T.StructField("data", LOCATION_DATA),
        T.StructField("_audit_run_id", T.StringType()),
        T.StructField("_audit_logical_date", T.DateType()),
        T.StructField("_audit_extracted_at", T.TimestampType()),
        T.StructField("_audit_source", T.StringType()),
        T.StructField("_audit_gcs_filename", T.StringType()),
    ]
)

RAW_MEASUREMENTS = T.StructType(
    [
        T.StructField("data", MEASUREMENT_DATA),
        T.StructField("_audit_run_id", T.StringType()),
        T.StructField("_audit_sensor_id", T.LongType()),
        T.StructField("_audit_logical_date", T.DateType()),
        T.StructField("_audit_extracted_at", T.TimestampType()),
        T.StructField("_audit_gcs_filename", T.StringType()),
    ]
)
