"""Staging layer: typed flattening of bronze + latest-per-key dedup.

Parity targets (all column names/types/semantics match the reference
views; citations into /root/reference):

- ``stg_locations``    ⇔ ``models/staging/stg_openaq__locations.sql``
- ``stg_sensors``      ⇔ ``models/staging/stg_openaq__sensors.sql``
- ``stg_measurements`` ⇔ ``models/staging/stg_openaq__measurements.sql``

Dedup (W1): every model keeps the most recently extracted record per
surrogate key — ``QUALIFY ROW_NUMBER() OVER(PARTITION BY key ORDER BY
extracted_at DESC) = 1``. Ties on ``extracted_at`` are
nondeterministic in BigQuery and Spark alike (SURVEY §7.4.2); we add
a deterministic file/position tiebreak behind ``deterministic=True``
(default) so results are oracle-testable, documented as a superset of
the reference contract.

Scale notes: the window partitions by the surrogate key — high
cardinality, evenly distributed (MD5), so no skew. Catalyst prunes
the unread branches of the nested ``data`` struct out of the parquet
scan (nestedSchemaPruning), and the whole staging layer stays inside
whole-stage codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window

from openaq_data_pipeline_spark.functions.keys import surrogate_key
from openaq_data_pipeline_spark.functions.scalars import display_name


def latest_per_key(
    df: DataFrame,
    key: str | list[str],
    order_col: str = "extracted_at",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W1/W2: keep the latest row per key (descending ``order_col``).

    The reference idiom is BigQuery ``QUALIFY ROW_NUMBER() = 1``; the
    Spark idiom is an identical window + filter — Catalyst runs one
    hash-shuffle on ``key`` and a per-partition sort, with partial
    top-1 pushdown at scale via the window group limit optimization.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _audit_cols(df: DataFrame) -> list[Column]:
    return [
        F.col("_audit_run_id"),
        F.col("_audit_logical_date").cast("date").alias("logical_date"),
        F.col("_audit_extracted_at").cast("timestamp").alias("extracted_at"),
    ]


_DATE_STR = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731


def stg_locations(raw_locations: DataFrame, deterministic: bool = True) -> DataFrame:
    """Typed location snapshots, one row per (location, logical_date).

    ⇔ ``stg_openaq__locations.sql:11-51``: JSON projection + casts
    (P1/F3), COALESCE locality chain (P3/F4-F6), MD5 surrogate key
    over (id, logical_date) (F13), latest-per-key dedup (W1).
    """
    extracted = raw_locations.select(
        surrogate_key(
            F.col("data.id").cast("string"),
            _DATE_STR(F.col("_audit_logical_date")),
        ).alias("record_id"),
        F.col("data.id").cast("long").alias("location_id"),
        F.col("data.name").alias("location_name"),
        display_name(
            F.col("data.locality"), F.col("data.city"), F.col("data.timezone")
        ).alias("locality"),
        F.col("data.country.code").alias("country_code"),
        F.col("data.country.name").alias("country_name"),
        F.col("data.coordinates.latitude").cast("double").alias("latitude"),
        F.col("data.coordinates.longitude").cast("double").alias("longitude"),
        F.col("data.provider.name").alias("provider_name"),
        F.col("data.isMobile").cast("boolean").alias("is_mobile"),
        F.col("data.isMonitor").cast("boolean").alias("is_monitor"),
        F.col("data.timezone").alias("timezone"),
        *_audit_cols(raw_locations),
    )
    tiebreak = ["_audit_run_id"] if deterministic else None
    return latest_per_key(extracted, "record_id", tiebreak=tiebreak)


def stg_sensors(raw_locations: DataFrame, deterministic: bool = True) -> DataFrame:
    """Sensor snapshots exploded from the location payload array.

    ⇔ ``stg_openaq__sensors.sql:11-43``: ``UNNEST(JSON_QUERY_ARRAY
    (data.sensors))`` → ``explode`` (F2 — drops null/empty arrays,
    same as BQ comma-UNNEST), two surrogate keys, W1 dedup.
    """
    exploded = raw_locations.select(
        F.col("data.id").alias("_loc_id"),
        F.explode(F.col("data.sensors")).alias("sensor"),
        F.col("_audit_run_id"),
        F.col("_audit_logical_date"),
        F.col("_audit_extracted_at"),
    )
    extracted = exploded.select(
        surrogate_key(
            F.col("sensor.id").cast("string"),
            _DATE_STR(F.col("_audit_logical_date")),
        ).alias("sensor_record_id"),
        surrogate_key(
            F.col("sensor.id").cast("string"),
            F.col("sensor.parameter.id").cast("string"),
        ).alias("sensor_parameter_key"),
        F.col("_loc_id").cast("long").alias("location_id"),
        F.col("sensor.id").cast("long").alias("sensor_id"),
        F.col("sensor.name").alias("sensor_name"),
        F.col("sensor.parameter.id").cast("long").alias("parameter_id"),
        F.col("sensor.parameter.name").alias("parameter_name"),
        F.col("sensor.parameter.units").alias("unit"),
        *_audit_cols(exploded),
    )
    tiebreak = ["_audit_run_id"] if deterministic else None
    return latest_per_key(extracted, "sensor_record_id", tiebreak=tiebreak)


def measurements_projection(raw_measurements: DataFrame) -> DataFrame:
    """The typed flattening of raw measurements *without* the W1
    dedup — shared by batch staging (which adds latest-per-key) and
    the streaming variant (which substitutes
    ``dropDuplicatesWithinWatermark``; window row_number is not
    streaming-expressible).

    ⇔ ``stg_openaq__measurements.sql:11-36``. The surrogate key
    hashes the *raw* JSON timestamp string (``JSON_VALUE(...)``
    before the CAST), so we hash ``period.datetimeFrom.utc`` as-is
    and cast separately.
    """
    return raw_measurements.select(
        surrogate_key(
            F.col("_audit_sensor_id").cast("string"),
            F.col("data.parameter.id").cast("string"),
            F.col("data.period.datetimeFrom.utc"),
        ).alias("measurement_id"),
        surrogate_key(
            F.col("_audit_sensor_id").cast("string"),
            F.col("data.parameter.id").cast("string"),
        ).alias("sensor_parameter_key"),
        F.col("_audit_sensor_id").cast("long").alias("sensor_id"),
        F.col("data.parameter.id").cast("long").alias("parameter_id"),
        F.col("data.value").cast("double").alias("measurement_value"),
        F.col("data.period.datetimeFrom.utc").cast("timestamp").alias("measured_from_utc"),
        F.col("data.period.datetimeTo.utc").cast("timestamp").alias("measured_to_utc"),
        F.col("data.period.interval").alias("measurement_interval"),
        F.col("data.flagInfo.hasFlags").cast("boolean").alias("has_flags"),
        *_audit_cols(raw_measurements),
    )


def stg_measurements(raw_measurements: DataFrame, deterministic: bool = True) -> DataFrame:
    """Typed measurement facts keyed by (sensor, parameter, from-ts),
    deduplicated latest-per-key (W1 ⇔ stg_openaq__measurements.sql:44-49)."""
    extracted = measurements_projection(raw_measurements)
    tiebreak = ["_audit_run_id"] if deterministic else None
    return latest_per_key(extracted, "measurement_id", tiebreak=tiebreak)
