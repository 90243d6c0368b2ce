"""Gold layer: SCD-1 dimension + wide hourly pivot facts.

Parity targets:

- ``dim_locations``        ⇔ ``models/marts/dim_locations.sql:17-33``
- ``mart_location_air_quality`` ⇔ ``models/marts/
  mart_location_air_quality.sql`` (J2 inner join, F7 hour trunc,
  F8 calendar extract, A1 6-col group-by, A2 14-column
  conditional-AVG pivot, F9 round, F13 surrogate key)
- ``mart_location_weather``     ⇔ ``models/marts/
  mart_location_weather.sql`` (A3 5-column pivot with the Fahrenheit
  conversion *inside* the aggregate, wind dir rounded to 0 dp)

Scale notes: the measurement fact is the only big input; enriched
sensors are a dimension (≤ sensors × snapshot days), broadcast into
the J2 join so the fact never shuffles for the join. The single
shuffle in each mart is the hash aggregation on the 6 grouping
columns — keyed by (location, hour), which is high-cardinality and
evenly spread. AQE coalesces post-agg partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.functions.keys import surrogate_key
from openaq_data_pipeline_spark.functions.scalars import celsius_to_fahrenheit, hour_bucket

# parameter_id → mart column (mart_location_air_quality.sql:71-86)
AIR_QUALITY_PIVOT: dict[str, int] = {
    "pm10_ugm3": 1,
    "pm25_ugm3": 2,
    "pm1_ugm3": 19,
    "um003_particles_cm3": 125,
    "o3_ugm3": 3,
    "co_ugm3": 4,
    "co_ppb": 102,
    "no2_ugm3": 5,
    "no2_ppb": 15,
    "so2_ugm3": 6,
    "so2_ppb": 101,
    "nox_ppb": 23,
    "no_ppb": 24,
    "no_ugm3": 19843,
}


def conditional_avg(
    parameter_id: Column, value: Column, pid: int, scale: int = 2, transform=None
) -> Column:
    """A2/A3 building block: ``ROUND(AVG(CASE WHEN parameter_id = k
    THEN f(value) END), scale)`` — Catalyst partial-aggregates this
    map-side, so the pivot costs one shuffle total for all columns."""
    v = F.when(parameter_id == pid, transform(value) if transform else value)
    return F.round(F.avg(v), scale)


def dim_locations(sensors_enriched: DataFrame) -> DataFrame:
    """SCD Type-1 current-location dimension (W2, P6).

    Latest snapshot per location_id by logical_date; the reference's
    tie among same-day sensor rows is harmless (all project identical
    location attributes), so output is deterministic.
    """
    from openaq_data_pipeline_spark.operators.staging import latest_per_key

    latest = latest_per_key(
        sensors_enriched.filter(F.col("location_id").isNotNull()),
        "location_id",
        order_col="logical_date",
    )
    return latest.select(
        "location_id",
        "location_name",
        "country_code",
        "country_name",
        "latitude",
        "longitude",
    ).withColumn("last_updated_utc", F.current_timestamp())


def _joined_hourly(
    valid_measurements: DataFrame,
    sensors_enriched: DataFrame,
    broadcast_sensors: bool = True,
) -> DataFrame:
    """J2 + F7: denormalize measurements with geography and snap
    timestamps to the hour. INNER join on sensor_id alone — fans out
    one measurement per snapshot day of its sensor (reference
    semantics, SURVEY §2.3); the AVG below re-collapses it."""
    s = sensors_enriched.select(
        "sensor_id",
        "location_id",
        "location_name",
        "country_code",
        "latitude",
        "longitude",
    )
    if broadcast_sensors:
        s = F.broadcast(s)
    m = valid_measurements.select(
        "sensor_id",
        "parameter_id",
        "measurement_value",
        hour_bucket(F.col("measured_from_utc")).alias("measurement_hour_utc"),
    )
    return m.join(s, on="sensor_id", how="inner")


_GROUP_COLS = [
    "location_id",
    "location_name",
    "country_code",
    "latitude",
    "longitude",
    "measurement_hour_utc",
]


def _calendar_cols() -> list[Column]:
    """F8: BI calendar columns from the hourly boundary."""
    h = F.col("measurement_hour_utc")
    return [
        F.to_date(h).alias("date_utc"),
        F.year(h).cast("long").alias("year_utc"),
        F.month(h).cast("long").alias("month_utc"),
        F.dayofmonth(h).cast("long").alias("day_utc"),
        F.hour(h).cast("long").alias("hour_utc"),
    ]


def _key_col() -> Column:
    return surrogate_key(
        F.col("location_id").cast("string"),
        F.date_format(F.col("measurement_hour_utc"), "yyyy-MM-dd HH:mm:ss"),
    )


def mart_location_air_quality(
    valid_measurements: DataFrame,
    sensors_enriched: DataFrame,
    broadcast_sensors: bool = True,
) -> DataFrame:
    """Wide hourly air-quality fact (14 pollutant columns)."""
    joined = _joined_hourly(valid_measurements, sensors_enriched, broadcast_sensors)
    aggs = [
        conditional_avg(F.col("parameter_id"), F.col("measurement_value"), pid).alias(name)
        for name, pid in AIR_QUALITY_PIVOT.items()
    ]
    grouped = joined.groupBy(*_GROUP_COLS).agg(*aggs)
    return grouped.select(
        _key_col().alias("air_quality_record_id"),
        *_GROUP_COLS,
        *_calendar_cols(),
        *AIR_QUALITY_PIVOT.keys(),
    )


def mart_location_weather(
    valid_measurements: DataFrame,
    sensors_enriched: DataFrame,
    broadcast_sensors: bool = True,
) -> DataFrame:
    """Wide hourly weather fact; Fahrenheit derived inside the
    aggregate for bit-parity (``mart_location_weather.sql:71``)."""
    joined = _joined_hourly(valid_measurements, sensors_enriched, broadcast_sensors)
    pid, v = F.col("parameter_id"), F.col("measurement_value")
    grouped = joined.groupBy(*_GROUP_COLS).agg(
        conditional_avg(pid, v, 100).alias("temp_celsius"),
        conditional_avg(pid, v, 100, transform=celsius_to_fahrenheit).alias(
            "temp_fahrenheit"
        ),
        conditional_avg(pid, v, 98).alias("humidity_pct"),
        conditional_avg(pid, v, 34).alias("wind_speed_ms"),
        conditional_avg(pid, v, 22, scale=0).alias("wind_direction_deg"),
    )
    return grouped.select(
        _key_col().alias("weather_record_id"),
        *_GROUP_COLS,
        *_calendar_cols(),
        "temp_celsius",
        "temp_fahrenheit",
        "humidity_pct",
        "wind_speed_ms",
        "wind_direction_deg",
    )
