"""Intermediate layer: validity filtering + geographic enrichment.

Parity targets:

- ``int_valid_measurements`` ⇔ ``models/intermediate/
  int_valid_measurements.sql:17-38`` — quality-flag filter (P4) and
  per-parameter physical-range predicate (P5).
- ``int_sensors_enriched``   ⇔ ``models/intermediate/
  int_sensors_enriched.sql:17-40`` — LEFT join of sensor snapshots to
  location snapshots on the composite (location_id, logical_date)
  key (J1), preserving the sensor×logical_date grain.

Null semantics (SURVEY §7.4.3): ``has_flags = FALSE`` is
null-rejecting in BigQuery — rows with NULL has_flags are dropped.
``F.col("has_flags") == False`` reproduces that exactly; do NOT
"fix" to ``!= True``.

Scale notes: the range predicate is a pure row-local CASE — it
vectorizes and pushes no shuffle. The enrichment join's right side is
a per-day location snapshot (small dimension); we broadcast it so the
sensor side never shuffles. At 100 TB the measurements fact never
appears here — it joins enriched sensors later (J2), also broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# parameter_id → (lo, hi) inclusive bounds; everything else: >= 0
# (int_valid_measurements.sql:23-35, FIXTURES.md §4)
PHYSICAL_RANGES: dict[int, tuple[float, float]] = {
    100: (-80.0, 60.0),  # temperature °C
    22: (0.0, 360.0),  # wind direction deg
    98: (0.0, 100.0),  # relative humidity %
}


def physical_validity(parameter_id: Column, value: Column) -> Column:
    """P5: CASE-based physical-feasibility predicate."""
    pred = None
    expr = None
    for pid, (lo, hi) in PHYSICAL_RANGES.items():
        cond = parameter_id == pid
        branch = value.between(lo, hi)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr.otherwise(value >= 0)


def int_valid_measurements(stg_measurements: DataFrame) -> DataFrame:
    """Quality-assured measurements (P4 + P5)."""
    return stg_measurements.filter(
        (F.col("has_flags") == False)  # noqa: E712 - null-rejecting, per reference
        & physical_validity(F.col("parameter_id"), F.col("measurement_value"))
    )


def int_sensors_enriched(
    stg_sensors: DataFrame, stg_locations: DataFrame, broadcast_locations: bool = True
) -> DataFrame:
    """J1: sensors ⟕ locations ON (location_id, logical_date).

    Grain stays sensor×logical_date (``intermediate.yml:5``) — this
    deliberately fans out the later measurement join across snapshot
    days (SURVEY §2.3 J2 note); the hourly AVG re-collapses it.

    Parity trap: the reference projects ``l.location_id`` — the
    *right* side of the LEFT join — so unmatched sensors carry NULL
    location_id (which ``dim_locations`` then filters on). A Spark
    USING-join would coalesce to the non-null left key; we therefore
    join on an explicit condition and project the right side.
    """
    s = stg_sensors.alias("s")
    locations = stg_locations.select(
        "location_id",
        "logical_date",
        "location_name",
        "country_code",
        "country_name",
        "latitude",
        "longitude",
    )
    if broadcast_locations:
        locations = F.broadcast(locations)
    l = locations.alias("l")  # noqa: E741
    return s.join(
        l,
        on=(F.col("s.location_id") == F.col("l.location_id"))
        & (F.col("s.logical_date") == F.col("l.logical_date")),
        how="left",
    ).select(
        F.col("s.sensor_record_id").alias("sensor_record_id"),
        F.col("s.sensor_id").alias("sensor_id"),
        F.col("s.parameter_id").alias("parameter_id"),
        F.col("s.parameter_name").alias("parameter_name"),
        F.col("s.unit").alias("unit"),
        F.col("s.logical_date").alias("logical_date"),
        F.col("l.location_id").alias("location_id"),
        F.col("l.location_name").alias("location_name"),
        F.col("l.country_code").alias("country_code"),
        F.col("l.country_name").alias("country_name"),
        F.col("l.latitude").alias("latitude"),
        F.col("l.longitude").alias("longitude"),
    )
