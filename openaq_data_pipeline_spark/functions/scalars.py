"""Scalar column expressions shared across the medallion layers.

Each maps 1:1 to a scalar-function cluster in SURVEY §2.8; all stay
inside Catalyst (built-in functions only) so they vectorize and
codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def display_name(locality: Column, city: Column, timezone: Column) -> Column:
    """NULL-safe fallback chain for a location's display name (P3/F4-F6).

    Reference: ``stg_openaq__locations.sql:20-24`` —
    ``COALESCE(locality, city, REPLACE(SPLIT(tz,'/')[SAFE_OFFSET(1)],'_',' '))``.
    ``getItem(1)`` past the end of the split yields NULL, matching
    BigQuery's SAFE_OFFSET.
    """
    tz_city = F.regexp_replace(F.split(timezone, "/").getItem(1), "_", " ")
    return F.coalesce(locality, city, tz_city)


def celsius_to_fahrenheit(c: Column) -> Column:
    """Unit conversion applied *inside* the aggregate for bit-parity
    with the reference (``mart_location_weather.sql:71``): (v*9/5)+32."""
    return c * 9 / 5 + 32


def hour_bucket(ts: Column) -> Column:
    """Hourly tumbling bucket (F7): ``TIMESTAMP_TRUNC(ts, HOUR)``
    (``mart_location_air_quality.sql:38``) → ``date_trunc('hour')``."""
    return F.date_trunc("hour", ts)
