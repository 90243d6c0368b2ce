"""Scalar helpers kept Catalyst-side (no Python UDFs).

These are the engine's equivalent of the reference's dbt/Jinja macro
surface (SURVEY §2.10): parameterized Python functions that *return
Column expressions*, so they compile into the same whole-stage-codegen
plan as hand-written SQL — zero serialization cost at any scale.
"""

from openaq_data_pipeline_spark.functions.keys import surrogate_key
from openaq_data_pipeline_spark.functions.scalars import (
    celsius_to_fahrenheit,
    display_name,
    hour_bucket,
)

__all__ = [
    "surrogate_key",
    "celsius_to_fahrenheit",
    "display_name",
    "hour_bucket",
]
