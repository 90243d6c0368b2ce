"""Structured Streaming variant of the transform pipeline."""

from openaq_data_pipeline_spark.streaming.pipeline import (  # noqa: F401
    stream_mart_air_quality,
    stream_mart_weather,
    stream_raw_measurements,
    stream_stg_measurements,
    write_stream_append,
    write_stream_merge,
)
from openaq_data_pipeline_spark.streaming.stateful import (  # noqa: F401
    sensor_late_arrival_audit,
)
