"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in
``openaq_data_pipeline_spark.catalog`` (QueryDef registry); this
module just adapts the registry to the driver's dict-based surface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from openaq_data_pipeline_spark.catalog import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the engine's restatement of the reference's
    hourly pivot mart (mart_location_air_quality.sql) on the events
    table: validity-filter → hour-truncate → conditional-AVG pivot →
    calendar + MD5 record key.
    """
    from openaq_data_pipeline_spark.queries_core import mart_hourly_activity

    return mart_hourly_activity(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {q.name: q.build for q in registry()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries →
    driver records a rows-only check)."""
    return {q.name: q.oracle for q in registry() if q.oracle is not None}
