"""Bronze layer: date-partitioned Parquet with audit columns.

Parity targets (SURVEY §2.1 S8-S10, §1.4):

- day partitioning on ``_audit_logical_date``
  (``dags/01_openaq_ingestion.py:132,190``) → ``partitionBy`` on the
  same column; Catalyst prunes partitions for any query filtered on
  it, which is what makes incremental runs O(1 day) instead of
  O(history) at 100 TB.
- clustering ``[_audit_sensor_id,_audit_extracted_at]``
  (``dags/01:191``) → ``sortWithinPartitions`` before write: parquet
  row-group min/max stats on the sort keys give the same
  bytes-scanned reduction for sensor-ranged reads.
- append vs truncate (``dags/01:129`` vs ``dags/99:57-60``) →
  ``mode("append")`` daily, ``mode("overwrite")`` recovery.
- idempotent re-run of one logical date (delete-before-write,
  ``gcs_utils.py:26-44``) → dynamic partition overwrite replaces just
  the partitions present in the incoming frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openaq_data_pipeline_spark.sources.lake import read_ndjson

PARTITION_COL = "_audit_logical_date"


def write_bronze(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    cluster_by: list[str] | None = None,
) -> None:
    """Write a bronze table. ``mode='overwrite'`` with the session's
    dynamic partitionOverwriteMode replaces only incoming partitions
    (idempotent daily re-run); ``mode='append'`` is the plain daily
    accumulate; recovery uses static overwrite upstream."""
    out = df
    if cluster_by:
        out = out.sortWithinPartitions(*cluster_by)
    out.write.mode(mode).partitionBy(PARTITION_COL).parquet(path)


def load_bronze(
    spark: SparkSession,
    lake_glob: str | list[str],
    schema: T.StructType,
    bronze_path: str,
    audit_defaults: dict[str, object] | None = None,
    cluster_by: list[str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Lake NDJSON → bronze Parquet for one (or more) logical dates
    (S9). Returns the loaded row count — the reference branches its
    DAG on this count (``dags/01:104-117``, A6)."""
    df = read_ndjson(spark, lake_glob, schema)
    for col, default in (audit_defaults or {}).items():
        if col not in df.columns:
            df = df.withColumn(col, F.lit(default))
    # Stamp provenance the way the reference stamps each row with its
    # own lake filename (gcs_utils.py:62-64) — recovered on read.
    if "_audit_gcs_filename" in [f.name for f in schema.fields]:
        df = df.withColumn(
            "_audit_gcs_filename",
            F.coalesce(F.col("_audit_gcs_filename"), F.input_file_name()),
        )
    write_bronze(df, bronze_path, mode=mode, cluster_by=cluster_by)
    return spark.read.parquet(bronze_path).count() if mode == "overwrite" else df.count()


def read_bronze(
    spark: SparkSession,
    bronze_path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Schema-evolution-safe bronze read.

    Daily appends accumulate files written by *different* engine
    versions; when a release adds a payload/audit field, day-1 files
    lack the column day-2 files carry. A plain ``read.parquet`` infers
    from one file footer and silently drops (or crashes on) the
    others' extras — the reference never hits this because BigQuery
    holds one table schema and ``ignore_unknown_values`` absorbs
    drift (``dags/01_openaq_ingestion.py:131-141``). Equivalents here:

    - ``schema`` given → authoritative declared read: files missing a
      column yield NULLs, unknown file columns are ignored — exactly
      the fixed-declared regime (SURVEY §1.3.2).
    - ``schema=None`` → ``mergeSchema``: union of all file footers,
      the autodetect regime (§1.3.1). Costs one footer read per file;
      prefer the declared form on wide bronze at scale.
    """
    if schema is not None:
        return spark.read.schema(schema).parquet(bronze_path)
    return spark.read.option("mergeSchema", True).parquet(bronze_path)


def recover_bronze(
    spark: SparkSession,
    lake_glob: str,
    schema: T.StructType,
    bronze_path: str,
    cluster_by: list[str] | None = None,
) -> int:
    """Disaster recovery (S10, ``dags/99_recover_datalake_to_bq.py``):
    whole-lake glob, full truncate-and-reload."""
    df = read_ndjson(spark, lake_glob, schema)
    # static overwrite: truncate semantics regardless of session mode
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy(PARTITION_COL)
        .parquet(bronze_path)
    )
    return spark.read.parquet(bronze_path).count()
