"""Lake-format readers/writers (NDJSON + CSV), Spark-native.

Operator parity (SURVEY §2.1):

- S5 NDJSON scan — the reference streams lines with ``json.loads``
  per line, *skipping blank/corrupt lines* (``extract_measurements
  .py:28-63``). Spark: ``spark.read.schema(s).json`` in PERMISSIVE
  mode with a corrupt-record column; callers drop corrupt rows to
  reproduce the skip, keeping the scan distributed and vectorized.
- S2 CSV scan — control CSV with header, ``id`` column fallback to
  first column (``extract_openaq_locations.py:29-34,88-90``).
- S6/S7 sinks — chunked NDJSON / CSV writers
  (``gcs_utils.py:47-77``). Chunking (1000-2000 rows/file) exists in
  the reference to bound memory in a single Python process; the Spark
  equivalent is simply partitioned writes — file count follows
  partitioning, and the per-row "own filename" audit column is
  recovered at read time with ``input_file_name()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_ndjson(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema'd NDJSON scan with reference skip semantics (S5).

    Unknown payload fields are ignored (declared schema wins =
    ``ignore_unknown_values=True``). Malformed lines are dropped at
    scan time via DROPMALFORMED — the distributed equivalent of the
    reference's per-line ``json.loads``-and-skip, with no corrupt
    column materialized (a PERMISSIVE read filtered on the corrupt
    column alone is disallowed by Spark for count-style queries and
    would force a cache at scale). ``keep_corrupt=True`` switches to
    PERMISSIVE with a ``_corrupt_record`` column for inspection
    pipelines; callers must project at least one data column next to
    it.
    """
    if keep_corrupt:
        schema_with_corrupt = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        return (
            spark.read.schema(schema_with_corrupt)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def read_ndjson_variant(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Variant-typed NDJSON scan — SURVEY §1.2's maximal-drift regime
    for the reference's semi-structured ``JSON`` bronze column
    (``dags/01_openaq_ingestion.py:135,194``; drift rationale
    ``README.md:61``).

    No payload schema is declared at all: each line parses into ONE
    Spark 4 ``VariantType`` column that preserves unknown and drifted
    fields byte-for-byte (a declared ``StructType`` silently drops
    them). Typed extraction happens lazily per query via
    ``try_variant_get(data, '$.path', type)`` — null on missing path
    or uncastable value, matching BigQuery ``JSON_VALUE`` + SAFE_CAST.
    Malformed and blank lines yield NULL variants and are dropped —
    the reference's per-line skip (``extract_measurements.py:51-59``).

    Scale: variant uses a binary columnar encoding with shredded
    field access, so ``variant_get`` projections prune like struct
    fields instead of re-parsing JSON text per row."""
    lines = spark.read.text(path)
    return (
        lines.select(F.try_parse_json(F.col("value")).alias("data"))
        .filter(F.col("data").isNotNull())
    )


def read_control_csv(spark: SparkSession, path: str) -> DataFrame:
    """Control-requests CSV (S2/S8): header + autodetected types.

    Returns the frame plus a ``control_id`` column = the ``id``
    column if present, else the first column
    (``extract_openaq_locations.py:29-34``).
    """
    df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    key = "id" if "id" in df.columns else df.columns[0]
    return df.withColumn("control_id", F.col(key).cast("long"))


def write_ndjson(df: DataFrame, path: str, rows_per_file: int | None = None) -> None:
    """NDJSON sink (S6). ``rows_per_file`` maps the reference's
    chunk_size (1000/2000) onto Spark's maxRecordsPerFile."""
    writer = df.write.mode("overwrite")
    if rows_per_file:
        writer = writer.option("maxRecordsPerFile", rows_per_file)
    writer.json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink with header (S7)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def read_orc(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """ORC scan — the columnar interchange format warehouses that
    predate parquet-everywhere still hand over (Hive/Trino exports).
    Native Spark reader: predicate pushdown, column pruning and
    vectorized decode all apply exactly as for parquet, so a
    downstream plan is format-agnostic."""
    paths = path if isinstance(path, list) else [path]
    return spark.read.orc(*paths)


def write_orc(
    df: DataFrame, path: str, rows_per_file: int | None = None
) -> None:
    """ORC sink, mirroring :func:`write_ndjson`'s chunking contract
    (maxRecordsPerFile maps the reference's chunk_size)."""
    writer = df.write.mode("overwrite")
    if rows_per_file:
        writer = writer.option("maxRecordsPerFile", rows_per_file)
    writer.orc(path)
