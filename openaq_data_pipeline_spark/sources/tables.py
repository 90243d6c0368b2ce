"""Bucketed warehouse tables: shuffle-free co-located joins.

The reference clusters its BigQuery tables on join/filter keys
(``dags/01:191``, ``mart_*.sql:9``) — a bytes-scanned optimization.
Spark's stronger analogue is *bucketing*: hash-partition rows into a
fixed bucket count on the join key at write time, so a join between
two tables bucketed on the same key by the same count needs **no
exchange at all** — each task zips matching buckets. At 100 TB this
removes the single largest cost of a fact-fact join (the full-table
shuffle); the price is paid once at load time.

Use for: repeatedly-joined fact pairs (orders ⋈ lineitem shapes),
fact ⋈ big-dim joins too large to broadcast. Don't use for: dims
small enough to broadcast (broadcast wins), or one-off joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed parquet
    table. Sorting within buckets additionally removes the join-time
    sort of a sort-merge join (plan shows neither Exchange nor Sort).
    ``path`` makes it an EXTERNAL bucketed table at that location
    (for callers that must control where the files live, e.g. a
    tempdir-scoped dedup index)."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    # co-partition the write with the bucket spec: without this every
    # input task writes a file per bucket it touches (partitions ×
    # n_buckets small files — measured 3.4 s vs 0.9 s for the dedup
    # index at sf0.1, and a small-files explosion at 100 TB); both
    # repartition and bucketBy hash with Murmur3 pmod n, so each task
    # lands exactly one bucket and writes exactly one file per batch
    df = df.repartition(n_buckets, *keys)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
