"""Global contiguous id assignment at scale — the two-phase
partition-offset pattern, not a single-partition window.

A training-data export wants stable, contiguous 0..n-1 sample ids in
a defined order (shard offsets, curriculum order, resumable loaders).
The naive ``row_number() OVER (ORDER BY key)`` collapses the whole
corpus into ONE task — the canonical 100 TB scale-killer. The classic
distributed answer (RDD ``zipWithIndex``, re-expressed for
DataFrames):

1. range-repartition + sort on the order key and MATERIALIZE once
   (``localCheckpoint``) — range partition i holds strictly smaller
   keys than partition i+1, so partition order IS key order;
2. count rows per partition (one tiny aggregate: n_partitions rows)
   and prefix-sum the counts into per-partition offsets — the only
   driver-scale state, and it never leaves the JVM as data;
3. number rows WITHIN each partition with a stateful
   ``mapInPandas`` pass — per-partition imperative logic is the one
   place the Arrow path is the right tool (the alternative, a window
   partitioned by ``spark_partition_id()``, would re-shuffle the
   corpus a second time because the optimizer cannot see that the
   data is already clustered by pid);
4. broadcast-join the offsets and add.

Total cost: ONE range exchange (what any globally-sorted write pays)
+ two reads of the materialized partitions. Ids are deterministic iff
the order key is unique — the caller supplies a tiebreak column
otherwise, exactly like every rank window in the catalog
(catalog.py determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PID = "__gid_pid"
_LOCAL = "__gid_local"


def assign_global_ids(
    df: DataFrame,
    order_col: str,
    id_name: str = "global_id",
    start: int = 0,
    n_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus a contiguous BIGINT ``id_name`` column numbering
    rows ``start..start+n-1`` in ascending ``order_col`` order.
    ``order_col`` must be unique for a deterministic result (pass a
    composite/surrogate key if not). ``n_partitions`` defaults to the
    session's shuffle parallelism."""
    if id_name in df.columns:
        raise ValueError(f"column {id_name!r} already exists")
    spark = df.sparkSession
    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .localCheckpoint(eager=False)
    )
    pid_df = part.withColumn(_PID, F.spark_partition_id())
    counts = pid_df.groupBy(_PID).agg(F.count("*").alias("__cnt"))
    # n_partitions rows: the prefix sum runs in one (tiny) task
    from pyspark.sql import Window

    w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID, F.coalesce(F.sum("__cnt").over(w), F.lit(0)).alias("__off")
    )

    from pyspark.sql.types import LongType, StructField, StructType

    # copy — StructType.add mutates in place, corrupting pid_df's
    # cached schema
    out_schema = StructType(
        list(pid_df.schema.fields) + [StructField(_LOCAL, LongType())]
    )

    def number_partition(batches):
        pos = 0
        for pdf in batches:
            pdf[_LOCAL] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf

    numbered = pid_df.mapInPandas(number_partition, schema=out_schema)
    return numbered.join(F.broadcast(offsets), _PID).select(
        *df.columns,
        (F.lit(start) + F.col("__off") + F.col(_LOCAL))
        .cast("long")
        .alias(id_name),
    )


def assign_global_cumsum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    name: str = "cum_weight",
    n_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus an INCLUSIVE global running sum of ``weight_col``
    in ascending ``order_col`` order — same two-phase shape as
    :func:`assign_global_ids` (a single-partition
    ``sum() OVER (ORDER BY ...)`` window is the same 100 TB killer
    as the row-number version): range-repartition + materialize,
    per-partition weight totals prefix-summed into offsets
    (n_partitions driver-scale rows), per-partition running sum via
    one stateful ``mapInPandas`` pass, broadcast offsets back on.
    Deterministic iff ``order_col`` is unique; weights must be
    integral for the exact-arithmetic consumers downstream
    (``pps_systematic_sample``)."""
    if name in df.columns:
        raise ValueError(f"column {name!r} already exists")
    spark = df.sparkSession
    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .localCheckpoint(eager=False)
    )
    pid_df = part.withColumn(_PID, F.spark_partition_id())
    totals = pid_df.groupBy(_PID).agg(F.sum(weight_col).alias("__wsum"))
    from pyspark.sql import Window

    w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID, F.coalesce(F.sum("__wsum").over(w), F.lit(0)).alias("__woff")
    )

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(pid_df.schema.fields) + [StructField(_LOCAL, LongType())]
    )

    def cumsum_partition(batches):
        run = 0
        for pdf in batches:
            c = pdf[weight_col].cumsum() + run
            pdf[_LOCAL] = c.astype("int64")
            if len(c):
                run = int(c.iloc[-1])
            yield pdf

    summed = pid_df.mapInPandas(cumsum_partition, schema=out_schema)
    return summed.join(F.broadcast(offsets), _PID).select(
        *df.columns,
        (F.col("__woff") + F.col(_LOCAL)).cast("long").alias(name),
    )
