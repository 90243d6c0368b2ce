"""One-pass table profiling — the `ANALYZE`-style column statistics a
lake operator reads before trusting a new feed: row count, null
counts, approximate distinct counts, min/max, numeric moments and
string lengths for every profiled column, computed in ONE aggregation
pass over the data.

Why one pass matters at 100 TB: the naive profiler loops columns and
scans once per column — a 200-column bronze table becomes 200 full
scans. Here every statistic is an expression in a single ``agg`` (all
partial-aggregable, so the map side collapses each task to one row),
the scan is column-pruned to exactly the profiled columns, and the
driver reshapes the ONE result row into per-column rows — driver work
bounded by column count, never data.

Scope notes: complex-typed columns (array/map/struct/binary) get null
counts only — min/max/distinct are either undefined or meaningless
for them; approximate distinct is HLL++ (`approx_count_distinct`,
default ~2.3% rsd). The profile is a DataFrame so it can be persisted
beside the lake and diffed across feeds (schema-drift triage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
)

_NUMERIC = (ByteType, ShortType, IntegerType, LongType,
            FloatType, DoubleType, DecimalType)

PROFILE_SCHEMA = (
    "column string, dtype string, n_rows long, n_nulls long, "
    "distinct_est long, min_value string, max_value string, "
    "mean double, stddev double, avg_len double"
)


def _is_atomic(dt) -> bool:
    s = dt.simpleString()
    return not (
        s.startswith(("array", "map", "struct")) or s == "binary"
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, distinct_est, min_value,
    max_value, mean, stddev, avg_len) — one row per profiled column,
    from ONE aggregation pass. min/max come back as strings so every
    column type fits one result schema; mean/stddev fill for numeric
    columns, avg_len for strings, NULL elsewhere."""
    spark = df.sparkSession
    cols = columns or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"profile_table: unknown columns {unknown}")

    exprs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = fields[c]
        exprs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c} nulls")
        )
        if _is_atomic(dt):
            exprs.append(
                F.approx_count_distinct(c).alias(f"{c} dist")
            )
            exprs.append(F.min(c).cast("string").alias(f"{c} min"))
            exprs.append(F.max(c).cast("string").alias(f"{c} max"))
        if isinstance(dt, _NUMERIC):
            exprs.append(
                F.avg(F.col(c).cast("double")).alias(f"{c} mean")
            )
            exprs.append(
                F.stddev(F.col(c).cast("double")).alias(f"{c} std")
            )
        if isinstance(dt, StringType):
            exprs.append(
                F.avg(F.length(c).cast("double")).alias(f"{c} len")
            )
    row = df.agg(*exprs).collect()[0].asDict()

    n = int(row["__n"])
    out = []
    for c in cols:
        get = lambda k: row.get(f"{c} {k}")
        dist = get("dist")
        out.append((
            c,
            fields[c].simpleString(),
            n,
            int(get("nulls") or 0),
            int(dist) if dist is not None else None,
            get("min"),
            get("max"),
            float(get("mean")) if get("mean") is not None else None,
            float(get("std")) if get("std") is not None else None,
            float(get("len")) if get("len") is not None else None,
        ))
    return spark.createDataFrame(out, PROFILE_SCHEMA)


def profile_drift(before: DataFrame, after: DataFrame) -> DataFrame:
    """Join two persisted profiles of the same table across feeds:
    (column, dtype_before, dtype_after, null_frac_before,
    null_frac_after, distinct_before, distinct_after, dtype_changed,
    null_spike) — the feed-triage diff: a column whose type flipped or
    whose null fraction jumped ≥ 10 points is where a silently broken
    upstream usually shows first. FULL outer join, so added and
    dropped columns surface as NULL-sided rows."""
    b = before.select(
        "column",
        F.col("dtype").alias("dtype_before"),
        (F.col("n_nulls") / F.greatest(F.col("n_rows"), F.lit(1)))
        .alias("null_frac_before"),
        F.col("distinct_est").alias("distinct_before"),
    )
    a = after.select(
        "column",
        F.col("dtype").alias("dtype_after"),
        (F.col("n_nulls") / F.greatest(F.col("n_rows"), F.lit(1)))
        .alias("null_frac_after"),
        F.col("distinct_est").alias("distinct_after"),
    )
    j = b.join(a, "column", "full_outer")
    return j.select(
        "*",
        (
            F.col("dtype_before").isNull()
            | F.col("dtype_after").isNull()
            | (F.col("dtype_before") != F.col("dtype_after"))
        ).alias("dtype_changed"),
        (
            F.coalesce(F.col("null_frac_after"), F.lit(1.0))
            - F.coalesce(F.col("null_frac_before"), F.lit(0.0))
            >= 0.10
        ).alias("null_spike"),
    )
