"""Temporal join operators Spark lacks as primitives: backward as-of
join and point-in-interval range join. The reference declares neither
(SURVEY §2.3 "absent join kinds") — these extend the engine for
time-series sensor workloads per the 100 TB north star, composed from
built-in DataFrame ops so Catalyst keeps optimizing them (no UDFs).

Scale design:
- **as-of join** — implemented as union + last-observation-carried-
  forward window, NOT as a join: both inputs shuffle ONCE on the key,
  the per-key sort interleaves state and probe rows by time, and
  `last(ignorenulls)` carries the newest state forward. A sort-merge
  join would pay the same single shuffle but then needs an unbounded
  range condition that Spark executes as a broadcast-nested-loop or
  per-row scan; the LOCF window is linear in partition size. Hot keys:
  window partitions are not AQE-splittable — for pathological keys,
  range-partition by (key, time-bucket) and re-seed each bucket with
  the previous bucket's final state (documented production variant;
  not needed at declared-key cardinalities here).
- **range join** — the naive expression is a cross join + filter,
  O(|points|·|intervals|) — unrunnable at scale. Binning makes it an
  equi-join: each interval is exploded to the fixed-width time bins it
  covers, each point maps to exactly one bin, and (key, bin) equality
  prunes candidates to co-located bins before the exact [start, end)
  refinement predicate runs. Interval fan-out = ⌈len/bin⌉ + 1 rows —
  pick bin_seconds ≈ median interval length so the blow-up stays ~2×.
  Each point carries one bin, so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "right_",
) -> DataFrame:
    """Backward as-of LEFT join: for every left row, attach the right
    row with the greatest ``right_ts`` <= ``left_ts`` for the same
    key (DuckDB ``ASOF LEFT JOIN ... ON l.ts >= r.ts`` semantics —
    equal timestamps DO match). Left rows with no prior right row get
    NULLs.

    Requires ``right`` to be unique per (key, right_ts) — pre-
    aggregate if not, or the carried state is nondeterministic.
    Output: all left columns, plus every non-key right column
    (including ``right_ts``) renamed with ``right_prefix``.
    """
    rpayload = [c for c in right.columns if c not in key_cols]
    lpayload = [c for c in left.columns if c not in key_cols]
    if not rpayload:
        return left
    # the whole right payload is carried as ONE struct so every output
    # column comes from the SAME matched row: per-column LOCF would
    # backfill a NULL field of the matched row from an older row,
    # fabricating a composite that never existed (ASOF returns the
    # matched row's NULLs as-is). The struct itself is non-null for
    # every state row — even one whose fields are all NULL — so
    # last(ignorenulls) skips probe rows only.
    r_struct_type = (
        "struct<"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in rpayload
        )
        + ">"
    )
    l2 = left.select(
        *key_cols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__probe"),
        *[F.col(c) for c in lpayload],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r2 = right.select(
        *key_cols,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__probe"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpayload],
        F.struct(*[F.col(c).alias(c) for c in rpayload]).alias("__r"),
    )
    # state rows sort before probes at equal __t (__probe 0 < 1), so a
    # same-timestamp state is visible to the probe — the >= contract
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__t", "__probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l2.unionByName(r2).select(
        *key_cols,
        "__probe",
        *[F.col(c) for c in lpayload],
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    return filled.filter(F.col("__probe") == 1).select(
        *key_cols,
        *[F.col(c) for c in lpayload],
        *[F.col(f"__r.{c}").alias(f"{right_prefix}{c}") for c in rpayload],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int,
) -> DataFrame:
    """Point-in-interval INNER join: rows where
    ``start_ts <= point_ts < end_ts`` on matching keys, executed as a
    (key, time-bin) equi-join + exact refinement instead of a cross
    join (module docstring). Column names of the two inputs must be
    disjoint apart from ``key_cols``; output carries all columns of
    both (key once)."""
    sec = F.lit(bin_seconds)
    p2 = points.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(point_ts)) / sec)
    )
    i2 = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts)) / sec),
                F.floor(F.unix_timestamp(F.col(end_ts)) / sec),
            )
        ),
    )
    return (
        p2.join(i2, [*key_cols, "__bin"])
        .filter(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("__bin")
    )
