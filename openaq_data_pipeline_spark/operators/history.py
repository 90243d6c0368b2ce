"""History / slowly-changing-state operators: SCD-2 interval builder,
CDC changelog apply, and time-series gap-fill. The reference keeps
only latest-state dims (SCD-1 via `ROW_NUMBER() = 1`, reference
`dbt/models/marts/dim_locations.sql`) and full-snapshot reloads — it
has no validity-interval history, no tombstone handling, and no grid
densification. These extend the engine for the warehouse-history and
sensor-timeline workloads a 100 TB deployment needs.

Scale design:
- **SCD-2 builder** — one shuffle on the business key; change
  detection (lag), interval close (lead) and the current-flag all run
  inside the SAME window partitioning, so Catalyst plans a single
  Exchange and the post-filter windows reuse its sort. No join, no
  second pass over the input.
- **CDC apply** — latest-record-per-key is the same W1 dedup shape as
  `staging.latest_per_key` (one shuffle, one window, rank=1 filter);
  tombstones are dropped AFTER ranking so a delete correctly erases
  earlier upserts instead of resurrecting them.
- **gap-fill** — the dense grid is generated per key from its own
  [min, max] bounds with `sequence()` + explode: grid size =
  Σ_key span/step, never keys × global-span. The observed series
  left-joins the grid on (key, bucket) — with per-key grids this is
  a broadcast-sized build only when keys are few; at high key
  cardinality both sides shuffle once on (key, bucket). LOCF and
  linear interpolation are windows over the SAME (key, bucket)
  partitioning. Pick the step so per-key grid rows stay bounded;
  gap-filling is inherently O(span/step) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_observations(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse an observation log (one row per key per observation
    time, attrs = the observed state) into SCD-2 validity intervals:
    one row per (key, state run) with ``valid_from`` / ``valid_to``
    half-open bounds and ``is_current``.

    A row opens a new interval iff it is the key's first observation
    or ANY attribute differs null-safely from the previous
    observation. ``valid_to`` is the next interval's ``valid_from``
    (NULL on the current interval). Ordering inside a key is
    (ts, *tiebreak_cols) — pass a unique tiebreak for deterministic
    output when timestamps can tie.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.lag(F.col(ts_col)).over(w).isNull()
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    kept = df.withColumn("__new_run", changed).filter(F.col("__new_run"))
    # same partitioning + prefix ordering as w: Catalyst reuses the
    # exchange/sort, so the interval close costs no extra shuffle
    valid_to = F.lead(F.col(ts_col)).over(w)
    return kept.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


def cdc_latest_snapshot(
    changelog: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str,
    delete_op: str = "D",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Apply an insert/update/delete changelog to produce the current
    snapshot: the newest record per key wins; keys whose newest record
    is a tombstone (``op_col == delete_op``) are absent from the
    output. Tombstones are ranked WITH the upserts (not pre-filtered)
    so `I@t1, D@t2` yields no row while `D@t1, I@t2` yields one —
    standard CDC materialization semantics (cf. Debezium/Delta CDF
    compaction). Output drops the op column.
    """
    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != F.lit(delete_op)))
        .drop("__rn", op_col)
    )


def gap_fill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    interpolate: bool = False,
) -> DataFrame:
    """Densify a per-key time series onto a fixed ``step_seconds``
    grid spanning each key's own [min, max] observation range, and
    fill gaps with last-observation-carried-forward (plus optional
    linear interpolation).

    Input may hold many observations per bucket: they aggregate with
    MAX (order-independent, exact over doubles — an average here
    would be fp-order-nondeterministic across engines). Output: one
    row per (key, bucket) with
      ``bucket_ts`` — grid timestamp,
      ``value``    — observed MAX in the bucket, NULL on gaps,
      ``is_gap``   — no observation in this bucket,
      ``value_locf`` — LOCF fill,
      ``value_interp`` (interpolate=True) — linear fill between the
        previous and next observed buckets; endpoints fall back to
        LOCF. Same IEEE double ops in any engine: identical inputs →
        identical bits.
    """
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds)
              * step_seconds).cast("long")
    observed = (
        df.select(*key_cols, bucket.alias("__b"), F.col(value_col))
        .groupBy(*key_cols, "__b")
        .agg(F.max(value_col).alias("value"))
    )
    grid = (
        df.groupBy(*key_cols)
        .agg(F.min(bucket).alias("__lo"), F.max(bucket).alias("__hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_seconds))
            ).alias("__b"),
        )
    )
    j = grid.join(observed, [*key_cols, "__b"], "left")
    w = Window.partitionBy(*key_cols).orderBy("__b")
    locf = F.last("value", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    out = j.select(
        *key_cols,
        F.timestamp_seconds(F.col("__b")).alias("bucket_ts"),
        F.col("__b").alias("__bucket"),
        "value",
        F.col("value").isNull().alias("is_gap"),
        locf.alias("value_locf"),
    )
    if not interpolate:
        return out.drop("__bucket")
    wp = Window.partitionBy(*key_cols).orderBy("__bucket")
    prev_b = F.last(F.when(~F.col("is_gap"), F.col("__bucket")), True).over(
        wp.rowsBetween(Window.unboundedPreceding, 0)
    )
    next_b = F.first(F.when(~F.col("is_gap"), F.col("__bucket")), True).over(
        wp.rowsBetween(0, Window.unboundedFollowing)
    )
    next_v = F.first(F.when(~F.col("is_gap"), F.col("value")), True).over(
        wp.rowsBetween(0, Window.unboundedFollowing)
    )
    frac = (F.col("__bucket") - prev_b).cast("double") / (
        (next_b - prev_b).cast("double")
    )
    interp = F.when(
        F.col("value").isNotNull(), F.col("value")
    ).when(
        prev_b.isNull() | next_b.isNull(), F.col("value_locf")
    ).otherwise(F.col("value_locf") + (next_v - F.col("value_locf")) * frac)
    return out.withColumn("value_interp", interp).drop("__bucket")
