"""Temporal-join queries over the events table: backward as-of join
(purchases ← latest prior signup state per user) and point-in-
interval range join (clicks within 2-hour post-signup sessions).
Neither join kind exists in the reference (SURVEY §2.3 notes their
absence) or as a Spark primitive; operators/temporal.py composes them
from shuffles Catalyst can optimize. Oracles use DuckDB's native
ASOF LEFT JOIN and inequality-join support — the Spark plans must
reproduce those semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.catalog import (
    TS_FMT_DUCK,
    TS_FMT_SPARK,
    load,
    register,
    register_rotated,
    ts_str,
)
from openaq_data_pipeline_spark.operators.temporal import asof_join, range_join_binned


@register_rotated(
    "asof_state_join",
    "EXT-temporal — backward as-of LEFT join: each purchase event "
    "picks up the latest signup state at-or-before its timestamp per "
    "user (union + LOCF window, one shuffle; no join operator)",
    oracle=f"""
WITH states AS (
    SELECT user_id, ts, max(value) AS state_value
    FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
),
purchases AS (
    SELECT event_id, user_id, ts, value FROM events
    WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
       p.value AS purchase_value,
       strftime(s.ts, '{TS_FMT_DUCK}') AS state_ts,
       s.state_value
FROM purchases p ASOF LEFT JOIN states s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
)
def asof_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")["events"]
    states = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, states, ["user_id"], left_ts="ts", right_ts="ts",
        right_prefix="state_",
    )
    return out.select(
        "event_id",
        "user_id",
        ts_str(F.col("ts"), TS_FMT_SPARK).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        ts_str(F.col("state_ts"), TS_FMT_SPARK).alias("state_ts"),
        "state_value",
    )


@register_rotated(
    "range_join_sessions",
    "EXT-temporal [rotated r5 after green r3+r4; temporal family stays driver-verified via asof_state_join] — point-in-interval range join: clicks landing in "
    "[signup, signup+2h) per user, executed as a (key, hour-bin) "
    "equi-join + exact refinement — never a cross join",
    oracle=f"""
WITH intervals AS (
    SELECT event_id AS interval_id, user_id, ts AS start_ts,
           ts + INTERVAL 2 HOUR AS end_ts
    FROM events WHERE event_type = 'signup'
),
clicks AS (
    SELECT event_id AS click_id, user_id, ts AS click_ts FROM events
    WHERE event_type = 'click'
)
SELECT i.interval_id, c.click_id, c.user_id,
       strftime(c.click_ts, '{TS_FMT_DUCK}') AS click_ts
FROM clicks c JOIN intervals i
  ON c.user_id = i.user_id
 AND c.click_ts >= i.start_ts AND c.click_ts < i.end_ts
""",
)
def range_join_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")["events"]
    intervals = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    out = range_join_binned(
        clicks, intervals, ["user_id"], "click_ts", "start_ts", "end_ts",
        bin_seconds=3600,
    )
    return out.select(
        "interval_id",
        "click_id",
        "user_id",
        ts_str(F.col("click_ts"), TS_FMT_SPARK).alias("click_ts"),
    )
