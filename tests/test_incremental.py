"""Incremental MERGE materialization semantics (S12/P7) on the
fixture pipeline: first-run full write, day-2 merge equals full
refresh, strictly-late rows silently dropped (reference parity,
SURVEY §2.9), boundary-hour rows updated in place, idempotent
re-runs, and untouched partitions never rewritten."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.incremental import (
    AIR_QUALITY_TABLE_SPEC,
    IncrementalTable,
    high_watermark,
    incremental_mart,
)
from openaq_data_pipeline_spark.operators.marts import mart_location_air_quality


def snap(df):
    """Order-insensitive value snapshot keyed on the record id."""
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.fixture()
def setup(spark, pipeline, tmp_path):
    models = pipeline["models"]
    valid = models["int_valid_measurements"]
    enriched = models["int_sensors_enriched"]
    table = IncrementalTable(path=str(tmp_path / "mart_aq"), **AIR_QUALITY_TABLE_SPEC)
    day1 = valid.filter(F.col("logical_date") == "2026-01-02")
    return models, valid, enriched, table, day1


def run(spark, table, src, enriched):
    return incremental_mart(
        spark, mart_location_air_quality, src, enriched, table
    )


class TestIncrementalMart:
    def test_two_runs_equal_full_refresh(self, spark, setup):
        _, valid, enriched, table, day1 = setup
        run(spark, table, day1, enriched)                      # first run: full write
        hwm = high_watermark(spark, table)
        assert str(hwm) == "2026-01-02 14:00:00"               # max surviving hour day1
        final = run(spark, table, valid, enriched)             # incremental day2
        full = mart_location_air_quality(valid, enriched)
        assert snap(final) == snap(full)

    def test_late_rows_silently_dropped(self, spark, setup):
        _, valid, enriched, table, day1 = setup
        run(spark, table, day1, enriched)
        # a late-arriving row in an hour strictly below the watermark:
        # pm25=1001 at 13:05 would explode the hour-13 average if merged
        late = day1.limit(1).select(
            *[
                F.lit(v).alias(c)
                for c, v in {
                    "measurement_id": "late-row-id",
                    "sensor_parameter_key": None,
                    "sensor_id": 11,
                    "parameter_id": 2,
                    "measurement_value": 1001.0,
                }.items()
            ],
            F.to_timestamp(F.lit("2026-01-02 13:05:00")).alias("measured_from_utc"),
            F.to_timestamp(F.lit("2026-01-02 13:05:00")).alias("measured_to_utc"),
            F.lit("01:00:00").alias("measurement_interval"),
            F.lit(False).alias("has_flags"),
            F.lit("r").alias("_audit_run_id"),
            F.to_date(F.lit("2026-01-03")).alias("logical_date"),
            F.to_timestamp(F.lit("2026-01-03 06:00:00")).alias("extracted_at"),
        )
        src2 = valid.unionByName(late.select(valid.columns))
        final = run(spark, table, src2, enriched)
        clean = mart_location_air_quality(valid, enriched)
        assert snap(final) == snap(clean)  # the late row left no trace

    def test_boundary_hour_updated_in_place(self, spark, setup):
        _, valid, enriched, table, day1 = setup
        run(spark, table, day1, enriched)
        # new 14:20 reading lands ON the watermark hour (>= 14:00) →
        # that hour's record is recomputed and MERGE-updated in place
        bump = day1.filter("sensor_id = 11 AND hour(measured_from_utc) = 14").select(
            F.lit("boundary-id").alias("measurement_id"),
            *[F.col(c) for c in day1.columns if c != "measurement_id"],
        ).withColumn("measurement_value", F.lit(100.0)).withColumn(
            "measured_from_utc", F.to_timestamp(F.lit("2026-01-02 14:20:00"))
        )
        src2 = day1.unionByName(bump.select(day1.columns))
        final = run(spark, table, src2, enriched)
        expected = mart_location_air_quality(src2, enriched)
        assert snap(final) == snap(expected)
        # hour-14 pm25 avg moved from 12.0 to avg(12.0, 100.0) = 56.0
        vals = {r["pm25_ugm3"] for r in final.filter("hour_utc = 14").collect()}
        assert 56.0 in vals and 12.0 not in vals

    def test_idempotent_rerun(self, spark, setup):
        _, valid, enriched, table, _ = setup
        first = snap(run(spark, table, valid, enriched))
        again = snap(run(spark, table, valid, enriched))
        assert first == again

    def test_untouched_partitions_not_rewritten(self, spark, setup):
        _, valid, enriched, table, day1 = setup
        run(spark, table, day1, enriched)
        day1_dir = os.path.join(table.path, "_part_date=2026-01-02")
        files_before = set(os.listdir(day1_dir))
        # day-2-only slice: its partitions exclude 2026-01-02 *except*
        # the watermark-boundary hour (14:00 is on day 1) — so push the
        # slice fully past day 1 by feeding only day-2 measurements
        day2 = valid.filter(F.col("logical_date") == "2026-01-03")
        run(spark, table, day2, enriched)
        files_after = set(os.listdir(day1_dir))
        assert files_before == files_after  # dynamic overwrite never touched day 1
