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

    def test_failed_merge_leaves_target_intact(self, spark, setup):
        """Crash DURING slice computation/materialization: merge_upsert
        localCheckpoints the merged slice eagerly BEFORE any write, so
        a failing incoming plan aborts the run with the target
        untouched — the dbt contract (a failed MERGE mutates nothing).
        Failure is injected with raise_error in the incoming plan."""
        _, valid, enriched, table, day1 = setup
        run(spark, table, day1, enriched)
        before = snap(spark.read.parquet(table.path))
        poisoned = valid.withColumn(
            "measurement_value",
            F.when(
                F.col("measurement_value").isNotNull(),
                F.expr(
                    "assert_true(measurement_value IS NULL, "
                    "'injected mid-merge failure')"
                ).cast("double"),
            ).otherwise(F.col("measurement_value")),
        )
        with pytest.raises(Exception, match="injected mid-merge"):
            run(spark, table, poisoned, enriched)
        assert snap(spark.read.parquet(table.path)) == before

    def test_torn_newest_partition_self_heals_on_rerun(self, spark, setup):
        """Crash-mid-commit torn state #1: the NEWEST day partition
        never landed (crash before its move). Because that partition
        holds the high watermark, its loss REGRESSES the watermark,
        so a plain re-run reselects the lost slice and converges —
        the self-healing case of the emulation's recovery contract
        (incremental.py module docstring)."""
        import shutil

        _, valid, enriched, table, day1 = setup
        run(spark, table, day1, enriched)
        expected = snap(run(spark, table, valid, enriched))
        newest = max(
            d for d in os.listdir(table.path) if d.startswith("_part_date=")
        )
        shutil.rmtree(os.path.join(table.path, newest))
        assert snap(spark.read.parquet(table.path).drop("_part_date")) != expected
        again = snap(run(spark, table, valid, enriched))
        assert again == expected

    def test_torn_older_partition_needs_full_refresh(self, spark, setup):
        """Crash-mid-commit torn state #2: the newest partition
        committed but an OLDER affected partition (boundary-hour
        update) reverted. The watermark now sits past the stale rows,
        so a plain re-run does NOT repair them — this is exactly what
        BigQuery's atomic MERGE rules out and the emulation cannot.
        The documented remedy, full_refresh=True (the reference's own
        disaster-recovery lever, S10), converges."""
        import shutil

        _, valid, enriched, table, day1 = setup
        run(spark, table, day1, enriched)
        oldest = min(
            d for d in os.listdir(table.path) if d.startswith("_part_date=")
        )
        stale_copy = table.path + "_stale"
        shutil.copytree(os.path.join(table.path, oldest), stale_copy)
        # day-2 source includes a boundary-hour bump, so the merge
        # genuinely rewrites the oldest partition (hour-14 avg 12→56)
        bump = day1.filter(
            "sensor_id = 11 AND hour(measured_from_utc) = 14"
        ).select(
            F.lit("boundary-id").alias("measurement_id"),
            *[F.col(c) for c in day1.columns if c != "measurement_id"],
        ).withColumn("measurement_value", F.lit(100.0)).withColumn(
            "measured_from_utc", F.to_timestamp(F.lit("2026-01-02 14:20:00"))
        )
        src2 = valid.unionByName(bump.select(valid.columns))
        expected = snap(run(spark, table, src2, enriched))
        # torn: oldest partition reverts to pre-merge content while
        # the newest (watermark-holding) partition committed
        shutil.rmtree(os.path.join(table.path, oldest))
        shutil.copytree(stale_copy, os.path.join(table.path, oldest))
        torn = snap(spark.read.parquet(table.path).drop("_part_date"))
        assert torn != expected
        # plain re-run does not see below the watermark → still torn
        assert snap(run(spark, table, src2, enriched)) == torn
        # full refresh recomputes everything → converges
        healed = snap(
            incremental_mart(
                spark, mart_location_air_quality, src2, enriched, table,
                full_refresh=True,
            )
        )
        assert healed == expected

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

    def test_merge_correct_under_static_overwrite_session(self, spark, setup):
        """merge_upsert must not depend on the caller's session conf:
        under Spark's DEFAULT static partitionOverwriteMode, the
        partition-scoped overwrite would silently drop every
        unaffected day partition (VERDICT r2 #2). The operator forces
        dynamic mode around its write and restores the caller's
        setting."""
        _, valid, enriched, table, day1 = setup
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "static")
        try:
            run(spark, table, day1, enriched)
            # slice strictly past day 1: the merge rewrites only the
            # day-2 partition, so a static overwrite would erase day 1
            day2 = valid.filter(F.col("logical_date") == "2026-01-03")
            final = run(spark, table, day2, enriched)
            assert {str(r[0]) for r in final.select("date_utc").distinct().collect()} == {
                "2026-01-02",
                "2026-01-03",
            }
            full = mart_location_air_quality(valid, enriched)
            assert snap(final) == snap(full)
            assert spark.conf.get(key) == "static"  # caller conf untouched
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
