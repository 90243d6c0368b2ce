"""End-to-end semantics tests on the OpenAQ-shaped fixture lake.

Each assertion targets a reference behavior cited in SURVEY.md /
FIXTURES.md §5 — dedup, explode, coalesce chain, null-rejecting
filters, range predicates, join fan-out, SCD-1, hourly pivot math.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def rows_by(df, key):
    return {r[key]: r for r in df.collect()}


class TestIngest:
    def test_counts_skip_corrupt_lines(self, pipeline):
        # 6 valid location rows; corrupt + blank skipped (S5 semantics)
        assert pipeline["counts"]["raw_locations"] == 6
        # 17 valid measurement rows; non-dict array line skipped
        assert pipeline["counts"]["raw_measurements"] == 17

    def test_bronze_partitioned_by_logical_date(self, pipeline, spark):
        df = spark.read.parquet(pipeline["paths"].bronze_locations)
        days = {str(r[0]) for r in df.select("_audit_logical_date").distinct().collect()}
        assert days == {"2026-01-02", "2026-01-03"}

    def test_bronze_schema_evolution_across_daily_loads(self, spark, tmp_path):
        """A release adds a column between daily appends: day-1 files
        lack it, day-2 files carry it. The declared read (fixed-schema
        regime) must surface the union with NULLs for old files; the
        mergeSchema read (autodetect regime) must find the new column
        without a declared schema."""
        from datetime import date

        from pyspark.sql import types as T

        from openaq_data_pipeline_spark.sources.bronze import read_bronze, write_bronze

        path = str(tmp_path / "bronze")
        day1 = spark.createDataFrame(
            [(1, date(2026, 1, 2))],
            "sensor_id long, _audit_logical_date date",
        )
        write_bronze(day1, path, mode="append")
        day2 = spark.createDataFrame(
            [(2, "drifted", date(2026, 1, 3))],
            "sensor_id long, new_field string, _audit_logical_date date",
        )
        write_bronze(day2, path, mode="append")

        v2 = T.StructType(
            [
                T.StructField("sensor_id", T.LongType()),
                T.StructField("new_field", T.StringType()),
                T.StructField("_audit_logical_date", T.DateType()),
            ]
        )
        declared = rows_by(read_bronze(spark, path, schema=v2), "sensor_id")
        assert declared[1].new_field is None  # old file → NULL
        assert declared[2].new_field == "drifted"

        merged = read_bronze(spark, path)
        assert "new_field" in merged.columns
        assert rows_by(merged, "sensor_id")[1].new_field is None


class TestStaging:
    def test_locations_dedup_latest_wins(self, pipeline):
        locs = rows_by(
            pipeline["models"]["stg_openaq__locations"].filter("location_id = 1"),
            "logical_date",
        )
        # day1 had two extractions; the 07:00 one ("v2") must win (W1)
        assert {str(k) for k in locs} == {"2026-01-02", "2026-01-03"}
        assert locs[[k for k in locs if str(k) == "2026-01-02"][0]]["location_name"] == "Del Norte v2"

    def test_locality_coalesce_chain(self, pipeline):
        locs = rows_by(pipeline["models"]["stg_openaq__locations"], "location_id")
        assert locs[1]["locality"] == "Albuquerque"  # direct locality
        assert locs[2]["locality"] == "Madrid"  # city fallback
        assert locs[3]["locality"] == "New York"  # tz split + '_'→' '
        assert locs[4]["locality"] == "Lyon"

    def test_sensors_explode_drops_empty_and_missing(self, pipeline):
        sensors = pipeline["models"]["stg_openaq__sensors"]
        loc_ids = {r[0] for r in sensors.select("location_id").distinct().collect()}
        assert loc_ids == {1, 2}  # L3 empty array, L4 missing → dropped (F2)
        # L1 snapshot on two days → sensor 11 appears twice, distinct record ids
        s11 = sensors.filter("sensor_id = 11")
        assert s11.count() == 2
        assert s11.select("sensor_record_id").distinct().count() == 2

    def test_measurements_dedup_latest_value_wins(self, pipeline):
        m = pipeline["models"]["stg_openaq__measurements"].filter(
            "sensor_id = 11 AND measured_from_utc = timestamp'2026-01-02 13:05:00'"
        )
        assert m.count() == 1
        assert m.first()["measurement_value"] == 99.0

    def test_surrogate_keys_unique(self, pipeline):
        for model, key in [
            ("stg_openaq__locations", "record_id"),
            ("stg_openaq__sensors", "sensor_record_id"),
            ("stg_openaq__measurements", "measurement_id"),
        ]:
            df = pipeline["models"][model]
            assert df.groupBy(key).count().filter("count > 1").count() == 0


class TestIntermediate:
    def test_validity_filter(self, pipeline):
        valid = pipeline["models"]["int_valid_measurements"]
        vals = {
            (r["sensor_id"], r["measurement_value"]) for r in valid.collect()
        }
        # dropped: pm25 -5, temp -100, humidity 140, winddir 400,
        #          flagged 50, null-flag 60
        assert (11, -5.0) not in vals
        assert (12, -100.0) not in vals
        assert (13, 140.0) not in vals
        assert (22, 400.0) not in vals
        assert (11, 50.0) not in vals
        assert (11, 60.0) not in vals  # null has_flags → dropped (null-rejecting =)
        # kept: negative temperature, boundary wind dir 360
        assert (12, -10.0) in vals
        assert (22, 360.0) in vals

    def test_enriched_grain_and_left_join(self, pipeline):
        enriched = pipeline["models"]["int_sensors_enriched"]
        # grain = sensor × logical_date: L1 sensors on 2 days + L2 on 1 day
        assert enriched.count() == 3 * 2 + 2
        # all fixture sensors have matching location snapshots
        assert enriched.filter("location_id IS NULL").count() == 0


class TestMarts:
    def test_dim_locations_scd1(self, pipeline):
        dim = rows_by(pipeline["models"]["dim_locations"], "location_id")
        assert set(dim) == {1, 2}  # only locations that own sensors survive
        assert dim[1]["location_name"] == "Del Norte v3"  # latest snapshot (W2)

    def test_air_quality_hourly_pivot(self, pipeline):
        mart = pipeline["models"]["mart_location_air_quality"]
        rows = {
            (r["location_id"], str(r["measurement_hour_utc"])): r
            for r in mart.collect()
        }
        # L1 13:00 bucket: pm25 valid rows at 13:05(→99 after dedup) and
        # 13:45(10.6); sensor snapshot fan-out (2 days) duplicates each
        # measurement but AVG collapses: (99+10.6)/2 = 54.8
        r = rows[(1, "2026-01-02 13:00:00")]
        assert r["pm25_ugm3"] == pytest.approx(54.8)
        assert r["country_code"] == "US"
        assert r["year_utc"] == 2026 and r["hour_utc"] == 13
        # 14:00 bucket: single pm25 12.0
        assert rows[(1, "2026-01-02 14:00:00")]["pm25_ugm3"] == pytest.approx(12.0)
        # orphan sensor 99 must not appear anywhere (inner join J2)
        assert all(loc in (1, 2) for loc, _ in rows)

    def test_weather_mart_conversions(self, pipeline):
        mart = pipeline["models"]["mart_location_weather"]
        rows = {
            (r["location_id"], str(r["measurement_hour_utc"])): r
            for r in mart.collect()
        }
        r13 = rows[(1, "2026-01-02 13:00:00")]
        # temp 13:00 → only -10 valid; F = -10*9/5+32 = 14.0
        assert r13["temp_celsius"] == pytest.approx(-10.0)
        assert r13["temp_fahrenheit"] == pytest.approx(14.0)
        assert r13["humidity_pct"] == pytest.approx(55.0)
        r14 = rows[(1, "2026-01-02 14:00:00")]
        assert r14["temp_celsius"] == pytest.approx(21.5)
        assert r14["temp_fahrenheit"] == pytest.approx(70.7)
        # wind direction at L2, rounded to 0 dp
        w13 = rows[(2, "2026-01-02 13:00:00")]
        assert w13["wind_direction_deg"] == pytest.approx(360.0)

    def test_mart_key_collision_under_metadata_drift(self, pipeline):
        """Reference-faithful quirk: the mart surrogate key hashes only
        (location_id, hour), but the GROUP BY includes location_name —
        so when location metadata drifts across snapshot days (L1:
        "v2" → "v3"), the same key appears on two rows. The reference
        would produce the same duplicates (its dbt `unique` test
        *detects* them as a quality failure rather than preventing
        them); our quality executor must flag them identically."""
        for model, key, group in [
            ("mart_location_air_quality", "air_quality_record_id", "pm25_ugm3"),
            ("mart_location_weather", "weather_record_id", "temp_celsius"),
        ]:
            df = pipeline["models"][model]
            dupes = df.groupBy(key).count().filter("count > 1")
            # exactly the drifted L1 hours collide; no other dupes
            assert dupes.count() == 2
            # full declared grain IS unique
            grain = [
                "location_id", "location_name", "country_code",
                "latitude", "longitude", "measurement_hour_utc",
            ]
            assert df.groupBy(*grain).count().filter("count > 1").count() == 0
