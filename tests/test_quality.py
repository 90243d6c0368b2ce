"""Quality executor tests: the ported dbt manifest must pass on the
fixture pipeline everywhere the fixtures are clean, and detect
exactly the violations the fixtures seed (the orphan sensor's
referential-integrity break)."""

from __future__ import annotations

import datetime

import pytest

from openaq_data_pipeline_spark import quality as Q


@pytest.fixture(scope="module")
def suite_results(pipeline):
    return Q.run_suite(
        pipeline["models"], Q.REFERENCE_SUITE, Q.REFERENCE_SINGULARS
    )


class TestReferenceSuite:
    def test_detects_exactly_the_seeded_violations(self, suite_results):
        failed = {r.check.name: r.failures for r in suite_results if not r.passed}
        # 1) orphan sensor 99 (fixtures_openaq.py) breaks measurements→sensors RI;
        # 2+3) L1's location_name drifts across snapshot days ("v2"→"v3"), so
        #    the J2 fan-out groups the same (location, hour) under two names —
        #    duplicate mart record ids. The reference's own dbt unique test
        #    fails identically on drifting metadata (mart grain includes
        #    location_name, mart_location_air_quality.sql:89-95); detecting
        #    it is the faithful behavior.
        assert failed == {
            "relationships:stg_openaq__measurements.sensor_parameter_key": 1,
            "unique:mart_location_air_quality.air_quality_record_id": 2,
            "unique:mart_location_weather.weather_record_id": 2,
        }

    def test_suite_covers_every_reference_test_kind(self):
        kinds = {c.kind for c in Q.REFERENCE_SUITE}
        assert kinds == {
            "unique", "not_null", "is_between", "is_non_negative",
            "is_not_future_year", "relationships", "singular",
        }

    def test_assert_suite_raises_with_named_check(self, suite_results):
        with pytest.raises(Q.QualitySuiteError, match="sensor_parameter_key"):
            Q.assert_suite(suite_results)


class TestExpectations:
    def test_unique_and_not_null(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, None)], ["k", "v"]
        )
        assert Q.unique_failures(df, "k").count() == 1  # key 1 duplicated
        assert Q.not_null_failures(df, "v").count() == 1

    def test_between_nulls_pass(self, spark):
        df = spark.createDataFrame(
            [(91.0,), (-91.0,), (45.0,), (None,)], ["lat"]
        )
        assert Q.between_failures(df, "lat", -90, 90).count() == 2

    def test_non_negative_and_future_year(self, spark):
        df = spark.createDataFrame([(-1, 2026), (0, 3000), (5, None)], ["n", "y"])
        assert Q.non_negative_failures(df, "n").count() == 1
        assert Q.not_future_year_failures(df, "y").count() == 1

    def test_relationship_ignores_null_child_keys(self, spark):
        child = spark.createDataFrame([(1,), (2,), (None,)], "k int")
        parent = spark.createDataFrame([(1,)], "k int")
        assert Q.relationship_failures(child, "k", parent).count() == 1  # only 2

    def test_singular_inverse_of_p5(self, spark):
        df = spark.createDataFrame(
            [
                (100, -100.0, False),  # temp below -80 → fail
                (100, 20.0, False),
                (2, 5.0, True),        # flagged → fail
                (22, 360.0, False),    # boundary ok
            ],
            ["parameter_id", "measurement_value", "has_flags"],
        )
        assert Q.invalid_measurement_rows(df).count() == 2


class TestFreshness:
    def _df(self, spark, ts):
        return spark.createDataFrame([(ts,)], "loaded_at timestamp")

    def test_statuses(self, spark):
        now = datetime.datetime(2026, 1, 10, 12, 0, 0)
        fresh = self._df(spark, now - datetime.timedelta(hours=1))
        warn = self._df(spark, now - datetime.timedelta(hours=30))
        stale = self._df(spark, now - datetime.timedelta(hours=49))
        kw = dict(loaded_at_col="loaded_at", now=now)
        assert Q.source_freshness(fresh, **kw).status == "pass"
        assert Q.source_freshness(warn, **kw).status == "warn"
        assert Q.source_freshness(stale, **kw).status == "error"

    def test_empty_source_is_error(self, spark):
        empty = self._df(spark, None).filter("loaded_at IS NOT NULL")
        assert Q.source_freshness(empty, loaded_at_col="loaded_at").status == "error"


class TestBuild:
    def test_build_raises_on_seeded_ri_failure(self, spark, pipeline):
        from openaq_data_pipeline_spark.plans.runner import build

        with pytest.raises(Q.QualitySuiteError, match="sensor_parameter_key"):
            build(spark, pipeline["paths"], freshness=False)

    def test_build_reports_without_raising(self, spark, pipeline):
        models, results, fresh = build_no_raise = __import__(
            "openaq_data_pipeline_spark.plans.runner", fromlist=["build"]
        ).build(spark, pipeline["paths"], freshness=True, raise_on_failure=False)
        assert len(results) == len(Q.REFERENCE_SUITE)
        # fixture lake was extracted in Jan 2026 → stale vs wall clock
        assert {f.status for f in fresh} == {"error"}
        assert "mart_location_air_quality" in models
