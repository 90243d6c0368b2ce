"""Disaster recovery (S10) and skew-tolerant aggregation semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark import schemas
from openaq_data_pipeline_spark.catalog import load
from openaq_data_pipeline_spark.functions.skew import (
    SALT_COL,
    add_salt,
    salted_two_stage_agg,
)
from openaq_data_pipeline_spark.sources.bronze import recover_bronze


class TestDisasterRecovery:
    def test_recover_truncates_and_reloads_whole_lake(
        self, spark, fixture_lake, pipeline, tmp_path
    ):
        """99_recover_datalake_to_bq semantics: whole-lake glob,
        WRITE_TRUNCATE — poisoned bronze content disappears."""
        bronze = str(tmp_path / "bronze_loc")
        n = recover_bronze(
            spark, fixture_lake["locations"], schemas.RAW_LOCATIONS, bronze
        )
        assert n == 6
        # poison: append a bogus partition, then recover again
        poison = spark.read.schema(schemas.RAW_LOCATIONS).parquet(bronze).limit(1)
        poison = poison.withColumn(
            "_audit_logical_date", F.to_date(F.lit("1999-01-01"))
        )
        poison.write.mode("append").partitionBy("_audit_logical_date").parquet(bronze)
        assert spark.read.parquet(bronze).count() == 7
        n2 = recover_bronze(
            spark, fixture_lake["locations"], schemas.RAW_LOCATIONS, bronze
        )
        assert n2 == 6
        days = {
            str(r[0])
            for r in spark.read.parquet(bronze)
            .select("_audit_logical_date")
            .distinct()
            .collect()
        }
        assert "1999-01-01" not in days  # truncate, not append


class TestSaltedAgg:
    def test_matches_single_stage_groupby(self, spark):
        e = load(spark, "/root/testdata/sf0.001", "events")["events"]
        salted = salted_two_stage_agg(
            e,
            keys=["event_type"],
            measures={
                "n": ("count", F.lit(1)),
                "vmin": ("min", F.col("value")),
                "vmax": ("max", F.col("value")),
                "usum": ("sum", F.col("user_id")),
            },
            n_salts=8,
        )
        plain = e.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.sum("user_id").alias("usum"),
        )
        key = lambda r: tuple(str(r[c]) for c in sorted(plain.columns))  # noqa: E731
        assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))

    def test_salt_is_deterministic_and_bounded(self, spark):
        e = load(spark, "/root/testdata/sf0.001", "events")["events"]
        s1 = add_salt(e, 8).select(SALT_COL)
        s2 = add_salt(e, 8).select(SALT_COL)
        vals = {r[0] for r in s1.distinct().collect()}
        assert vals <= set(range(8)) and len(vals) > 1
        assert sorted(r[0] for r in s1.collect()) == sorted(r[0] for r in s2.collect())

    def test_rejects_non_algebraic_measure(self, spark):
        e = load(spark, "/root/testdata/sf0.001", "events")["events"]
        with pytest.raises(ValueError, match="does not decompose"):
            salted_two_stage_agg(
                e, ["event_type"], {"m": ("median", F.col("value"))}
            )

    def test_two_shuffles_in_plan(self, spark):
        e = load(spark, "/root/testdata/sf0.001", "events")["events"]
        salted = salted_two_stage_agg(
            e, ["event_type"], {"n": ("count", F.lit(1))}, n_salts=4
        )
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 2
