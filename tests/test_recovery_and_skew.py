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


class TestAQESkewJoin:
    def test_hot_key_join_recovers_via_skew_split(self, spark):
        """session.py enables spark.sql.adaptive.skewJoin; prove it
        actually fires: a join where one key holds 90% of the rows
        must re-plan with the hot partition split
        (SortMergeJoin(skew=true) + 'AQEShuffleRead … skewed') and
        still produce exactly the right rows. Salting
        (functions/skew.py) covers aggregation skew; this is the
        join-side counterpart the engine gets for free from AQE.

        Thresholds are scaled down to fire at test size; the payload
        is hash-generated because a compressible constant would
        shrink below any threshold at the shuffle layer, and it must
        survive into the OUTPUT or column pruning drops it before the
        exchange. The final plan comes from an action on THIS
        DataFrame's own QueryExecution (count() would execute a
        different tree and leave this one isFinalPlan=false)."""
        saved = {
            k: spark.conf.get(k)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            )
        }
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
            )
            spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            left = spark.range(100000).select(
                F.when(F.col("id") % 10 < 9, 0)
                .otherwise(F.col("id") % 97)
                .alias("k"),
                F.concat(
                    F.md5(F.col("id").cast("string")),
                    F.sha2(F.col("id").cast("string"), 256),
                ).alias("payload"),
            )
            right = spark.range(97).select(
                F.col("id").alias("k"), F.col("id").alias("rv")
            )
            j = left.join(right, "k").select("k", "payload", "rv")
            n = len(j.toPandas())
            assert n == 100000  # every left row matches exactly once
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "SortMergeJoin(skew=true)" in plan, plan[:1500]
            assert "skewed" in plan, "hot partition not split"
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)


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
