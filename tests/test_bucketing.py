"""Bucketed co-located joins: same key + same bucket count ⇒ the
join plan contains no Exchange (and no Sort when bucket-sorted),
while the values match the plain shuffled join exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.catalog import load
from openaq_data_pipeline_spark.sources.tables import read_table, save_bucketed


@pytest.fixture(scope="module")
def bucketed(spark):
    t = load(spark, "/root/testdata/sf0.001", "orders", "lineitem")
    save_bucketed(t["orders"], "b_orders", "o_orderkey", n_buckets=4)
    save_bucketed(
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        n_buckets=4,
    )
    yield t
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


class TestBucketedJoin:
    def test_no_exchange_no_sort(self, spark, bucketed):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_table(spark, "b_orders").join(
                read_table(spark, "b_lineitem"), "o_orderkey"
            )
            plan = _plan(j)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located buckets zip directly
            assert "Bucketed: true" in plan
            # (a Sort may remain: with >1 file per bucket Spark cannot
            # assume global bucket order — the shuffle is what matters)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_unbucketed_join_needs_exchanges(self, spark, bucketed):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            t = bucketed
            j = t["orders"].join(
                t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
                "o_orderkey",
            )
            assert _plan(j).count("Exchange") >= 2
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_values_match_plain_join(self, spark, bucketed):
        t = bucketed
        b = (
            read_table(spark, "b_orders")
            .join(read_table(spark, "b_lineitem"), "o_orderkey")
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = (
            t["orders"]
            .join(
                t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
                "o_orderkey",
            )
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, b.collect())) == sorted(map(tuple, p.collect()))
