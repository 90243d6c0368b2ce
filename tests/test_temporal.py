"""Edge-semantics tests for the temporal joins: as-of tie/no-state
behavior and range-join boundary handling across bin borders."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.temporal import asof_join, range_join_binned


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


class TestAsofJoin:
    def test_semantics(self, spark):
        probes = spark.createDataFrame(
            [
                (1, 7, ts("2024-01-01T10:00:00")),  # after two states → latest wins
                (2, 7, ts("2024-01-01T08:00:00")),  # exactly at state ts → matches (>=)
                (3, 7, ts("2024-01-01T07:59:59")),  # before any state → NULL
                (4, 8, ts("2024-01-01T12:00:00")),  # key with no states → NULL
            ],
            "probe_id long, k long, ts timestamp",
        )
        states = spark.createDataFrame(
            [
                (7, ts("2024-01-01T08:00:00"), 1.0),
                (7, ts("2024-01-01T09:00:00"), 2.0),
                (7, ts("2024-01-01T11:00:00"), 3.0),  # future state: never visible
            ],
            "k long, ts timestamp, v double",
        )
        out = {
            r.probe_id: r
            for r in asof_join(
                probes, states, ["k"], "ts", "ts", right_prefix="s_"
            ).collect()
        }
        assert out[1].s_v == 2.0 and out[1].s_ts == ts("2024-01-01T09:00:00")
        assert out[2].s_v == 1.0
        assert out[3].s_v is None and out[3].s_ts is None
        assert out[4].s_v is None
        assert len(out) == 4  # left join: every probe survives

    def test_matched_row_nulls_not_backfilled(self, spark):
        """ASOF must return the matched (latest) right row verbatim —
        a NULL payload field of the matched row stays NULL instead of
        being carried forward from an older right row (ADVICE r1: the
        whole payload LOCFs as one struct)."""
        probes = spark.createDataFrame(
            [(1, 7, ts("2024-01-01T10:00:00"))],
            "probe_id long, k long, ts timestamp",
        )
        states = spark.createDataFrame(
            [
                (7, ts("2024-01-01T08:00:00"), 1.0, "old"),
                (7, ts("2024-01-01T09:00:00"), None, "new"),  # matched row
            ],
            "k long, ts timestamp, v double, tag string",
        )
        row = asof_join(probes, states, ["k"], "ts", "ts", right_prefix="s_").first()
        assert row.s_ts == ts("2024-01-01T09:00:00")
        assert row.s_tag == "new"
        assert row.s_v is None, "NULL of the matched row must not backfill"

    def test_single_shuffle(self, spark):
        probes = spark.range(10).select(
            F.col("id").alias("probe_id"),
            (F.col("id") % 3).alias("k"),
            F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        )
        states = spark.range(5).select(
            (F.col("id") % 3).alias("k"),
            F.timestamp_seconds(F.col("id") * 100).alias("ts"),
            F.col("id").cast("double").alias("v"),
        )
        df = asof_join(probes, states, ["k"], "ts", "ts")
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, "LOCF window must be the only shuffle"
        assert "Join" not in plan, "as-of must not materialize a join"


class TestRangeJoinBinned:
    def test_boundaries_and_bin_straddle(self, spark):
        # interval [10:30, 12:30) with 1h bins straddles three bins
        intervals = spark.createDataFrame(
            [(100, 7, ts("2024-01-01T10:30:00"), ts("2024-01-01T12:30:00"))],
            "interval_id long, k long, start_ts timestamp, end_ts timestamp",
        )
        points = spark.createDataFrame(
            [
                (1, 7, ts("2024-01-01T10:29:59")),  # before start → out
                (2, 7, ts("2024-01-01T10:30:00")),  # at start → in (inclusive)
                (3, 7, ts("2024-01-01T11:59:00")),  # middle bin → in
                (4, 7, ts("2024-01-01T12:29:59")),  # last second → in
                (5, 7, ts("2024-01-01T12:30:00")),  # at end → out (exclusive)
                (6, 8, ts("2024-01-01T11:00:00")),  # other key → out
            ],
            "point_id long, k long, p_ts timestamp",
        )
        got = sorted(
            r.point_id
            for r in range_join_binned(
                points, intervals, ["k"], "p_ts", "start_ts", "end_ts", 3600
            ).collect()
        )
        assert got == [2, 3, 4]

    def test_no_duplicate_matches(self, spark):
        # a long interval covers many bins; each in-range point must
        # still match exactly once (points carry a single bin)
        intervals = spark.createDataFrame(
            [(1, 1, ts("2024-01-01T00:00:00"), ts("2024-01-02T00:00:00"))],
            "interval_id long, k long, start_ts timestamp, end_ts timestamp",
        )
        points = spark.createDataFrame(
            [(i, 1, ts(f"2024-01-01T{i:02d}:15:00")) for i in range(24)],
            "point_id long, k long, p_ts timestamp",
        )
        out = range_join_binned(
            points, intervals, ["k"], "p_ts", "start_ts", "end_ts", 3600
        )
        assert out.count() == 24
        assert out.select("point_id").distinct().count() == 24
