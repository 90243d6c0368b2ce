"""Edge-semantics tests for the history operators: SCD-2 null-safe
change detection and run collapse, CDC tombstone ordering (delete
must not resurrect or be resurrected out of order), and gap-fill
grid bounds / LOCF / interpolation endpoints."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.history import (
    cdc_latest_snapshot,
    gap_fill,
    scd2_from_observations,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


class TestScd2:
    def test_runs_collapse_and_intervals(self, spark):
        obs = spark.createDataFrame(
            [
                (1, ts("2024-01-01T00:00:00"), 1, "a"),
                (1, ts("2024-01-02T00:00:00"), 2, "a"),  # same state: collapsed
                (1, ts("2024-01-03T00:00:00"), 3, "b"),  # change
                (1, ts("2024-01-04T00:00:00"), 4, "a"),  # back to a: new interval
            ],
            "k long, t timestamp, seq long, attr string",
        )
        rows = (
            scd2_from_observations(obs, ["k"], "t", ["attr"], ["seq"])
            .orderBy("valid_from")
            .collect()
        )
        assert [(r.attr, r.is_current) for r in rows] == [
            ("a", False),
            ("b", False),
            ("a", True),
        ]
        # half-open chain: each valid_to == next valid_from, last open
        assert rows[0].valid_to == rows[1].valid_from == ts("2024-01-03T00:00:00")
        assert rows[1].valid_to == rows[2].valid_from == ts("2024-01-04T00:00:00")
        assert rows[2].valid_to is None

    def test_null_attr_is_a_state(self, spark):
        obs = spark.createDataFrame(
            [
                (1, ts("2024-01-01T00:00:00"), 1, "a"),
                (1, ts("2024-01-02T00:00:00"), 2, None),  # a → NULL: change
                (1, ts("2024-01-03T00:00:00"), 3, None),  # NULL → NULL: no change
                (1, ts("2024-01-04T00:00:00"), 4, "a"),  # NULL → a: change
            ],
            "k long, t timestamp, seq long, attr string",
        )
        rows = (
            scd2_from_observations(obs, ["k"], "t", ["attr"], ["seq"])
            .orderBy("valid_from")
            .collect()
        )
        assert [r.attr for r in rows] == ["a", None, "a"]

    def test_multi_attr_any_change_opens_interval(self, spark):
        obs = spark.createDataFrame(
            [
                (1, ts("2024-01-01T00:00:00"), 1, "a", 10),
                (1, ts("2024-01-02T00:00:00"), 2, "a", 20),  # second attr changes
            ],
            "k long, t timestamp, seq long, a1 string, a2 long",
        )
        assert (
            scd2_from_observations(obs, ["k"], "t", ["a1", "a2"], ["seq"]).count()
            == 2
        )


class TestCdcApply:
    def _snap(self, spark, rows):
        log = spark.createDataFrame(
            rows, "k long, t timestamp, seq long, v double, op string"
        )
        return {
            r.k: r
            for r in cdc_latest_snapshot(
                log, ["k"], "t", "op", "D", ["seq"]
            ).collect()
        }

    def test_trailing_tombstone_erases_key(self, spark):
        out = self._snap(
            spark,
            [
                (1, ts("2024-01-01T00:00:00"), 1, 1.0, "I"),
                (1, ts("2024-01-02T00:00:00"), 2, 2.0, "U"),
                (1, ts("2024-01-03T00:00:00"), 3, None, "D"),
            ],
        )
        assert out == {}

    def test_insert_after_delete_resurrects(self, spark):
        out = self._snap(
            spark,
            [
                (1, ts("2024-01-01T00:00:00"), 1, None, "D"),
                (1, ts("2024-01-02T00:00:00"), 2, 5.0, "I"),
            ],
        )
        assert out[1].v == 5.0

    def test_tiebreak_orders_same_timestamp(self, spark):
        # same ts: higher seq wins — D@seq2 beats U@seq1
        out = self._snap(
            spark,
            [
                (1, ts("2024-01-01T00:00:00"), 1, 1.0, "U"),
                (1, ts("2024-01-01T00:00:00"), 2, None, "D"),
            ],
        )
        assert out == {}

    def test_op_column_dropped(self, spark):
        log = spark.createDataFrame(
            [(1, ts("2024-01-01T00:00:00"), 1, 1.0, "I")],
            "k long, t timestamp, seq long, v double, op string",
        )
        assert "op" not in cdc_latest_snapshot(log, ["k"], "t", "op").columns


class TestGapFill:
    def test_grid_bounds_locf_interp(self, spark):
        # key 1 observed at hours 0, 3 (values 10, 40); key 2 at hour 5 only
        obs = spark.createDataFrame(
            [
                (1, ts("2024-01-01T00:10:00"), 10.0),
                (1, ts("2024-01-01T03:20:00"), 40.0),
                (2, ts("2024-01-01T05:00:00"), 7.0),
            ],
            "k long, t timestamp, v double",
        )
        out = gap_fill(obs, ["k"], "t", "v", 3600, interpolate=True)
        rows = {(r.k, r.bucket_ts.hour): r for r in out.collect()}
        # per-key grid: key 1 spans hours 0..3, key 2 exactly hour 5
        assert sorted(rows) == [(1, 0), (1, 1), (1, 2), (1, 3), (2, 5)]
        assert rows[(1, 0)].is_gap is False and rows[(1, 1)].is_gap is True
        assert rows[(1, 1)].value_locf == 10.0
        assert rows[(1, 1)].value_interp == 20.0  # 10 + (40-10)*1/3
        assert rows[(1, 2)].value_interp == 30.0
        assert rows[(2, 5)].value_interp == 7.0

    def test_bucket_max_aggregation(self, spark):
        obs = spark.createDataFrame(
            [
                (1, ts("2024-01-01T00:10:00"), 5.0),
                (1, ts("2024-01-01T00:50:00"), 9.0),
            ],
            "k long, t timestamp, v double",
        )
        [r] = gap_fill(obs, ["k"], "t", "v", 3600).collect()
        assert r.value == 9.0 and r.is_gap is False

    def test_single_shuffle_for_windows(self, spark):
        obs = spark.createDataFrame(
            [(1, ts("2024-01-01T00:10:00"), 5.0)], "k long, t timestamp, v double"
        )
        plan = (
            gap_fill(obs, ["k"], "t", "v", 3600, interpolate=True)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        # LOCF + both interpolation windows share (k, bucket) ordering:
        # the optimizer must not stack one Window-per-expression
        assert plan.count("Window") <= 2
