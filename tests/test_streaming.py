"""Structured Streaming variant: the availableNow drain of the
fixture bronze must reproduce the batch mart (update/MERGE sink),
withhold watermark-open windows (append sink), and deduplicate
in-stream (dropDuplicatesWithinWatermark)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.incremental import (
    AIR_QUALITY_TABLE_SPEC,
    IncrementalTable,
)
from openaq_data_pipeline_spark.operators.intermediate import int_valid_measurements
from openaq_data_pipeline_spark.operators.marts import mart_location_air_quality
from openaq_data_pipeline_spark.operators.staging import measurements_projection
from openaq_data_pipeline_spark.streaming import (
    stream_mart_air_quality,
    stream_raw_measurements,
    stream_stg_measurements,
    write_stream_append,
    write_stream_merge,
)


def _run(query, timeout=120):
    query.awaitTermination(timeout)
    assert not query.isActive


def snap(df, cols=None):
    cols = cols or sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.fixture()
def streams(spark, pipeline):
    raw = stream_raw_measurements(spark, pipeline["paths"].bronze_measurements)
    enriched = pipeline["models"]["int_sensors_enriched"]
    return raw, enriched


class TestStreamingMart:
    def test_merge_sink_equals_batch_mart(self, spark, pipeline, streams, tmp_path):
        """Update-mode foreachBatch MERGE drains everything: result ==
        batch mart computed over the *undeduplicated* projection (the
        stream also skips dedup here so both sides see identical
        input multiplicities)."""
        raw, enriched = streams
        stg = stream_stg_measurements(raw, dedup=False)
        mart = stream_mart_air_quality(stg, enriched)
        table = IncrementalTable(path=str(tmp_path / "aq"), **AIR_QUALITY_TABLE_SPEC)
        _run(write_stream_merge(mart, table, str(tmp_path / "ckpt")))

        got = spark.read.parquet(table.path).drop("_part_date")
        raw_batch = spark.read.schema(raw.schema).parquet(
            pipeline["paths"].bronze_measurements
        )
        valid = int_valid_measurements(measurements_projection(raw_batch))
        expected = mart_location_air_quality(valid, enriched)
        assert snap(got) == snap(expected)

    def test_append_sink_withholds_open_windows(self, spark, streams, tmp_path):
        """Append emits only windows the final watermark closed: max
        event time is day-2 09:10, lateness 2h → every day-1 hour
        emits, the 09:00 day-2 window stays open (the reference's
        'yesterday completes on today's run' shape)."""
        raw, enriched = streams
        stg = stream_stg_measurements(raw, lateness="2 hours", dedup=False)
        mart = stream_mart_air_quality(stg, enriched)
        out = str(tmp_path / "aq_append")
        _run(write_stream_append(mart, out, str(tmp_path / "ckpt")))

        got = spark.read.parquet(out)
        days = {str(r[0]) for r in got.select("date_utc").distinct().collect()}
        assert days == {"2026-01-02"}
        assert got.filter("hour_utc = 13").count() > 0

    def test_in_stream_dedup(self, spark, streams, tmp_path):
        """With dedup on, exactly one of the three 13:05 duplicate
        extractions survives (value 9.4 twice + 99.0 once): hour-13
        pm25 avg is avg(x, 10.6) with x ∈ {9.4, 99.0} — never the
        no-dedup avg over all four rows (32.1)."""
        raw, enriched = streams
        stg = stream_stg_measurements(raw, dedup=True)
        mart = stream_mart_air_quality(stg, enriched)
        table = IncrementalTable(path=str(tmp_path / "aq"), **AIR_QUALITY_TABLE_SPEC)
        _run(write_stream_merge(mart, table, str(tmp_path / "ckpt")))

        vals = {
            r["pm25_ugm3"]
            for r in spark.read.parquet(table.path)
            .filter("hour_utc = 13 AND location_id = 1")
            .collect()
        }
        assert vals <= {10.0, 54.8} and vals


class TestStatefulAudit:
    """applyInPandasWithState custom operator: per-sensor late-arrival
    audit. Two availableNow drains over a growing source dir — the
    second delivers rows below each sensor's checkpointed high-
    watermark, which must be counted as late (the rows the reference's
    incremental MERGE silently drops, SURVEY §2.9)."""

    def _drain(self, spark, src, ckpt, sink):
        from openaq_data_pipeline_spark.streaming import sensor_late_arrival_audit

        stream = (
            spark.readStream.schema("sensor_id long, measured_from_utc timestamp")
            .parquet(src)
        )
        audit = sensor_late_arrival_audit(stream)
        rows = []

        def _collect(batch_df, batch_id):
            rows.extend(batch_df.collect())

        q = (
            audit.writeStream.outputMode("update")
            .foreachBatch(_collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _run(q)
        # cumulative counters are monotone: the final state per sensor
        # is the row with the highest n_total
        final = {}
        for r in rows:
            if r.sensor_id not in final or r.n_total > final[r.sensor_id].n_total:
                final[r.sensor_id] = r
        sink.update(final)

    def test_late_rows_counted_against_checkpointed_watermark(self, spark, tmp_path):
        from datetime import datetime

        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        t = lambda h, m=0: datetime(2026, 1, 2, h, m)  # noqa: E731

        phase1 = spark.createDataFrame(
            [(1, t(10)), (1, t(11)), (2, t(10, 30))],
            "sensor_id long, measured_from_utc timestamp",
        )
        phase1.coalesce(1).write.mode("append").parquet(src)
        state: dict = {}
        self._drain(spark, src, ckpt, state)
        assert state[1].n_total == 2 and state[1].n_late == 0
        assert state[2].n_total == 1 and state[2].n_late == 0

        # phase 2: one on-time row + one below each sensor's watermark
        phase2 = spark.createDataFrame(
            [(1, t(9)), (1, t(12)), (2, t(10))],
            "sensor_id long, measured_from_utc timestamp",
        )
        phase2.coalesce(1).write.mode("append").parquet(src)
        self._drain(spark, src, ckpt, state)
        assert state[1].n_total == 4 and state[1].n_late == 1
        assert state[2].n_total == 2 and state[2].n_late == 1
        # high-watermark advanced to the newest on-time row
        assert state[1].max_seen_utc == t(12)
        assert state[2].max_seen_utc == t(10, 30)


class TestStreamingWeatherMart:
    def test_weather_merge_equals_batch(self, spark, pipeline, streams, tmp_path):
        from openaq_data_pipeline_spark.incremental import WEATHER_TABLE_SPEC
        from openaq_data_pipeline_spark.operators.marts import mart_location_weather
        from openaq_data_pipeline_spark.streaming import stream_mart_weather

        raw, enriched = streams
        stg = stream_stg_measurements(raw, dedup=False)
        mart = stream_mart_weather(stg, enriched)
        table = IncrementalTable(path=str(tmp_path / "w"), **WEATHER_TABLE_SPEC)
        _run(write_stream_merge(mart, table, str(tmp_path / "ckpt_w")))

        got = spark.read.parquet(table.path).drop("_part_date")
        raw_batch = spark.read.schema(raw.schema).parquet(
            pipeline["paths"].bronze_measurements
        )
        valid = int_valid_measurements(measurements_projection(raw_batch))
        expected = mart_location_weather(valid, enriched)
        assert snap(got) == snap(expected)


class TestStreamStreamIntervalJoin:
    """Stream-stream interval join (r8): inner-join parity with the
    equivalent batch join, the bounded-state plan contract, and the
    column-overlap guard."""

    LEFT = [  # (sensor_id, m_ts, value)
        (1, "2026-01-02 10:00:00", 7.0),
        (1, "2026-01-02 13:00:00", 9.0),
        (2, "2026-01-02 10:30:00", 4.0),
    ]
    RIGHT = [  # (sensor_id, c_ts, factor)
        (1, "2026-01-02 10:20:00", 1.5),   # within 1h of 10:00
        (1, "2026-01-02 11:30:00", 2.0),   # outside 1h of both
        (2, "2026-01-02 09:45:00", 3.0),   # within 1h of 10:30
        (3, "2026-01-02 10:00:00", 9.9),   # key never matches
    ]

    def _dfs(self, spark, tmp_path):
        import datetime as _dt

        lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
        lschema = "sensor_id long, m_ts timestamp, value double"
        rschema = "sensor_id long, c_ts timestamp, factor double"
        parse = _dt.datetime.fromisoformat
        spark.createDataFrame(
            [(k, parse(t), v) for k, t, v in self.LEFT], lschema
        ).write.parquet(lp)
        spark.createDataFrame(
            [(k, parse(t), v) for k, t, v in self.RIGHT], rschema
        ).write.parquet(rp)
        return (
            spark.readStream.schema(lschema).parquet(lp),
            spark.readStream.schema(rschema).parquet(rp),
            spark.read.parquet(lp),
            spark.read.parquet(rp),
        )

    def test_inner_matches_batch_join(self, spark, tmp_path):
        from openaq_data_pipeline_spark.streaming.pipeline import (
            stream_stream_interval_join,
        )

        ls, rs, lb, rb = self._dfs(spark, tmp_path)
        out = stream_stream_interval_join(
            ls, rs, "sensor_id", "m_ts", "c_ts", tolerance="1 hour"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("ssj_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.sensor_id, str(r.m_ts), str(r.c_ts), r.value, r.factor)
            for r in spark.table("ssj_out").collect()
        )
        import pyspark.sql.functions as F

        want = sorted(
            (r.sensor_id, str(r.m_ts), str(r.c_ts), r.value, r.factor)
            for r in lb.alias("l")
            .join(
                rb.alias("r"),
                (F.col("l.sensor_id") == F.col("r.sensor_id"))
                & (F.col("c_ts") >= F.col("m_ts") - F.expr("INTERVAL 1 hour"))
                & (F.col("c_ts") <= F.col("m_ts") + F.expr("INTERVAL 1 hour")),
            )
            .select("l.sensor_id", "m_ts", "value", "c_ts", "factor")
            .collect()
        )
        assert got == want and len(got) == 2
        # bounded state: the executed streaming plan carries watermarks
        # on both sides (the eviction contract)
        progress = q.recentProgress
        assert any(
            p.get("stateOperators") for p in progress
        ), "join ran stateless?!"

    def test_overlapping_columns_rejected(self, spark, tmp_path):
        import pytest as _p

        from openaq_data_pipeline_spark.streaming.pipeline import (
            stream_stream_interval_join,
        )

        ls, rs, _, _ = self._dfs(spark, tmp_path)
        with _p.raises(ValueError):
            stream_stream_interval_join(
                ls,
                rs.withColumnRenamed("factor", "value"),
                "sensor_id",
                "m_ts",
                "c_ts",
            )
