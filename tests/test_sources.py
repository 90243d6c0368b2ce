"""Source/sink operator tests (SURVEY §2.1 S2-S8): NDJSON scan skip
semantics, CSV control scan, chunked sinks, and the distributed REST
fetch plumbing with injected transports (no network in this env)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openaq_data_pipeline_spark.sources import lake, rest


@pytest.fixture()
def ndjson_dir(tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    rows = [
        {"id": 1, "v": "a"},
        {"id": 2, "v": "b", "unknown_field": True},  # unknown ignored
    ]
    with open(p / "part0.ndjson", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("\n")
        f.write("{broken json]\n")
    return str(p)


SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


class TestLake:
    def test_read_ndjson_drops_corrupt_keeps_unknown_tolerant(self, spark, ndjson_dir):
        df = lake.read_ndjson(spark, ndjson_dir, SCHEMA)
        assert sorted((r["id"], r["v"]) for r in df.collect()) == [(1, "a"), (2, "b")]

    def test_read_ndjson_variant_preserves_drift(self, spark, ndjson_dir):
        """VariantType regime: corrupt/blank lines drop, but unknown
        fields SURVIVE (a declared StructType silently loses them) and
        typed extraction is null-safe on missing paths."""
        df = lake.read_ndjson_variant(spark, ndjson_dir)
        assert df.count() == 2  # corrupt + blank dropped
        got = df.select(
            F.try_variant_get("data", "$.id", "long").alias("id"),
            F.try_variant_get("data", "$.v", "string").alias("v"),
            F.try_variant_get("data", "$.unknown_field", "boolean").alias("extra"),
            F.try_variant_get("data", "$.never_there", "string").alias("missing"),
        ).collect()
        rows = {r.id: r for r in got}
        assert rows[1].v == "a" and rows[1].extra is None
        assert rows[2].v == "b" and rows[2].extra is True  # drift preserved
        assert all(r.missing is None for r in got)

    def test_read_ndjson_keep_corrupt_exposes_bad_lines(self, spark, ndjson_dir):
        df = lake.read_ndjson(spark, ndjson_dir, SCHEMA, keep_corrupt=True)
        # Spark refuses queries referring only to the corrupt column
        # (see skill gotcha) — materialize, then inspect
        rows = df.collect()
        bad = [r for r in rows if r[lake.CORRUPT_COL] is not None]
        assert len(bad) == 1 and "broken" in bad[0][lake.CORRUPT_COL]

    def test_read_control_csv_id_fallback(self, spark, tmp_path):
        with_id = tmp_path / "a.csv"
        with_id.write_text("id,name\n7,x\n8,y\n")
        no_id = tmp_path / "b.csv"
        no_id.write_text("loc,name\n3,z\n")
        a = lake.read_control_csv(spark, str(with_id))
        b = lake.read_control_csv(spark, str(no_id))
        assert {r[0] for r in a.select("control_id").collect()} == {7, 8}
        assert {r[0] for r in b.select("control_id").collect()} == {3}

    def test_write_ndjson_chunking(self, spark, tmp_path):
        df = spark.range(10).withColumnRenamed("id", "n").coalesce(1)
        out = str(tmp_path / "out")
        lake.write_ndjson(df, out, rows_per_file=3)
        files = glob.glob(os.path.join(out, "part-*"))
        assert len(files) == 4  # ceil(10/3) — maxRecordsPerFile ⇔ chunk_size
        back = spark.read.json(out)
        assert back.count() == 10

    def test_write_csv_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
        out = str(tmp_path / "csv")
        lake.write_csv(df, out)
        back = spark.read.option("header", True).option("inferSchema", True).csv(out)
        assert sorted((r["k"], r["v"]) for r in back.collect()) == [(1, "x"), (2, "y")]


class TestRetry:
    def test_404_yields_none_row(self):
        payload = rest.fetch_with_retry(
            lambda url, p: (404, None), "u", {}, rest.RetryPolicy(sleep=lambda s: None)
        )
        assert payload is None

    def test_retries_then_succeeds_with_linear_backoff(self):
        calls, waits = [], []
        policy = rest.RetryPolicy(backoff="linear", sleep=waits.append)

        def flaky(url, p):
            calls.append(1)
            return (500, None) if len(calls) < 3 else (200, {"ok": True})

        assert rest.fetch_with_retry(flaky, "u", {}, policy) == {"ok": True}
        assert waits == [1.0, 2.0]  # 1s·(n+1), extract_openaq_locations.py:69

    def test_exhaustion_raises_loud_with_exponential_backoff(self):
        waits = []
        policy = rest.RetryPolicy(backoff="exponential", sleep=waits.append)
        with pytest.raises(RuntimeError, match="retries exhausted"):
            rest.fetch_with_retry(lambda u, p: (503, None), "u", {}, policy)
        assert waits == [1.0, 2.0]  # 2**n, extract_measurements.py:128


class TestDistributedFetch:
    def test_fetch_per_key(self, spark):
        keys = rest.distinct_keys(
            spark.createDataFrame([(1,), (2,), (2,), (None,)], "id long"), "id"
        )

        def fake(url, params):
            key = int(url.rsplit("/", 1)[1])
            if key == 2:
                return 404, None
            return 200, {"results": [{"id": key, "name": f"loc{key}"}]}

        out = rest.fetch_per_key(
            keys,
            "https://api.example/locations/{key}",
            out_schema="key long, found boolean, name string",
            row_fn=lambda k, payload: {
                "key": k,
                "found": payload is not None,
                "name": (payload or {}).get("results", [{}])[0].get("name"),
            },
            fetch=fake,
            policy=rest.RetryPolicy(sleep=lambda s: None),
        )
        rows = {r["key"]: (r["found"], r["name"]) for r in out.collect()}
        assert rows == {1: (True, "loc1"), 2: (False, None)}

    def test_paginate_dedup_and_short_page_stop(self):
        pages = {
            1: [
                {"value": 1.0, "period": {"datetimeFrom": {"utc": "t1"}}},
                {"value": 1.0, "period": {"datetimeFrom": {"utc": "t1"}}},  # dup
                "not-a-dict",  # P8 guard
            ]
            + [
                {"value": float(i), "period": {"datetimeFrom": {"utc": f"x{i}"}}}
                for i in range(997)
            ],
            2: [{"value": 2.0, "period": {"datetimeFrom": {"utc": "t2"}}}],
        }
        calls = []

        def fake(url, params):
            calls.append(params["page"])
            return 200, {"results": pages[params["page"]]}

        out = rest.paginate_time_range(
            fake, "u", "2026-01-02", "2026-01-03",
            policy=rest.RetryPolicy(sleep=lambda s: None),
        )
        assert calls == [1, 2]  # page 2 is short → stop
        assert len(out) == 999  # 1000-row page minus in-flight dup, plus page 2
        vals = [(r["period"]["datetimeFrom"]["utc"], r["value"]) for r in out]
        assert len(vals) == len(set(vals))  # dedup key respected


class TestOrcLake:
    """ORC scan/sink (r8): round-trip fidelity and pushdown parity
    with the parquet path."""

    def test_round_trip_and_pushdown(self, spark, tmp_path):
        from openaq_data_pipeline_spark.sources.lake import (
            read_orc,
            write_orc,
        )

        df = spark.createDataFrame(
            [(i, f"name{i}", float(i) / 4) for i in range(100)],
            "id long, name string, score double",
        )
        p = str(tmp_path / "orc_tbl")
        write_orc(df, p, rows_per_file=30)
        back = read_orc(spark, p)
        assert back.count() == 100
        assert sorted(back.columns) == ["id", "name", "score"]
        assert back.filter("id = 42").first()["name"] == "name42"
        # filter + projection reach the ORC scan like the parquet path
        plan = (
            back.filter(F.col("id") > 90)
            .select("id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(id), GreaterThan(id,90)]" in plan
        assert "ReadSchema: struct<id:bigint>" in plan

    def test_rows_per_file_chunking(self, spark, tmp_path):
        import glob

        from openaq_data_pipeline_spark.sources.lake import write_orc

        df = spark.createDataFrame(
            [(i,) for i in range(100)], "id long"
        ).coalesce(1)
        p = str(tmp_path / "orc_chunks")
        write_orc(df, p, rows_per_file=25)
        files = glob.glob(f"{p}/*.orc")
        assert len(files) == 4
