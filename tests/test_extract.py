"""End-to-end §3.1 ingestion lifecycle with injected transports:
control CSV → per-id fetch → locations lake → sensor ids → paginated
fetch → measurements lake → bronze ingest → transform → mart rows."""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.plans.extract import (
    extract_locations,
    extract_measurements,
)
from openaq_data_pipeline_spark.plans.runner import PipelinePaths, ingest, transform

DS = "2026-02-01"
RUN = "scheduled__2026-02-01T06:00:00+00:00"


# The fake transports are built as closures (factory functions whose
# bodies reference nothing module-level): cloudpickle then serializes
# them by value, so Spark workers — which cannot import this test
# module — can still run them inside mapInPandas.


def make_fake_locations_fetch():
    def fetch(url: str, params: dict):
        key = int(url.rsplit("/", 1)[1])
        if key == 404404:
            return 404, None
        payload = {
            "results": [
                {
                    "id": key,
                    "name": f"Station {key}",
                    "locality": "Springfield",
                    "city": None,
                    "timezone": "America/Chicago",
                    "country": {"code": "US", "name": "United States"},
                    "coordinates": {"latitude": 39.8, "longitude": -89.6},
                    "provider": {"name": "AirNow"},
                    "isMobile": False,
                    "isMonitor": True,
                    "sensors": [
                        {
                            "id": key * 10 + 1,
                            "name": "pm25",
                            "parameter": {"id": 2, "name": "pm25", "units": "µg/m³"},
                        }
                    ],
                }
            ]
        }
        return 200, payload

    return fetch


def make_fake_measurements_fetch(ds: str):
    def fetch(url: str, params: dict):
        sensor_id = int(url.split("/sensors/")[1].split("/")[0])
        recs = [
            {
                "value": 10.0 + i,
                "parameter": {"id": 2, "name": "pm25", "units": "µg/m³"},
                "period": {
                    "datetimeFrom": {"utc": f"{ds}T0{i}:10:00Z"},
                    "datetimeTo": {"utc": f"{ds}T0{i}:10:00Z"},
                    "interval": "01:00:00",
                },
                "flagInfo": {"hasFlags": False},
            }
            for i in range(3)
        ]
        return 200, {"results": recs, "sensor": sensor_id}

    return fetch


fake_locations_fetch = make_fake_locations_fetch()
fake_measurements_fetch = make_fake_measurements_fetch(DS)


@pytest.fixture()
def lifecycle(spark, tmp_path):
    control = tmp_path / "control.csv"
    control.write_text("id,requested_by\n1,ops\n2,ops\n404404,ops\n")
    lake_loc = str(tmp_path / "lake" / "locations")
    lake_mea = str(tmp_path / "lake" / "measurements")

    n_loc = extract_locations(
        spark, str(control), lake_loc, RUN, DS, fetch=fake_locations_fetch
    )
    n_mea = extract_measurements(
        spark,
        lake_loc + "/*/*/*/*.json",
        lake_mea,
        RUN,
        DS,
        date_to="2026-02-02",
        fetch=fake_measurements_fetch,
    )
    return dict(
        n_loc=n_loc, n_mea=n_mea, lake_loc=lake_loc, lake_mea=lake_mea, tmp=tmp_path
    )


class TestExtractionLifecycle:
    def test_counts_include_404_null_rows(self, lifecycle):
        assert lifecycle["n_loc"] == 3  # two found + one 404 null-data row
        assert lifecycle["n_mea"] == 6  # 2 sensors × 3 records (404 loc has none)

    def test_lake_layout_and_audit(self, spark, lifecycle):
        files = glob.glob(lifecycle["lake_loc"] + "/2026/02/01/*.json")
        assert files  # Hive-style YYYY/MM/DD date path (F14)
        with open(files[0]) as f:
            row = json.loads(f.readline())
        assert row["_audit_run_id"] == RUN
        assert row["_audit_source"] == "OpenAQ API"
        assert row["_audit_logical_date"] == DS

    def test_lake_feeds_the_batch_pipeline(self, spark, lifecycle):
        paths = PipelinePaths(
            root=str(lifecycle["tmp"] / "wh"),
            lake_locations=lifecycle["lake_loc"] + "/*/*/*/*.json",
            lake_measurements=lifecycle["lake_mea"] + "/*/*/*/*.json",
        )
        counts = ingest(spark, paths)
        assert counts == {"raw_locations": 3, "raw_measurements": 6}
        models = transform(spark, paths)
        mart = models["mart_location_air_quality"]
        rows = {
            (r["location_id"], r["hour_utc"]): r["pm25_ugm3"] for r in mart.collect()
        }
        # 2 locations × 3 hourly buckets, avg == the single reading
        assert len(rows) == 6
        assert rows[(1, 0)] == 10.0 and rows[(2, 2)] == 12.0

    def test_empty_control_branches_to_no_files(self, spark, tmp_path):
        control = tmp_path / "empty.csv"
        control.write_text("id,requested_by\n")
        lake_loc = str(tmp_path / "lake2" / "locations")
        n = extract_locations(
            spark, str(control), lake_loc, RUN, DS, fetch=fake_locations_fetch
        )
        assert n == 0
        assert not glob.glob(lake_loc + "/**/*.json", recursive=True)

    def test_rerun_is_idempotent(self, spark, lifecycle):
        n2 = extract_locations(
            spark,
            str(lifecycle["tmp"] / "control.csv"),
            lifecycle["lake_loc"],
            RUN,
            DS,
            fetch=fake_locations_fetch,
        )
        assert n2 == 3  # overwrite-per-date ≙ delete-before-write
        files = glob.glob(lifecycle["lake_loc"] + "/2026/02/01/*.json")
        spark_rows = spark.read.json(lifecycle["lake_loc"] + "/2026/02/01").count()
        assert spark_rows == 3
