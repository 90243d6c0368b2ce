"""Shared pytest fixtures: one SparkSession per test session, plus
the OpenAQ-shaped fixture lake and its bronze/transform outputs."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from openaq_data_pipeline_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    import json

    extra = {
        "spark.driver.memory": "4g",
        # partest.py runs shards as concurrent pytest processes;
        # managed tables (saveAsTable) must not collide across
        # their in-memory catalogs, so each shard gets its own
        # warehouse root via this env var
        "spark.sql.warehouse.dir": os.environ.get(
            "SPARK_TEST_WAREHOUSE", "/tmp/spark-wh"
        ),
    }
    # ad-hoc conf overrides for suite-latency experiments (r17), e.g.
    # SPARK_TEST_EXTRA_CONF='{"spark.sql.codegen.wholeStage":"false"}'
    extra.update(json.loads(os.environ.get("SPARK_TEST_EXTRA_CONF", "{}")))
    spark = get_spark(
        app_name="openaq-tests",
        master=os.environ.get("SPARK_TEST_MASTER", "local[4]"),
        shuffle_partitions=int(os.environ.get("SPARK_TEST_SHUFFLE", "4")),
        extra_conf=extra,
    )
    yield spark


@pytest.fixture(scope="session")
def fixture_lake(tmp_path_factory):
    from fixtures_openaq import write_lake

    root = tmp_path_factory.mktemp("lake")
    return write_lake(str(root))


@pytest.fixture(scope="session")
def pipeline(spark, fixture_lake, tmp_path_factory):
    """Ingested + transformed fixture pipeline (lazy model dict)."""
    from openaq_data_pipeline_spark.plans.runner import PipelinePaths, ingest, transform

    root = str(tmp_path_factory.mktemp("wh"))
    paths = PipelinePaths(
        root=root,
        lake_locations=fixture_lake["locations"],
        lake_measurements=fixture_lake["measurements"],
    )
    counts = ingest(spark, paths)
    models = transform(spark, paths)
    return {"counts": counts, "models": models, "paths": paths}
