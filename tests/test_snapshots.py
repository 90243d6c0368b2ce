"""Atomic versioned snapshot publish (sources/snapshots.py): pointer
semantics, time travel, crash safety, orphan handling, pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.sources.snapshots import (
    current_version,
    list_snapshots,
    prune_snapshots,
    publish_snapshot,
    read_snapshot,
)


def _df(spark, tag, n=20):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


class TestPublishAndRead:
    def test_publish_read_time_travel(self, spark, tmp_path):
        root = str(tmp_path / "corpus")
        v1 = publish_snapshot(_df(spark, "a"), root)
        v2 = publish_snapshot(_df(spark, "b", n=30), root)
        assert (v1, v2) == (1, 2)
        assert current_version(root) == 2
        latest = read_snapshot(spark, root)
        assert latest.count() == 30
        assert latest.select("tag").distinct().first()[0] == "b"
        pinned = read_snapshot(spark, root, version=1)
        assert pinned.count() == 20
        assert pinned.select("tag").distinct().first()[0] == "a"

    def test_read_unpublished_raises(self, spark, tmp_path):
        root = str(tmp_path / "empty")
        os.makedirs(root)
        with pytest.raises(ValueError, match="no published snapshot"):
            read_snapshot(spark, root)
        publish_snapshot(_df(spark, "a"), root)
        with pytest.raises(ValueError, match="v=9 does not exist"):
            read_snapshot(spark, root, version=9)

    def test_reader_pinned_through_publish(self, spark, tmp_path):
        """The reproducibility contract: a reader holding version N
        is untouched by a later publish — published dirs are
        immutable."""
        root = str(tmp_path / "pin")
        publish_snapshot(_df(spark, "a"), root)
        pinned = read_snapshot(spark, root, version=1)
        before = sorted(tuple(r) for r in pinned.collect())
        publish_snapshot(_df(spark, "b", n=5), root)
        after = sorted(tuple(r) for r in pinned.collect())
        assert after == before
        assert read_snapshot(spark, root).count() == 5


class TestCrashSafety:
    def test_failed_write_leaves_pointer_untouched(self, spark, tmp_path):
        root = str(tmp_path / "crash")
        publish_snapshot(_df(spark, "good"), root)
        bad = _df(spark, "bad").withColumn(
            "boom", F.expr("raise_error('simulated executor failure')")
        )
        with pytest.raises(Exception, match="simulated"):
            publish_snapshot(bad, root)
        # pointer still names the good snapshot; readers unaffected
        assert current_version(root) == 1
        assert read_snapshot(spark, root).count() == 20
        # the orphan (if any files landed) is visible as uncommitted
        orphans = [s for s in list_snapshots(root) if not s["committed"]]
        for o in orphans:
            assert not o["published"]

    def test_publish_skips_orphaned_version_dirs(self, spark, tmp_path):
        root = str(tmp_path / "orphan")
        publish_snapshot(_df(spark, "a"), root)
        os.makedirs(os.path.join(root, "v=2"))  # crashed publish stub
        v = publish_snapshot(_df(spark, "c"), root)
        assert v == 3
        assert read_snapshot(spark, root).select("tag").first()[0] == "c"


class TestPrune:
    def test_prune_keeps_published_and_recent(self, spark, tmp_path):
        root = str(tmp_path / "prune")
        for tag in "abcd":
            publish_snapshot(_df(spark, tag), root)
        os.makedirs(os.path.join(root, "v=9"))  # orphan
        removed = prune_snapshots(root, keep_last=2)
        assert set(removed) == {1, 2, 9}
        left = {s["version"] for s in list_snapshots(root)}
        assert left == {3, 4}
        assert read_snapshot(spark, root).select("tag").first()[0] == "d"
        # published version survives even keep_last=0
        removed = prune_snapshots(root, keep_last=0)
        assert set(removed) == {3}
        assert read_snapshot(spark, root).count() == 20
