"""Z-order clustered layout (sources/layout.py): Morton-value
exactness, and the multi-dimensional file-skipping property measured
from real parquet footers — the z-layout prunes range predicates on
EVERY clustered dimension, where a single-column sort prunes only its
own."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from openaq_data_pipeline_spark.sources.layout import (
    file_minmax_stats,
    files_overlapping,
    write_zordered,
    zvalue,
)


def _ref_z(vals: list[int], bits: int) -> int:
    n = len(vals)
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (n * i + j)
    return z


class TestZvalue:
    def test_matches_reference(self, spark):
        rng = random.Random(42)
        rows = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(200)
        ]
        df = spark.createDataFrame(rows, "x long, y long, w long")
        for cols, bits in [(["x", "y"], 8), (["x", "y", "w"], 8), (["x"], 16)]:
            got = df.select(
                *cols, zvalue(cols, bits).alias("z")
            ).collect()
            for r in got:
                assert r["z"] == _ref_z([r[c] for c in cols], bits)

    def test_z_is_monotone_in_locality(self, spark):
        # points equal in both dims share a z; moving one dim's low
        # bit moves z by a small amount — spot the interleave pattern
        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (1, 1)], "x long, y long"
        )
        z = {
            (r["x"], r["y"]): r["z"]
            for r in df.select("x", "y", zvalue(["x", "y"], 4).alias("z")).collect()
        }
        assert z == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}

    def test_validation(self, spark):
        import pytest

        with pytest.raises(ValueError):
            zvalue([], 8)
        with pytest.raises(ValueError):
            zvalue(["a", "b", "c", "d"], 16)  # 64 bits > 62


class TestZorderedLayout:
    def _grid(self, spark, n=20000):
        return spark.range(n).select(
            (F.col("id") % 256).alias("x"),
            ((F.col("id") * 7919) % 256).alias("y"),
            F.col("id").alias("payload"),
        )

    def test_prunes_on_every_dimension(self, spark, tmp_path):
        df = self._grid(spark)
        zpath = str(tmp_path / "zordered")
        spath = str(tmp_path / "xsorted")
        write_zordered(df, zpath, ["x", "y"], bits=8, n_files=16)
        # the one-dimensional strawman: same file count, sorted on x
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(spath)
        )
        lo, hi = 64, 95  # a 1/8-of-range predicate
        zx = files_overlapping(file_minmax_stats(zpath, "x"), lo, hi)
        zy = files_overlapping(file_minmax_stats(zpath, "y"), lo, hi)
        sx = files_overlapping(file_minmax_stats(spath, "x"), lo, hi)
        sy = files_overlapping(file_minmax_stats(spath, "y"), lo, hi)
        n_z = len(file_minmax_stats(zpath, "x"))
        n_s = len(file_minmax_stats(spath, "x"))
        assert n_z >= 8 and n_s >= 8
        # z-layout: BOTH dimensions prune (files form 2-D tiles).
        # Bound is variance-aware: repartitionByRange samples its
        # boundaries, so tile edges shift run to run and a 1/8-range
        # predicate can graze one extra tile row/column; 5/8 of the
        # files is still far below the strawman's no-pruning floor
        # (ideal tiling reads 4/16; sampling noise was observed at 9).
        assert zx <= n_z * 5 // 8, f"x predicate reads {zx}/{n_z} z-files"
        assert zy <= n_z * 5 // 8, f"y predicate reads {zy}/{n_z} z-files"
        # x-sort: own column prunes hard, the other not at all
        assert sx <= max(3, n_s // 4)
        assert sy >= n_s - 1, "x-sorted layout shouldn't prune y"

    def test_content_unchanged_and_filters_pushed(self, spark, tmp_path):
        df = self._grid(spark, n=5000)
        zpath = str(tmp_path / "zcontent")
        write_zordered(df, zpath, ["x", "y"], bits=8, n_files=8)
        back = spark.read.parquet(zpath)
        assert back.count() == 5000
        assert (
            back.agg(F.sum("payload")).first()[0]
            == df.agg(F.sum("payload")).first()[0]
        )
        q = back.filter((F.col("x") >= 10) & (F.col("x") < 20))
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "GreaterThanOrEqual(x,10)" in plan
