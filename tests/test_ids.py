"""Global contiguous id assignment (operators/ids.py): exactness vs
the naive single-partition window, contiguity, multi-partition
correctness, and the no-second-corpus-shuffle plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.ids import assign_global_ids


def _corpus(spark, n=10_000):
    # non-monotonic unique key so ordering is real work
    return spark.range(n).select(
        ((F.col("id") * 7919) % n).alias("key"),
        F.col("id").alias("payload"),
    )


class TestAssignGlobalIds:
    def test_matches_global_row_number(self, spark):
        df = _corpus(spark)
        got = assign_global_ids(df, "key", n_partitions=8).collect()
        by_key = {r["key"]: r["global_id"] for r in got}
        for k in sorted(by_key):
            assert by_key[k] == k  # key is a permutation of 0..n-1

    def test_contiguous_from_start(self, spark):
        df = _corpus(spark, n=997)  # prime → uneven partitions
        ids = sorted(
            r["global_id"]
            for r in assign_global_ids(
                df, "key", start=100, n_partitions=7
            ).collect()
        )
        assert ids == list(range(100, 100 + 997))

    def test_single_partition_degenerate(self, spark):
        df = _corpus(spark, n=50)
        ids = sorted(
            r["global_id"]
            for r in assign_global_ids(df, "key", n_partitions=1).collect()
        )
        assert ids == list(range(50))

    def test_preserves_columns_and_rejects_collision(self, spark):
        df = _corpus(spark, n=20)
        out = assign_global_ids(df, "key")
        assert out.columns == ["key", "payload", "global_id"]
        with pytest.raises(ValueError, match="already exists"):
            assign_global_ids(out, "key")

    def test_one_range_exchange_no_global_sort(self, spark):
        df = _corpus(spark)
        out = assign_global_ids(df, "key", n_partitions=8)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the corpus moves through exactly one range exchange (inside
        # the checkpointed subplan, already executed); the visible
        # plan must not sort globally or re-shuffle the corpus — the
        # MapInPandas numbering pass must read the checkpointed
        # partitions directly (no Exchange between scan and numbering;
        # the one pid exchange in the plan moves partial-aggregated
        # COUNTS, n_partitions rows, not the corpus)
        assert "rangepartitioning" not in plan.lower()
        corpus_side = plan[
            plan.index("MapInPandas") : plan.index("BroadcastQueryStage")
        ]
        assert "Exchange" not in corpus_side
        assert "Scan ExistingRDD" in corpus_side
        assert "BroadcastHashJoin" in plan
