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


class TestGlobalCumsum:
    """Two-phase global running sum (r8) — the weight analogue of
    assign_global_ids, feeding pps_systematic_sample."""

    def test_matches_python_cumsum(self, spark):
        from openaq_data_pipeline_spark.operators.ids import (
            assign_global_cumsum,
        )

        rows = [(i, (i * 7) % 11 + 1) for i in range(500)]
        df = spark.createDataFrame(rows, "k long, w long")
        got = {
            r.k: r.cum_weight
            for r in assign_global_cumsum(df, "k", "w").collect()
        }
        run = 0
        for k, w in rows:
            run += w
            assert got[k] == run

    def test_no_single_partition_window(self, spark):
        from openaq_data_pipeline_spark.operators.ids import (
            assign_global_cumsum,
        )

        df = spark.createDataFrame(
            [(i, 1) for i in range(100)], "k long, w long"
        )
        plan = (
            assign_global_cumsum(df, "k", "w")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the corpus-sized side (the MapInPandas branch down to its
        # scan) must never pass through a global window / single
        # partition; the offsets window runs over n_partitions rows
        # only, inside the broadcast branch below a HashAggregate
        lines = plan.splitlines()
        start = next(i for i, l in enumerate(lines) if "MapInPandas" in l)
        end = next(
            i for i, l in enumerate(lines) if "BroadcastExchange" in l
        )
        corpus_branch = "\n".join(lines[start:end])
        assert "SinglePartition" not in corpus_branch
        assert "Window" not in corpus_branch
        # and the single-partition exchange that DOES exist feeds the
        # offsets window from an aggregate, not from the corpus
        sp = next(i for i, l in enumerate(lines) if "SinglePartition" in l)
        assert any("HashAggregate" in l for l in lines[sp:sp + 3])

    def test_name_collision_raises(self, spark):
        import pytest as _p

        from openaq_data_pipeline_spark.operators.ids import (
            assign_global_cumsum,
        )

        df = spark.createDataFrame([(1, 2)], "k long, cum_weight long")
        with _p.raises(ValueError):
            assign_global_cumsum(df, "k", "cum_weight")


class TestPpsSystematicSample:
    def _sample(self, spark, rows, k):
        from openaq_data_pipeline_spark.operators.curation import (
            pps_systematic_sample,
        )

        df = spark.createDataFrame(rows, "doc_id long, w long")
        return pps_systematic_sample(df, "w", "doc_id", k=k).collect()

    def test_uniform_weights_pick_every_nth(self, spark):
        rows = [(i, 1) for i in range(100)]
        got = sorted(r.doc_id for r in self._sample(spark, rows, 10))
        # W=100, k=10: selection points at cum multiples of 10 →
        # rows with cum_weight 10,20,...,100 = ids 9,19,...,99
        assert got == [9, 19, 29, 39, 49, 59, 69, 79, 89, 99]

    def test_heavy_item_collapses_not_duplicates(self, spark):
        # one row carries 80% of the mass: it covers several selection
        # points but is returned ONCE; sample size < k by the collapse
        rows = [(0, 80), (1, 5), (2, 5), (3, 5), (4, 5)]
        got = self._sample(spark, rows, 10)
        ids = [r.doc_id for r in got]
        assert ids.count(0) == 1
        heavy = next(r for r in got if r.doc_id == 0)
        assert heavy.pick_no == 8  # covers points 1..8 (cum 80 → 8·W/k)
        assert len(got) == len(set(ids))

    def test_zero_total_raises(self, spark):
        import pytest as _p

        with _p.raises(ValueError):
            self._sample(spark, [(0, 0)], 5)
