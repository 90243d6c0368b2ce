"""Fixed-point PageRank (operators/graph.py, r8): structural
ranking properties, exact-arithmetic reproducibility against a
pure-Python replay, and mass accounting."""

from __future__ import annotations

import pytest

from openaq_data_pipeline_spark.operators.graph import (
    SCALE,
    pagerank_fixed_point,
)


def _run(spark, edges, n_iters=3):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.p
        for r in pagerank_fixed_point(df, n_iters=n_iters).collect()
    }


def _python_replay(edges, n_iters, redistribute=False):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    p = {v: SCALE // n for v in nodes}
    base = (3 * SCALE) // (20 * n)
    for _ in range(n_iters):
        dang = sum(p[v] for v in nodes if v not in outdeg)
        dt = (17 * (dang // n)) // 20 if redistribute else 0
        contrib = {v: 0 for v in nodes}
        for s, d in edges:
            contrib[d] += p[s] // outdeg[s]
        p = {v: base + dt + (17 * contrib[v]) // 20 for v in nodes}
    return p


class TestPagerank:
    # undirected star: hub 0 linked to 1..5
    STAR = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]

    def test_hub_outranks_leaves(self, spark):
        got = _run(spark, self.STAR)
        hub, leaves = got[0], [got[i] for i in range(1, 6)]
        assert all(hub > l for l in leaves)
        assert len(set(leaves)) == 1  # symmetric leaves tie exactly

    def test_matches_python_replay_exactly(self, spark):
        for g in (self.STAR, [(1, 2), (2, 3), (3, 1), (1, 3)]):
            assert _run(spark, g, 4) == _python_replay(g, 4)

    def test_mass_never_exceeds_scale(self, spark):
        # truncation and (here absent) dangling loss only REMOVE mass
        got = _run(spark, self.STAR, 5)
        assert sum(got.values()) <= SCALE

    def test_zero_iters_is_uniform_start(self, spark):
        got = _run(spark, self.STAR, 0)
        assert set(got.values()) == {SCALE // 6}

    def test_dangling_redistribution_matches_replay(self, spark):
        from openaq_data_pipeline_spark.operators.graph import (
            pagerank_fixed_point,
        )

        # 2 is a sink; 4 only receives — directed chain + branch
        g = [(1, 2), (3, 2), (3, 4)]
        df = spark.createDataFrame(g, "src long, dst long")
        got = {
            r.node: r.p
            for r in pagerank_fixed_point(
                df, n_iters=3, redistribute_dangling=True
            ).collect()
        }
        assert got == _python_replay(g, 3, redistribute=True)
        # redistribution strictly increases every node's rank vs the
        # mass-dropping base recurrence on a graph WITH sinks
        base = _python_replay(g, 3, redistribute=False)
        assert all(got[v] >= base[v] for v in got)
        assert sum(got.values()) > sum(base.values())

    def test_empty_edges_raises(self, spark):
        with pytest.raises(ValueError):
            pagerank_fixed_point(
                spark.createDataFrame([], "src long, dst long")
            ).collect()
