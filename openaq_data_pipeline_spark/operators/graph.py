"""Iterative graph scoring on DataFrames — PageRank in exact integer
fixed-point arithmetic.

Web-scale training-data curation ranks crawl URLs by link-graph
centrality before anything else touches the page (the public
CommonCrawl ranking releases are exactly this: harmonic centrality
and PageRank over the host graph). The engine therefore ships the
iterative-graph primitive, expressed the way Pregel-class systems
run it on a cluster: ranks live in a node table, each superstep is
one edge-keyed join (scatter the rank shares along out-edges) plus
one partial-aggregable groupBy (gather per destination), and the
loop materializes per iteration to cut lineage — the same
bounded-rounds discipline as the BPE trainer and the Lloyd
quantizer (`tokenizer.py`, `similarity.py`).

Determinism contract: the damping factor 0.85 is rational (17/20),
so the whole recurrence runs in 64-bit integer arithmetic at
``SCALE`` fixed-point —

    share(u)   = p(u) div outdeg(u)
    contrib(v) = Σ_{u→v} share(u)
    p'(v)      = (3·SCALE) div (20·N)  +  (17·contrib(v)) div 20

— order-free BIGINT sums, bit-identical in any engine, so a
chained-CTE SQL oracle can replay every superstep. Truncating
``div`` drops sub-fixed-point mass (≤ outdeg ulps per node per
round) and DANGLING-node mass leaves the system entirely (the
documented simple variant; production graphs add a dangling-mass
redistribution term — one extra scalar aggregate per round).
Both losses only shrink scores; they never reorder two nodes whose
true ranks differ by more than N ulps.

Scale shape per superstep: the node table is |V|-sized (vocab-class,
not corpus-class), the scatter join keys on src and the gather
shuffles on dst — both partial-aggregable, skew-bounded by max
degree (a web-scale run pre-splits super-nodes exactly like the
salted-agg idiom in queries_ext). Driver-side state: N, one scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank_fixed_point(
    edges: DataFrame,
    n_iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = SCALE,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """(node, p) after ``n_iters`` supersteps from the uniform start
    ``p0 = scale div N`` over the node set = src ∪ dst of ``edges``
    (distinct directed edges; pass both directions for an undirected
    walk). ``p`` is the SCALE-fixed-point rank.

    ``redistribute_dangling=True`` adds the standard correction for
    sink nodes: their rank mass, which the simple recurrence drops,
    is summed (ONE scalar aggregate per round — same bounded-collect
    class as N) and shared uniformly, still in exact integers:
    ``p'(v) += (17 · (D div N)) div 20`` where D = Σ p(dangling).
    On a symmetric edge set there are no dangling nodes and the term
    is exactly zero — the driver query proves the base recurrence,
    pytest proves the correction."""
    if n_iters < 0:
        raise ValueError("n_iters must be >= 0")
    # (r16 audit: repartitioning e by src before the checkpoint was
    # tried and REVERTED — under AQE a localCheckpoint's LogicalRDD
    # carries UnknownPartitioning, so the scatter join cannot reuse
    # it and the extra exchange bought nothing; the scatter join's
    # small side (node-sized shares) broadcasts anyway.)
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty edge set")
    # node-count-sized and read by every superstep — materialize once
    # instead of re-aggregating the edge list each round
    outdeg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=False)
    )
    base = (3 * scale) // (20 * n)
    ranks = nodes.select("node", F.lit(scale // n).alias("p"))
    for _ in range(n_iters):
        with_deg = ranks.join(outdeg, "node", "left")
        shares = with_deg.where(F.col("outdeg").isNotNull()).select(
            F.col("node").alias("src"),
            F.expr("p div outdeg").alias("share"),
        )
        dang_term = 0
        if redistribute_dangling:
            row = (
                with_deg.where(F.col("outdeg").isNull())
                .agg(F.sum("p").alias("d"))
                .first()
            )
            dangling = int(row["d"] or 0)
            dang_term = (17 * (dangling // n)) // 20
        contrib = (
            e.join(shares, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base + dang_term)
                    + F.expr("(17 * coalesce(contrib, 0)) div 20")
                ).cast("long").alias("p"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
