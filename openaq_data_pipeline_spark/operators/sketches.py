"""Persisted mergeable-sketch rollups — pre-aggregated distinct
counts that answer arbitrary-range queries WITHOUT rescanning facts.

The pattern every warehouse ships for 100 TB distinct-count
dashboards: distinct counts don't sum across partitions
(|A ∪ B| ≠ |A| + |B|), so per-partition COUNTS are useless for
range rollups — but HLL SKETCHES merge losslessly. Materialize one
sketch per (grain, group) once at ingest; any later range query
unions the covered sketches — cost proportional to the number of
grains touched, never to fact rows. Spark 3.5+ exposes the Apache
DataSketches HllSketch binary (`hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`), so the sketch column is an ordinary BINARY
table column and the persisted table is a plain parquet/bucketed
table like every other index in this engine.

Determinism: the HllSketch update path is seed-fixed in the library,
so the SAME rows at the SAME lgConfigK produce byte-identical
sketches — which is why the test can assert merged-rollup estimate
== direct full-scan estimate EXACTLY, not within an error band.
(Estimates vs TRUE counts still carry the usual ~1-2% HLL error;
equality holds between two sketch paths over the same data.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_sketch_rollup(
    facts: DataFrame,
    grain_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    lg_config_k: int = 12,
) -> DataFrame:
    """(grain, *group_cols, n_rows, distinct_sketch) — one HLL
    sketch of ``value_col`` per (grain, groups) cell, plus the exact
    row count (counts DO sum, so they ride along for free). One
    partial-aggregable pass over the facts; persist the result with
    ``save_bucketed``/parquet and append per new grain."""
    groups = [grain_col, *(group_cols or [])]
    return facts.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_config_k)).alias(
            "distinct_sketch"
        ),
    )


def rollup_distinct(
    rollup: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge a (filtered) sketch-rollup slice back to estimates:
    (*group_cols, n_rows, distinct_est). Filter the rollup by grain
    range BEFORE calling (partition pruning applies — the fact table
    is never touched). With no ``group_cols`` the whole slice folds
    to one row."""
    agg = [
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("distinct_sketch"), F.lit(True))
        ).alias("distinct_est"),
    ]
    if group_cols:
        return rollup.groupBy(*group_cols).agg(*agg)
    return rollup.agg(*agg)
