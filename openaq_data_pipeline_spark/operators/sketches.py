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


# --- quantile rollups (r8): KLL beside the HLL tier ---------------------
#
# Same pre-aggregation pattern for PERCENTILES: quantiles don't merge
# from per-partition quantiles, but KLL sketches (Karnin, Lang &
# Liberty 2016; Spark 4 ships the DataSketches impl as
# kll_sketch_agg_* / kll_sketch_merge_* / kll_sketch_get_*) do —
# materialize one sketch per (grain, group) at ingest, answer any
# later range-percentile query by folding the covered sketches.
# Unlike hll_union_agg there is no KLL merge AGGREGATE, only the
# two-sketch scalar — the fold below runs over collect_list, which is
# bounded by GRAINS PER GROUP (rollup rows, e.g. hours in the asked
# range), never fact rows. Unlike the HLL tier the sketches are NOT
# byte-deterministic (KLL compaction samples), so tests assert the
# published rank-error bound, not byte equality.

_KLL_SUFFIX = {"bigint": "bigint", "double": "double"}


def _kll_value_type(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "bigint"
    if s in ("float", "double"):
        return "double"
    raise ValueError(f"KLL rollup needs a numeric value column, got {s}")


def build_quantile_rollup(
    facts: DataFrame,
    grain_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 200,
) -> DataFrame:
    """(grain, *group_cols, n_rows, quantile_sketch) — one KLL sketch
    of ``value_col`` per (grain, groups) cell. Integer columns sketch
    as bigint, float columns as double; pass the SAME family to the
    query functions (the binary formats differ). ``k`` trades sketch
    size for rank error (k=200 ≈ 1.7% worst-case single-sided)."""
    vt = _kll_value_type(facts.schema[value_col].dataType)
    agg_fn = getattr(F, f"kll_sketch_agg_{vt}")
    groups = [grain_col, *(group_cols or [])]
    return facts.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_rows"),
        agg_fn(F.col(value_col).cast(vt), F.lit(k)).alias("quantile_sketch"),
    )


def _kll_fold(arr_col, value_type: str):
    """Fold a collected sketch array through the two-sketch merge:
    init = first sketch, merge the rest. Bounded by grains-per-group."""
    merge_fn = getattr(F, f"kll_sketch_merge_{value_type}")
    return F.aggregate(
        F.slice(arr_col, 2, F.greatest(F.size(arr_col) - 1, F.lit(0))),
        F.get(arr_col, 0),
        lambda acc, x: merge_fn(acc, x),
    )


def _merged_slice(
    rollup: DataFrame, group_cols: list[str] | None, value_type: str
):
    """(grouped, merged): the shared group → collect_list → fold
    scaffolding behind both query functions — one place to evolve the
    merge path."""
    if value_type not in _KLL_SUFFIX:
        raise ValueError(f"value_type must be one of {sorted(_KLL_SUFFIX)}")
    base = [
        F.sum("n_rows").alias("n_rows"),
        F.collect_list("quantile_sketch").alias("__sk"),
    ]
    grouped = (
        rollup.groupBy(*group_cols).agg(*base)
        if group_cols
        else rollup.agg(*base)
    )
    return grouped, _kll_fold(F.col("__sk"), value_type)


def rollup_quantiles(
    rollup: DataFrame,
    probs: list[float],
    group_cols: list[str] | None = None,
    value_type: str = "bigint",
) -> DataFrame:
    """Merge a (filtered) quantile-rollup slice back to estimates:
    (*group_cols, n_rows, q_<p>...). Filter the rollup by grain range
    BEFORE calling — the fact table is never touched. Column naming:
    p=0.5 → ``q_0_5``."""
    grouped, merged = _merged_slice(rollup, group_cols, value_type)
    q_fn = getattr(F, f"kll_sketch_get_quantile_{value_type}")
    cols = [*(group_cols or []), "n_rows"] + [
        q_fn(merged, F.lit(p)).alias(f"q_{str(p).replace('.', '_')}")
        for p in probs
    ]
    return grouped.select(*cols)


def rollup_rank(
    rollup: DataFrame,
    value,
    group_cols: list[str] | None = None,
    value_type: str = "bigint",
) -> DataFrame:
    """(*group_cols, n_rows, rank) — the estimated fraction of rows
    with ``value_col`` ≤ ``value`` over the merged slice: the SLA
    query ('what share of latencies in this range were under X')
    without rescanning facts."""
    grouped, merged = _merged_slice(rollup, group_cols, value_type)
    r_fn = getattr(F, f"kll_sketch_get_rank_{value_type}")
    cols = [*(group_cols or []), "n_rows",
            r_fn(merged, F.lit(value).cast(value_type)).alias("rank")]
    return grouped.select(*cols)
