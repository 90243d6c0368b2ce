"""Z-order (Morton-curve) clustered parquet layout: multi-dimensional
data clustering so range filters on ANY clustered dimension skip most
files via parquet row-group/file min-max statistics.

The problem at 100 TB: a table range-partitioned (or sorted) on one
column prunes scans on that column perfectly and on every other
column not at all — each file spans the full range of the secondary
dimensions, so its min/max stats never exclude it. Interleaving the
bits of N dimensions into one Morton value and range-partitioning +
sorting on THAT gives every file a contiguous z-range, which maps to
a small hyper-rectangle of the original space: per-file min/max of
EVERY clustered column is narrow, and the parquet reader's stats
filter (plus Spark's partition-level skipping) drops most files for
a selective predicate on any of them. This is the clustering scheme
behind public lakehouse OPTIMIZE ZORDER implementations; the curve
itself is Morton 1966.

Everything is codegen Column arithmetic (`aggregate` over
`sequence` with shift/mask lambdas) — no UDF; the write is one
`repartitionByRange` (range exchange with a sampled-boundaries pass)
plus an in-partition sort, exactly the shuffle a sorted write costs
anyway.

No counterpart exists in the reference (its lake is loaded by
Airflow into BigQuery, which z-orders internally via its own
CLUSTER BY); this is the self-managed-parquet equivalent of
reference `dags/openaq_ingestion_dag.py`'s partitioned-lake layout
discipline, one ring further.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZVAL_COL = "__zval"


def zvalue(cols: list[str], bits: int = 16) -> Column:
    """Morton value interleaving the low ``bits`` bits of each column
    in ``cols`` (column i contributes bit position n*j + i for its
    j-th bit). Inputs must be non-negative integers < 2**bits — the
    caller normalizes (rank, min-max scale, or modulo) because only
    the caller knows the dimension's distribution; out-of-range bits
    are masked off rather than silently corrupting neighbors.

    Pure codegen: one ``aggregate`` over ``sequence(0, bits-1)`` with
    shift/mask arithmetic — no UDF, no shuffle."""
    if not cols:
        raise ValueError("zvalue needs at least one column")
    n = len(cols)
    if n * bits > 62:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} interleaved bits "
            "won't fit a signed 64-bit z-value"
        )
    terms = " + ".join(
        f"shiftleft(shiftright(cast(`{c}` as bigint), i) & 1L, {n}*i + {j})"
        for j, c in enumerate(cols)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc + {terms})"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    ``cols``: range-repartition into ``n_files`` contiguous z-ranges,
    sort within each, drop the helper column. Each output file then
    covers a hyper-rectangle of the clustered dimensions, so its
    min/max stats prune scans filtered on ANY of them (pinned by
    tests/test_layout.py against the single-column-sort layout that
    prunes only its own column).

    One range exchange (with Spark's sampled-boundary pass) — the
    same cost as any globally-sorted write. ``n_files`` at cluster
    scale = target file size / input size; here it is explicit so
    tests control the layout exactly."""
    (
        df.withColumn(ZVAL_COL, zvalue(cols, bits))
        .repartitionByRange(n_files, ZVAL_COL)
        .sortWithinPartitions(ZVAL_COL)
        .drop(ZVAL_COL)
        .write.mode(mode)
        .parquet(path)
    )


def file_minmax_stats(path: str, column: str) -> list[tuple[str, int, int]]:
    """(file, min, max) of ``column`` per data file, read from parquet
    FOOTERS via pyarrow — zero row reads, the same metadata the
    engine's stats filter consults. This is the observability hook
    the layout tests (and a capacity planner deciding whether to
    re-cluster) use to measure how many files a range predicate must
    touch."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet") or name.startswith(("_", ".")):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((name, lo, hi))
    return out


def files_overlapping(
    stats: list[tuple[str, int, int]], lo: int, hi: int
) -> int:
    """How many files a [lo, hi] range predicate must read given
    per-file min/max stats — the planner-side pruning arithmetic."""
    return sum(1 for _, fmin, fmax in stats if fmax >= lo and fmin <= hi)
