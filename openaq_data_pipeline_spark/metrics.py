"""Post-execution plan observability: per-node SQL metrics and scan
summaries straight from the executed physical plan.

At 100 TB the question after every run is "what did this actually
READ?" — rows surviving pushdown, files touched after pruning, bytes
off disk. Spark tracks all of it in per-node SQLMetrics; this module
surfaces them to Python so pipelines can assert their own IO budgets
(and tests can pin pruning regressions) without scraping the UI or
the event log. Read AFTER an action: metrics accumulate during
execution and are zero on an unexecuted plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_KEEP = ("numOutputRows", "numFiles", "filesSize", "numPartitions")


def _walk(node):
    yield node
    # AQE wraps the real tree twice: AdaptiveSparkPlanExec holds the
    # current plan, and each (Shuffle/Broadcast/Result)QueryStageExec
    # wraps its materialized subtree behind .plan()
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        try:
            yield from _walk(node.executedPlan())
            return
        except Exception:
            pass
    if "QueryStage" in name:
        try:
            yield from _walk(node.plan())
            return
        except Exception:
            pass
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def plan_metrics(df: DataFrame) -> list[dict]:
    """[{node, metrics{name: value}}] for every physical node that
    carries interesting metrics (rows/files/bytes/partitions), in
    plan order. Call after an action."""
    out = []
    for node in _walk(df._jdf.queryExecution().executedPlan()):
        it = node.metrics().iterator()
        vals = {}
        while it.hasNext():
            kv = it.next()
            name = str(kv._1())
            if name in _KEEP:
                vals[name] = int(kv._2().value())
        if vals:
            out.append({"node": node.nodeName(), "metrics": vals})
    return out


def scan_summary(df: DataFrame) -> dict:
    """Aggregate IO of every file-source scan in the executed plan:
    {rows_scanned, files_read, bytes_read, n_scans}. The number a
    100 TB pipeline budgets against — if pruning or pushdown
    regresses, bytes_read is where it shows first."""
    rows = files = size = n = 0
    for entry in plan_metrics(df):
        if entry["node"].startswith("Scan"):
            m = entry["metrics"]
            rows += m.get("numOutputRows", 0)
            files += m.get("numFiles", 0)
            size += m.get("filesSize", 0)
            n += 1
    return {
        "rows_scanned": rows,
        "files_read": files,
        "bytes_read": size,
        "n_scans": n,
    }
