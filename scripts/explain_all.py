#!/usr/bin/env python
"""Capture .explain("formatted") for every driver-registry query into
plans/<tag>/<query>_<suffix>.txt plus a one-line plan-shape summary
(Exchange count, join strategies, Python-eval nodes) per query.

Usage: python scripts/explain_all.py <tag> <suffix> [query ...]
  e.g. python scripts/explain_all.py r16 before
       python scripts/explain_all.py r16 after lang_id_trigram

The optimization guide (§1, §7.2) asks for the plan shape of every
declared query before and after each change; this script is the
measurement half of that loop.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from openaq_data_pipeline_spark.catalog import registry
from openaq_data_pipeline_spark.session import get_spark


def explain_str(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def plan_shape(txt: str) -> dict[str, object]:
    def count(pat: str) -> int:
        return len(re.findall(pat, txt))

    return {
        "exchange": count(r"\bExchange\b"),
        "bhj": count(r"\bBroadcastHashJoin\b"),
        "smj": count(r"\bSortMergeJoin\b"),
        "shj": count(r"\bShuffledHashJoin\b"),
        "bnlj": count(r"\bBroadcastNestedLoopJoin\b"),
        "cartesian": count(r"\bCartesianProduct\b"),
        "py_eval": count(r"\b(BatchEvalPython|ArrowEvalPython)\b"),
        "map_arrow": count(r"\b(MapInArrow|MapInPandas|PythonMapInArrow)\b"),
        "wsc": count(r"WholeStageCodegen"),
        "sort": count(r"\bSort\b"),
        "window": count(r"\bWindow\b"),
        "scans": count(r"Scan parquet"),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "..", "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))
    spark = get_spark(
        app_name="explain-all",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    rows = []
    for q in registry():
        if only and q.name not in only:
            continue
        try:
            df = q.build(spark, sf_dir)
            txt = explain_str(df)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            txt = f"EXPLAIN FAILED: {exc!r}"
        path = os.path.join(outdir, f"{q.name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        shape = plan_shape(txt)
        rows.append((q.name, shape))
        print(q.name, shape, flush=True)
        spark.catalog.clearCache()

    with open(os.path.join(outdir, f"_shapes_{suffix}.tsv"), "w") as fh:
        keys = list(rows[0][1].keys()) if rows else []
        fh.write("query\t" + "\t".join(keys) + "\n")
        for name, shape in rows:
            fh.write(name + "\t" + "\t".join(str(shape[k]) for k in keys) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
