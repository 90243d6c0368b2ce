#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total wall-clock of one timed pass over all bench
queries (after a warm-up pass that triggers JVM/codegen warmup and
parquet footer caching — we measure steady-state engine throughput,
not JVM startup).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openaq_data_pipeline_spark.catalog import registry
from openaq_data_pipeline_spark.session import get_spark

# every catalog query runs in the bench; `bench`-tagged ones are the
# headline heavy hitters, but coverage keeps us honest
BENCH_ALL = os.environ.get("SPARK_GRAFT_BENCH_ALL", "1") == "1"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        app_name="openaq-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    qdefs = [q for q in registry() if BENCH_ALL or "bench" in q.tags]

    # warm-up pass (not timed)
    for q in qdefs:
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for q in qdefs:
        t0 = time.perf_counter()
        # noop sink executes the full plan without collect/driver cost
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[q.name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_total0, 3)

    sf = None
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            pass

    print(
        json.dumps(
            {
                "metric": "total_bench_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
