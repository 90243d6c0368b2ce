#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the sum over queries of the BEST of two timed EXEC-ONLY
runs, after a warm-up pass that triggers JVM/codegen warmup and
parquet footer caching — the timeit convention: the minimum measures
the engine, the spread measures the box (external load on this host
has produced >1.5× swings on identical code; per-query minima are
stable). Between-run hygiene (cache clear + Python GC) runs OUTSIDE
the timer since r6 and its cost is reported in BENCH_DETAIL.json
under "harness_overhead" (VERDICT r5 #1: in-timer cleanup was
per-run fixed overhead that grew with catalog size and read as
uniform drift).

Hygiene contract (VERDICT r1 #6/#10 + ADVICE):
- any query failure (including a streaming drain error or a stream
  left running by a builder) aborts with rc=1 on stderr — a bench
  artifact is either a clean JSON line or an explicit failure;
- the cache is cleared between queries so persisted intermediates
  from one build never occupy executor memory during another's
  timing (builders persist() shared subplans but cannot unpersist a
  lazy result);
- the JSON line is printed after spark.stop() so late JVM/log noise
  cannot trail it;
- per-query ratios vs the latest BENCH_r*.json are reported under
  "ratio_vs_prev" (cross-run noise on this box is large — treat
  ratios as trend hints, not verdicts).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openaq_data_pipeline_spark.catalog import registry
from openaq_data_pipeline_spark.session import get_spark

# every catalog query runs in the bench; `bench`-tagged ones are the
# headline heavy hitters, but coverage keeps us honest
BENCH_ALL = os.environ.get("SPARK_GRAFT_BENCH_ALL", "1") == "1"

# ---- host-load calibration (VERDICT r9 #4) ----------------------------
# A fixed Spark workload (range → xxhash64 → 1024-bucket count, 32
# partitions, noop sink) timed at three points of every sample gives
# each bench artifact its own load marker: load_factor =
# median(calibration)/CALIB_REF_SEC. The reference is the quiet-host
# steady state: pinned from the r10 introduction run's 18 in-bench
# samples across two fresh JVMs on this box at local[32] (steady
# cluster 0.40-0.58, median 0.46; the first ad-hoc pin of 0.55 was
# taken in a session with residual load and made quiet windows read
# as factor ~0.85). The workload touches no repo code and no test
# data, so it can NEVER drift with the engine — only with the box.
CALIB_REF_SEC = 0.46


def _calibrate(spark) -> list[float]:
    """Three timed runs of the fixed calibration workload (one
    untimed warm pass first — its codegen/JVM warmup is not host
    load)."""
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 30_000_000, 1, 32)
            .select(F.xxhash64("id").alias("h"))
            .groupBy((F.col("h") % 1024).alias("b"))
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    once()  # warm (untimed)
    return [once() for _ in range(3)]


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _exec_once(spark, q, sf_dir: str) -> None:
    """Execute one query end-to-end via the noop sink (full plan, no
    collect/driver cost). This — and only this — is what the timer
    wraps: harness hygiene (cache clear, Python GC) lives in
    :func:`_cleanup` OUTSIDE the timed region. Rationale (VERDICT r5
    'What's wrong' #1): the r5 drift on unchanged trivial queries was
    a near-uniform ADDITIVE ~0.1–0.2 s, the signature of per-run fixed
    overhead — and the in-timer `clearCache` py4j round-trip plus a
    full-heap `gc.collect` over the session's ever-growing py4j object
    graph are exactly such costs, growing with catalog size (50
    registered queries in r5 vs 38 in r4), not with the query under
    test. r1 — the envelope anchor — had no in-timer cleanup either,
    so exec-only timing is also the apples-to-apples convention.
    Cleanup cost is still measured and reported per query in
    BENCH_DETAIL.json as the drift evidence."""
    q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()


def _cleanup(spark, q) -> dict[str, float]:
    """Leave the session clean between runs; returns its own cost
    breakdown {clearcache_sec, gc_sec} so harness overhead is
    observable instead of silently folded into query timings."""
    import gc

    leaked = list(spark.streams.active)
    for s in leaked:
        s.stop()
    if leaked:
        raise RuntimeError(
            f"{q.name} left {len(leaked)} streaming query(ies) running"
        )
    t0 = time.perf_counter()
    spark.catalog.clearCache()
    t1 = time.perf_counter()
    # drop py4j refs promptly so the ContextCleaner can release
    # localCheckpoint blocks between queries — across a 100-run
    # session the accumulated blocks otherwise crowd executor
    # memory and skew later queries' timings
    gc.collect()
    t2 = time.perf_counter()
    return {"clearcache_sec": t1 - t0, "gc_sec": t2 - t1}


def _run_once(spark, q, sf_dir: str) -> dict[str, float]:
    """Untimed convenience wrapper: exec + cleanup."""
    try:
        _exec_once(spark, q, sf_dir)
    finally:
        cost = _cleanup(spark, q)
    return cost


def _previous_bench() -> tuple[str, dict] | None:
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    for _, path in sorted(rounds, reverse=True):
        try:
            with open(path) as fh:
                data = json.load(fh)
            # the driver wraps the bench line under "parsed"
            if isinstance(data, dict) and isinstance(data.get("parsed"), dict):
                data = data["parsed"]
            if isinstance(data, dict) and isinstance(data.get("queries"), dict):
                return os.path.basename(path), data
        except (OSError, json.JSONDecodeError):
            continue
    return None


def run_sample() -> tuple[dict, dict]:
    """ONE full bench sample in THIS process: warm-up pass, timed
    min-of-2(+1) per query, calibration at start/middle/end. Returns
    (compact stdout result, detail block)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        app_name="openaq-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    qdefs = [q for q in registry() if BENCH_ALL or "bench" in q.tags]

    times: dict[str, float] = {}
    overhead: dict[str, dict[str, float]] = {}
    calib: list[list[float]] = []
    try:
        # warm-up pass (not timed)
        for q in qdefs:
            _run_once(spark, q, sf_dir)

        calib.append(_calibrate(spark))
        for qi, q in enumerate(qdefs):
            if qi == len(qdefs) // 2:
                calib.append(_calibrate(spark))
            runs = []
            costs = []

            def timed_run(q=q):
                t0 = time.perf_counter()
                try:
                    _exec_once(spark, q, sf_dir)
                finally:
                    dt = time.perf_counter() - t0
                    costs.append(_cleanup(spark, q))
                runs.append(dt)

            timed_run()
            timed_run()
            # external load on this host swings identical code >1.5x;
            # when the two timed passes disagree by >25% the minimum
            # itself is suspect, so buy one more sample for that
            # query only (bounded: noisy queries alone pay the cost)
            if max(runs) > 1.25 * min(runs):
                timed_run()
            times[q.name] = round(min(runs), 3)
            overhead[q.name] = {
                k: round(sum(c[k] for c in costs) / len(costs), 3)
                for k in ("clearcache_sec", "gc_sec")
            }
        calib.append(_calibrate(spark))
        total = round(sum(times.values()), 3)
    except Exception as exc:  # noqa: BLE001 — fail loudly, never emit a partial line
        print(f"bench FAILED at query {len(times) + 1}/{len(qdefs)}: {exc!r}",
              file=sys.stderr)
        raise SystemExit(1)

    sf = None
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            pass

    flat = [x for block in calib for x in block]
    load_factor = round(_median(flat) / CALIB_REF_SEC, 3)
    result = {
        "metric": "total_bench_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        # the host-load marker (VERDICT r9 #4): fixed workload timed
        # at start/middle/end of the sample vs its pinned quiet-host
        # reference — divide any time by load_factor to normalize
        "calib": {
            "samples_sec": [round(x, 3) for x in flat],
            "ref_sec": CALIB_REF_SEC,
            "load_factor": load_factor,
            # the reference is pinned at the default local[32]; a
            # different core count shifts the workload's baseline, so
            # the factor is only a load marker at cpus == 32
            "cpus": int(cpus),
        },
        "value_calibrated": round(total / load_factor, 3),
        # r16 (VERDICT r15 next #6): per-query CALIBRATED seconds on
        # the RESULT line, not only the detail file — BENCH_r{N}.json
        # then carries them, so round-over-round attribution of a
        # host-noise drift is one jq away instead of manual math
        "queries_calibrated": {
            k: round(v / load_factor, 3) for k, v in times.items()
        },
    }
    detail = dict(result)
    # record the timing convention next to the ratios (ADVICE r3):
    # per-query times are min-of-N EXEC-ONLY passes after an untimed
    # warm-up; cache clear + Python GC run between passes but OUTSIDE
    # the timer (VERDICT r5 #1 — the in-timer cleanup was per-run
    # fixed overhead that grew with catalog size and drifted every
    # unchanged query ~1.2-1.6x; its cost is now reported under
    # "harness_overhead" instead of silently inflating query times).
    # Cross-round ratios are only apples-to-apples against rounds
    # using the same convention (r1/r2 single-timed-pass with no
    # in-timer cleanup; r3-r5 min-of-2 WITH in-timer cleanup; r6+
    # exec-only — closest in kind to the r1 envelope anchor; r10+
    # additionally min across fresh-JVM samples, calibrated).
    detail["timing_convention"] = (
        "min_of_2_exec_only_cleanup_untimed_plus_third_on_25pct_spread"
        "_calibrated"
    )
    detail["harness_overhead"] = {
        "per_query": overhead,
        "total_clearcache_sec": round(
            sum(o["clearcache_sec"] for o in overhead.values()), 3
        ),
        "total_gc_sec": round(sum(o["gc_sec"] for o in overhead.values()), 3),
        "note": (
            "mean per-timed-pass cost of the between-run cache clear "
            "and Python GC — in r3-r5 this was inside the timer and "
            "counted toward every query's time"
        ),
    }
    # stop Spark here: a child sample must release the JVM before the
    # next sample starts, and late log noise must precede any output
    spark.stop()
    return result, detail


def _merge_samples(samples: list[tuple[dict, dict]]) -> tuple[dict, dict]:
    """min-of-N across fresh-JVM samples (VERDICT r9 #4): per-query
    raw minimum across windows, and per-query CALIBRATED minimum
    (each window normalized by its own load factor first). The
    merged line carries every window's load factor so the artifact
    shows how quiet each window was."""
    results = [r for r, _ in samples]
    details = [d for _, d in samples]
    qnames = results[0]["queries"].keys()
    times = {
        k: min(r["queries"][k] for r in results) for k in qnames
    }
    times_cal = {
        k: round(min(d["queries_calibrated"][k] for d in details), 3)
        for k in qnames
    }
    factors = [r["calib"]["load_factor"] for r in results]
    merged = {
        "metric": "total_bench_wall_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": results[0]["sf"],
        "n_samples": len(samples),
        "calib": {
            "load_factors": factors,
            "ref_sec": CALIB_REF_SEC,
            "cpus": results[0]["calib"]["cpus"],
        },
        "value_calibrated": round(sum(times_cal.values()), 3),
        "queries_calibrated": times_cal,
    }
    detail = dict(merged)
    detail["timing_convention"] = (
        f"min_across_{len(samples)}_fresh_jvm_samples_of_"
        + details[0]["timing_convention"]
    )
    detail["samples"] = [
        {
            "value": r["value"],
            "value_calibrated": r["value_calibrated"],
            "calib": r["calib"],
            "queries": r["queries"],
            "harness_overhead": d["harness_overhead"],
        }
        for r, d in samples
    ]
    return merged, detail


def _child_sample(i: int) -> tuple[dict, dict]:
    """Run one sample in a FRESH subprocess (its own JVM, its own
    Python heap — no cross-sample session state), returning its
    (result, detail)."""
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(
        mode="r", suffix=f"_bench_s{i}.json"
    ) as out:
        env = dict(os.environ)
        env["_SPARK_GRAFT_BENCH_CHILD"] = "1"
        env["_SPARK_GRAFT_BENCH_CHILD_OUT"] = out.name
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.DEVNULL,
            stderr=sys.stderr,
        )
        if proc.returncode != 0:
            print(f"bench sample {i} FAILED (rc={proc.returncode})",
                  file=sys.stderr)
            raise SystemExit(1)
        payload = json.load(open(out.name))
    return payload["result"], payload["detail"]


def main() -> None:
    if os.environ.get("_SPARK_GRAFT_BENCH_CHILD") == "1":
        result, detail = run_sample()
        with open(os.environ["_SPARK_GRAFT_BENCH_CHILD_OUT"], "w") as fh:
            json.dump({"result": result, "detail": detail}, fh)
        return

    n_samples = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "3"))
    if n_samples <= 1:
        result, detail = run_sample()
    else:
        # wall budget: never let sampling run the invoking harness
        # into a timeout — a complete 1-sample artifact beats a
        # killed 2-sample one. Stop when the NEXT sample (projected
        # at the mean of those taken) would not fit.
        budget = float(
            os.environ.get("SPARK_GRAFT_BENCH_WALL_BUDGET_SEC", "2400")
        )
        t_start = time.perf_counter()
        samples = []
        for i in range(n_samples):
            elapsed = time.perf_counter() - t_start
            if samples and elapsed + (elapsed / len(samples)) > budget:
                print(
                    f"bench: stopping after {len(samples)} sample(s) — "
                    f"next would exceed the {budget:.0f}s wall budget",
                    file=sys.stderr,
                )
                break
            samples.append(_child_sample(i))
        result, detail = _merge_samples(samples)

    prev = _previous_bench()
    if prev is not None:
        name, prev_data = prev
        prev_times = prev_data.get("queries", {})
        times = result["queries"]
        common = {k: v for k, v in times.items() if prev_times.get(k)}
        prev_common = sum(prev_times[k] for k in common)
        detail["ratio_vs_prev"] = {
            "baseline": name,
            "baseline_timing_convention": (
                # parse the round NUMBER — a lexicographic compare
                # misclassifies r100 < r03 (ADVICE r4)
                "min_of_2_after_warmup_cache_cleared"
                if int(re.search(r"r(\d+)", name).group(1)) >= 3
                else "single_timed_pass"
            ),
            # the honest cross-round total compares the COMMON query
            # subset only (VERDICT r5 'What's wrong' #5: a total over
            # differing 50-query sets conflates rotation with drift)
            "total_common_subset": (
                round(sum(common.values()) / prev_common, 3)
                if prev_common
                else None
            ),
            "n_common": len(common),
            "total_all_queries_incomparable_sets": (
                round(result["value"] / prev_data["value"], 3)
                if prev_data.get("value")
                else None
            ),
            "queries": {
                k: round(v / prev_times[k], 3) for k, v in common.items()
            },
        }
        # r16 (VERDICT r15 next #6): when the previous artifact also
        # carries calibrated per-query values (r16+), compare those —
        # host noise divides out and a byte-unchanged module showing
        # +8% raw reads as ~1.0 calibrated instead of needing manual
        # attribution
        prev_cal = prev_data.get("queries_calibrated", {})
        cur_cal = result.get("queries_calibrated", {})
        common_cal = {
            k: v for k, v in cur_cal.items() if prev_cal.get(k)
        }
        if common_cal:
            prev_cal_sum = sum(prev_cal[k] for k in common_cal)
            detail["ratio_vs_prev"]["queries_calibrated"] = {
                k: round(v / prev_cal[k], 3)
                for k, v in common_cal.items()
            }
            detail["ratio_vs_prev"]["total_common_subset_calibrated"] = (
                round(sum(common_cal.values()) / prev_cal_sum, 3)
                if prev_cal_sum
                else None
            )
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(here, "BENCH_DETAIL.json")
    # carry forward hand-written evidence blocks (r{N}_evidence,
    # per-round diagnoses): a fresh run must refresh its own
    # measurements without clobbering the round's adjudication notes
    try:
        with open(detail_path) as fh:
            old_detail = json.load(fh)
        for key, val in old_detail.items():
            if key.endswith(("_evidence", "_diagnosis")) and key not in detail:
                detail[key] = val
    except (OSError, json.JSONDecodeError):
        pass
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)

    # all Spark sessions are stopped inside run_sample / the child
    # processes, so late JVM/log noise cannot trail the JSON line
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
