#!/usr/bin/env python
"""Parallel test runner: shards tests/test_*.py across concurrent
pytest processes, each with its own Spark JVM (local[4]) and its own
warehouse root (``SPARK_TEST_WAREHOUSE``), so the full suite's wall
clock divides by the shard count instead of paying 700+ Spark tests
single-file.

Why not pytest-xdist: not installed in this environment (no pip), and
per-FILE sharding is the right granularity anyway — session-scoped
fixtures (one SparkSession, the fixture lake, the ingested pipeline)
rebuild once per shard rather than once per worker-test.

Packing is self-tuning: the first run packs by file size (a decent
proxy for Spark-test cost), records real per-file durations to
``.partest_durations.json``, and every later run greedy-packs by those
measured durations (longest-processing-time first), so the shards
converge to balanced wall clocks.

Usage:
    python partest.py              # default shards = min(8, cpus//4)
    python partest.py -j 6        # explicit shard count
    python partest.py -k router   # forwarded to pytest (every shard)

Exit code 0 iff every shard exited 0. Per-shard tails are printed on
failure; the combined pass/fail counts always.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
DURATIONS_FILE = ROOT / ".partest_durations.json"

# Files whose parametrized cases dominate the suite shard at NODE
# granularity instead of file granularity (VERDICT r13 next #7: the
# 134 Spark-vs-DuckDB oracles in one file pinned a whole shard's wall
# clock) — each collected node id becomes its own packing unit, so
# LPT spreads them across every shard.
SPLIT_FILES = ("test_entry_parity.py",)


def collect_units() -> list[str]:
    """Packing units: 'tests/<file>.py' for normal files, full node
    ids ('tests/<file>.py::test[param]') for SPLIT_FILES."""
    units: list[str] = []
    for f in sorted((ROOT / "tests").glob("test_*.py")):
        rel = f"tests/{f.name}"
        if f.name not in SPLIT_FILES:
            units.append(rel)
            continue
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "--collect-only", "-q",
             "-p", "no:cacheprovider", rel],
            capture_output=True, text=True, cwd=ROOT,
        ).stdout
        nodes = [
            line.strip() for line in out.splitlines()
            if line.startswith(rel + "::")
        ]
        units.extend(nodes if nodes else [rel])
    return units


def load_durations() -> dict[str, float]:
    try:
        return json.loads(DURATIONS_FILE.read_text())
    except (OSError, ValueError):
        return {}


def pack(units: list[str], n: int, weights: dict[str, float]) -> list[list[str]]:
    """Greedy LPT bin-packing by weight: measured seconds when known;
    file bytes scaled to rough seconds otherwise (so first-run units
    of both kinds mix on one scale), 15 s default for an unmeasured
    node id."""

    def w(u: str) -> float:
        got = weights.get(u)
        if got is not None:
            return got
        if "::" in u:
            return 15.0
        return (ROOT / u).stat().st_size / 500.0

    shards: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for u in sorted(units, key=w, reverse=True):
        i = min(range(n), key=lambda k: shards[k][0])
        total, members = shards[i]
        members.append(u)
        shards[i] = (total + w(u), members)
    return [members for _, members in shards if members]


def run_shard(
    idx: int, units: list[str], extra: list[str], tmp: Path
) -> subprocess.Popen:
    env = dict(os.environ)
    env["SPARK_TEST_WAREHOUSE"] = str(tmp / f"wh-{idx}")
    env.setdefault("PYTHONUNBUFFERED", "1")
    cmd = [
        sys.executable,
        "-m",
        "pytest",
        "-q",
        "-p",
        "no:cacheprovider",
        f"--junitxml={tmp / f'shard-{idx}.xml'}",
        *extra,
        *units,
    ]
    # hand the log fd to the child and close it HERE: the parent
    # must read fully-flushed shard tails after wait()
    with open(tmp / f"shard-{idx}.log", "w") as out:
        return subprocess.Popen(
            cmd, stdout=out, stderr=subprocess.STDOUT, env=env, cwd=ROOT
        )


def harvest_durations(tmp: Path, n: int) -> None:
    """Record per-UNIT wall seconds from the junit XML of each shard
    into the packing table: summed testcase times per file for
    ordinary files, per node id for SPLIT_FILES. The classname looks
    like 'tests.test_router.TestX' — the file is the component that
    starts with 'test_' (the r13 table keyed everything under
    'tests.py', silently reverting packing to file size)."""
    import xml.etree.ElementTree as ET

    table = load_durations()
    fresh: dict[str, float] = {}
    for i in range(n):
        xml = tmp / f"shard-{i}.xml"
        if not xml.exists():
            continue
        try:
            root = ET.parse(xml).getroot()
        except ET.ParseError:
            continue
        for case in root.iter("testcase"):
            cls = case.get("classname", "")
            stem = next(
                (p for p in cls.split(".") if p.startswith("test_")), None
            )
            if stem is None:
                continue
            if f"{stem}.py" in SPLIT_FILES:
                key = f"tests/{stem}.py::{case.get('name')}"
            else:
                key = f"tests/{stem}.py"
            fresh[key] = fresh.get(key, 0.0) + float(case.get("time", 0))
    if fresh:
        table.update({k: round(v, 2) for k, v in fresh.items()})
        DURATIONS_FILE.write_text(json.dumps(table, indent=1, sort_keys=True))


def main() -> int:
    ap = argparse.ArgumentParser()
    cpus = os.cpu_count() or 8
    ap.add_argument("-j", type=int, default=min(8, max(2, cpus // 4)))
    ap.add_argument("pytest_args", nargs="*", help="forwarded to every shard")
    args = ap.parse_args()

    units = collect_units()
    shards = pack(units, args.j, load_durations())
    tmp = Path(tempfile.mkdtemp(prefix="partest-"))
    t0 = time.time()
    print(f"partest: {len(units)} units -> {len(shards)} shards (logs in {tmp})")

    procs = [run_shard(i, s, args.pytest_args, tmp) for i, s in enumerate(shards)]
    codes = [p.wait() for p in procs]
    wall = time.time() - t0

    failed_total = passed_total = skipped_total = 0
    ok = True
    for i, code in enumerate(codes):
        log = (tmp / f"shard-{i}.log").read_text()
        tail = log.strip().splitlines()[-1] if log.strip() else "(no output)"
        m = re.search(r"(\d+) failed", tail)
        failed = int(m.group(1)) if m else 0
        m = re.search(r"(\d+) passed", tail)
        passed = int(m.group(1)) if m else 0
        m = re.search(r"(\d+) skipped", tail)
        skipped_total += int(m.group(1)) if m else 0
        failed_total += failed
        passed_total += passed
        # exit 5 = pytest collected nothing (a -k filter can empty a
        # shard whose units are explicit node ids) — not a failure
        status = "ok" if code in (0, 5) else f"EXIT {code}"
        print(f"  shard {i}: {status:8s} {tail}")
        if code not in (0, 5):
            ok = False
            print("    --- last 40 lines ---")
            for line in log.strip().splitlines()[-40:]:
                print(f"    {line}")
    harvest_durations(tmp, len(shards))
    print(
        f"partest: {passed_total} passed, {failed_total} failed, "
        f"{skipped_total} skipped in {wall:.1f}s wall"
    )
    return 0 if ok and failed_total == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
