"""Atomic versioned snapshot publish + time-travel reads: the
minimal lakehouse commit protocol over plain parquet directories.

The reference's disaster-recovery reload (``dags/99_recover_datalake_
to_bq.py``, re-expressed as ``sources/bronze.recover_bronze``) is a
truncate-and-reload: between the truncate and the reload's commit,
readers see a torn table. At 100 TB that window is hours. The
standard fix — the commit pattern under every public lakehouse format
— is to never mutate published data:

- each publish writes a COMPLETE new snapshot under an immutable
  ``v=N`` directory (writers never touch a published dir);
- a single tiny pointer file (``_VERSION``) names the current
  version, flipped with an ATOMIC rename after the snapshot's
  ``_SUCCESS`` commit — readers see the old snapshot or the new one,
  never a mix, with no lock and no coordination;
- readers resolve the pointer at read time (or pin an explicit
  version for reproducible time travel — the property a training run
  needs to be re-runnable against the exact corpus it saw);
- old snapshots stay readable until ``prune_snapshots`` removes
  them, and the published version is never prunable.

A writer crash before the pointer flip leaves an orphaned ``v=N``
directory and an unchanged pointer — garbage, not corruption; the
prune pass sweeps it. POSIX ``os.replace`` gives the rename
atomicity locally; on an object store the same protocol rides the
store's atomic single-object PUT of the pointer.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

POINTER = "_VERSION"


def _vdir(root: str, version: int) -> str:
    return os.path.join(root, f"v={version}")


def current_version(root: str) -> int | None:
    """The published version, or None if nothing is published."""
    try:
        with open(os.path.join(root, POINTER)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def publish_snapshot(df: DataFrame, root: str) -> int:
    """Write ``df`` as the next snapshot version and atomically
    publish it; returns the new version number. The data write fully
    commits (parquet ``_SUCCESS``) before the pointer moves, so a
    failure anywhere in between leaves the previous version published
    and intact."""
    os.makedirs(root, exist_ok=True)
    version = (current_version(root) or 0) + 1
    # skip over orphaned dirs from crashed publishes — versions are
    # monotone, never reused
    while os.path.exists(_vdir(root, version)):
        version += 1
    df.write.mode("error").parquet(_vdir(root, version))
    tmp = os.path.join(root, f"{POINTER}.{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(root, POINTER))  # the atomic commit
    return version


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The published snapshot, or a pinned historical one
    (time travel). Raises if nothing is published / the pin doesn't
    exist."""
    if version is None:
        version = current_version(root)
        if version is None:
            raise ValueError(f"no published snapshot under {root}")
    path = _vdir(root, version)
    if not os.path.exists(path):
        raise ValueError(f"snapshot v={version} does not exist under {root}")
    return spark.read.parquet(path)


def list_snapshots(root: str) -> list[dict]:
    """One dict per snapshot dir: version, published flag, committed
    flag (_SUCCESS present — False marks a crashed publish), file
    count and bytes. Metadata-only (directory listing)."""
    published = current_version(root)
    out = []
    for entry in sorted(os.listdir(root)):
        if not entry.startswith("v="):
            continue
        vdir = os.path.join(root, entry)
        files = [
            f
            for f in os.listdir(vdir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        out.append(
            {
                "version": int(entry[2:]),
                "published": int(entry[2:]) == published,
                "committed": os.path.exists(os.path.join(vdir, "_SUCCESS")),
                "n_files": len(files),
                "n_bytes": sum(
                    os.path.getsize(os.path.join(vdir, f)) for f in files
                ),
            }
        )
    return sorted(out, key=lambda d: d["version"])


def prune_snapshots(root: str, keep_last: int = 2) -> list[int]:
    """Remove old and orphaned (uncommitted) snapshots, keeping the
    newest ``keep_last`` committed ones; the PUBLISHED version is
    never removed regardless. Returns the pruned version numbers."""
    import shutil

    published = current_version(root)
    snaps = list_snapshots(root)
    committed = [s["version"] for s in snaps if s["committed"]]
    keep = set(committed[-keep_last:]) if keep_last > 0 else set()
    if published is not None:
        keep.add(published)
    removed = []
    for s in snaps:
        v = s["version"]
        if v in keep:
            continue
        shutil.rmtree(_vdir(root, v), ignore_errors=True)
        removed.append(v)
    return removed
