"""Code-corpus structure extraction — unified diffs and Jupyter
notebooks (r16 capability wave: code-training pipelines mine commit
diffs for edit-pair data and notebooks for code/markdown cells; both
are ubiquitous in code crawls and both decompose with PURE Catalyst
— no Python in the row path).

- Unified diffs (the ``git diff`` / ``diff -u`` format): one row
  per changed file — paths from the ``---``/``+++`` headers, hunk
  count from ``@@`` markers, added/removed line counts via
  ``filter()`` over the split lines (``+``/``-`` lines excluding
  the header lines themselves). Whole-stage codegen: block split on
  ``(?m)^diff `` + aligned regexp extracts + higher-order array
  functions.

- Notebooks (nbformat 4 JSON): ``from_json`` with an explicit
  cells schema (schema-on-read — a malformed notebook yields NULL,
  observable, never a stage failure), ``posexplode`` to one row per
  cell, source joined from its line array. Catalyst end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)


def parse_unified_diff(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Explode a unified diff into per-file rows: (id, file_idx,
    old_path, new_path, n_hunks, n_added, n_removed). ``a/``/``b/``
    prefixes strip; ``/dev/null`` (creations/deletions) surfaces as
    NULL on the corresponding side; blocks without both file
    headers drop (mode-only changes, binary notices)."""
    norm = F.regexp_replace(F.col(content_col), "\r\n?", "\n")
    blocks = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.concat(F.lit("\n"), norm), r"\ndiff ")
        ).alias("__pos", "__block"),
    ).where(F.col("__pos") > 0)
    b = F.col("__block")
    old_raw = F.regexp_extract(b, r"(?m)^--- (\S+)", 1)
    new_raw = F.regexp_extract(b, r"(?m)^\+\+\+ (\S+)", 1)

    def path(raw: Column) -> Column:
        return F.when(
            (raw == "") | (raw == "/dev/null"),
            F.lit(None).cast("string"),
        ).otherwise(F.regexp_replace(raw, r"^[ab]/", ""))

    # the split consumed the literal "diff " prefix, so each block's
    # FIRST line is the rest of the diff command line ("--git a/x
    # b/x" in git's dialect) — drop it before counting, or its
    # leading dashes would count as a removed line
    all_lines = F.split(b, "\n")
    lines = F.slice(all_lines, 2, F.size(all_lines))
    n_added = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("+") & ~ln.startswith("+++"),
        )
    )
    n_removed = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("-") & ~ln.startswith("---"),
        )
    )
    n_hunks = F.size(F.filter(lines, lambda ln: ln.startswith("@@")))
    out = blocks.select(
        F.col(id_col),
        F.col("__pos"),
        path(old_raw).alias("old_path"),
        path(new_raw).alias("new_path"),
        n_hunks.cast("int").alias("n_hunks"),
        n_added.cast("long").alias("n_added"),
        n_removed.cast("long").alias("n_removed"),
        (old_raw != "").alias("__has_old"),
        (new_raw != "").alias("__has_new"),
    ).where(F.col("__has_old") & F.col("__has_new"))
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy("__pos")
    return out.select(
        F.col(id_col),
        (F.row_number().over(w) - 1).cast("long").alias("file_idx"),
        "old_path", "new_path", "n_hunks", "n_added", "n_removed",
    )


_NB_SCHEMA = StructType([
    StructField("nbformat", StringType()),
    StructField(
        "cells",
        ArrayType(
            StructType([
                StructField("cell_type", StringType()),
                StructField("source", ArrayType(StringType())),
            ])
        ),
    ),
])


def extract_notebook_cells(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Explode an ipynb JSON document into per-cell rows: (id,
    cell_idx, cell_type, source, n_lines). ``from_json`` with the
    nbformat-4 cells schema — malformed JSON or a JSON without a
    cells array yields no rows for that document (callers wanting
    the observable split join back against the input ids)."""
    parsed = df.select(
        F.col(id_col),
        F.from_json(F.col(content_col), _NB_SCHEMA).alias("__nb"),
    ).where(F.col("__nb.cells").isNotNull())
    return parsed.select(
        F.col(id_col),
        F.posexplode(F.col("__nb.cells")).alias("cell_idx", "__cell"),
    ).select(
        F.col(id_col),
        F.col("cell_idx").cast("long"),
        F.col("__cell.cell_type").alias("cell_type"),
        F.array_join(F.col("__cell.source"), "").alias("source"),
        F.size(F.col("__cell.source")).cast("int").alias("n_lines"),
    )
