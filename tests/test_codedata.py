"""r16 code-data wave: unified-diff mining and notebook cell
extraction — pure-Catalyst decompositions for code-training
corpora."""

from __future__ import annotations

from openaq_data_pipeline_spark.operators.codedata import (
    extract_notebook_cells,
    parse_unified_diff,
)

DIFF = """diff --git a/src/app.py b/src/app.py
index 1234567..89abcde 100644
--- a/src/app.py
+++ b/src/app.py
@@ -1,5 +1,6 @@
 import os
-import sys
+import sys, json
+import re
 def main():
@@ -10,3 +11,3 @@
-    return 1
+    return 0
diff --git a/LICENSE b/LICENSE
old mode 100644
new mode 100755
diff --git a/new_file.txt b/new_file.txt
new file mode 100644
index 0000000..e69de29
--- /dev/null
+++ b/new_file.txt
@@ -0,0 +1,2 @@
+hello
+world
"""


class TestUnifiedDiff:
    def test_git_diff_per_file_rows(self, spark):
        df = spark.createDataFrame(
            [(1, DIFF)], "id long, content string"
        )
        rows = (
            parse_unified_diff(df, "content", "id")
            .orderBy("file_idx")
            .collect()
        )
        assert len(rows) == 2  # mode-only block dropped
        r0 = rows[0]
        assert (r0.old_path, r0.new_path) == ("src/app.py", "src/app.py")
        assert (r0.n_hunks, r0.n_added, r0.n_removed) == (2, 3, 2)
        r1 = rows[1]
        assert r1.old_path is None  # /dev/null creation
        assert r1.new_path == "new_file.txt"
        assert (r1.n_hunks, r1.n_added, r1.n_removed) == (1, 2, 0)

    def test_non_diff_yields_no_rows(self, spark):
        df = spark.createDataFrame(
            [(1, "just some prose\nwith - dashes\n+ plus lines")],
            "id long, content string",
        )
        assert parse_unified_diff(df, "content", "id").count() == 0


class TestNotebookCells:
    def test_cells_explode_and_malformed_drop(self, spark):
        nb = (
            '{"nbformat": 4, "nbformat_minor": 5, "metadata": {},'
            ' "cells": ['
            '{"cell_type": "markdown", "metadata": {},'
            ' "source": ["# Title\\n", "intro"]},'
            '{"cell_type": "code", "execution_count": 1,'
            ' "metadata": {}, "outputs": [],'
            ' "source": ["print(1)\\n", "print(2)"]}'
            "]}"
        )
        rows_in = [
            (1, nb),
            (2, '{"nbformat": 4, "cells": [truncated'),
            (3, '{"some": "other json"}'),
        ]
        df = spark.createDataFrame(rows_in, "id long, content string")
        rows = (
            extract_notebook_cells(df, "content", "id")
            .orderBy("id", "cell_idx")
            .collect()
        )
        assert [r.id for r in rows] == [1, 1]
        assert rows[0].cell_type == "markdown"
        assert rows[0].source == "# Title\nintro"
        assert rows[0].n_lines == 2
        assert rows[1].cell_type == "code"
        assert rows[1].source == "print(1)\nprint(2)"


class TestPlanShape:
    """The r16 text-plane decompositions are whole-stage codegen:
    no Python evaluator anywhere in the physical plan (SCALE.md's
    claim, pinned)."""

    @staticmethod
    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_codegen_only_planes(self, spark):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_spark.operators.codedata import (
            extract_notebook_cells,
            parse_unified_diff,
        )
        from openaq_data_pipeline_spark.operators.frontier import (
            parse_hls_playlist,
        )
        from openaq_data_pipeline_spark.operators.mail import (
            explode_mbox,
        )
        from openaq_data_pipeline_spark.operators.subtitles import (
            extract_subtitle_cues,
        )

        df = spark.createDataFrame(
            [(1, "x")], "id long, content string"
        )
        for build in (
            lambda: parse_unified_diff(df, "content", "id"),
            lambda: extract_notebook_cells(df, "content", "id"),
            lambda: parse_hls_playlist(df, "content", "id"),
            lambda: explode_mbox(df, "content", "id"),
            lambda: extract_subtitle_cues(df, "content", "id"),
        ):
            plan = self._plan(build())
            assert "BatchEvalPython" not in plan
            assert "ArrowEvalPython" not in plan
            assert "mapInPandas" not in plan.lower()
