"""Incremental cross-batch dedup (VERDICT r4 #1): correctness of the
three dispositions across batches, index update across a third batch,
and the two scale properties — the index side of the batch join is
bucket-aligned (no exchange), and the batch-2 plan never re-shingles
history text. Temp indexes are context-managed (VERDICT r5 #2): every
test below asserts-by-construction that tables and tempdirs are
dropped on exit, and test_no_temp_index_residue pins it end-to-end
for the registered query."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.incremental_dedup import (
    build_index,
    incremental_candidate_pairs,
    incremental_dedup,
    temp_index,
)

B1_TEXTS = {
    0: "the quick brown fox jumps over the lazy dog today",
    2: "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
    # near-dup of 2 → collapsed at bootstrap
    4: "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu",
}
B2_ROWS = [
    (11, "completely different content about rivers mountains and weather patterns"),
    # near-dup of HISTORY survivor 2 → dropped cross-batch
    (13, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
    # 15/17 near-dup each other, nothing in history → in-batch cluster
    (15, "one two three four five six seven eight nine ten eleven twelve"),
    (17, "one two three four five six seven eight nine ten eleven twelve thirteen"),
    (19, "tiny doc here"),
]


class TestIncrementalDedup:
    def test_three_batch_scenario(self, spark):
        b1 = spark.createDataFrame(
            list(B1_TEXTS.items()), "doc_id long, text string"
        )
        with temp_index() as idx:
            surv = build_index(b1, "text", "doc_id", idx)
            assert sorted(
                (r.doc_id, r.cluster_size) for r in surv.collect()
            ) == [
                (0, 1),
                (2, 2),
            ]

            b2 = spark.createDataFrame(B2_ROWS, "doc_id long, text string")
            disp = incremental_dedup(b2, "text", "doc_id", idx)
            got = sorted((r.doc_id, r.kept, r.dup_of) for r in disp.collect())
            assert got == [
                (11, True, None),   # fresh
                (13, False, 2),     # cross-batch dup of history survivor
                (15, True, None),   # in-batch cluster min id
                (17, False, 15),    # in-batch dup
                (19, True, None),   # fresh (too short to pair)
            ]

            # the index absorbed batch-2 survivors: batch 3 dups one
            b3 = spark.createDataFrame(
                [(21, "one two three four five six seven eight nine ten eleven")],
                "doc_id long, text string",
            )
            got3 = [
                (r.doc_id, r.kept, r.dup_of)
                for r in incremental_dedup(b3, "text", "doc_id", idx).collect()
            ]
            assert got3 == [(21, False, 15)]

    def test_update_index_false_leaves_index_untouched(self, spark):
        b1 = spark.createDataFrame(
            list(B1_TEXTS.items()), "doc_id long, text string"
        )
        with temp_index() as idx:
            build_index(b1, "text", "doc_id", idx)
            before = spark.table(idx.sizes_table).count()
            b2 = spark.createDataFrame(B2_ROWS, "doc_id long, text string")
            incremental_dedup(
                b2, "text", "doc_id", idx, update_index=False
            ).collect()
            assert spark.table(idx.sizes_table).count() == before

    def test_index_side_aggregation_is_exchange_free(self, spark):
        """The per-shingle re-aggregation of appended posting lists
        must satisfy the table's bucketing: NO Exchange between the
        index scan and the aggregate — at 100 TB an index shuffle per
        batch is the cost the whole design exists to avoid."""
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            _old_posting_lists,
        )

        b1 = spark.createDataFrame(
            list(B1_TEXTS.items()), "doc_id long, text string"
        )
        with temp_index() as idx:
            build_index(b1, "text", "doc_id", idx)
            # append a second generation so re-aggregation is real
            b2 = spark.createDataFrame(B2_ROWS, "doc_id long, text string")
            incremental_dedup(b2, "text", "doc_id", idx)

            plan = (
                _old_posting_lists(spark, idx)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "Exchange" not in plan, plan
            assert "Bucketed: true" in plan, plan

    def test_batch2_plan_touches_index_not_history_text(self, spark, tmp_path):
        """VERDICT r4 #1 'done' criterion: batch-2 work scales with
        batch 2 — the candidate-pair plan scans the BATCH parquet and
        the INDEX tables, never the history parquet (no re-shingled
        history)."""
        hist_path = str(tmp_path / "history_docs")
        batch_path = str(tmp_path / "batch2_docs")
        spark.createDataFrame(
            list(B1_TEXTS.items()), "doc_id long, text string"
        ).write.parquet(hist_path)
        spark.createDataFrame(B2_ROWS, "doc_id long, text string").write.parquet(
            batch_path
        )

        with temp_index() as idx:
            build_index(spark.read.parquet(hist_path), "text", "doc_id", idx)
            pairs = incremental_candidate_pairs(
                spark.read.parquet(batch_path), "text", "doc_id", idx
            )
            # inputFiles() enumerates every source the plan will read —
            # immune to the plan-string path truncation. The default path
            # checkpoints the batch shingle table (one materialization for
            # its three consumers), which severs the batch parquet scan
            # from THIS plan — so probe the batch-scan claim on an
            # explicitly-passed raw shingle table, where the full lineage
            # stays in one plan.
            files = pairs.inputFiles()
            assert idx.location is not None
            assert any(idx.location in f for f in files), "index scan missing"
            assert not any(hist_path in f for f in files), (
                "batch-2 plan re-reads history text"
            )
            from openaq_data_pipeline_spark.operators.dedup import shingles

            raw = incremental_candidate_pairs(
                spark.read.parquet(batch_path),
                "text",
                "doc_id",
                idx,
                new_sh=shingles(
                    spark.read.parquet(batch_path), "text", "doc_id", n=idx.n
                ),
            )
            raw_files = raw.inputFiles()
            assert any(batch_path in f for f in raw_files), "batch scan missing"
            assert not any(hist_path in f for f in raw_files)
            # and the pair results are identical to the disposition inputs
            got = sorted(
                (r.id_a, r.id_b, r.b_old) for r in pairs.collect()
            )
            # cross pairs carry (new_id, old_id); in-batch pairs id_a<id_b
            assert got == [(13, 2, True), (15, 17, False)]

    def test_df_guard_caps_combined_frequency(self, spark):
        """A shingle whose COMBINED (history + batch) df exceeds the
        guard leaves the intersection universe; full-size denominators
        keep scoring (conservatively) without it."""
        boiler = "spam spam spam spam spam"  # one repeated shingle
        b1 = spark.createDataFrame(
            [(i, boiler) for i in range(3)], "doc_id long, text string"
        )
        with temp_index(max_doc_freq=4) as idx:
            build_index(b1, "text", "doc_id", idx)  # exact dups of each other
            # batch adds 3 more copies: combined df = survivors(1) + 3 > 4?
            # no — 1 + 3 = 4 ≤ 4 → pairs found; with 5 new copies 1+5 > 4 →
            # the shingle is guarded out and NO pairs exist
            small = spark.createDataFrame(
                [(100 + i, boiler) for i in range(3)], "doc_id long, text string"
            )
            pairs_ok = incremental_candidate_pairs(small, "text", "doc_id", idx)
            assert pairs_ok.count() > 0
            big = spark.createDataFrame(
                [(200 + i, boiler) for i in range(5)], "doc_id long, text string"
            )
            pairs_guarded = incremental_candidate_pairs(big, "text", "doc_id", idx)
            assert pairs_guarded.count() == 0

    def test_no_temp_index_residue(self, spark):
        """VERDICT r5 #2 'done' criterion: the registered
        dedup_incremental query — the path parity tests and the bench
        exercise repeatedly — leaves NO dedup_index_* tempdir and NO
        dedup_idx_* catalog table behind, and its result is still
        readable after cleanup (eager checkpoint severs the index
        dependency)."""
        import tempfile

        from openaq_data_pipeline_spark.queries_ext import dedup_incremental

        tmp_root = tempfile.gettempdir()
        dirs_before = set(glob.glob(os.path.join(tmp_root, "dedup_index_*")))
        disp = dedup_incremental(spark, os.environ.get(
            "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001"
        ))
        assert disp.count() > 0  # evaluable AFTER the index was dropped
        dirs_after = set(glob.glob(os.path.join(tmp_root, "dedup_index_*")))
        assert dirs_after - dirs_before == set(), (
            "dedup_incremental leaked tempdirs"
        )
        leaked_tables = [
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith("dedup_idx_")
        ]
        assert leaked_tables == [], leaked_tables


class TestIncrementalContainment:
    """VERDICT r6 next #7: the containment tier probes the SAME
    persisted posting/size tables; cross-pairs-only, full-size
    denominators, guarded numerator, and history text never
    re-shingled."""

    HIST = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    # excerpt of doc 0 (containment 1.0), partial overlap (0.4),
    # fresh text (no pair)
    BATCH = [
        (101, "the quick brown fox jumps"),
        (103, "jumps over the lazy cat today maybe"),
        (105, "completely unrelated words about rivers and rain"),
    ]

    def test_hand_computed_containment(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_full_index,
            incremental_containment_matches,
            temp_index,
        )

        hist = spark.createDataFrame(self.HIST, "doc_id long, text string")
        batch = spark.createDataFrame(self.BATCH, "doc_id long, text string")
        with temp_index() as idx:
            build_full_index(hist, "text", "doc_id", idx)
            # full index keeps BOTH docs (no dedup pass)
            assert spark.table(idx.sizes_table).count() == 2
            strict = incremental_containment_matches(
                batch, "text", "doc_id", idx, min_containment=0.8
            )
            got = [
                (r.new_id, r.old_id, r.n_common, r.n_new, r.n_old,
                 float(r.containment))
                for r in strict.collect()
            ]
            # doc 0 has 8 shingles; the 5-word excerpt has 3, all
            # contained → 3/min(3,8) = 1.0
            assert got == [(101, 0, 3, 3, 8, 1.0)]
            loose = incremental_containment_matches(
                batch, "text", "doc_id", idx, min_containment=0.3
            )
            got = sorted(
                (r.new_id, r.old_id, float(r.containment))
                for r in loose.collect()
            )
            # 103 shares 'jumps over the','over the lazy' → 2/min(5,8)=0.4
            assert got == [(101, 0, 1.0), (103, 0, 0.4)]

    def test_probe_plan_touches_index_not_history_text(self, spark, tmp_path):
        from openaq_data_pipeline_spark.operators.dedup import shingles
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_full_index,
            incremental_containment_matches,
            temp_index,
        )

        hist_path = str(tmp_path / "hist")
        batch_path = str(tmp_path / "batch")
        spark.createDataFrame(self.HIST, "doc_id long, text string").write.parquet(
            hist_path
        )
        spark.createDataFrame(self.BATCH, "doc_id long, text string").write.parquet(
            batch_path
        )
        with temp_index() as idx:
            build_full_index(spark.read.parquet(hist_path), "text", "doc_id", idx)
            batch = spark.read.parquet(batch_path)
            probe = incremental_containment_matches(
                batch, "text", "doc_id", idx,
                new_sh=shingles(batch, "text", "doc_id", n=idx.n),
            )
            files = probe.inputFiles()
            assert idx.location is not None
            assert any(idx.location in f for f in files), "index scan missing"
            assert any(batch_path in f for f in files), "batch scan missing"
            assert not any(hist_path in f for f in files), (
                "containment probe re-reads history text"
            )


class TestIncrementalExactDedup:
    """r7: the exact tier — persisted hash index, three dispositions,
    cross-batch survival, history never re-read."""

    def test_three_batch_scenario(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            incremental_exact_dedup,
            temp_exact_index,
        )

        b1 = spark.createDataFrame(
            [(0, "Alpha  Beta"), (2, "alpha beta"), (4, "gamma delta")],
            "doc_id long, text string",
        )
        with temp_exact_index(n_buckets=4) as idx:
            # normalization folds 0 and 2 → survivor 0
            build_exact_index(b1, "text", "doc_id", idx)
            assert spark.table(idx.hashes_table).count() == 2

            b2 = spark.createDataFrame(
                [
                    (11, "ALPHA BETA"),     # cross dup → 0 (not 2)
                    (13, "fresh text one"),  # in-batch class min → kept
                    (15, "Fresh  Text One"),  # in-batch dup of 13
                    (17, "totally new"),     # fresh singleton
                ],
                "doc_id long, text string",
            )
            got = sorted(
                (r.doc_id, r.kept, r.dup_of)
                for r in incremental_exact_dedup(b2, "text", "doc_id", idx).collect()
            )
            assert got == [
                (11, False, 0),
                (13, True, None),
                (15, False, 13),
                (17, True, None),
            ]
            # batch-2 survivors are in the index for batch 3
            b3 = spark.createDataFrame(
                [(21, "fresh text one"), (23, "gamma delta")],
                "doc_id long, text string",
            )
            got3 = sorted(
                (r.doc_id, r.kept, r.dup_of)
                for r in incremental_exact_dedup(b3, "text", "doc_id", idx).collect()
            )
            assert got3 == [(21, False, 13), (23, False, 4)]

    def test_update_index_false_leaves_index_untouched(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            incremental_exact_dedup,
            temp_exact_index,
        )

        b1 = spark.createDataFrame([(0, "base doc")], "doc_id long, text string")
        b2 = spark.createDataFrame([(5, "new doc")], "doc_id long, text string")
        with temp_exact_index(n_buckets=4) as idx:
            build_exact_index(b1, "text", "doc_id", idx)
            incremental_exact_dedup(b2, "text", "doc_id", idx, update_index=False)
            assert spark.table(idx.hashes_table).count() == 1

    def test_probe_plan_is_bucket_local_and_never_reads_history(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            incremental_exact_dedup,
            temp_exact_index,
        )

        hist_path = str(tmp_path / "ehist")
        batch_path = str(tmp_path / "ebatch")
        spark.createDataFrame(
            [(0, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
        ).write.parquet(hist_path)
        spark.createDataFrame(
            [(11, "alpha beta"), (13, "fresh")], "doc_id long, text string"
        ).write.parquet(batch_path)
        with temp_exact_index(n_buckets=4) as idx:
            build_exact_index(
                spark.read.parquet(hist_path), "text", "doc_id", idx
            )
            disp = incremental_exact_dedup(
                spark.read.parquet(batch_path), "text", "doc_id", idx,
                update_index=False,
            )
            files = disp.inputFiles()
            assert idx.location is not None
            assert any(idx.location in f for f in files), "index scan missing"
            # the batch parquet is absent from inputFiles because the
            # fingerprint table is checkpointed (one materialization
            # for its two consumers) — the claim under test is the
            # NEGATIVE one: no history source in the plan
            assert not any(hist_path in f for f in files), (
                "exact probe re-reads history text"
            )
            # the index-side min-per-fingerprint satisfies the bucket
            # spec: no Exchange between the index scan and its agg
            hist_agg = (
                spark.table(idx.hashes_table)
                .groupBy("fingerprint")
                .agg(F.min("doc_id"))
            )
            plan = hist_agg._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "Bucketed: true" in plan, plan


class TestIncrementalFunnelComposition:
    """The production shape end-to-end: a crawl batch passes the
    EXACT gate first (byte-dups against all history), and only its
    survivors reach the fuzzy (Jaccard) gate — both gates probing
    their persisted indexes and appending their survivors, so the
    NEXT batch is gated against everything kept so far."""

    def test_two_gate_funnel_across_batches(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            build_index,
            incremental_dedup,
            incremental_exact_dedup,
            temp_exact_index,
            temp_index,
        )

        hist = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps over the lazy dog today"),
                (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            ],
            "doc_id long, text string",
        )
        b1 = spark.createDataFrame(
            [
                (11, "The  Quick Brown fox jumps over the lazy dog today"),  # exact dup of 0 (normalized)
                (13, "alpha beta gamma delta epsilon zeta eta theta iota"),  # NEAR dup of 2
                (15, "completely fresh content about rivers and mountains"),
                (17, "completely fresh content about rivers and mountains"),  # exact dup of 15 in-batch
            ],
            "doc_id long, text string",
        )
        with temp_exact_index(n_buckets=4) as eidx, temp_index(n_buckets=4) as jidx:
            build_exact_index(hist, "text", "doc_id", eidx)
            build_index(hist, "text", "doc_id", jidx)

            e_disp = incremental_exact_dedup(b1, "text", "doc_id", eidx)
            e_rows = {r.doc_id: (r.kept, r.dup_of) for r in e_disp.collect()}
            assert e_rows == {
                11: (False, 0),    # exact gate catches the byte dup
                13: (True, None),  # near-dup passes the exact gate
                15: (True, None),
                17: (False, 15),   # in-batch exact class
            }
            survivors = b1.join(
                e_disp.filter(F.col("kept")).select("doc_id"), "doc_id"
            )
            j_disp = incremental_dedup(survivors, "text", "doc_id", jidx)
            j_rows = {r.doc_id: (r.kept, r.dup_of) for r in j_disp.collect()}
            assert j_rows == {
                13: (False, 2),    # fuzzy gate catches the near dup
                15: (True, None),  # genuinely new → kept, appended
            }
            # batch 2: dups of batch-1 survivors are caught by the
            # UPDATED indexes at both gates
            b2 = spark.createDataFrame(
                [
                    (21, "completely  fresh content about RIVERS and mountains"),  # exact dup of 15
                    (23, "completely fresh content about rivers and lakes today"),  # near dup of 15
                ],
                "doc_id long, text string",
            )
            e2 = incremental_exact_dedup(b2, "text", "doc_id", eidx)
            e2_rows = {r.doc_id: (r.kept, r.dup_of) for r in e2.collect()}
            assert e2_rows[21] == (False, 15)
            assert e2_rows[23] == (True, None)
            s2 = b2.join(e2.filter(F.col("kept")).select("doc_id"), "doc_id")
            j2 = incremental_dedup(s2, "text", "doc_id", jidx)
            j2_rows = {r.doc_id: (r.kept, r.dup_of) for r in j2.collect()}
            assert j2_rows[23] == (False, 15)


# --- property tests: incremental tiers vs pure-Python recompute ---------

import hashlib
import re as _re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_norm(text: str) -> str:
    return _re.sub(r"\s+", " ", text.lower()).strip()


def _py_fp(text: str) -> str:
    return hashlib.md5(_py_norm(text).encode()).hexdigest()


def _py_shingles(text: str, n: int = 3) -> set:
    w = [t for t in _py_norm(text).split(" ") if t]
    if not w:
        return set()
    if len(w) < n:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


_DOC = st.text(alphabet="ab c", min_size=0, max_size=24)


class TestIncrementalTierProperties:
    @given(
        st.lists(_DOC, min_size=1, max_size=6),
        st.lists(_DOC, min_size=1, max_size=6),
    )
    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_exact_tier_matches_python_recompute(self, spark, hist, batch):
        """Disposition of arbitrary whitespace-soup batches equals a
        pure-Python recompute of the module contract (history
        survivor wins; else in-batch min id; else kept)."""
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            incremental_exact_dedup,
            temp_exact_index,
        )

        hrows = [(i, t) for i, t in enumerate(hist)]
        brows = [(100 + i, t) for i, t in enumerate(batch)]
        hdf = spark.createDataFrame(hrows, "doc_id long, text string")
        bdf = spark.createDataFrame(brows, "doc_id long, text string")
        with temp_exact_index(n_buckets=4) as idx:
            build_exact_index(hdf, "text", "doc_id", idx)
            got = {
                r.doc_id: (r.kept, r.dup_of)
                for r in incremental_exact_dedup(
                    bdf, "text", "doc_id", idx, update_index=False
                ).collect()
            }
        hist_min: dict = {}
        for i, t in hrows:
            fp = _py_fp(t)
            hist_min[fp] = min(hist_min.get(fp, i), i)
        bmin: dict = {}
        for i, t in brows:
            fp = _py_fp(t)
            bmin[fp] = min(bmin.get(fp, i), i)
        expect = {}
        for i, t in brows:
            fp = _py_fp(t)
            if fp in hist_min:
                expect[i] = (False, hist_min[fp])
            elif i == bmin[fp]:
                expect[i] = (True, None)
            else:
                expect[i] = (False, bmin[fp])
        assert got == expect

    @given(
        st.lists(_DOC, min_size=1, max_size=5),
        st.lists(_DOC, min_size=1, max_size=5),
    )
    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_containment_tier_matches_python_recompute(
        self, spark, hist, batch
    ):
        """Cross containment pairs over arbitrary corpora equal the
        pure-Python recompute: shared guarded shingles over
        min(full sizes), threshold 0.0 (every pair surfaced)."""
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_full_index,
            incremental_containment_matches,
            temp_index,
        )

        hrows = [(i, t) for i, t in enumerate(hist)]
        brows = [(100 + i, t) for i, t in enumerate(batch)]
        hdf = spark.createDataFrame(hrows, "doc_id long, text string")
        bdf = spark.createDataFrame(brows, "doc_id long, text string")
        with temp_index(n_buckets=4, max_doc_freq=3) as idx:
            build_full_index(hdf, "text", "doc_id", idx)
            got = {
                (r.new_id, r.old_id): (r.n_common, r.n_new, r.n_old)
                for r in incremental_containment_matches(
                    bdf, "text", "doc_id", idx, min_containment=0.0
                ).collect()
            }
        hsh = {i: _py_shingles(t) for i, t in hrows}
        bsh = {i: _py_shingles(t) for i, t in brows}
        # combined df per shingle over docs that contain it
        df_count: dict = {}
        for sh in list(hsh.values()) + list(bsh.values()):
            for s in sh:
                df_count[s] = df_count.get(s, 0) + 1
        ok = {s for s, c in df_count.items() if c <= 3}
        expect = {}
        for bi, bs in bsh.items():
            for hi, hs in hsh.items():
                common = bs & hs & ok
                if common and bs and hs:
                    expect[(bi, hi)] = (len(common), len(bs), len(hs))
        assert got == expect
