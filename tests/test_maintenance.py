"""Small-file compaction: fragmented partitions collapse to few
files, untouched partitions keep their exact files, content is
bit-preserved."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from openaq_data_pipeline_spark.sources.maintenance import (
    compact_partitions,
    partition_file_stats,
)


def _files(path, part):
    return sorted(glob.glob(os.path.join(path, f"d={part}", "part-*")))


class TestCompaction:
    def _fragmented(self, spark, tmp_path):
        p = str(tmp_path / "t")
        # day A: 12 tiny appends → 12+ files; day B: one append
        for i in range(12):
            spark.createDataFrame([(i, "A")], "v long, d string").write.mode(
                "append"
            ).partitionBy("d").parquet(p)
        spark.createDataFrame([(99, "B")], "v long, d string").write.mode(
            "append"
        ).partitionBy("d").parquet(p)
        return p

    def test_compacts_only_fragmented_partitions(self, spark, tmp_path):
        p = self._fragmented(spark, tmp_path)
        before_b = _files(p, "B")
        before = spark.read.parquet(p).orderBy("v").collect()
        compacted = compact_partitions(spark, p, "d", max_files=8)
        assert compacted == ["A"]
        assert len(_files(p, "A")) < 12
        assert _files(p, "B") == before_b  # untouched, same physical files
        after = spark.read.parquet(p).orderBy("v").collect()
        assert [tuple(r) for r in after] == [tuple(r) for r in before]

    def test_noop_below_threshold(self, spark, tmp_path):
        p = self._fragmented(spark, tmp_path)
        assert compact_partitions(spark, p, "d", max_files=50) == []

    def test_stats_shape(self, spark, tmp_path):
        p = self._fragmented(spark, tmp_path)
        stats = {r["p"]: r["n_files"] for r in partition_file_stats(spark, p, "d").collect()}
        assert stats["A"] >= 12 and stats["B"] >= 1

    def test_stats_reports_real_byte_sizes(self, spark, tmp_path):
        p = self._fragmented(spark, tmp_path)
        on_disk = {
            part: sum(os.path.getsize(f) for f in _files(p, part))
            for part in ("A", "B")
        }
        got = {
            r["p"]: r["n_bytes"]
            for r in partition_file_stats(spark, p, "d").collect()
        }
        assert got == on_disk

    def test_stats_launches_no_spark_job(self, spark, tmp_path):
        """VERDICT r5 #3 'done' criterion: deciding which partitions
        to compact is a filesystem LISTING, not a data scan — the
        stats pass must launch zero Spark jobs (the previous form
        ran input_file_name() over the whole table)."""
        p = self._fragmented(spark, tmp_path)
        store = spark.sparkContext._jsc.sc().statusStore()
        before = store.jobsList(None).size()
        stats = partition_file_stats(spark, p, "d")
        assert store.jobsList(None).size() == before, (
            "partition_file_stats launched a Spark job"
        )
        # the result itself is sane (collecting the 2-row
        # driver-local DataFrame afterwards may legitimately run a
        # trivial local job — that is not a data scan)
        assert {r["p"] for r in stats.collect()} == {"A", "B"}


class TestTmpRootHygiene:
    """VERDICT r6 #8: a process killed between mkdtemp and context-
    manager exit must not leak index dirs forever — the next session
    start reaps dead-pid roots and over-age legacy dirs."""

    def test_session_tmpdir_roots_under_own_pid(self):
        from openaq_data_pipeline_spark import tmproots

        d = tmproots.session_tmpdir("dedup_index_")
        assert os.path.isdir(d)
        root = tmproots.session_root()
        assert d.startswith(root + os.sep)
        assert os.path.basename(root).split("_", 1)[0] == str(os.getpid())

    def test_dead_pid_root_is_reaped_live_root_is_not(self):
        from openaq_data_pipeline_spark import tmproots

        os.makedirs(tmproots.ROOT_PARENT, exist_ok=True)
        # a root owned by a pid that cannot be alive (max pid + 1 is
        # not spawnable; 2**22 exceeds the default pid_max)
        dead = os.path.join(tmproots.ROOT_PARENT, f"{2**22 + 17}_deadbeef")
        os.makedirs(os.path.join(dead, "simhash_index_x"), exist_ok=True)
        live = tmproots.session_root()  # ours — alive by definition
        removed = tmproots.reap_stale_roots()
        assert dead in removed and not os.path.exists(dead)
        assert os.path.isdir(live)

    def test_legacy_prefix_dirs_reaped_only_past_age_gate(self, tmp_path):
        import tempfile
        import time

        from openaq_data_pipeline_spark import tmproots

        fresh = tempfile.mkdtemp(prefix="simhash_index_")
        stale = tempfile.mkdtemp(prefix="simhash_index_")
        old = time.time() - tmproots.LEGACY_MAX_AGE_SEC - 60
        os.utime(stale, (old, old))
        try:
            removed = tmproots.reap_stale_roots()
            assert stale in removed and not os.path.exists(stale)
            assert os.path.isdir(fresh)  # could be a live session's
        finally:
            for d in (fresh, stale):
                if os.path.isdir(d):
                    __import__("shutil").rmtree(d, ignore_errors=True)

    def test_get_spark_triggers_reap(self, spark, monkeypatch):
        """The reap is wired into the session factory (once per
        process; reset the latch to observe it)."""
        from openaq_data_pipeline_spark import session as sess
        from openaq_data_pipeline_spark import tmproots

        dead = os.path.join(tmproots.ROOT_PARENT, f"{2**22 + 23}_cafef00d")
        os.makedirs(dead, exist_ok=True)
        monkeypatch.setattr(sess, "_reaped", False)
        sess.get_spark()
        assert not os.path.exists(dead)


class TestBucketedCompaction:
    """VERDICT r6 #3: N appends to a bucketed index → one file set per
    bucket per append; compaction collapses each bucket to one file,
    preserving the bucket spec (probe joins stay exchange-free) and
    the exact contents."""

    def _bucketed_with_appends(self, spark, tmp_path, n_appends=5):
        from openaq_data_pipeline_spark.sources.tables import save_bucketed

        name = "compact_idx_postings_t"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        loc = str(tmp_path / "bidx")
        for i in range(n_appends):
            df = spark.range(i * 100, (i + 1) * 100).select(
                F.col("id").alias("bkey"), (F.col("id") * 2).alias("v")
            )
            save_bucketed(
                df, name, "bkey", n_buckets=4, sort=True,
                mode="overwrite" if i == 0 else "append", path=loc,
            )
        return name

    def test_stats_metadata_only_and_per_bucket(self, spark, tmp_path):
        from openaq_data_pipeline_spark.sources.maintenance import (
            bucket_file_stats,
        )

        name = self._bucketed_with_appends(spark, tmp_path)
        store = spark.sparkContext._jsc.sc().statusStore()
        before = store.jobsList(None).size()
        stats_df = bucket_file_stats(spark, name)
        assert store.jobsList(None).size() == before, (
            "bucket_file_stats launched a Spark job"
        )
        stats = {
            r["bucket_id"]: r["n_files"] for r in stats_df.collect()
        }
        assert set(stats) == {0, 1, 2, 3}
        assert all(n == 5 for n in stats.values())

    def test_compact_collapses_buckets_preserves_plan_and_rows(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_spark.sources.maintenance import (
            bucket_file_stats,
            compact_bucketed_table,
        )

        name = self._bucketed_with_appends(spark, tmp_path)
        before = sorted(
            (r["bkey"], r["v"]) for r in spark.table(name).collect()
        )
        assert compact_bucketed_table(spark, name, max_files=2) is True
        stats = {
            r["bucket_id"]: r["n_files"]
            for r in bucket_file_stats(spark, name).collect()
        }
        assert set(stats) == {0, 1, 2, 3}
        assert all(n == 1 for n in stats.values())
        after = sorted(
            (r["bkey"], r["v"]) for r in spark.table(name).collect()
        )
        assert after == before
        # bucket spec survived: a self-join on the bucket key plans
        # with no Exchange (the whole point of the index layout)
        other = spark.table(name).groupBy("bkey").count()
        plan = (
            spark.table(name)
            .join(other, "bkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # no SHUFFLE exchange (a broadcast of the tiny aggregated side
        # is fine — the bucketed scan itself must not repartition)
        assert "Exchange hashpartitioning" not in plan
        # second call is a metadata-gated no-op
        assert compact_bucketed_table(spark, name, max_files=2) is False
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    def test_compacts_a_real_dedup_index(self, spark):
        """The maintenance pass speaks the actual index tables: two
        batches through incremental_dedup fragment the postings
        table; compaction heals it and a third batch still dedups
        correctly against history."""
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_index,
            incremental_dedup,
            temp_index,
        )
        from openaq_data_pipeline_spark.sources.maintenance import (
            bucket_file_stats,
            compact_bucketed_table,
        )

        rows1 = [(1, "alpha beta gamma delta epsilon"), (2, "zeta eta theta iota kappa")]
        rows2 = [(3, "alpha beta gamma delta epsilon"), (4, "unique words here only four")]
        rows3 = [(5, "zeta eta theta iota kappa"), (6, "fresh text never seen before")]
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
        with temp_index(n_buckets=4) as idx:
            build_index(mk(rows1), "text", "doc_id", idx)
            incremental_dedup(mk(rows2), "text", "doc_id", idx)
            frag = bucket_file_stats(spark, idx.postings_table)
            assert frag.agg(F.max("n_files")).collect()[0][0] >= 2
            assert compact_bucketed_table(spark, idx.postings_table, max_files=1)
            healed = bucket_file_stats(spark, idx.postings_table)
            assert healed.agg(F.max("n_files")).collect()[0][0] == 1
            out = incremental_dedup(mk(rows3), "text", "doc_id", idx)
            dup = {r["doc_id"]: r["dup_of"] for r in out.collect()}
            assert dup[5] == 2  # history survived compaction
            assert dup[6] is None


class TestBm25IndexCompaction:
    """The compactor speaks every bucketed index family: fragment the
    BM25 term-bucketed postings across appends, compact, and the
    indexed probe must return identical rows with the bucket-local
    plan intact."""

    def test_bm25_probe_identical_after_compaction(self, spark):
        from openaq_data_pipeline_spark.operators.retrieval import (
            append_bm25_index,
            bm25_topk_indexed,
            build_bm25_index,
            temp_bm25_index,
        )
        from openaq_data_pipeline_spark.sources.maintenance import (
            bucket_file_stats,
            compact_bucketed_table,
        )

        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
        b1 = mk([(1, "spark engines shuffle data"), (2, "ducks paddle in rivers")])
        b2 = mk([(3, "spark rivers of data"), (4, "paddle faster spark")])
        b3 = mk([(5, "data rivers run deep")])
        q = spark.createDataFrame(
            [(100, "spark rivers")], "query_id long, text string"
        )
        with temp_bm25_index(n_buckets=4) as idx:
            build_bm25_index(b1, "text", "doc_id", idx)
            append_bm25_index(b2, "text", "doc_id", idx)
            append_bm25_index(b3, "text", "doc_id", idx)
            probe = lambda: bm25_topk_indexed(
                spark, q, idx, id_col="doc_id", q_text_col="text", k=5
            )
            before = sorted(tuple(r) for r in probe().collect())
            frag = bucket_file_stats(spark, idx.tf_table)
            assert frag.agg(F.max("n_files")).collect()[0][0] >= 2
            assert compact_bucketed_table(spark, idx.tf_table, max_files=1)
            healed = bucket_file_stats(spark, idx.tf_table)
            assert healed.agg(F.max("n_files")).collect()[0][0] == 1
            after = sorted(tuple(r) for r in probe().collect())
            assert after == before


class TestCompactIndex:
    """compact_index sweeps every bucketed table of an index handle
    in one call, skipping non-bucketed side tables."""

    def test_compacts_all_fragmented_tables_of_a_dedup_index(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_index,
            incremental_dedup,
            temp_index,
        )
        from openaq_data_pipeline_spark.sources.maintenance import (
            bucket_file_stats,
            compact_index,
        )

        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
        # multi-doc batches so every write lands files in EVERY bucket
        # of both tables (a 1-doc batch touches one sizes bucket only)
        words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
        batch = lambda base: mk(
            [
                (
                    base + i,
                    f"tag{base} "
                    + " ".join(words[j % 10] for j in range(i, i + 5))
                    + f" tail{base + i}",
                )
                for i in range(8)
            ]
        )
        with temp_index(n_buckets=4) as idx:
            build_index(batch(0), "text", "doc_id", idx)
            incremental_dedup(batch(100), "text", "doc_id", idx)
            incremental_dedup(batch(200), "text", "doc_id", idx)
            done = compact_index(spark, idx, max_files=1)
            assert sorted(done) == sorted(
                [idx.postings_table, idx.sizes_table]
            )
            for t in done:
                healed = bucket_file_stats(spark, t)
                assert healed.agg(F.max("n_files")).collect()[0][0] == 1
            # second sweep: nothing left to do
            assert compact_index(spark, idx, max_files=1) == []

    def test_skips_non_bucketed_side_tables(self, spark):
        from openaq_data_pipeline_spark.operators.retrieval import (
            append_bm25_index,
            build_bm25_index,
            temp_bm25_index,
        )
        from openaq_data_pipeline_spark.sources.maintenance import compact_index

        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
        with temp_bm25_index(n_buckets=4) as idx:
            build_bm25_index(mk([(1, "spark rivers")]), "text", "doc_id", idx)
            append_bm25_index(mk([(2, "rivers run")]), "text", "doc_id", idx)
            append_bm25_index(mk([(3, "spark runs")]), "text", "doc_id", idx)
            done = compact_index(spark, idx, max_files=1)
            # tf (bucketed) compacted; stats (plain parquet, one row
            # per batch) skipped
            assert done == [idx.tf_table]
            assert spark.table(idx.stats_table).count() == 3

    def test_fuzzy_and_simhash_indexes_heal_with_probe_unchanged(self, spark):
        """compact_index on the remaining families: the fuzzy index's
        three bucketed tables and the simhash band table fragment
        across appends, heal to 1 file/bucket, and the incremental
        probes return identical rows."""
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            append_fuzzy_index,
            append_simhash_index,
            build_fuzzy_index,
            build_simhash_index,
            incremental_fuzzy_matches,
            incremental_simhash_matches,
            temp_fuzzy_index,
            temp_simhash_index,
        )
        from openaq_data_pipeline_spark.sources.maintenance import (
            bucket_file_stats,
            compact_index,
        )

        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
        words = "alpha beta gamma delta epsilon zeta eta theta".split()
        batch = lambda base: mk(
            [
                (base + i, " ".join(words[(i + j) % 8] for j in range(6)))
                for i in range(6)
            ]
        )
        probe_batch = mk(
            [(900, " ".join(words[j % 8] for j in range(6)) + " extra")]
        )
        with temp_fuzzy_index(n_buckets=4) as fidx:
            build_fuzzy_index(batch(0), "text", "doc_id", fidx)
            append_fuzzy_index(batch(100), "text", "doc_id", fidx)
            before = sorted(
                tuple(r)
                for r in incremental_fuzzy_matches(
                    probe_batch, "text", "doc_id", fidx
                ).collect()
            )
            done = compact_index(spark, fidx, max_files=1)
            assert len(done) >= 1
            for t in done:
                assert (
                    bucket_file_stats(spark, t)
                    .agg(F.max("n_files"))
                    .collect()[0][0]
                    == 1
                )
            after = sorted(
                tuple(r)
                for r in incremental_fuzzy_matches(
                    probe_batch, "text", "doc_id", fidx
                ).collect()
            )
            assert after == before
        with temp_simhash_index(n_buckets=4) as sidx:
            build_simhash_index(batch(0), "text", "doc_id", sidx)
            append_simhash_index(batch(100), "text", "doc_id", sidx)
            before = sorted(
                tuple(r)
                for r in incremental_simhash_matches(
                    probe_batch, "text", "doc_id", sidx
                ).collect()
            )
            done = compact_index(spark, sidx, max_files=1)
            assert done == [sidx.bands_table]
            after = sorted(
                tuple(r)
                for r in incremental_simhash_matches(
                    probe_batch, "text", "doc_id", sidx
                ).collect()
            )
            assert after == before


class TestAdviceR7:
    """ADVICE r7: crash-safe compaction swap, loud layout gate,
    content-mtime legacy reaping, scheme-only `file:` strip."""

    def _bucketed(self, spark, tmp_path, name, external=True, appends=4):
        from openaq_data_pipeline_spark.sources.tables import save_bucketed

        loc = str(tmp_path / name) if external else None
        for i in range(appends):
            df = spark.createDataFrame(
                [(j, i * 10 + j) for j in range(8)], "bkey long, v long"
            )
            save_bucketed(
                df, name, "bkey", n_buckets=4, sort=True,
                mode="overwrite" if i == 0 else "append", path=loc,
            )
        return loc

    def test_crash_during_staging_leaves_old_table_intact(
        self, spark, tmp_path, monkeypatch
    ):
        """The medium finding: a failure mid-compaction must never
        lose the only copy of the index. Simulate a crash during the
        staging write — the original table (metadata AND files) must
        still read back exactly."""
        from openaq_data_pipeline_spark.sources import maintenance, tables

        name = "adv7_crash_tbl"
        self._bucketed(spark, tmp_path, name)
        before = sorted(tuple(r) for r in spark.table(name).collect())

        real = tables.save_bucketed

        def exploding(*a, **kw):
            raise RuntimeError("simulated executor loss mid-stage")

        monkeypatch.setattr(tables, "save_bucketed", exploding)
        try:
            import pytest as _pytest

            with _pytest.raises(RuntimeError, match="simulated"):
                maintenance.compact_bucketed_table(spark, name, max_files=1)
        finally:
            monkeypatch.setattr(tables, "save_bucketed", real)
        after = sorted(tuple(r) for r in spark.table(name).collect())
        assert after == before
        # and a real (non-crashing) compaction still heals it
        assert maintenance.compact_bucketed_table(spark, name, max_files=1)
        healed = sorted(tuple(r) for r in spark.table(name).collect())
        assert healed == before
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    def test_compaction_never_strands_appends(self, spark, tmp_path):
        """Location stays stable across the swap: an append through
        the index path after compaction lands in the same table."""
        from openaq_data_pipeline_spark.sources import maintenance
        from openaq_data_pipeline_spark.sources.maintenance import (
            _describe_bucketed,
        )
        from openaq_data_pipeline_spark.sources.tables import save_bucketed

        name = "adv7_stable_loc"
        loc = self._bucketed(spark, tmp_path, name)
        loc_before = _describe_bucketed(spark, name)["location"]
        assert maintenance.compact_bucketed_table(spark, name, max_files=1)
        assert _describe_bucketed(spark, name)["location"] == loc_before
        save_bucketed(
            spark.createDataFrame([(1, 999)], "bkey long, v long"),
            name, "bkey", n_buckets=4, sort=True, mode="append", path=loc,
        )
        assert spark.table(name).filter(F.col("v") == 999).count() == 1
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    def test_managed_table_compacts_via_rename_swap(self, spark, tmp_path):
        from openaq_data_pipeline_spark.sources import maintenance

        name = "adv7_managed_tbl"
        self._bucketed(spark, tmp_path, name, external=False)
        before = sorted(tuple(r) for r in spark.table(name).collect())
        assert maintenance.compact_bucketed_table(spark, name, max_files=1)
        stats = {
            r["bucket_id"]: r["n_files"]
            for r in maintenance.bucket_file_stats(spark, name).collect()
        }
        assert all(n == 1 for n in stats.values())
        after = sorted(tuple(r) for r in spark.table(name).collect())
        assert after == before
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    def test_stats_raise_on_unrecognized_layout(self, spark, tmp_path):
        """A data file outside the bucket naming scheme (or a stray
        subdirectory) must fail the gate loudly, not silently
        undercount fragmentation."""
        import pytest as _pytest

        from openaq_data_pipeline_spark.sources import maintenance

        name = "adv7_layout_tbl"
        loc = self._bucketed(spark, tmp_path, name, appends=2)
        with open(os.path.join(loc, "rogue-data.parquet"), "w") as fh:
            fh.write("not bucketed")
        with _pytest.raises(ValueError, match="rogue-data"):
            maintenance.bucket_file_stats(spark, name)
        os.remove(os.path.join(loc, "rogue-data.parquet"))
        os.makedirs(os.path.join(loc, "unexpected_subdir"))
        with _pytest.raises(ValueError, match="unexpected_subdir"):
            maintenance.bucket_file_stats(spark, name)
        os.rmdir(os.path.join(loc, "unexpected_subdir"))
        # clean again → the gate passes (keys 0-7 murmur into 3 of
        # the 4 buckets on this fixture)
        assert maintenance.bucket_file_stats(spark, name).count() == 3
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    def test_legacy_reap_spares_dir_with_fresh_content(self):
        """A >6h-old top-level dir whose CONTENTS were written
        recently belongs to a live pre-hygiene process — the reaper
        must look at tree mtimes, not the top-level one."""
        import tempfile
        import time

        from openaq_data_pipeline_spark import tmproots

        live = tempfile.mkdtemp(prefix="simhash_index_")
        inner = os.path.join(live, "bands", "part-0")
        os.makedirs(os.path.dirname(inner))
        with open(inner, "w") as fh:
            fh.write("x")
        old = time.time() - tmproots.LEGACY_MAX_AGE_SEC - 3600
        # age the top level AND the intermediate dir; the inner file
        # stays fresh — only content recency should protect the tree
        os.utime(live, (old, old))
        os.utime(os.path.dirname(inner), (old, old))
        try:
            removed = tmproots.reap_stale_roots()
            assert live not in removed and os.path.isdir(live)
            # now age everything → reapable
            os.utime(inner, (old, old))
            os.utime(os.path.dirname(inner), (old, old))
            os.utime(live, (old, old))
            removed = tmproots.reap_stale_roots()
            assert live in removed and not os.path.exists(live)
        finally:
            if os.path.isdir(live):
                __import__("shutil").rmtree(live, ignore_errors=True)

    def test_strip_file_scheme_only_prefix(self):
        from openaq_data_pipeline_spark.sources.maintenance import (
            _strip_file_scheme,
        )

        assert _strip_file_scheme("file:/tmp/x") == "/tmp/x"
        # pathological: 'file:' appearing later must survive
        assert (
            _strip_file_scheme("file:/tmp/profile:data")
            == "/tmp/profile:data"
        )
        assert _strip_file_scheme("/already/plain") == "/already/plain"


class TestParquetBloomFilters:
    """save_bucketed's bloom option (r8): footers carry a bloom
    filter for the requested column only, and the exact-index
    point-lookup API pushes its IN predicate to the scan where the
    bloom applies."""

    def _bloom_offsets(self, spark, location, column):
        """(file, offset) via parquet-mr footers — pyarrow 16 doesn't
        expose bloom metadata, the JVM reader does."""
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        out = {}
        for name in os.listdir(location):
            if not name.endswith(".parquet") or name.startswith(("_", ".")):
                continue
            jpath = jvm.org.apache.hadoop.fs.Path(
                os.path.join(location, name)
            )
            footer = jvm.org.apache.parquet.hadoop.ParquetFileReader.readFooter(
                conf, jpath
            )
            for block in footer.getBlocks():
                for col in block.getColumns():
                    if col.getPath().toDotString() == column:
                        out[name] = col.getBloomFilterOffset()
        return out

    def test_bloom_written_only_when_requested(self, spark, tmp_path):
        from openaq_data_pipeline_spark.sources.tables import save_bucketed

        df = spark.createDataFrame(
            [(f"k{i}", i) for i in range(500)], "k string, v long"
        )
        on = str(tmp_path / "bloom_on")
        off = str(tmp_path / "bloom_off")
        save_bucketed(df, "bloom_on_tbl", "k", 4, path=on,
                      bloom={"k": 500})
        save_bucketed(df, "bloom_off_tbl", "k", 4, path=off)
        on_offsets = self._bloom_offsets(spark, on, "k")
        off_offsets = self._bloom_offsets(spark, off, "k")
        assert on_offsets and all(v > 0 for v in on_offsets.values())
        assert off_offsets and all(v == -1 for v in off_offsets.values())
        # the non-bloom column stays bloom-free even on the bloom table
        v_offsets = self._bloom_offsets(spark, on, "v")
        assert all(v == -1 for v in v_offsets.values())
        spark.sql("DROP TABLE IF EXISTS bloom_on_tbl")
        spark.sql("DROP TABLE IF EXISTS bloom_off_tbl")

    def test_exact_index_lookup_pushes_in_predicate(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            lookup_fingerprints,
            temp_exact_index,
        )
        from openaq_data_pipeline_spark.operators.text import fingerprint

        docs = spark.createDataFrame(
            [(i, f"text number {i}") for i in range(200)],
            "doc_id long, text string",
        )
        with temp_exact_index(n_buckets=4, bloom_ndv=200) as idx:
            build_exact_index(docs, "text", "doc_id", idx)
            offsets = self._bloom_offsets(
                spark, f"{idx.location}/hashes", "fingerprint"
            )
            assert offsets and all(v > 0 for v in offsets.values())
            wanted = [
                r["fp"]
                for r in docs.filter("doc_id in (3, 77)")
                .select(fingerprint(F.col("text")).alias("fp"))
                .collect()
            ]
            hits = lookup_fingerprints(spark, idx, wanted)
            got = {r["doc_id"] for r in hits.collect()}
            assert got == {3, 77}
            plan = hits._jdf.queryExecution().executedPlan().toString()
            assert "PushedFilters: [In(fingerprint" in plan
