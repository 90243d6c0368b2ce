"""Document retraction (takedown propagation) across persisted
indexes: after `retract_documents(ids)`, (1) no probe of any index
ever surfaces a retracted id again, (2) results about surviving
documents are unchanged — for BM25 exactly equal to an index that
never contained the retracted docs (stats correction included), (3)
tables with no trace of the ids are left untouched, and (4) the
bucket spec survives the in-place rewrite, so probes stay
exchange-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.retraction import (
    retract_documents,
    retract_from_table,
)

TRAIN = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (4, "one two three four five six seven eight nine ten eleven twelve"),
    (6, "completely unrelated text about rivers mountains and weather patterns"),
]
# near-copies of 2 and 4, plus a fresh doc
BATCH = [
    (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
    (103, "one two three four five six seven eight nine ten eleven"),
    (105, "nothing like anything indexed before at all whatsoever"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRetractExactIndex:
    def test_forgotten_content_is_new_again(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            incremental_exact_dedup,
            temp_exact_index,
        )

        with temp_exact_index(n_buckets=4) as idx:
            build_exact_index(_df(spark, TRAIN), "text", "doc_id", idx)
            touched = retract_documents(spark, idx, [0], id_col="doc_id")
            assert touched == [idx.hashes_table]
            # the fingerprint row is gone
            assert (
                spark.table(idx.hashes_table)
                .where(F.col("doc_id") == 0)
                .count()
                == 0
            )
            # an exact copy of the RETRACTED doc is treated as new;
            # a copy of a KEPT doc still drops against history
            probe = _df(spark, [(200, TRAIN[0][1]), (202, TRAIN[1][1])])
            got = sorted(
                (r.doc_id, r.kept, r.dup_of)
                for r in incremental_exact_dedup(
                    probe, "text", "doc_id", idx, update_index=False
                ).collect()
            )
            assert got == [(200, True, None), (202, False, 2)]

    def test_noop_when_ids_absent(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            temp_exact_index,
        )

        with temp_exact_index(n_buckets=4) as idx:
            build_exact_index(_df(spark, TRAIN), "text", "doc_id", idx)
            before = sorted(map(tuple, spark.table(idx.hashes_table).collect()))
            assert retract_documents(spark, idx, [999], id_col="doc_id") == []
            assert retract_documents(spark, idx, [], id_col="doc_id") == []
            after = sorted(map(tuple, spark.table(idx.hashes_table).collect()))
            assert after == before


class TestRetractFuzzyIndex:
    def test_probe_forgets_retracted_doc_only(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            incremental_fuzzy_matches,
            temp_fuzzy_index,
        )

        batch = _df(spark, BATCH)
        with temp_fuzzy_index(n_buckets=4) as idx:
            build_fuzzy_index(_df(spark, TRAIN), "text", "doc_id", idx)
            before = {
                (r.train_id, r.eval_id)
                for r in incremental_fuzzy_matches(
                    batch, "text", "doc_id", idx
                ).collect()
            }
            assert before == {(2, 101), (4, 103)}
            touched = retract_documents(spark, idx, [2], id_col="doc_id")
            assert set(touched) == {
                idx.bands_table,
                idx.postings_table,
                idx.sizes_table,
            }
            after = {
                (r.train_id, r.eval_id)
                for r in incremental_fuzzy_matches(
                    batch, "text", "doc_id", idx
                ).collect()
            }
            assert after == {(4, 103)}

    def test_member_arrays_scrubbed_and_emptied_rows_dropped(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            temp_fuzzy_index,
        )

        with temp_fuzzy_index(n_buckets=4) as idx:
            build_fuzzy_index(_df(spark, TRAIN), "text", "doc_id", idx)
            retract_documents(spark, idx, [2, 6], id_col="doc_id")
            for table in (idx.bands_table, idx.postings_table):
                rows = spark.table(table).collect()
                assert rows, table
                for r in rows:
                    assert r.doc_ids, f"{table}: emptied row survived"
                    assert 2 not in r.doc_ids and 6 not in r.doc_ids
            left = {r.doc_id for r in spark.table(idx.sizes_table).collect()}
            assert left == {0, 4}

    def test_bucket_spec_preserved(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.sources.maintenance import (
            _describe_bucketed,
        )

        with temp_fuzzy_index(n_buckets=4) as idx:
            build_fuzzy_index(_df(spark, TRAIN), "text", "doc_id", idx)
            spec = _describe_bucketed(spark, idx.bands_table)
            retract_documents(spark, idx, [2], id_col="doc_id")
            spec2 = _describe_bucketed(spark, idx.bands_table)
            assert (spec2["keys"], spec2["n_buckets"], spec2["location"]) == (
                spec["keys"],
                spec["n_buckets"],
                spec["location"],
            )


class TestRetractSimHashIndex:
    def test_member_structs_filtered(self, spark):
        """Real corpus docs + one appended token — the fixture the
        SimHash tier's own tests use (synthetic token soups don't
        land in the banded Hamming radius)."""
        import os

        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_simhash_index,
            incremental_simhash_matches,
            temp_simhash_index,
        )

        sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
        train = (
            spark.read.parquet(f"{sf}/documents.parquet")
            .filter(F.col("doc_id") < 40)
            .select("doc_id", "text")
        )
        batch = train.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qq")).alias("text"),
        )
        with temp_simhash_index(n_buckets=4) as idx:
            build_simhash_index(train, "text", "doc_id", idx)
            before = {
                (r.id_a, r.id_b)
                for r in incremental_simhash_matches(
                    batch, "text", "doc_id", idx
                ).collect()
            }
            assert before, "fixture produced no near-dup pairs"
            victim = min(b for _, b in before)
            retract_documents(spark, idx, [victim], id_col="doc_id")
            after = {
                (r.id_a, r.id_b)
                for r in incremental_simhash_matches(
                    batch, "text", "doc_id", idx
                ).collect()
            }
            assert after == {p for p in before if p[1] != victim}
            # struct members scrubbed at the table level too
            for r in spark.table(idx.bands_table).collect():
                assert r.members, "emptied member row survived"
                assert all(m.id != victim for m in r.members)


class TestRetractBm25Index:
    QUERIES = [
        (1, "alpha beta gamma"),
        (2, "quick brown fox"),
        (3, "rivers and mountains"),
    ]

    def _topk(self, spark, idx, k=3):
        from openaq_data_pipeline_spark.operators.retrieval import (
            bm25_topk_indexed,
        )

        q = spark.createDataFrame(self.QUERIES, "query_id long, q_text string")
        return sorted(
            map(
                tuple,
                bm25_topk_indexed(
                    spark, q, idx, "doc_id", "q_text", k=k
                ).collect(),
            )
        )

    def test_retract_equals_index_built_without(self, spark):
        """The strong contract: scores of surviving docs after a
        retraction are EXACTLY those of an index that never saw the
        retracted docs — the negative stats row restores N and avgdl,
        df re-derives from the scrubbed postings."""
        from openaq_data_pipeline_spark.operators.retrieval import (
            build_bm25_index,
            temp_bm25_index,
        )

        full = TRAIN + [(8, "alpha beta something else entirely new here")]
        retracted = [2, 6]
        with temp_bm25_index(n_buckets=4) as idx, temp_bm25_index(
            n_buckets=4
        ) as ref:
            build_bm25_index(_df(spark, full), "text", "doc_id", idx)
            touched = retract_documents(spark, idx, retracted, id_col="doc_id")
            assert set(touched) == {idx.tf_table, idx.stats_table}
            build_bm25_index(
                _df(spark, [r for r in full if r[0] not in retracted]),
                "text",
                "doc_id",
                ref,
            )
            assert self._topk(spark, idx) == self._topk(spark, ref)
            # summed stats match the rebuilt index exactly
            def stats(i):
                return tuple(
                    spark.table(i.stats_table)
                    .agg(F.sum("n_docs"), F.sum("s_tokens"))
                    .collect()[0]
                )

            assert stats(idx) == stats(ref)


class TestRetractIvfIndex:
    def _vectors(self, spark):
        rows = [
            (i, [float(i % 4 == j) + 0.1 * i for j in range(4)])
            for i in range(8)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_neardup_probe_drops_only_retracted_neighbors(self, spark):
        from openaq_data_pipeline_spark.operators.similarity import (
            build_ivf_index,
            ivf_neardup_indexed,
            temp_ivf_index,
        )

        vecs = self._vectors(spark)
        with temp_ivf_index(nprobe=2) as idx:
            build_ivf_index(vecs, idx, n_cells=2, id_col="vec_id")
            queries = vecs.limit(3)
            before = {
                (r.query_id, r.neighbor_id)
                for r in ivf_neardup_indexed(
                    spark, queries, idx, min_cosine=0.5
                ).collect()
            }
            retracted = {5, 7}
            touched = retract_documents(
                spark, idx, list(retracted), id_col="vec_id"
            )
            assert idx.cells_table in touched
            after = {
                (r.query_id, r.neighbor_id)
                for r in ivf_neardup_indexed(
                    spark, queries, idx, min_cosine=0.5
                ).collect()
            }
            assert after == {p for p in before if p[1] not in retracted}
            # frozen quantizer untouched
            assert spark.table(idx.centroids_table).count() == 2

    def test_int8_rescore_table_scrubbed_too(self, spark):
        from openaq_data_pipeline_spark.operators.similarity import (
            build_ivf_index,
            temp_ivf_index,
        )

        vecs = self._vectors(spark)
        with temp_ivf_index(nprobe=2, storage="int8", rescore=True) as idx:
            build_ivf_index(vecs, idx, n_cells=2, id_col="vec_id")
            touched = retract_documents(spark, idx, [3], id_col="vec_id")
            assert set(touched) == {idx.cells_table, idx.rescore_table}
            for table in (idx.cells_table, idx.rescore_table):
                assert (
                    spark.table(table).where(F.col("neighbor_id") == 3).count()
                    == 0
                )


class TestRetractDedupIndex:
    def test_survivor_removed_from_posting_core(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_index,
            incremental_dedup,
            temp_index,
        )

        with temp_index(n_buckets=4) as idx:
            build_index(_df(spark, TRAIN), "text", "doc_id", idx)
            batch = _df(spark, BATCH)
            before = sorted(
                (r.doc_id, r.kept, r.dup_of)
                for r in incremental_dedup(
                    batch, "text", "doc_id", idx, update_index=False
                ).collect()
            )
            assert before == [
                (101, False, 2),
                (103, False, 4),
                (105, True, None),
            ]
            retract_documents(spark, idx, [2], id_col="doc_id")
            after = sorted(
                (r.doc_id, r.kept, r.dup_of)
                for r in incremental_dedup(
                    batch, "text", "doc_id", idx, update_index=False
                ).collect()
            )
            # the near-copy of the retracted survivor is new again;
            # the other disposition is unchanged
            assert after == [
                (101, True, None),
                (103, False, 4),
                (105, True, None),
            ]


class TestRetractFromTableDirect:
    def test_unrelated_columns_never_match(self, spark):
        """cell_id / band_id style columns must not be mistaken for
        doc ids: only exact name matches retract."""
        from openaq_data_pipeline_spark.sources.tables import save_bucketed

        df = spark.createDataFrame(
            [(1, 7, [7, 8]), (2, 9, [9])],
            "cell_id long, doc_id long, doc_ids array<long>",
        )
        table = "retract_direct_test"
        save_bucketed(df, table, "cell_id", 2)
        try:
            assert retract_from_table(spark, table, [1], frozenset({"doc_id"})) is False
            assert retract_from_table(spark, table, [7], frozenset({"doc_id"})) is True
            rows = sorted(map(tuple, spark.table(table).collect()))
            # row with doc_id 7 dropped; 7 also scrubbed from arrays
            assert rows == [(2, 9, [9])]
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")


class TestRetractFromLake:
    def test_partitioned_rewrites_only_affected_partitions(
        self, spark, tmp_path
    ):
        import glob
        import os

        from openaq_data_pipeline_spark.operators.retraction import (
            retract_from_lake,
        )

        path = str(tmp_path / "lake")
        rows = [(i, f"2026-01-{(i % 3) + 1:02d}", f"text {i}") for i in range(12)]
        spark.createDataFrame(
            rows, "doc_id long, day string, text string"
        ).write.partitionBy("day").parquet(path)

        def listing(day):
            return sorted(
                os.path.basename(p)
                for p in glob.glob(f"{path}/day={day}/*.parquet")
            )

        before_d2 = listing("2026-01-02")
        before_d3 = listing("2026-01-03")
        # ids 0 and 3 both live in day=2026-01-01
        rewritten = retract_from_lake(
            spark, path, [0, 3], "doc_id", partition_col="day"
        )
        assert rewritten == ["day=2026-01-01"]
        left = sorted(r.doc_id for r in spark.read.parquet(path).collect())
        assert left == [i for i in range(12) if i not in (0, 3)]
        # untouched partitions keep their exact files (names carry
        # write UUIDs — identical listing means no rewrite happened)
        assert listing("2026-01-02") == before_d2
        assert listing("2026-01-03") == before_d3
        # no staging residue beside the table
        assert glob.glob(f"{path}__*") == []

    def test_nested_partitioning_rewrites_only_affected_leaves(
        self, spark, tmp_path
    ):
        """Two-level date=/hour= lake (r9, VERDICT r8 #3): affected
        dirs derive from the full path relative to the lake root, so
        only the hit LEAF partitions rewrite and siblings under the
        same date keep their exact files."""
        import glob
        import os

        from openaq_data_pipeline_spark.operators.retraction import (
            retract_from_lake,
        )

        path = str(tmp_path / "lake2")
        rows = [
            (i, f"2026-01-{(i % 2) + 1:02d}", (i % 3), f"text {i}")
            for i in range(12)
        ]
        spark.createDataFrame(
            rows, "doc_id long, date string, hour int, text string"
        ).write.partitionBy("date", "hour").parquet(path)

        def listing(rel):
            return sorted(
                os.path.basename(p) for p in glob.glob(f"{path}/{rel}/*.parquet")
            )

        # doc 0 → date=2026-01-01/hour=0; doc 4 → date=2026-01-01/hour=1
        sibling_before = listing("date=2026-01-01/hour=2")
        other_date_before = listing("date=2026-01-02/hour=0")
        rewritten = retract_from_lake(
            spark, path, [0, 4], "doc_id", partition_col=["date", "hour"]
        )
        assert rewritten == [
            "date=2026-01-01/hour=0", "date=2026-01-01/hour=1",
        ]
        left = sorted(r.doc_id for r in spark.read.parquet(path).collect())
        assert left == [i for i in range(12) if i not in (0, 4)]
        assert listing("date=2026-01-01/hour=2") == sibling_before
        assert listing("date=2026-01-02/hour=0") == other_date_before
        assert glob.glob(f"{path}__*") == []
        # declaring only the top level against a nested lake is loud
        import pytest

        with pytest.raises(ValueError, match="partition"):
            retract_from_lake(spark, path, [1], "doc_id", partition_col="date")

    def test_unpartitioned_swap_and_noop(self, spark, tmp_path):
        import glob

        from openaq_data_pipeline_spark.operators.retraction import (
            retract_from_lake,
        )

        path = str(tmp_path / "flat")
        spark.createDataFrame(
            [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
        ).write.parquet(path)
        assert retract_from_lake(spark, path, [2, 4], "doc_id") == [path]
        left = sorted(r.doc_id for r in spark.read.parquet(path).collect())
        assert left == [0, 1, 3, 5]
        assert glob.glob(f"{path}__*") == []
        # ids with no trace: no rewrite, files untouched
        before = sorted(glob.glob(f"{path}/*.parquet"))
        assert retract_from_lake(spark, path, [99], "doc_id") == []
        assert sorted(glob.glob(f"{path}/*.parquet")) == before


class TestDenylist:
    """The block complement of retraction: takedown = retract (forget)
    + denylist (block). Blocked content is refused at ingest even
    after the exact index forgot it; the blocklist stores only MD5s."""

    def test_full_takedown_story(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            incremental_exact_dedup,
            temp_exact_index,
        )
        from openaq_data_pipeline_spark.operators.retraction import (
            add_to_denylist,
            denylist_gate,
            temp_denylist,
        )

        corpus = _df(spark, TRAIN)
        taken_down = corpus.where(F.col("doc_id") == 0)
        with temp_exact_index(n_buckets=4) as idx, temp_denylist() as dl:
            build_exact_index(corpus, "text", "doc_id", idx)
            # takedown: block FIRST (needs the text), then forget
            add_to_denylist(taken_down, "text", dl)
            retract_documents(spark, idx, [0], id_col="doc_id")
            # re-submission of the taken-down content: the exact index
            # would now accept it as new — the gate refuses it
            resub = _df(spark, [(300, TRAIN[0][1]), (301, "fresh new words")])
            gated = {
                r.doc_id: r.blocked
                for r in denylist_gate(resub, "text", "doc_id", dl).collect()
            }
            assert gated == {300: True, 301: False}
            passed = denylist_gate(resub, "text", "doc_id", dl).where(
                ~F.col("blocked")
            )
            got = [
                (r.doc_id, r.kept)
                for r in incremental_exact_dedup(
                    passed.select("doc_id", "text"), "text", "doc_id", idx,
                    update_index=False,
                ).collect()
            ]
            assert got == [(301, True)]

    def test_denylist_stores_only_fingerprints(self, spark):
        from openaq_data_pipeline_spark.operators.retraction import (
            add_to_denylist,
            temp_denylist,
        )

        with temp_denylist() as dl:
            add_to_denylist(_df(spark, TRAIN), "text", dl)
            schema = spark.table(dl.fps_table).schema
            assert [f.name for f in schema.fields] == ["fingerprint"]
            assert spark.table(dl.fps_table).count() == len(TRAIN)

    def test_append_and_normalization_insensitivity(self, spark):
        from openaq_data_pipeline_spark.operators.retraction import (
            add_to_denylist,
            denylist_gate,
            temp_denylist,
        )

        with temp_denylist() as dl:
            add_to_denylist(_df(spark, TRAIN[:1]), "text", dl)
            add_to_denylist(_df(spark, TRAIN[1:2]), "text", dl)  # append path
            # case/whitespace variants hash to the same fingerprint
            variant = "  The  QUICK brown fox jumps over the lazy dog today "
            got = {
                r.doc_id: r.blocked
                for r in denylist_gate(
                    _df(spark, [(1, variant), (2, TRAIN[1][1]), (3, "other")]),
                    "text", "doc_id", dl,
                ).collect()
            }
            assert got == {1: True, 2: True, 3: False}


class TestRetractSpanIndex:
    """Count-only index: retraction appends NEGATED window counts
    (the text is in hand at takedown time), so probes equal an index
    that never held the documents; the generic id walk leaves the
    counts table untouched by design."""

    def test_negative_counts_equal_rebuild_without(self, spark):
        from openaq_data_pipeline_spark.operators.retraction import (
            retract_from_span_index,
        )
        from openaq_data_pipeline_spark.operators.spans import (
            SpanIndex,
            build_span_index,
            incremental_duplicated_spans,
        )
        from openaq_data_pipeline_spark.tmproots import session_tmpdir
        import uuid

        corpus = _df(spark, [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
        ])
        # shares an 8-word window with doc 0 only
        batch = _df(spark, [(100, "alpha beta gamma delta epsilon zeta eta theta more")])

        def probe(idx):
            return sorted(
                (r.doc_id, r.span_start, r.span_end)
                for r in incremental_duplicated_spans(
                    batch, idx, update_index=False
                ).collect()
            )

        def make(docs):
            idx = SpanIndex(
                name=f"span_rt_{uuid.uuid4().hex}", k=8, min_docs=2,
                n_buckets=4, location=session_tmpdir("span_rt_"),
            )
            build_span_index(docs, idx)
            return idx

        with make(corpus) as idx, make(
            corpus.where(F.col("doc_id") != 0)
        ) as ref:
            before = probe(idx)
            assert before, "fixture batch shares no window with history"
            # generic id walk: counts table untouched (no id columns)
            assert retract_documents(spark, idx, [0], id_col="doc_id") == []
            assert probe(idx) == before
            # text-in-hand retraction: negative counts land
            retract_from_span_index(
                corpus.where(F.col("doc_id") == 0), idx
            )
            assert probe(idx) == probe(ref) == []


class TestReviewRegressions:
    """Pins for the review findings: zero-padded/int-inferred
    partition spellings, NULL-id row survival, denylist fingerprint
    column + unbootstrapped table, WordPiece duplicate merges,
    webdataset member-type validation."""

    def test_lake_partition_spelling_zero_padded_ints(self, spark, tmp_path):
        """hour=03 dirs: spark infers hour as int → the old
        value-cast match produced '3' and silently skipped the dir."""
        from openaq_data_pipeline_spark.operators.retraction import (
            retract_from_lake,
        )

        path = str(tmp_path / "lake")
        spark.createDataFrame(
            [(1, "03"), (2, "03"), (3, "11")], "doc_id long, hour string"
        ).write.partitionBy("hour").parquet(path)
        got = retract_from_lake(spark, path, [1], "doc_id", partition_col="hour")
        assert got == ["hour=03"]
        assert sorted(
            r.doc_id for r in spark.read.parquet(path).collect()
        ) == [2, 3]

    def test_lake_null_id_rows_survive_retraction(self, spark, tmp_path):
        from openaq_data_pipeline_spark.operators.retraction import (
            retract_from_lake,
        )

        path = str(tmp_path / "lake")
        spark.createDataFrame(
            [(1, "a"), (None, "keep me"), (3, "b")], "doc_id long, text string"
        ).write.parquet(path)
        retract_from_lake(spark, path, [1], "doc_id")
        left = [
            (r.doc_id, r.text) for r in spark.read.parquet(path).collect()
        ]
        assert (None, "keep me") in left and (3, "b") in left
        assert (1, "a") not in left

    def test_index_null_id_rows_survive(self, spark):
        """Top-level id columns in index tables: NULL ids must not be
        swept by an unrelated retraction."""
        from openaq_data_pipeline_spark.operators.retraction import (
            retract_from_table,
        )
        from openaq_data_pipeline_spark.sources.tables import save_bucketed

        df = spark.createDataFrame(
            [("k1", 1), ("k2", None), ("k3", 3)],
            "fingerprint string, doc_id long",
        )
        table = "retract_null_guard_test"
        save_bucketed(df, table, "fingerprint", 2)
        try:
            assert retract_from_table(
                spark, table, [1], frozenset({"doc_id"})
            )
            rows = sorted(
                map(tuple, spark.table(table).collect()),
                key=lambda r: r[0],
            )
            assert rows == [("k2", None), ("k3", 3)]
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_df_path_null_in_ids_frame_never_kills_null_rows(self, spark):
        """The join path's NULL-safe keep: a NULL in the ids
        DataFrame must not retract NULL-id rows — eqNullSafe
        left_anti would match NULL↔NULL unless NULLs are dropped
        from the ids frame, diverging from the literal path's
        documented keep (r10 ADVICE)."""
        from openaq_data_pipeline_spark.operators.retraction import (
            _df_transform,
        )

        src = spark.createDataFrame(
            [("k1", 1), ("k2", None), ("k3", 3)],
            "fingerprint string, doc_id long",
        )
        ids_df = spark.createDataFrame(
            [(1,), (None,)], "doc_id long"
        )
        out = _df_transform(src, ids_df, frozenset({"doc_id"}))
        rows = sorted(map(tuple, out.collect()), key=lambda r: r[0])
        assert rows == [("k2", None), ("k3", 3)]

    def test_index_null_array_rows_survive(self, spark):
        """Array-id and member-struct columns: a row whose doc_ids /
        members column is NULL must survive a retraction touching the
        table — size(NULL) > 0 is NULL, and a bare where(NULL) would
        silently delete it (r8 review finding)."""
        from pyspark.sql import Row

        from openaq_data_pipeline_spark.operators.retraction import (
            retract_from_table,
        )
        from openaq_data_pipeline_spark.sources.tables import save_bucketed

        ids_df = spark.createDataFrame(
            [("k1", [1, 2]), ("k2", None), ("k3", [3])],
            "fingerprint string, doc_ids array<long>",
        )
        members_df = spark.createDataFrame(
            [
                Row(bkey="b1", members=[Row(id=1, sig=7)]),
                Row(bkey="b2", members=None),
                Row(bkey="b3", members=[Row(id=3, sig=9)]),
            ],
            "bkey string, members array<struct<id:long,sig:long>>",
        )
        t_ids, t_mem = "retract_null_array_ids", "retract_null_array_members"
        save_bucketed(ids_df, t_ids, "fingerprint", 2)
        save_bucketed(members_df, t_mem, "bkey", 2)
        try:
            assert retract_from_table(spark, t_ids, [1], frozenset({"doc_id"}))
            got = {r.fingerprint: r.doc_ids for r in spark.table(t_ids).collect()}
            assert got == {"k1": [2], "k2": None, "k3": [3]}
            assert retract_from_table(spark, t_mem, [1], frozenset({"doc_id"}))
            got_m = {r.bkey: r.members for r in spark.table(t_mem).collect()}
            assert set(got_m) == {"b2", "b3"} and got_m["b2"] is None
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {t_ids}")
            spark.sql(f"DROP TABLE IF EXISTS {t_mem}")

    def test_denylist_gate_preserves_fingerprint_column_and_bootstraps(
        self, spark
    ):
        from openaq_data_pipeline_spark.operators.retraction import (
            add_to_denylist,
            denylist_gate,
            temp_denylist,
        )

        batch = spark.createDataFrame(
            [(1, "hello there", "MY_OWN_FP")],
            "doc_id long, text string, fingerprint string",
        )
        with temp_denylist() as dl:
            # unbootstrapped: blocks nothing, never raises
            out = denylist_gate(batch, "text", "doc_id", dl).collect()[0]
            assert out.blocked is False
            assert out.fingerprint == "MY_OWN_FP"
            add_to_denylist(
                spark.createDataFrame([(0, "hello there")], "i long, text string"),
                "text", dl,
            )
            out2 = denylist_gate(batch, "text", "doc_id", dl).collect()[0]
            assert out2.blocked is True and out2.fingerprint == "MY_OWN_FP"

    def test_wordpiece_no_duplicate_vocab_entries(self):
        """A popped pair that re-forms via later merges may win again;
        the piece must not enter the vocabulary twice."""
        import itertools

        from openaq_data_pipeline_spark.operators.tokenizer import (
            wordpiece_train_local,
        )

        # brute-force a search space of tiny corpora for any duplicate
        for words in itertools.combinations(
            ["aa", "aaa", "aaaa", "ab", "abab", "abcd", "cdcd", "abcdab"], 4
        ):
            vocab = wordpiece_train_local(
                [(w, i + 1) for i, w in enumerate(words)], vocab_size=40
            )
            assert len(vocab) == len(set(vocab)), (words, vocab)

    def test_webdataset_rejects_non_string_binary_member(self, spark, tmp_path):
        import pytest as _pytest

        from openaq_data_pipeline_spark.operators.curation import (
            write_webdataset_shards,
        )

        df = spark.range(3).selectExpr("id as doc_id", "id as label")
        with _pytest.raises(ValueError, match="string or binary"):
            write_webdataset_shards(
                df, str(tmp_path), "doc_id", {"cls": "label"}, 2
            )


class TestRetractionEdgeContracts:
    """Documented edge semantics pinned: the BM25 empty-doc residual,
    the no-postings no-op, and the exchange-free probe plan after a
    retraction rewrite (the bucket layout's whole point)."""

    def test_bm25_no_postings_retraction_is_full_noop(self, spark):
        from openaq_data_pipeline_spark.operators.retrieval import (
            build_bm25_index,
            temp_bm25_index,
        )

        with temp_bm25_index(n_buckets=4) as idx:
            build_bm25_index(_df(spark, TRAIN), "text", "doc_id", idx)
            stats_before = sorted(
                map(tuple, spark.table(idx.stats_table).collect())
            )
            # ids with no postings anywhere: nothing rewritten, no
            # correction row appended
            assert retract_documents(spark, idx, [777], id_col="doc_id") == []
            assert (
                sorted(map(tuple, spark.table(idx.stats_table).collect()))
                == stats_before
            )

    def test_bm25_empty_doc_residual_is_exactly_as_documented(self, spark):
        """An empty document leaves no postings, so retracting it
        cannot reverse its +1 on n_docs — the module docstring's
        stated residual. Pin BOTH halves: the stats row stays, and
        retracting a NON-empty doc from the same index is still
        exact."""
        from openaq_data_pipeline_spark.operators.retrieval import (
            build_bm25_index,
            temp_bm25_index,
        )

        rows = TRAIN + [(8, "   ")]  # doc 8 is empty after normalization
        with temp_bm25_index(n_buckets=4) as idx:
            build_bm25_index(_df(spark, rows), "text", "doc_id", idx)
            n0 = spark.table(idx.stats_table).agg(
                F.sum("n_docs")
            ).collect()[0][0]
            assert n0 == len(rows)
            # retracting the empty doc: no postings → documented no-op
            assert retract_documents(spark, idx, [8], id_col="doc_id") == []
            # retracting a real doc still corrects stats by exactly 1
            touched = retract_documents(spark, idx, [2], id_col="doc_id")
            assert idx.stats_table in touched
            n1 = spark.table(idx.stats_table).agg(
                F.sum("n_docs")
            ).collect()[0][0]
            assert n1 == n0 - 1

    def test_probe_plan_stays_exchange_free_after_retraction(self, spark):
        """The retraction rewrite preserves the bucket spec, so the
        index-side re-aggregation of a later probe still plans with
        NO Exchange above the index scan."""
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            _old_posting_lists,
            build_index,
            temp_index,
        )

        with temp_index(n_buckets=4) as idx:
            build_index(_df(spark, TRAIN), "text", "doc_id", idx)
            retract_documents(spark, idx, [2], id_col="doc_id")
            plan = (
                _old_posting_lists(spark, idx)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "Exchange" not in plan, plan


class TestRetractFromSnapshots:
    """The time-travel half of a takedown: every retained snapshot
    version is scrubbed — pinned historical reads no longer serve
    retracted content — while version numbers, the published pointer
    and untouched versions' files all survive."""

    def test_all_versions_scrubbed_pointer_and_untouched_files_intact(
        self, spark, tmp_path
    ):
        import glob

        from openaq_data_pipeline_spark.operators.retraction import (
            retract_from_snapshots,
        )
        from openaq_data_pipeline_spark.sources.snapshots import (
            current_version,
            publish_snapshot,
            read_snapshot,
        )

        root = str(tmp_path / "snaps")
        v1 = publish_snapshot(_df(spark, TRAIN), root)
        v2 = publish_snapshot(_df(spark, TRAIN + BATCH), root)
        # v3 never contained the retracted doc
        v3 = publish_snapshot(_df(spark, BATCH), root)
        files_v3 = sorted(glob.glob(f"{root}/v={v3}/*.parquet"))
        got = retract_from_snapshots(spark, root, [2], "doc_id")
        assert got == [v1, v2]
        assert current_version(root) == v3
        for v, want in ((v1, {0, 4, 6}), (v2, {0, 4, 6, 101, 103, 105}),
                        (v3, {101, 103, 105})):
            ids = {r.doc_id for r in read_snapshot(spark, root, v).collect()}
            assert ids == want, v
        # the version with no trace kept its exact files
        assert sorted(glob.glob(f"{root}/v={v3}/*.parquet")) == files_v3
        assert glob.glob(f"{root}/v=*__*") == []

    def test_noop_and_empty_ids(self, spark, tmp_path):
        from openaq_data_pipeline_spark.operators.retraction import (
            retract_from_snapshots,
        )
        from openaq_data_pipeline_spark.sources.snapshots import (
            publish_snapshot,
        )

        root = str(tmp_path / "snaps")
        publish_snapshot(_df(spark, TRAIN), root)
        assert retract_from_snapshots(spark, root, [], "doc_id") == []
        assert retract_from_snapshots(spark, root, [999], "doc_id") == []


class TestRetractDocumentsDf:
    """The join-based (DataFrame-sized) retraction path: same scrub
    as the literal path — proven table-for-table — with ids that
    never touch the driver and a plan that stays bounded at a
    million ids (VERDICT r9 #6)."""

    def test_fuzzy_df_path_matches_literal_path(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.operators.retraction import (
            retract_documents_df,
        )

        ids_df = spark.createDataFrame([(2,), (6,)], "doc_id long")
        with temp_fuzzy_index(n_buckets=4) as lit, temp_fuzzy_index(
            n_buckets=4
        ) as viadf:
            build_fuzzy_index(_df(spark, TRAIN), "text", "doc_id", lit)
            build_fuzzy_index(_df(spark, TRAIN), "text", "doc_id", viadf)
            t_lit = retract_documents(spark, lit, [2, 6], id_col="doc_id")
            t_df = retract_documents_df(spark, viadf, ids_df, id_col="doc_id")
            assert [t.split("_")[-1] for t in t_lit] == [
                t.split("_")[-1] for t in t_df
            ]
            for attr in ("bands_table", "postings_table", "sizes_table"):
                a = sorted(
                    str(sorted(r.asDict().items()))
                    for r in spark.table(getattr(lit, attr)).collect()
                )
                b = sorted(
                    str(sorted(r.asDict().items()))
                    for r in spark.table(getattr(viadf, attr)).collect()
                )
                assert a == b, attr

    def test_simhash_member_structs_df_path(self, spark):
        import os

        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_simhash_index,
            temp_simhash_index,
        )
        from openaq_data_pipeline_spark.operators.retraction import (
            retract_documents_df,
        )

        sf = os.environ.get(
            "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001"
        )
        train = (
            spark.read.parquet(f"{sf}/documents.parquet")
            .filter(F.col("doc_id") < 40)
            .select("doc_id", "text")
        )
        victim = spark.createDataFrame([(3,)], "doc_id long")
        with temp_simhash_index(n_buckets=4) as idx:
            build_simhash_index(train, "text", "doc_id", idx)
            retract_documents_df(spark, idx, victim, id_col="doc_id")
            for r in spark.table(idx.bands_table).collect():
                assert r.members, "emptied member row survived"
                assert all(m.id != 3 for m in r.members)

    def test_bm25_df_path_stats_correction(self, spark):
        from openaq_data_pipeline_spark.operators.retraction import (
            retract_documents_df,
        )
        from openaq_data_pipeline_spark.operators.retrieval import (
            build_bm25_index,
            temp_bm25_index,
        )

        full = TRAIN + [(8, "alpha beta something else entirely new here")]
        ids_df = spark.createDataFrame([(2,), (6,)], "doc_id long")
        with temp_bm25_index(n_buckets=4) as idx, temp_bm25_index(
            n_buckets=4
        ) as ref:
            build_bm25_index(_df(spark, full), "text", "doc_id", idx)
            touched = retract_documents_df(spark, idx, ids_df, id_col="doc_id")
            assert set(touched) == {idx.tf_table, idx.stats_table}
            build_bm25_index(
                _df(spark, [r for r in full if r[0] not in (2, 6)]),
                "text",
                "doc_id",
                ref,
            )
            def stats(i):
                return tuple(
                    spark.table(i.stats_table)
                    .agg(F.sum("n_docs"), F.sum("s_tokens"))
                    .collect()[0]
                )

            assert stats(idx) == stats(ref)

    def test_million_id_plan_stays_bounded(self, spark):
        """The literal path folds ids into the plan; the df path must
        not — at 1e6 ids the transform's optimized plan is joins, no
        id literals, and its string form stays small."""
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.operators.retraction import (
            _df_transform,
        )

        ids_df = spark.range(1_000_000).withColumnRenamed("id", "doc_id")
        with temp_fuzzy_index(n_buckets=4) as idx:
            build_fuzzy_index(_df(spark, TRAIN), "text", "doc_id", idx)
            src = spark.table(idx.bands_table)
            out = _df_transform(
                src, ids_df, frozenset({"doc_id", "neighbor_id"})
            )
            plan = out._jdf.queryExecution().optimizedPlan().toString()
            assert "Join" in plan
            assert len(plan) < 20_000, f"plan blew up: {len(plan)} chars"

    def test_noop_when_ids_absent(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.operators.retraction import (
            retract_documents_df,
        )

        ids_df = spark.createDataFrame([(999,)], "doc_id long")
        with temp_fuzzy_index(n_buckets=4) as idx:
            build_fuzzy_index(_df(spark, TRAIN), "text", "doc_id", idx)
            assert retract_documents_df(spark, idx, ids_df) == []
