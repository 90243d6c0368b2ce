"""Streaming corpus ingestion through the exact-dedup gate
(streaming/ingest.py): cross-micro-batch dedup against the persisted
index, survivors sink correctness, and equivalence with the batch
operator run sequentially."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.incremental_dedup import (
    build_exact_index,
    incremental_exact_dedup,
    temp_exact_index,
)
from openaq_data_pipeline_spark.streaming.ingest import stream_corpus_ingest

SCHEMA = "doc_id long, text string"

HISTORY = [(0, "alpha beta gamma"), (1, "delta epsilon zeta")]
# file 1: one dup-of-history (10), one new (11), one intra-batch dup
# pair (12 survives, 13 drops)
FILE1 = [
    (10, "alpha beta gamma"),
    (11, "eta theta iota"),
    (12, "kappa lambda mu"),
    (13, "kappa lambda mu"),
]
# file 2: dup of a FILE1 survivor (20 → 11), dup of history (21 → 1),
# and a fresh doc (22)
FILE2 = [
    (20, "eta theta iota"),
    (21, "delta epsilon zeta"),
    (22, "nu xi omicron"),
]
EXPECT_KEPT = {11, 12, 22}
EXPECT_DUP_OF = {10: 0, 13: 12, 20: 11, 21: 1}


def _write_file(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


class TestStreamCorpusIngest:
    def _run(self, spark, tmp_path):
        src = str(tmp_path / "incoming")
        out = str(tmp_path / "survivors")
        ckpt = str(tmp_path / "ckpt")
        _write_file(spark, FILE1, src)
        time.sleep(1.1)  # distinct mtimes → deterministic file order
        _write_file(spark, FILE2, src)
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        with temp_exact_index(n_buckets=4) as idx:
            build_exact_index(
                spark.createDataFrame(HISTORY, SCHEMA), "text", "doc_id", idx
            )
            q = stream_corpus_ingest(
                stream, "text", "doc_id", idx, out, ckpt
            )
            q.awaitTermination(120)
            n_batches = len(
                [p for p in q.recentProgress if p["numInputRows"] > 0]
            )
            index_rows = {
                (r["fingerprint"], r["doc_id"])
                for r in spark.table(idx.hashes_table).collect()
            }
            survivors = spark.read.parquet(out).collect()
        return n_batches, index_rows, survivors

    def test_cross_micro_batch_dedup(self, spark, tmp_path):
        n_batches, index_rows, survivors = self._run(spark, tmp_path)
        # two files → two micro-batches (maxFilesPerTrigger=1): the
        # FILE2 dups can only be caught through the persisted index
        assert n_batches == 2
        kept_ids = {r["doc_id"] for r in survivors}
        assert kept_ids == EXPECT_KEPT
        # survivors carry full rows + their batch partition
        by_id = {r["doc_id"]: r for r in survivors}
        assert by_id[11]["text"] == "eta theta iota"
        assert by_id[11]["batch_id"] == 0 and by_id[22]["batch_id"] == 1
        # the index grew by exactly the kept fingerprints
        assert {d for _, d in index_rows} == {0, 1} | EXPECT_KEPT

    def test_matches_sequential_batch_operator(self, spark, tmp_path):
        _, stream_index, _ = self._run(spark, tmp_path)
        with temp_exact_index(n_buckets=4) as idx:
            build_exact_index(
                spark.createDataFrame(HISTORY, SCHEMA), "text", "doc_id", idx
            )
            disps = []
            for rows in (FILE1, FILE2):
                disps.extend(
                    incremental_exact_dedup(
                        spark.createDataFrame(rows, SCHEMA),
                        "text",
                        "doc_id",
                        idx,
                    ).collect()
                )
            batch_index = {
                (r["fingerprint"], r["doc_id"])
                for r in spark.table(idx.hashes_table).collect()
            }
        assert stream_index == batch_index
        dup_of = {r["doc_id"]: r["dup_of"] for r in disps if not r["kept"]}
        assert dup_of == EXPECT_DUP_OF

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        """A foreachBatch retry re-runs the same micro-batch: the
        survivors partition overwrites itself and the index's extra
        rows change nothing the probe can observe."""
        out = str(tmp_path / "survivors2")
        with temp_exact_index(n_buckets=4) as idx:
            build_exact_index(
                spark.createDataFrame(HISTORY, SCHEMA), "text", "doc_id", idx
            )
            from openaq_data_pipeline_spark.streaming.ingest import dedup_gate

            gate = dedup_gate("text", "doc_id", idx, out)
            batch = spark.createDataFrame(FILE1, SCHEMA)
            gate(batch, 0)
            first = sorted(
                tuple(r) for r in spark.read.parquet(out).collect()
            )
            gate(batch, 0)  # simulated retry
            second = sorted(
                tuple(r) for r in spark.read.parquet(out).collect()
            )
            assert second == first
            # probe semantics unchanged: FILE2's doc 20 still dups to 11
            disp = incremental_exact_dedup(
                spark.createDataFrame(FILE2, SCHEMA),
                "text",
                "doc_id",
                idx,
                update_index=False,
            ).collect()
            assert {r["doc_id"]: r["dup_of"] for r in disp if not r["kept"]} == {
                20: 11,
                21: 1,
            }
        assert os.path.isdir(out)


# --- two-gate funnel (r8) ----------------------------------------------

FHISTORY = [
    (0, "alpha beta gamma delta epsilon zeta eta"),
    (1, "one two three four five six"),
]
# file 1: 10 near-dups history 0 (subset text — exact gate passes it,
# fuzzy gate must drop it); 11 fresh; 12/13 exact intra-batch pair
FFILE1 = [
    (10, "alpha beta gamma delta epsilon zeta"),
    (11, "red orange yellow green blue indigo"),
    (12, "cat dog fish bird mouse"),
    (13, "cat dog fish bird mouse"),
]
# file 2: 20 near-dups FILE1 survivor 11 (cross-micro-batch — only
# the persisted fuzzy index can catch it); 21 exact-dups history;
# 22 fresh
FFILE2 = [
    (20, "red orange yellow green blue indigo extra"),
    (21, "one two three four five six"),
    (22, "totally fresh content here now"),
]
FEXPECT_KEPT = {11, 12, 22}


class TestStreamCorpusIngestFuzzy:
    def _run(self, spark, tmp_path):
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.streaming.ingest import (
            stream_corpus_ingest_fuzzy,
        )

        src = str(tmp_path / "incoming")
        out = str(tmp_path / "survivors")
        ckpt = str(tmp_path / "ckpt")
        _write_file(spark, FFILE1, src)
        time.sleep(1.1)
        _write_file(spark, FFILE2, src)
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        hist = spark.createDataFrame(FHISTORY, SCHEMA)
        with temp_exact_index(n_buckets=4) as eidx, temp_fuzzy_index(
            n_buckets=4
        ) as fidx:
            build_exact_index(hist, "text", "doc_id", eidx)
            build_fuzzy_index(hist, "text", "doc_id", fidx)
            q = stream_corpus_ingest_fuzzy(
                stream, "text", "doc_id", eidx, fidx, out, ckpt
            )
            q.awaitTermination(120)
            survivors = spark.read.parquet(out).collect()
            sizes_ids = {
                r["doc_id"]
                for r in spark.table(fidx.sizes_table).collect()
            }
        return survivors, sizes_ids

    def test_two_gate_funnel_across_micro_batches(self, spark, tmp_path):
        survivors, sizes_ids = self._run(spark, tmp_path)
        kept_ids = {r["doc_id"] for r in survivors}
        assert kept_ids == FEXPECT_KEPT
        by_id = {r["doc_id"]: r for r in survivors}
        # 20 near-dupped a FILE1 survivor: catchable only through the
        # persisted index appended by micro-batch 0
        assert by_id[11]["batch_id"] == 0 and by_id[22]["batch_id"] == 1
        # only KEPT docs entered the fuzzy index (history + survivors)
        assert sizes_ids == {0, 1} | FEXPECT_KEPT

    def test_replay_is_guarded_by_marker(self, spark, tmp_path):
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.streaming.ingest import (
            fuzzy_dedup_gate,
        )

        out = str(tmp_path / "survivors")
        hist = spark.createDataFrame(FHISTORY, SCHEMA)
        batch = spark.createDataFrame(FFILE1, SCHEMA)
        with temp_exact_index(n_buckets=4) as eidx, temp_fuzzy_index(
            n_buckets=4
        ) as fidx:
            build_exact_index(hist, "text", "doc_id", eidx)
            build_fuzzy_index(hist, "text", "doc_id", fidx)
            gate = fuzzy_dedup_gate("text", "doc_id", eidx, fidx, out)
            gate(batch, 0)
            first = sorted(
                r["doc_id"] for r in spark.read.parquet(out).collect()
            )
            n_band_rows = spark.table(fidx.bands_table).count()
            assert os.path.isdir(os.path.join(fidx.location, "_batch_0"))
            gate(batch, 0)  # at-least-once replay
            second = sorted(
                r["doc_id"] for r in spark.read.parquet(out).collect()
            )
            assert first == second == [11, 12]
            # marker prevented a double append
            assert spark.table(fidx.bands_table).count() == n_band_rows

    def test_inprogress_crash_retry_scrubs_then_reappends(
        self, spark, tmp_path
    ):
        """The append-then-crash window (r8 review finding): the
        append landed (here forged as a TORN DOUBLE append — the
        worst state a crashed retry sequence can leave) but the
        final marker was never promoted. The retry must retract the
        batch's ids and re-append — leaving the index bit-identical
        to the clean run, and the survivors sink rewritten. This is
        only non-vacuous with the replay-stable exact disposition
        (r9 review finding: without the self-match rule the retry
        sees an empty kept set and blesses the torn state)."""
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            append_fuzzy_index,
            build_fuzzy_index,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.streaming.ingest import (
            fuzzy_dedup_gate,
        )

        out = str(tmp_path / "survivors")
        hist = spark.createDataFrame(FHISTORY, SCHEMA)
        batch = spark.createDataFrame(FFILE1, SCHEMA)
        with temp_exact_index(n_buckets=4) as eidx, temp_fuzzy_index(
            n_buckets=4
        ) as fidx:
            build_exact_index(hist, "text", "doc_id", eidx)
            build_fuzzy_index(hist, "text", "doc_id", fidx)
            gate = fuzzy_dedup_gate("text", "doc_id", eidx, fidx, out)
            gate(batch, 0)
            n_band_rows = spark.table(fidx.bands_table).count()
            n_post_rows = spark.table(fidx.postings_table).count()
            first = sorted(
                r["doc_id"] for r in spark.read.parquet(out).collect()
            )
            # forge the crash: a SECOND append landed (torn retry),
            # marker never promoted, survivors partition lost
            kept_rows = spark.createDataFrame(
                [r for r in FFILE1 if r[0] in (11, 12)], SCHEMA
            )
            append_fuzzy_index(kept_rows, "text", "doc_id", fidx)
            assert spark.table(fidx.bands_table).count() > n_band_rows
            marker = os.path.join(fidx.location, "_batch_0")
            os.rmdir(marker)
            os.makedirs(marker + ".__inprogress")
            import shutil

            shutil.rmtree(os.path.join(out, "batch_id=0"))
            gate(batch, 0)
            second = sorted(
                r["doc_id"] for r in spark.read.parquet(out).collect()
            )
            # survivors REWRITTEN (not an empty no-op overwrite)
            assert first == second == [11, 12]
            # the torn double-append was scrubbed before re-append
            assert spark.table(fidx.bands_table).count() == n_band_rows
            assert spark.table(fidx.postings_table).count() == n_post_rows
            assert os.path.isdir(marker)
            assert not os.path.exists(marker + ".__inprogress")

    def test_replay_reproduces_within_batch_near_dup_disposition(
        self, spark, tmp_path
    ):
        """Two near-dups inside ONE micro-batch both pass (the
        cross-pairs-only contract). A replay whose marker exists
        recomputes disposition against an index that now CONTAINS
        the batch — the train-id-in-batch exclusion must keep the
        original verdict instead of dropping both docs against
        their own indexed copies."""
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.streaming.ingest import (
            fuzzy_dedup_gate,
        )

        out = str(tmp_path / "survivors")
        hist = spark.createDataFrame(FHISTORY, SCHEMA)
        batch = spark.createDataFrame(
            [
                (30, "pine oak elm birch maple ash"),
                (31, "pine oak elm birch maple ash cedar"),
            ],
            SCHEMA,
        )
        with temp_exact_index(n_buckets=4) as eidx, temp_fuzzy_index(
            n_buckets=4
        ) as fidx:
            build_exact_index(hist, "text", "doc_id", eidx)
            build_fuzzy_index(hist, "text", "doc_id", fidx)
            gate = fuzzy_dedup_gate("text", "doc_id", eidx, fidx, out)
            gate(batch, 0)
            first = sorted(
                r["doc_id"] for r in spark.read.parquet(out).collect()
            )
            assert first == [30, 31]
            gate(batch, 0)  # replay with the marker present
            second = sorted(
                r["doc_id"] for r in spark.read.parquet(out).collect()
            )
            assert second == [30, 31]

    def test_gate_requires_durable_marker_root(self, spark, tmp_path):
        import dataclasses

        import pytest

        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.streaming.ingest import (
            fuzzy_dedup_gate,
        )

        with temp_exact_index(n_buckets=4) as eidx, temp_fuzzy_index(
            n_buckets=4
        ) as fidx:
            bare = dataclasses.replace(fidx, location=None)
            with pytest.raises(ValueError, match="marker root"):
                fuzzy_dedup_gate(
                    "text", "doc_id", eidx, bare, str(tmp_path / "s")
                )
            # an explicit marker_root satisfies the contract
            fuzzy_dedup_gate(
                "text", "doc_id", eidx, bare, str(tmp_path / "s"),
                marker_root=str(tmp_path / "markers"),
            )


class TestStreamDenylistGate:
    """Denylist composed into the streaming funnel (r8): blocked
    content is refused at EVERY micro-batch before the dedup gates —
    it never lands in survivors and never enters the index (a
    blocked doc must not become a survivor other docs dedup
    against)."""

    def test_blocked_content_never_survives_or_indexes(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_spark.operators.retraction import (
            add_to_denylist,
            temp_denylist,
        )

        src = str(tmp_path / "incoming")
        out = str(tmp_path / "survivors")
        ckpt = str(tmp_path / "ckpt")
        blocked_text = "forbidden content here"
        _write_file(spark, [(10, blocked_text), (11, "fine one")], src)
        time.sleep(1.1)
        # batch 2 re-submits the blocked text under a new id
        _write_file(spark, [(20, blocked_text), (21, "fine two")], src)
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        with temp_exact_index(n_buckets=4) as idx, temp_denylist() as dl:
            add_to_denylist(
                spark.createDataFrame([(0, blocked_text)], SCHEMA), "text", dl
            )
            build_exact_index(
                spark.createDataFrame(HISTORY, SCHEMA), "text", "doc_id", idx
            )
            q = stream_corpus_ingest(
                stream, "text", "doc_id", idx, out, ckpt, denylist=dl
            )
            q.awaitTermination(120)
            kept = {
                r.doc_id for r in spark.read.parquet(out).collect()
            }
            assert kept == {11, 21}
            # the blocked fingerprint never entered the exact index
            from openaq_data_pipeline_spark.operators.text import fingerprint

            fp_rows = (
                spark.table(idx.hashes_table)
                .where(
                    F.col("fingerprint")
                    == spark.createDataFrame([(0, blocked_text)], SCHEMA)
                    .select(fingerprint(F.col("text")).alias("f"))
                    .collect()[0]["f"]
                )
                .count()
            )
            assert fp_rows == 0


class TestStreamCrawlIntake:
    """The r9 crawl front door as a stream (crawl_intake_gate): per
    micro-batch URL-ledger dedup, robots verdicts, density
    extraction, Gopher gate and content dedup — cross-micro-batch
    state carried by the two persisted exact indexes."""

    ART = (
        "<p>the quick brown fox jumps over the lazy dog and then "
        "the calm river flows through the old valley and the town "
        "while the people of the village act with reason and care "
        "in a spirit of brotherhood for all of the free world and "
        "every autumn the water slows while the village measures "
        "the change with the same brass gauge it has used for "
        "eighty years of quiet work</p>"
    )

    def _page(self, body):
        return (
            "<html><body>"
            '<nav><a href="/">Home</a> <a href="/n">News</a> '
            '<a href="/a">About</a></nav>'
            "<article>" + body + "</article>"
            '<footer><a href="/p">Privacy</a> <a href="/t">Terms</a>'
            "</footer></body></html>"
        )

    def test_cross_batch_gates(self, spark, tmp_path):
        from openaq_data_pipeline_spark.operators.frontier import (
            parse_robots,
        )
        from openaq_data_pipeline_spark.streaming.ingest import (
            stream_crawl_intake,
        )

        schema = "page_id long, url string, html string"
        src = str(tmp_path / "incoming")
        out = str(tmp_path / "survivors")
        ckpt = str(tmp_path / "ckpt")
        art2 = self.ART.replace("quick", "swift")
        b1 = [
            (1, "https://A.org/x?utm_source=tw", self._page(self.ART)),
            (2, "https://a.org/private/y", self._page(art2)),  # robots
            (3, "https://a.org/tiny", self._page("<p>tiny</p>")),
        ]
        # batch 2: URL respelling of 1 (ledger drop), fresh page
        # (kept), exact content copy of 1 under a new URL (content
        # index drop — only the CROSS-BATCH indexes can catch 4 and 6)
        b2 = [
            (4, "https://a.org:443/x", self._page(self.ART)),
            (5, "https://b.org/fresh", self._page(art2)),
            (6, "https://c.org/copy", self._page(self.ART)),
        ]
        spark.createDataFrame(b1, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        import time as _t

        _t.sleep(1.1)
        spark.createDataFrame(b2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        rules = parse_robots(
            spark.createDataFrame(
                [("a.org", "User-agent: *\nDisallow: /priv*/")],
                "host string, content string",
            ),
            "host",
            "content",
        ).localCheckpoint(eager=True)
        with temp_exact_index(n_buckets=4) as ledger, temp_exact_index(
            n_buckets=4
        ) as hist:
            q = stream_crawl_intake(
                stream, "url", "html", "page_id", ledger, hist, out,
                ckpt, robots_rules=rules,
            )
            q.awaitTermination(180)
            rows = spark.read.parquet(out).collect()
        got = {r.page_id: (r.batch_id, r.text) for r in rows}
        assert set(got) == {1, 5}
        assert got[1][0] == 0 and got[5][0] == 1
        # density extraction ran: boilerplate gone, article kept
        for _, text in got.values():
            assert "Home" not in text and "Privacy" not in text
            assert "calm river flows" in text


class TestReplayStableDisposition:
    """r9 review finding: after the first attempt's eager index
    append, a replayed micro-batch matches its own fingerprints
    (dup_of == own id). Every gate must treat that self-match as
    KEPT — otherwise a retry drops the whole batch and the survivors
    sink silently loses it."""

    def test_dedup_gate_retry_rewrites_lost_survivors(
        self, spark, tmp_path
    ):
        import shutil

        from openaq_data_pipeline_spark.streaming.ingest import dedup_gate

        out = str(tmp_path / "survivors")
        with temp_exact_index(n_buckets=4) as idx:
            build_exact_index(
                spark.createDataFrame(HISTORY, SCHEMA), "text", "doc_id", idx
            )
            gate = dedup_gate("text", "doc_id", idx, out)
            batch = spark.createDataFrame(FILE1, SCHEMA)
            gate(batch, 0)
            first = sorted(
                r.doc_id for r in spark.read.parquet(out).collect()
            )
            assert first == [11, 12]
            # crash-during-write: the partition is lost, the index
            # append already landed; the retry must REWRITE it
            shutil.rmtree(os.path.join(out, "batch_id=0"))
            gate(batch, 0)
            second = sorted(
                r.doc_id for r in spark.read.parquet(out).collect()
            )
            assert second == [11, 12]

    def test_url_ledger_replay_is_self_kept(self, spark):
        from openaq_data_pipeline_spark.operators.frontier import (
            url_ledger_gate,
        )

        b = spark.createDataFrame(
            [(1, "https://a.org/x"), (2, "https://a.org/y")],
            "doc_id long, url string",
        )
        with temp_exact_index(n_buckets=4) as idx:
            first = {
                r.doc_id: (r.kept, r.dup_of)
                for r in url_ledger_gate(b, "url", "doc_id", idx).collect()
            }
            assert first == {1: (True, None), 2: (True, None)}
            # the identical rows replayed: self-matches stay kept
            replay = {
                r.doc_id: (r.kept, r.dup_of)
                for r in url_ledger_gate(b, "url", "doc_id", idx).collect()
            }
            assert replay == first
            # a genuinely NEW id refetching the same URL still drops
            refetch = spark.createDataFrame(
                [(9, "https://a.org/x")], "doc_id long, url string"
            )
            got = url_ledger_gate(refetch, "url", "doc_id", idx).collect()[0]
            assert got.kept is False and got.dup_of == 1

    def test_crawl_intake_retry_rewrites_lost_survivors(
        self, spark, tmp_path
    ):
        import shutil

        from openaq_data_pipeline_spark.streaming.ingest import (
            crawl_intake_gate,
        )

        art = (
            "the quick brown fox jumps over the lazy dog and then "
            "the calm river flows through the old valley and the town "
            "while the people of the village act with reason and care "
            "in a spirit of brotherhood for all of the free world and "
            "every autumn the water slows while the village measures "
            "the change with the same brass gauge it has used for "
            "eighty years of quiet work"
        )
        out = str(tmp_path / "survivors")
        batch = spark.createDataFrame(
            [(1, "https://a.org/x", f"<article><p>{art}</p></article>")],
            "page_id long, url string, html string",
        )
        with temp_exact_index(n_buckets=4) as ledger, temp_exact_index(
            n_buckets=4
        ) as hist:
            gate = crawl_intake_gate(
                "url", "html", "page_id", ledger, hist, out
            )
            gate(batch, 0)
            assert [
                r.page_id for r in spark.read.parquet(out).collect()
            ] == [1]
            shutil.rmtree(os.path.join(out, "batch_id=0"))
            gate(batch, 0)  # retry after both indexes already appended
            assert [
                r.page_id for r in spark.read.parquet(out).collect()
            ] == [1]

    def test_first_attempt_still_drops_redelivered_old_ids(
        self, spark, tmp_path
    ):
        """The marker gating (r9 review finding #2): a source that
        re-delivers an id kept in an EARLIER batch must still drop it
        — the self-match rule applies only to retries of the same
        batch_id, detected by the per-batch attempt marker."""
        from openaq_data_pipeline_spark.streaming.ingest import dedup_gate

        out = str(tmp_path / "survivors")
        with temp_exact_index(n_buckets=4) as idx:
            build_exact_index(
                spark.createDataFrame(HISTORY, SCHEMA), "text", "doc_id", idx
            )
            gate = dedup_gate("text", "doc_id", idx, out)
            gate(spark.createDataFrame(FILE1, SCHEMA), 0)
            # batch 7 re-delivers doc 11 verbatim (same id, same text)
            gate(
                spark.createDataFrame(
                    [(11, "eta theta iota"), (30, "brand new words")],
                    SCHEMA,
                ),
                7,
            )
            rows = spark.read.parquet(out).collect()
            by_batch = {(r.doc_id, r.batch_id) for r in rows}
            assert (30, 7) in by_batch
            # doc 11 exists ONLY under its original batch partition
            assert (11, 0) in by_batch and (11, 7) not in by_batch


class TestRowScopedReplayRule:
    """ADVICE r9: the attempt-scoped self-match rule kept EVERY
    self-match on a retry — including a row whose id was re-delivered
    from an earlier batch, which must drop on the retry exactly as it
    did on the first attempt. The durable kept-set makes the rule
    row-scoped."""

    def test_retried_batch_still_drops_redelivered_old_id(
        self, spark, tmp_path
    ):
        import shutil

        from openaq_data_pipeline_spark.streaming.ingest import dedup_gate

        out = str(tmp_path / "survivors")
        with temp_exact_index(n_buckets=4) as idx:
            build_exact_index(
                spark.createDataFrame(HISTORY, SCHEMA), "text", "doc_id", idx
            )
            gate = dedup_gate("text", "doc_id", idx, out)
            gate(spark.createDataFrame(FILE1, SCHEMA), 0)
            # batch 7 re-delivers doc 11 verbatim alongside a new doc
            batch7 = spark.createDataFrame(
                [(11, "eta theta iota"), (30, "brand new words")], SCHEMA
            )
            gate(batch7, 7)
            # crash-after-append: the sink partition is lost, batch 7
            # retries. Doc 11 self-matches (its fingerprint maps to
            # its own id, indexed in batch 0) — the retry must STILL
            # drop it, keeping only batch 7's recorded kept set {30}
            shutil.rmtree(os.path.join(out, "batch_id=7"))
            gate(batch7, 7)
            by_batch = {
                (r.doc_id, r.batch_id)
                for r in spark.read.parquet(out).collect()
            }
            assert (30, 7) in by_batch
            assert (11, 0) in by_batch and (11, 7) not in by_batch

    def test_crash_scrub_path_is_collect_free(self):
        """VERDICT r9 #3: the fuzzy crash-window scrub fed a driver-
        collected id list into the literal retraction path. Pin that
        the gate body no longer collects anything to the driver.

        Structural pin (VERDICT r12 wrong #1): an AST walk of the two
        functions, not a source-substring match — a docstring that
        mentions collect(), or the whitelisted ONE-ROW drift-summary
        read (`_maybe_rebuild_embedding_index`, VERDICT r12 wrong #3:
        adjudicated fine, same class as the A4 watermark read) moving
        into the pinned region, must not fire it; a data-sized
        `.collect()` reappearing in the scrub path still must."""
        import ast
        import inspect
        import textwrap

        from openaq_data_pipeline_spark.streaming import ingest

        # functions allowed to hold a driver-side read: each is a
        # one-row/bounded summary, individually adjudicated
        ALLOWED_SCOPES = {"_maybe_rebuild_embedding_index"}

        def collect_sites(fn):
            tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
            sites, calls = [], []

            def walk(node, scopes):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    scopes = scopes + [node.name]
                if isinstance(node, ast.Call):
                    f = node.func
                    if isinstance(f, ast.Attribute):
                        if f.attr == "collect" and not (
                            set(scopes) & ALLOWED_SCOPES
                        ):
                            sites.append(node.lineno)
                        calls.append(f.attr)
                    elif isinstance(f, ast.Name):
                        calls.append(f.id)
                for child in ast.iter_child_nodes(node):
                    walk(child, scopes)

            walk(tree, [])
            return sites, calls

        # the stage body moved into the shared _fuzzy_gate helper
        # (r11: the crawl intake reuses it) — pin both faces
        gate_sites, _ = collect_sites(ingest.fuzzy_dedup_gate)
        stage_sites, stage_calls = collect_sites(ingest._fuzzy_gate)
        assert gate_sites == [] and stage_sites == [], (
            "driver-side .collect() in the scrub path at lines "
            f"{gate_sites + stage_sites}"
        )
        # the scrub must still route through the set-based retraction
        assert "retract_documents_df" in stage_calls

        # self-check: the walker would catch a real regression — a
        # bare df.collect() parses to exactly one flagged site
        tree_sites = []
        probe = "def f(df):\n    ids = [r.id for r in df.collect()]\n"
        t = ast.parse(probe)
        for n in ast.walk(t):
            if (
                isinstance(n, ast.Call)
                and isinstance(n.func, ast.Attribute)
                and n.func.attr == "collect"
            ):
                tree_sites.append(n.lineno)
        assert tree_sites == [2]


class TestStreamEmbeddingGate:
    """Third, semantic gate of the fuzzy ingestion stream (r11,
    VERDICT r10 next #6): embedding near-dups are caught ONLINE
    through the persisted IVF index — cross-micro-batch copies that
    neither the exact hash nor the MinHash text gate can see — with
    the kept-set/marker replay machinery reused verbatim."""

    SCHEMA_E = "doc_id long, text string, embedding array<float>"
    E_HIST = [
        (0, "alpha beta gamma", [1.0, 0.0, 0.0, 0.0]),
        (1, "delta epsilon zeta", [0.0, 1.0, 0.0, 0.0]),
    ]
    # file 1: 11 is fresh on every tier; 12 has FRESH TEXT but its
    # embedding near-dups history doc 0 (only the semantic gate
    # catches it)
    E_FILE1 = [
        (11, "eta theta iota", [0.0, 0.0, 1.0, 0.0]),
        (12, "kappa lambda mu", [0.995, 0.05, 0.0, 0.0]),
    ]
    # file 2: 21 near-dups SURVIVOR 11's embedding — catchable only
    # through the index appended by micro-batch 0; 22 is fresh
    E_FILE2 = [
        (21, "nu xi omicron", [0.0, 0.0, 0.99, 0.05]),
        (22, "pi rho sigma", [0.0, 0.0, 0.0, 1.0]),
    ]

    def _indexes(self, spark):
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.operators.similarity import (
            build_ivf_index,
            temp_ivf_index,
        )

        hist = spark.createDataFrame(self.E_HIST, self.SCHEMA_E)
        eidx = temp_exact_index(n_buckets=4)
        fidx = temp_fuzzy_index(n_buckets=4)
        vidx = temp_ivf_index(nprobe=4, n_buckets=4)
        build_exact_index(hist, "text", "doc_id", eidx)
        build_fuzzy_index(hist, "text", "doc_id", fidx)
        build_ivf_index(
            hist, vidx, n_cells=2, train_iters=1,
            id_col="doc_id", vec_col="embedding",
        )
        return eidx, fidx, vidx

    def test_cross_micro_batch_semantic_copy_caught(self, spark, tmp_path):
        from openaq_data_pipeline_spark.streaming.ingest import (
            stream_corpus_ingest_fuzzy,
        )

        src = str(tmp_path / "incoming")
        out = str(tmp_path / "survivors")

        def _w(rows):
            spark.createDataFrame(rows, self.SCHEMA_E).coalesce(
                1
            ).write.mode("append").parquet(src)

        _w(self.E_FILE1)
        time.sleep(1.1)
        _w(self.E_FILE2)
        stream = (
            spark.readStream.schema(self.SCHEMA_E)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        eidx, fidx, vidx = self._indexes(spark)
        with eidx, fidx, vidx:
            q = stream_corpus_ingest_fuzzy(
                stream, "text", "doc_id", eidx, fidx, out,
                str(tmp_path / "ckpt"),
                embedding_index=vidx, vec_col="embedding",
            )
            q.awaitTermination(120)
            survivors = {
                r.doc_id: r.batch_id
                for r in spark.read.parquet(out).collect()
            }
            # 12 near-dups history semantically; 21 near-dups
            # SURVIVOR 11 — only the persisted index carries that
            assert survivors == {11: 0, 22: 1}
            # only kept docs entered the embedding index
            indexed = {
                r.neighbor_id
                for r in spark.table(vidx.cells_table).collect()
            }
            assert indexed == {0, 1, 11, 22}

    def test_within_batch_pair_passes_and_replay_is_marker_guarded(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_spark.streaming.ingest import (
            fuzzy_dedup_gate,
        )

        out = str(tmp_path / "survivors")
        batch = spark.createDataFrame(
            [
                (31, "tau upsilon phi", [0.0, 0.0, 1.0, 0.0]),
                (32, "chi psi omega", [0.0, 0.1, 0.99, 0.0]),
            ],
            self.SCHEMA_E,
        )
        eidx, fidx, vidx = self._indexes(spark)
        with eidx, fidx, vidx:
            gate = fuzzy_dedup_gate(
                "text", "doc_id", eidx, fidx, out,
                embedding_index=vidx, vec_col="embedding",
            )
            gate(batch, 0)
            first = sorted(
                r.doc_id for r in spark.read.parquet(out).collect()
            )
            # the cross-pairs-only contract: within-batch semantic
            # near-dups BOTH pass
            assert first == [31, 32]
            n_cells_rows = spark.table(vidx.cells_table).count()
            assert os.path.isdir(
                os.path.join(fidx.location, "_emb_batch_0")
            )
            gate(batch, 0)  # at-least-once replay, marker present
            second = sorted(
                r.doc_id for r in spark.read.parquet(out).collect()
            )
            # replay reproduces disposition (the neighbor-in-batch
            # rule keeps the batch from dropping against its own
            # first-attempt appends) and the marker prevents a
            # double cell append
            assert second == [31, 32]
            assert spark.table(vidx.cells_table).count() == n_cells_rows

    def test_inprogress_crash_retry_scrubs_then_reappends(
        self, spark, tmp_path
    ):
        import shutil

        from openaq_data_pipeline_spark.operators.similarity import (
            append_ivf_index,
        )
        from openaq_data_pipeline_spark.streaming.ingest import (
            fuzzy_dedup_gate,
        )

        out = str(tmp_path / "survivors")
        batch = spark.createDataFrame(self.E_FILE1, self.SCHEMA_E)
        eidx, fidx, vidx = self._indexes(spark)
        with eidx, fidx, vidx:
            gate = fuzzy_dedup_gate(
                "text", "doc_id", eidx, fidx, out,
                embedding_index=vidx, vec_col="embedding",
            )
            gate(batch, 0)
            clean = spark.table(vidx.cells_table).count()
            # forge the crash: a torn DOUBLE append landed, the final
            # marker never promoted, the survivors partition lost
            append_ivf_index(
                batch.filter("doc_id = 11"), vidx,
                id_col="doc_id", vec_col="embedding",
            )
            assert spark.table(vidx.cells_table).count() > clean
            marker = os.path.join(fidx.location, "_emb_batch_0")
            os.rmdir(marker)
            os.makedirs(marker + ".__inprogress")
            shutil.rmtree(os.path.join(out, "batch_id=0"))
            gate(batch, 0)
            # survivors rewritten, torn append scrubbed, marker
            # promoted
            assert sorted(
                r.doc_id for r in spark.read.parquet(out).collect()
            ) == [11]
            assert spark.table(vidx.cells_table).count() == clean
            assert os.path.isdir(marker)
            assert not os.path.exists(marker + ".__inprogress")

    def test_bootstrap_trains_on_first_batch_then_freezes(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.operators.similarity import (
            temp_ivf_index,
        )
        from openaq_data_pipeline_spark.streaming.ingest import (
            fuzzy_dedup_gate,
        )

        out = str(tmp_path / "survivors")
        b0 = spark.createDataFrame(self.E_FILE1, self.SCHEMA_E)
        # 41 semantically copies 11 (fresh text): must drop through
        # the index the BOOTSTRAPPED quantizer built
        b1 = spark.createDataFrame(
            [(41, "tau upsilon phi", [0.0, 0.0, 0.99, 0.05])],
            self.SCHEMA_E,
        )
        with temp_exact_index(n_buckets=4) as eidx, temp_fuzzy_index(
            n_buckets=4
        ) as fidx, temp_ivf_index(nprobe=4, n_buckets=4) as vidx:
            build_exact_index(
                b0.limit(0), "text", "doc_id", eidx
            )
            from openaq_data_pipeline_spark.operators.incremental_fuzzy import (  # noqa: E501
                build_fuzzy_index,
            )

            build_fuzzy_index(b0.limit(0), "text", "doc_id", fidx)
            gate = fuzzy_dedup_gate(
                "text", "doc_id", eidx, fidx, out,
                embedding_index=vidx, vec_col="embedding",
                bootstrap_cells=2,
            )
            assert not spark.catalog.tableExists(vidx.centroids_table)
            gate(b0, 0)
            assert spark.catalog.tableExists(vidx.centroids_table)
            n_cents = spark.table(vidx.centroids_table).count()
            gate(b1, 1)
            kept = {
                r.doc_id for r in spark.read.parquet(out).collect()
            }
            assert kept == {11, 12}  # batch 1's copy dropped
            # the quantizer froze at bootstrap (append-stable)
            assert spark.table(vidx.centroids_table).count() == n_cents


class TestStreamDriftRebuild:
    """DriftRebuildPolicy closes the drift loop (r12, VERDICT r11
    next #7): the embedding gate reads the drift summary after each
    append and rebuilds the quantizer BETWEEN micro-batches when a
    threshold crosses — a drifting feed recovers near-dup recall
    without manual intervention, and the rebuild is marker-guarded
    like every other index mutation of the gate.

    Geometry: batch 0 bootstraps a 2-cell quantizer on cluster A
    (e0/e1 mass, ids 0..19 with the two lowest ids seeding one cell
    each). Batch 1 drifts: b0=[1,0,10,0] (id 2) and b1=[0,1,0,10]
    (id 3) are ⟂ the A cells, and their tiny e0/e1 components pin
    their STALE assignment to cell0/cell1 respectively. Batch 2
    carries fresh-text semantic copies with the eps SWAPPED
    (c0=[0,1,10,0] ≈ b0 at cos 100/101, c1=[1,0,0,10] ≈ b1) — under
    the stale quantizer each copy probes the OTHER cell (nprobe=1)
    and misses its partner, so without a rebuild both SURVIVE. The
    policy fires after batch 1 (drift mass lifts the worst per-cell
    mean residual ~25× over the in-distribution bootstrap), grows
    the quantizer to 4 cells (target_fill), and deterministic Lloyd
    (lowest-id seeds = A-e0, A-e1, b0, b1) gives each cluster its
    own cell — batch 2's copies then probe straight into their
    partners' cells and drop."""

    SCHEMA_E = "doc_id long, text string, embedding array<float>"

    def _batches(self, spark):
        a_rows = []
        for i in range(10):
            a_rows.append(
                (2 * i if i < 1 else 8 + 2 * i,
                 f"alpha tokens {i}", [10.0, float(i % 3), 0.0, 0.0])
            )
            a_rows.append(
                (1 if i < 1 else 9 + 2 * i,
                 f"beta tokens {i}", [float(i % 3), 10.0, 0.0, 0.0])
            )
        b_rows = [
            (2, "gamma drift text", [1.0, 0.0, 10.0, 0.0]),
            (3, "delta drift text", [0.0, 1.0, 0.0, 10.0]),
        ]
        c_rows = [
            (202, "epsilon copy text", [0.0, 1.0, 10.0, 0.0]),
            (203, "zeta copy text", [1.0, 0.0, 0.0, 10.0]),
        ]
        return (
            spark.createDataFrame(a_rows, self.SCHEMA_E),
            spark.createDataFrame(b_rows, self.SCHEMA_E),
            spark.createDataFrame(c_rows, self.SCHEMA_E),
        )

    def _gate(self, spark, tmp_path, tag, policy):
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            build_exact_index,
            temp_exact_index,
        )
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.operators.similarity import (
            temp_ivf_index,
        )
        from openaq_data_pipeline_spark.streaming.ingest import (
            fuzzy_dedup_gate,
        )

        out = str(tmp_path / f"survivors_{tag}")
        eidx = temp_exact_index(n_buckets=4)
        fidx = temp_fuzzy_index(n_buckets=4)
        vidx = temp_ivf_index(nprobe=1, n_buckets=4)
        empty = spark.createDataFrame([], self.SCHEMA_E)
        build_exact_index(empty, "text", "doc_id", eidx)
        build_fuzzy_index(empty, "text", "doc_id", fidx)
        gate = fuzzy_dedup_gate(
            "text", "doc_id", eidx, fidx, out,
            embedding_index=vidx, vec_col="embedding",
            bootstrap_cells=2, drift_policy=policy,
        )
        return gate, out, eidx, fidx, vidx

    def test_drifting_feed_triggers_rebuild_and_recall_recovers(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_spark.streaming.ingest import (
            DriftRebuildPolicy,
        )

        a, b, c = self._batches(spark)
        policy = DriftRebuildPolicy(
            max_cell_residual=0.05, min_vecs=16, target_fill=6
        )
        gate, out, eidx, fidx, vidx = self._gate(
            spark, tmp_path, "drift", policy
        )
        with eidx, fidx, vidx:
            gate(a, 0)
            # in-distribution bootstrap: no rebuild fired
            assert not os.path.exists(
                os.path.join(fidx.location, "_emb_rebuild_0")
            )
            n_cents0 = spark.table(vidx.centroids_table).count()
            assert n_cents0 == 2
            gate(b, 1)
            # drift crossed the threshold: rebuild ran, marker
            # promoted, quantizer grew to target_fill's cell count
            marker = os.path.join(fidx.location, "_emb_rebuild_1")
            assert os.path.isdir(marker)
            assert not os.path.exists(marker + ".__inprogress")
            assert spark.table(vidx.centroids_table).count() == 4
            gate(c, 2)
            kept = {
                r.doc_id for r in spark.read.parquet(out).collect()
            }
            # recall recovered: both semantic copies dropped through
            # the rebuilt quantizer
            assert 202 not in kept and 203 not in kept

    def test_without_policy_stale_quantizer_misses_the_copies(
        self, spark, tmp_path
    ):
        """Control: same feed, no policy — the eps-swapped copies
        probe the WRONG stale cell at nprobe=1 and both survive,
        which is exactly the recall decay the policy exists to
        repair."""
        a, b, c = self._batches(spark)
        gate, out, eidx, fidx, vidx = self._gate(
            spark, tmp_path, "stale", None
        )
        with eidx, fidx, vidx:
            gate(a, 0)
            gate(b, 1)
            assert not os.path.exists(
                os.path.join(fidx.location, "_emb_rebuild_1")
            )
            assert spark.table(vidx.centroids_table).count() == 2
            gate(c, 2)
            kept = {
                r.doc_id for r in spark.read.parquet(out).collect()
            }
            assert {202, 203} <= kept

    def test_crashed_rebuild_reruns_on_replay(self, spark, tmp_path):
        """A rebuild that died mid-swap leaves its in-progress
        marker; the replayed batch re-runs the rebuild even though
        the appends all skip via their own markers — deterministic
        Lloyd makes the re-run THE recovery."""
        import shutil

        from openaq_data_pipeline_spark.streaming.ingest import (
            DriftRebuildPolicy,
        )

        a, b, c = self._batches(spark)
        policy = DriftRebuildPolicy(
            max_cell_residual=0.05, min_vecs=16, target_fill=6
        )
        gate, out, eidx, fidx, vidx = self._gate(
            spark, tmp_path, "crash", policy
        )
        with eidx, fidx, vidx:
            gate(a, 0)
            gate(b, 1)
            marker = os.path.join(fidx.location, "_emb_rebuild_1")
            # forge the crash window: demote the completed rebuild
            # to in-progress and lose the survivors partition
            os.rmdir(marker)
            os.makedirs(marker + ".__inprogress")
            shutil.rmtree(os.path.join(out, "batch_id=1"))
            gate(b, 1)
            assert os.path.isdir(marker)
            assert not os.path.exists(marker + ".__inprogress")
            assert spark.table(vidx.centroids_table).count() == 4
            gate(c, 2)
            kept = {
                r.doc_id for r in spark.read.parquet(out).collect()
            }
            assert 202 not in kept and 203 not in kept


class TestCrawlIntakeFuzzyStage:
    """The crawl front door's optional MinHash stage (r11): a
    template respin of a batch-0 survivor — different bytes, same
    shingles — drops cross-micro-batch through the persisted band
    index, inside the full intake composition."""

    def test_near_dup_page_drops_across_batches(self, spark, tmp_path):
        from openaq_data_pipeline_spark.operators.incremental_fuzzy import (
            build_fuzzy_index,
            temp_fuzzy_index,
        )
        from openaq_data_pipeline_spark.streaming.ingest import (
            stream_crawl_intake,
        )

        art = (
            "the quick brown fox jumps over the lazy dog and then "
            "the calm river flows through the old valley and the town "
            "while the people of the village act with reason and care "
            "in a spirit of brotherhood for all of the free world and "
            "every autumn the water slows while the village measures "
            "the change with the same brass gauge it has used for "
            "eighty years of quiet work"
        )
        art_respin = art + " and one closing remark"
        fresh = (
            "a different essay altogether about harbor cranes lifting "
            "steel boxes onto patient ships while gulls argue over "
            "the morning catch and the tide charts pinned inside the "
            "harbormaster office curl slowly in the salt air as the "
            "winter schedule brings fewer vessels and longer quiet "
            "hours for the crews who repaint hull numbers and mend "
            "the worn fenders along the pier"
        )

        def _page(body):
            return (
                "<html><body><article><p>" + body + "</p></article>"
                '<footer><a href="/p">Privacy</a> '
                '<a href="/t">Terms</a></footer></body></html>'
            )

        schema = "page_id long, url string, html string"
        src = str(tmp_path / "incoming")
        out = str(tmp_path / "survivors")
        b1 = [(1, "https://a.org/x", _page(art))]
        b2 = [
            (2, "https://b.org/copy", _page(art_respin)),  # respin
            (3, "https://c.org/new", _page(fresh)),
        ]
        spark.createDataFrame(b1, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        import time as _t

        _t.sleep(1.1)
        spark.createDataFrame(b2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        with temp_exact_index(n_buckets=4) as ledger, temp_exact_index(
            n_buckets=4
        ) as hist, temp_fuzzy_index(n_buckets=4) as fidx:
            build_fuzzy_index(
                spark.createDataFrame([], "page_id long, text string"),
                "text", "page_id", fidx,
            )
            q = stream_crawl_intake(
                stream, "url", "html", "page_id", ledger, hist, out,
                str(tmp_path / "ckpt"), fuzzy_index=fidx,
            )
            q.awaitTermination(180)
            got = {
                r.page_id: r.batch_id
                for r in spark.read.parquet(out).collect()
            }
            # 2's text near-dups survivor 1 (different bytes — the
            # exact gate passes it; only the persisted MinHash index
            # catches the respin)
            assert got == {1: 0, 3: 1}
            indexed = {
                r["page_id"]
                for r in spark.table(fidx.sizes_table).collect()
            }
            assert indexed == {1, 3}
            # ADVICE r11: crawl-intake markers are NAMESPACED so a
            # fuzzy index shared with an ingest-funnel gate (which
            # owns the `_batch_<n>` names) never collides — a
            # collision makes the second stream silently skip its
            # index append
            import os

            assert os.path.isdir(
                os.path.join(fidx.location, "_crawl_batch_0")
            )
            assert not os.path.exists(
                os.path.join(fidx.location, "_batch_0")
            )
