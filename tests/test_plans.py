"""Physical-plan regression gates: the scale properties SURVEY §4
promises (pushdown, pruning, broadcast, partial aggregation, codegen)
must actually appear in the executed plans — a correct answer computed
with a bad plan is a regression at 100 TB even when 60k rows pass.

These assert on the final AQE plan string after one execution, the
same artifact `.explain("formatted")` shows.
"""

from __future__ import annotations

import re

import pytest

from openaq_data_pipeline_spark.catalog import registry, rotated_registry

SF_DIR = "/root/testdata/sf0.001"

# plan gates cover rotated queries too: rotation drops the driver
# oracle slot, never the physical-plan contract
REG = {q.name: q for q in [*registry(), *rotated_registry()]}


def final_plan(df) -> str:
    df.count()  # resolve AQE to the final plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    """pricing_summary's shipdate range predicate is parquet-pushable
    and must appear in PushedFilters (row-group/page pruning at 100 TB);
    int_valid_events' CASE predicate is not pushable to parquet but
    must still evaluate AT the scan (DataFilters), not in a later
    stage after materialization."""
    plan = final_plan(REG["pricing_summary"].build(spark, SF_DIR))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), f"no pushed filters:\n{plan[:2000]}"

    plan = final_plan(REG["int_valid_events"].build(spark, SF_DIR))
    m = re.search(r"DataFilters: \[([^\]]*)", plan)
    assert m and "CASE WHEN" in m.group(1), "validity CASE not at scan"


def test_column_pruning_narrow_read_schema(spark):
    """surrogate_keys projects a few columns — the parquet ReadSchema
    must not contain the wide remainder (e.g. lineitem comment)."""
    plan = final_plan(REG["surrogate_keys"].build(spark, SF_DIR))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas
    assert all("comment" not in s for s in schemas), schemas


def test_dimension_joins_broadcast(spark):
    """snapshot_left_join and revenue_by_order join small dimensions:
    both must resolve to BroadcastHashJoin, never SortMergeJoin."""
    for name in ["snapshot_left_join", "revenue_by_order"]:
        plan = final_plan(REG[name].build(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast"
        assert "SortMergeJoin" not in plan, f"{name} fell back to SMJ"


def test_anti_join_stays_broadcast(spark):
    """RI tests are anti-joins against a parent dim — broadcastable."""
    plan = final_plan(REG["ri_violations"].build(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_hourly_pivot_has_partial_aggregation(spark):
    """A1/A2 pivot: hash aggregation must run map-side (partial) then
    final — one shuffle of pre-aggregated rows, not raw measurements."""
    plan = final_plan(REG["mart_hourly_activity"].build(spark, SF_DIR))
    assert len(re.findall(r"HashAggregate", plan)) >= 2
    assert "partial_" in plan  # map-side combine present


def test_pivot_is_single_pass(spark):
    """The 14-column conditional-AVG pivot must stay ONE aggregation
    over the fact scan — a .pivot()-style re-scan per parameter would
    show up as multiple parquet scans of the fact table."""
    plan = final_plan(REG["mart_hourly_activity"].build(spark, SF_DIR))
    fact_scans = len(re.findall(r"Scan parquet[^\n]*lineitem|Scan parquet[^\n]*events", plan))
    assert fact_scans <= 2, f"fact scanned {fact_scans}×"


def test_whole_stage_codegen_covers_hot_path(spark):
    """scan→filter→agg pipelines must run inside whole-stage codegen
    spans (the ``*(n)`` markers), not interpreted."""
    plan = final_plan(REG["int_valid_events"].build(spark, SF_DIR))
    assert re.search(r"\*\(\d+\)", plan) or "WholeStageCodegen" in plan


def test_topk_filters_before_full_sort(spark):
    """topk_orders_per_segment: rank-filter pattern must use a window
    + filter, not a global sort of everything (no global Sort without
    partitioning below the filter)."""
    plan = final_plan(REG["topk_orders_per_segment"].build(spark, SF_DIR))
    assert "RunningWindowFunction" in plan or "Window" in plan


@pytest.mark.parametrize("name", ["dedup_minhash_lsh", "dedup_ngram_jaccard"])
def test_dedup_pipelines_compute_shingles_once(spark, name):
    """The shingle token-explode pipeline must run exactly once per
    query — lambda-bearing plans never canonicalize equal, so a
    formulation that feeds it to several consumers without
    materializing would replicate it wholesale (measured 4× the
    Generates at sf0.1). The explode is identified by the shingle
    builder's `greatest(...)` sequence signature (jaccard's
    posting-list pair explosion is a different, legitimate Generate
    over aggregated id lists). Jaccard checkpoints the shingle table
    for its two consumers (sizes + posting lists) — the explode lives
    inside the shared RDD, zero in-plan copies; minhash's band table
    has exactly ONE consumer (the posting-list aggregate), so its
    pipeline appears exactly once inline with no materialization
    needed."""
    plan = final_plan(REG[name].build(spark, SF_DIR))
    n_shingle_builds = len(re.findall(r"greatest", plan))
    if name == "dedup_ngram_jaccard":
        rdd_scans = len(re.findall(r"Scan ExistingRDD", plan))
        assert rdd_scans >= 2, f"{name}: consumers not sharing the checkpoint"
        assert n_shingle_builds == 0, f"{name}: shingle explode re-planned per consumer"
    else:
        assert n_shingle_builds == 1, f"{name}: shingle pipeline replicated"


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Catalyst's runtime bloom filter is the scan-pruning story for
    selective dim joins too big to broadcast: the dim side aggregates
    a bloom_filter_agg and the FACT scan gains a might_contain
    semi-filter, discarding non-joining rows before the shuffle. The
    application-side threshold defaults to 10 GB of scan — it fires
    on its own at 100 TB; here it is lowered to prove the injection
    and that results are unchanged."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            "o_totalprice > 400000"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt, "bloom filter not injected"
        assert "might_contain" in opt, "fact side not bloom-filtered"
        with_bloom = j.count()
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        try:
            assert with_bloom == j.count(), "bloom filter changed results"
        finally:
            spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_embedding_cosine_default_is_bucketed(spark):
    """dedup_embedding_cosine's default path must be the LSH-bucketed
    tag → repartition(table, bucket) → per-bucket kernel topology
    (VERDICT r1 #1 / r2 performance): no cartesian/nested-loop
    all-pairs scan, no full-corpus driver collect (collect/toPandas
    patched to raise during build; the one permitted driver scalar is
    the count() that sizes (b, L) — watermark-class, not a row
    collect), no join operator at all, exactly one data shuffle on
    the bucket key plus the final tiny distinct."""
    from unittest import mock

    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    def boom(*a, **kw):
        raise AssertionError("driver collect in default cosine path")

    with mock.patch.object(ClassicDF, "collect", boom), mock.patch.object(
        ClassicDF, "toPandas", boom
    ):
        df = REG["dedup_embedding_cosine"].build(spark, SF_DIR)
    plan = final_plan(df)
    assert "CartesianProduct" not in plan, "all-pairs cross join in default path"
    assert "BroadcastNestedLoopJoin" not in plan, "nested-loop all-pairs"
    assert "Join" not in plan, "bucket kernel replaced joins entirely"
    assert plan.count("MapInPandas") == 2, "tag + bucket-kernel Arrow stages"
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges <= 2, f"unexpected shuffles: {n_exchanges}"


def test_repetition_signals_plan(spark):
    """text_repetition_signals: scan prunes to (doc_id, text); the
    n-gram histogram is exactly two exchanges ((id, gram) counts →
    per-id moments) with map-side partial aggregation — shuffled
    volume is distinct grams per doc, never corpus bytes."""
    plan = final_plan(REG["text_repetition_signals"].build(spark, SF_DIR))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(
        set(s.split(",")) <= {"doc_id:bigint", "text:string"} for s in schemas
    ), schemas
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan.count(
        "Exchange"
    )


def test_jaccard_index_is_single_exchange(spark):
    """r4 rewrite: the inverted index is ONE groupBy(shingle)
    aggregate and the per-doc size table is materialized once for its
    two side-lookups (both inside checkpoints), so the FINAL plan
    carries no df-count Window and exactly one hash exchange — the
    pair-count aggregate. The r3 shape added a distinct, a
    count-over-shingle window, and a per-side size recompute — three
    more full shuffles of exploded-shingle/corpus-sized tables."""
    plan = final_plan(REG["dedup_ngram_jaccard"].build(spark, SF_DIR))
    assert "Window" not in plan, "stop-shingle guard regressed to a window"
    n_hash_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash_exchanges == 1, f"expected 1 hash exchange, got {n_hash_exchanges}"


def test_containment_shares_posting_core(spark):
    """containment_pairs rides the same checkpointed posting-list
    index as jaccard (two RDD-scan consumers: sizes + pairs), with
    no window and no cartesian — only the ratio denominator differs."""
    plan = final_plan(REG["dedup_containment"].build(spark, SF_DIR))
    assert plan.count("Scan ExistingRDD") >= 2, "posting checkpoint not shared"
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_banded_plan(spark):
    """64-bit banded SimHash: candidates come from band posting lists
    (stack → one grouping exchange → map-side pair explosion), the
    integer bit_count(xor) Hamming verify filters BEFORE the
    distinct, and no join operator of any kind exists — the whole
    pair search is aggregates + explodes."""
    plan = final_plan(REG["dedup_simhash"].build(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan, "banded search must not re-join fingerprints"
    assert "bit_count" in plan, "Hamming verify missing from the plan"
    # verify runs map-side (a Filter containing bit_count), not after
    # the final distinct aggregate
    assert re.search(r"Filter .*bit_count", plan), "Hamming verify not a filter"


def test_connected_components_survives_non_numeric_conf(spark, monkeypatch):
    """ADVICE r3: a platform may pin spark.sql.shuffle.partitions to
    a non-numeric value at session build (the public conf API rejects
    it, so inject via monkeypatch). The operator must keep full width
    (never call conf.set) and still converge, not raise ValueError."""
    from openaq_data_pipeline_spark.operators.dedup import connected_components

    real_get = spark.conf.get
    set_calls = []
    monkeypatch.setattr(
        spark.conf,
        "get",
        lambda key, *a: "auto" if key == "spark.sql.shuffle.partitions" else real_get(key, *a),
    )
    monkeypatch.setattr(
        spark.conf, "set", lambda *a, **k: set_calls.append(a)
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {(r.node, r.component_id) for r in connected_components(pairs).collect()}
    assert out == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert not set_calls, "conf mutated despite unparseable session width"


def test_connected_components_scopes_width_to_cloned_session(spark, monkeypatch):
    """VERDICT r4 #3: CC's shuffle-width downsizing must be invisible
    to the caller's session — a query planning concurrently mid-CC
    observes its shuffle width unchanged. Mid-CC observation points:
    every DataFrame.count() CC issues (the edge count plus one per
    propagation round) snapshots the caller's conf; all must read the
    original value, while the clone CC actually runs on did narrow.
    ``local_contraction=False`` forces the merge loop — the default
    fast path solves a 3-edge graph in one task on the caller's own
    session and never tunes any width (covered by
    test_local_contraction_fast_path_stays_on_callers_session)."""
    from openaq_data_pipeline_spark.operators.dedup import connected_components

    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    seen = []
    # patch the CONCRETE DataFrame class (pyspark.sql.classic in 4.x
    # overrides the pyspark.sql.DataFrame ABC's methods)
    df_cls = type(spark.range(1))
    real_count = df_cls.count

    def spy(self):
        seen.append(spark.conf.get(key))
        return real_count(self)

    monkeypatch.setattr(df_cls, "count", spy)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = connected_components(pairs, local_contraction=False)
    out = {(r.node, r.component_id) for r in comp.collect()}
    assert out == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert len(seen) >= 2, "expected mid-CC conf observations"
    assert all(v == orig for v in seen), f"caller width mutated mid-CC: {seen}"
    assert spark.conf.get(key) == orig
    # the downsizing itself is real, just scoped to the clone
    assert comp.sparkSession is not spark
    assert comp.sparkSession.conf.get(key) == "1"
    # the handoff view was cleaned up
    leftovers = [
        t.name
        for t in spark.catalog.listTables("global_temp")
        if t.name.startswith("cc_pairs_")
    ]
    assert leftovers == []


def test_keep_one_survivors_plan(spark):
    """dedup_keep_one's survivor step must stay equi-join-shaped (no
    cartesian/nested-loop), with the non-representative drop as a
    LeftAnti join — component counts at corpus scale are far past
    broadcast range, so the shape, not the strategy, is pinned."""
    plan = final_plan(REG["dedup_keep_one"].build(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan, "non-representative drop is not an anti-join"


def test_curation_plan_shapes(spark):
    """Curation family scale properties: decontamination shares one
    checkpointed shingle table across its three consumers and never
    falls back to SortMergeJoin (eval set broadcasts); sampling and
    PII scanning are pure scan-side work — zero shuffles; all three
    prune to the columns they touch."""
    plan = final_plan(REG["decontamination"].build(spark, SF_DIR))
    assert plan.count("Scan ExistingRDD") >= 3, "shingle checkpoint not shared"
    # the train⋈eval overlap join must broadcast the collapsed eval
    # shingle set; the later per-doc totals⋈shared outer join is
    # doc-count-sized on BOTH sides, so a sort-merge there is the
    # correct scale plan (AQE demotes it to broadcast on small runs)
    assert re.search(r"BroadcastHashJoin \[shingle", plan), "eval-set broadcast lost"

    for name in ("stratified_sample", "pii_scan"):
        plan = final_plan(REG[name].build(spark, SF_DIR))
        assert "Exchange" not in plan, f"{name} acquired a shuffle"
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        assert schemas and all("n_chars" not in s for s in schemas), schemas


def test_mixture_sample_broadcasts_thresholds(spark):
    """domain_mixture_sample: the threshold table is a tiny per-stratum
    aggregate — it must reach the corpus via a broadcast hash join,
    never a sort-merge shuffle of the big side."""
    plan = final_plan(REG["domain_mixture_sample"].build(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quantize_embeddings_has_no_reassembly_shuffle(spark):
    """embedding_quantization: pass 2 must be a per-row transform fed
    by a broadcast single-row grid (BroadcastNestedLoopJoin), NOT a
    posexplode + groupBy(vec_id) reassembly — the corpus side may
    shuffle only inside the tiny per-dim stats aggregate."""
    plan = final_plan(REG["embedding_quantization"].build(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    # exactly one scan feeds the per-dim stats; the quantize pass scans
    # the table once more — never a third time
    assert len(re.findall(r"Scan parquet[^\n]*embeddings", plan)) <= 2


def test_boilerplate_heavy_lines_broadcast(spark):
    """boilerplate_line_removal: the heavy-line set (df >= min_df) is
    tiny by construction and must broadcast onto the exploded lines."""
    plan = final_plan(REG["boilerplate_line_removal"].build(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_vocab_topk_never_full_sorts(spark):
    """vocab_top_ngrams: global top-k must run as
    TakeOrderedAndProject (per-partition heaps), not a full Sort of
    the vocabulary."""
    plan = final_plan(REG["vocab_top_ngrams"].build(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_audio_features_is_arrow_batched(spark):
    """audio_decode_features: both synth and decode must run as Arrow
    mapInPandas stages (never row-at-a-time Python UDFs)."""
    plan = final_plan(REG["audio_decode_features"].build(spark, SF_DIR))
    assert len(re.findall(r"MapInPandas", plan)) >= 2
    assert "BatchEvalPython" not in plan


def test_bm25_prunes_postings_by_broadcast_query_terms(spark):
    """bm25 probe: query terms must reach the tf table as a BROADCAST
    hash join (posting scan prunes to query terms — never a shuffle
    of the corpus-sized tf table against the tiny query side), the
    fixed-point scoring stays JVM-side, and no corpus×corpus
    sort-merge join exists (dl rides through the tf groupBy). The
    1-row stats join is the only nested-loop (broadcast, bounded).
    Since r6 the registered query returns an eager checkpoint of the
    indexed probe (the temp index is dropped before return), so the
    pinned plan is the probe itself — built here against a live temp
    index, the exact DataFrame the query checkpoints."""
    from pyspark.sql import functions as F

    from openaq_data_pipeline_spark.catalog import fan_out, load
    from openaq_data_pipeline_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_bm25_index,
        temp_bm25_index,
    )
    from openaq_data_pipeline_spark.operators.text import normalize, tokens

    d = fan_out(load(spark, SF_DIR, "documents")["documents"])
    qdf = d.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(tokens(normalize(F.col("text"))), 1, 8)
        ).alias("q_text"),
    )
    with temp_bm25_index(n_buckets=4) as idx:
        build_bm25_index(d, "text", "doc_id", idx)
        plan = final_plan(
            bm25_topk_indexed(spark, qdf, idx, "doc_id", "q_text", k=5)
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_lm_score_joins_stay_keyed_and_jvm_side(spark):
    """lm_bigram_score: scoring is two keyed joins + one aggregate —
    no Python in the plan, no cartesian, and the count tables build
    as broadcast or shuffled-hash joins (vocab-bounded sides)."""
    plan = final_plan(REG["lm_bigram_score"].build(spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_training_shards_single_exchange_for_rank(spark):
    """training_shards: one exchange on shard_id feeding the rank
    window — the same physical shape the sharded writer needs, and
    nothing else (no join, no extra shuffle beyond the scan fan-out)."""
    plan = final_plan(REG["training_shards"].build(spark, SF_DIR))
    assert plan.count("Window") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_fuzzy_decon_explodes_cross_pairs_only(spark):
    """fuzzy_decontamination: candidates come from per-bucket SPLIT
    train/eval lists (one exchange on the band key, train×eval
    explode) — no bands self-join, no cartesian; verification joins
    are keyed."""
    plan = final_plan(REG["fuzzy_decontamination"].build(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_video_sampling_is_arrow_batched(spark):
    """video_frame_sample: synth and demux+decode both run as Arrow
    mapInPandas stages; no row-at-a-time Python, no shuffle at all
    (pure per-row media work)."""
    plan = final_plan(REG["video_frame_sample"].build(spark, SF_DIR))
    assert len(re.findall(r"MapInPandas", plan)) >= 2
    assert "BatchEvalPython" not in plan
    # the only exchange is the scan fan-out (round-robin); the media
    # path itself never shuffles
    assert len(re.findall(r"Exchange", plan)) <= 1


def test_apply_robots_broadcasts_rules(spark):
    """The robots verdict join must broadcast the (per-host tiny)
    rules side — never shuffle the URL set into an SMJ — and the
    regex match happens on the joined rows (no rule explosion
    upstream of the join)."""
    from openaq_data_pipeline_spark.operators.frontier import (
        apply_robots,
        parse_robots,
    )

    robots = spark.createDataFrame(
        [("a.org", "User-agent: *\nDisallow: /private/\nDisallow: /w*x$")],
        "host string, content string",
    )
    urls = spark.range(200).selectExpr(
        "id AS doc_id", "concat('https://a.org/p/', id) AS url"
    )
    out = apply_robots(urls, "url", "doc_id", parse_robots(robots, "host", "content"))
    plan = final_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_frontier_schedule_parses_urls_once(spark):
    """Politeness scheduling has three consumers of the URL→host
    projection (the host window, the host-rank dim, the n_hosts
    scalar). The projection must materialize ONCE (lazy checkpoint —
    try_parse_url never canonicalizes equal across subplans), so the
    executed plan reads an ExistingRDD and carries zero parse_url
    calls; the rank dim and count ride broadcasts."""
    from openaq_data_pipeline_spark.operators.frontier import (
        frontier_schedule,
    )

    urls = spark.range(200).selectExpr(
        "id AS doc_id",
        "concat('https://h', CAST(id % 4 AS STRING), '.org/p/', id) AS url",
    )
    plan = final_plan(frontier_schedule(urls, "url", "doc_id"))
    assert "BroadcastExchange" in plan
    assert "Scan ExistingRDD" in plan
    assert "parse_url" not in plan, "frontier re-parses URLs per consumer"


def test_frontier_host_rank_has_no_corpus_sized_single_partition_window(
    spark,
):
    """VERDICT r9 #7: host ranks used dense_rank over an UNPARTITIONED
    window — one task for all distinct hosts (~1e8 at web scale). The
    two-phase range-partition pattern replaces it; the only
    unpartitioned window allowed in the executed plan is the
    n_partitions-row prefix sum over __gid_pid (bounded by the
    partition count, not the host count), and the host-dim join is
    hint-free (AQE broadcasts it at fixture scale; a web-scale dim
    falls back to shuffle instead of OOMing the driver)."""
    from openaq_data_pipeline_spark.operators.frontier import (
        frontier_schedule,
    )

    urls = spark.range(500).selectExpr(
        "id AS doc_id",
        "concat('https://h', CAST(id % 37 AS STRING), '.org/p/', id) AS url",
    )
    out = frontier_schedule(urls, "url", "doc_id")
    plan = final_plan(out)
    assert "dense_rank" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" not in line:
            continue
        assert (
            "windowspecdefinition(host#" in line or "__gid_pid" in line
        ), f"corpus-sized unpartitioned window: {line.strip()[:160]}"
    # fixture-scale: AQE still lands the host dim on the build side
    assert "BroadcastExchange" in plan


def test_lm_quality_buckets_rank_is_two_phase(spark):
    """The CCNet tertile cut ranks the whole scored corpus — that
    rank must come from the two-phase range-partition pattern, never
    a corpus-sized single-partition window (same contract as the
    frontier host rank)."""
    from pyspark.sql import functions as F

    from openaq_data_pipeline_spark.operators.lm import lm_quality_buckets

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = lm_quality_buckets(
        d.filter(F.col("doc_id") % 10 == 0), d, "text", "doc_id"
    )
    plan = final_plan(out)
    for line in plan.splitlines():
        if "windowspecdefinition" not in line:
            continue
        assert "__gid_pid" in line, (
            f"corpus-sized unpartitioned window: {line.strip()[:160]}"
        )
    # exact tertiles: bucket sizes differ by at most 1
    sizes = {
        r.bucket: r["count"]
        for r in out.groupBy("bucket").count().collect()
    }
    assert set(sizes) == {"head", "middle", "tail"}
    assert max(sizes.values()) - min(sizes.values()) <= 1
