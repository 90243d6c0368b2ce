"""BM25 sparse retrieval over an inverted index — the lexical
companion to the dense ANN tier (`operators/similarity.py`): a
training-data pipeline retrieves with BOTH (near-dup audit, eval-set
decontamination by retrieval, hard-negative mining), so the engine
ships both.

Extends the reference's surface (BASELINE.json north star); the
reference's own query layer has no retrieval operator.

Plan shape (everything keyed, everything partial-aggregable):

- corpus side: ONE tokenization pass builds the term-frequency
  table (doc_id, term, tf, dl) — the inverted index, which is the
  single materialization point; the document-frequency table
  (term, df) and the S corpus stat both derive FROM it, and N from
  an id-only pruned scan.
- query side: distinct query terms BROADCAST into tf — the posting
  scan prunes to query terms before anything heavy happens, so cost
  scales with Σ df(query terms), never with the corpus.
- one groupBy (query_id, doc_id) sums term scores; one k-bounded
  rank window per query_id orders candidates.

Determinism contract — this is a RATIONAL-IDF BM25 VARIANT, not
textbook BM25 (ADVICE r5 #2): the Robertson idf takes the LOGARITHM
of the ratio below; we deliberately drop the log so every term score
stays an exact integer ratio (a transcendental log cannot be
fixed-pointed bit-identically across engines). Single-term rankings
are unchanged (log is monotone); MULTI-term rankings can differ from
textbook BM25 because rare terms weigh in linearly rather than
logarithmically — rare-term matches are overweighted relative to
Robertson idf. A production deployment wanting textbook ranking
applies ``F.log`` to the same ratio (float path, no oracle). With
k1 = 6/5 and b = 3/4 the variant is rational in integer corpus
statistics:

    idf(t)        = (N − df + ½) / (df + ½)        = (2N − 2df + 1) / (2df + 1)
    tf_factor(t,d)= tf·(k1+1) / (tf + k1(1 − b + b·dl·N/S))
                  = 22·tf·S / (10·tf·S + 3·S + 9·dl·N)

so each term score is one exact integer ratio, fixed-pointed at
``SCORE_SCALE`` decimals with DECIMAL(38,0) arithmetic (the operand
products pass 2^63 long before they threaten 10^38) and summed as a
BIGINT — order-free, bit-identical in any engine. Ties rank by
doc_id. Scores ship as the scaled BIGINT (``score_fp``); callers
wanting floats divide by 10^SCORE_SCALE themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.text import normalize, tokens

SCORE_SCALE = 6  # fixed-point decimals for per-term BM25 scores


def corpus_index(
    corpus: DataFrame, text_col: str, id_col: str, materialize: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(tf, df, stats) — the inverted-index family:
    ``tf`` (id, term, tf, dl), ``df`` (term, df),
    ``stats`` (n_docs, s_tokens) as a 1-row DataFrame (joined
    broadcast, never collected). Empty documents carry no terms and
    still count toward N and S (dl = 0 ... they add nothing to S).

    Materialization point: the INDEX (tf), not the raw tokens — tf
    feeds three consumers (the df aggregate, the S scalar, and the
    query-term probe), and it is what a production retrieval system
    persists anyway; the tokenized corpus is strictly larger and is
    deliberately NEVER materialized (it would pin corpus-sized
    blocks). The corpus is tokenized exactly once: N comes from a
    column-pruned id-only scan and S = Σtf from the index itself
    (per-doc token sums equal document length; empty docs carry no
    terms and contribute 0 to both).

    ``materialize=False`` skips the in-memory checkpoint — for
    callers whose FIRST action over tf is itself a materialization
    (the persisted-index bucketed write), where a memory copy would
    be pure overhead. Such callers must not evaluate the returned
    df/stats before their own materialization lands (they would
    re-tokenize)."""
    toks = corpus.select(
        F.col(id_col), tokens(normalize(F.col(text_col))).alias("__w")
    )
    dl_col = (
        F.when(F.concat_ws("", F.col("__w")) == "", F.lit(0))
        .otherwise(F.size(F.col("__w")))
        .cast("long")
        .alias("dl")
    )
    # dl rides through the tf aggregation as a grouping column — it
    # is functionally dependent on the doc id, so the groups are
    # unchanged and the corpus×corpus (tf ⋈ dl) join a separate
    # length table would need (a sort-merge join at scale) never
    # exists
    tf = (
        toks.select(F.col(id_col), dl_col, F.explode(F.col("__w")).alias("term"))
        .where(F.col("term") != "")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if materialize:
        tf = tf.localCheckpoint(eager=False)
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = (
        corpus.select(F.col(id_col))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(tf.agg(F.sum("tf").alias("s_tokens")))
    )
    return tf, df_t, stats


def _probe_topk(
    tf: DataFrame,
    df_t: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    id_col: str,
    q_text_col: str,
    q_id_col: str,
    k: int,
    score_mode: str,
) -> DataFrame:
    """Shared probe core of :func:`bm25_topk` and
    :func:`bm25_topk_indexed`: query terms broadcast into the
    postings, per-term score, one (query, doc) aggregate, one
    k-bounded rank window.

    ``score_mode``:
    - ``"fixed_point"`` (oracle mode): the rational-idf variant of
      the module contract, summed as a scaled BIGINT ``score_fp`` —
      bit-identical in any engine.
    - ``"float"`` (production mode): TEXTBOOK BM25 — Robertson
      log-idf, double arithmetic, column ``score`` (rounded 6 dp for
      display stability; rankings use the unrounded value). Use this
      when ranking quality matters more than cross-engine
      hashability; there is deliberately no DuckDB oracle for it
      (float sums are order-dependent), it is pinned by pytest
      instead."""
    from pyspark.sql import Window

    if score_mode not in ("fixed_point", "float"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    qterms = queries.select(
        F.col(q_id_col),
        F.explode(
            F.array_distinct(tokens(normalize(F.col(q_text_col))))
        ).alias("term"),
    ).where(F.col("term") != "")

    # prune df to the query vocabulary BEFORE aggregating: a term's
    # df over the pruned postings equals its df over the full table
    # (every posting row of that term survives the semi-join), so
    # the full-index groupBy never runs — the probe's only
    # index-sized work is the pruned posting scan itself (r6: the
    # full-table df aggregate was the probe's dominant cost once the
    # index moved to disk)
    if df_t is None:
        pruned = tf.join(
            F.broadcast(qterms.select("term").distinct()), "term"
        )
        df_t = pruned.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    cand = (
        tf.join(F.broadcast(qterms), "term")
        .join(df_t, "term")
        .crossJoin(F.broadcast(stats))
    )
    if score_mode == "float":
        # textbook BM25 (k1 = 1.2, b = 0.75): idf·tf-saturation with
        # avgdl = S/N; all double-side, whole-stage-codegen friendly
        n = F.col("n_docs").cast("double")
        s = F.col("s_tokens").cast("double")
        tfc = F.col("tf").cast("double")
        dfc = F.col("df").cast("double")
        dlc = F.col("dl").cast("double")
        idf = F.log((n - dfc + 0.5) / (dfc + 0.5))
        tf_factor = (tfc * 2.2) / (tfc + 1.2 * (0.25 + 0.75 * dlc * n / s))
        agg = (
            cand.select(
                F.col(q_id_col), F.col(id_col), (idf * tf_factor).alias("__s")
            )
            .groupBy(q_id_col, id_col)
            .agg(F.sum("__s").alias("score"))
        )
        order = [F.col("score").desc(), F.col(id_col)]
        score_cols = [F.round(F.col("score"), 6).alias("score")]
    else:
        dec = "decimal(38,0)"
        n = F.col("n_docs").cast(dec)
        s = F.col("s_tokens").cast(dec)
        tfc = F.col("tf").cast(dec)
        dfc = F.col("df").cast(dec)
        dlc = F.col("dl").cast(dec)
        num = (2 * n - 2 * dfc + 1) * (22 * tfc * s)
        den = (2 * dfc + 1) * (10 * tfc * s + 3 * s + 9 * dlc * n)
        k10 = 10**SCORE_SCALE
        scored = cand.select(
            F.col(q_id_col),
            F.col(id_col),
            num.alias("__n"),
            den.alias("__d"),
        ).withColumn(
            # round-half-up(num/den · 10^SCORE_SCALE) in pure integer
            # arithmetic: `div` is integral division (exact on DECIMAL,
            # returns BIGINT) — never a float on the way
            "__score",
            F.expr(f"(__n * {2 * k10} + __d) div (2 * __d)"),
        )
        agg = scored.groupBy(q_id_col, id_col).agg(
            F.sum("__score").alias("score_fp")
        )
        order = [F.col("score_fp").desc(), F.col(id_col)]
        score_cols = [F.col("score_fp")]
    w = Window.partitionBy(q_id_col).orderBy(*order)
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col(q_id_col),
            F.col("rank").cast("long").alias("rank"),
            F.col(id_col),
            *score_cols,
        )
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    q_text_col: str,
    q_id_col: str = "query_id",
    k: int = 5,
    score_mode: str = "fixed_point",
) -> DataFrame:
    """(query_id, rank, doc_id, score_fp|score) — top-``k`` BM25
    documents per query over an index built inline from ``corpus``
    (one tokenization pass, localCheckpoint-materialized). For a
    persisted, batch-appendable index use :class:`Bm25Index` +
    :func:`bm25_topk_indexed`. Scores per ``score_mode`` — see
    :func:`_probe_topk`. A doc ranks only if it shares ≥1 term with
    the query; ties order by doc_id."""
    tf, _, stats = corpus_index(corpus, text_col, id_col)
    # df_t=None: the probe derives df from the query-term-pruned
    # postings (exact; see _probe_topk) instead of corpus_index's
    # full-vocabulary aggregate
    return _probe_topk(
        tf, None, stats, queries, id_col, q_text_col, q_id_col, k, score_mode
    )


# --- persisted, batch-appendable index (VERDICT r5 next #4) -------------


from dataclasses import dataclass  # noqa: E402
import uuid as _uuid  # noqa: E402


@dataclass(frozen=True)
class Bm25Index:
    """Handle for a PERSISTED inverted index — what a production
    retrieval system keeps between query sessions (the module
    docstring's own production note). Two tables:

    - ``{name}_tf`` (id, dl, term, tf) BUCKETED on ``term``: the
      postings. The probe join (query terms → postings), the df
      aggregate and the S scalar all key on ``term``, so every one
      of them is bucket-local — no index-side exchange, and the
      corpus is NEVER re-tokenized at query time (pinned by
      tests/test_incremental_fuzzy.py's sibling plan tests).
    - ``{name}_stats`` (n_docs, s_tokens): one row PER APPENDED
      BATCH (empty documents count toward N but carry no postings,
      so N cannot be derived from tf); readers sum across batches.

    df is deliberately NOT persisted: it derives from tf with a
    bucket-local aggregate, and persisting it would go stale on
    every append."""

    name: str
    n_buckets: int = 32
    location: str | None = None

    @property
    def tf_table(self) -> str:
        return f"{self.name}_tf"

    @property
    def stats_table(self) -> str:
        return f"{self.name}_stats"

    def _path(self, suffix: str) -> str | None:
        return f"{self.location}/{suffix}" if self.location else None

    def drop(self, spark=None) -> None:
        """No-residue contract, as DedupIndex/FuzzyIndex."""
        import shutil

        from pyspark.sql import SparkSession

        spark = spark or SparkSession.getActiveSession()
        if spark is not None:
            for t in (self.tf_table, self.stats_table):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
        if self.location:
            shutil.rmtree(self.location, ignore_errors=True)

    def __enter__(self) -> "Bm25Index":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.drop()


def build_bm25_index(
    corpus: DataFrame, text_col: str, id_col: str, index: Bm25Index
) -> None:
    """Tokenize ``corpus`` once and persist the postings + batch
    stats (overwrite)."""
    _write_index(corpus, text_col, id_col, index, mode="overwrite")


def append_bm25_index(
    batch: DataFrame, text_col: str, id_col: str, index: Bm25Index
) -> None:
    """Append a new batch's postings and stats row (doc ids globally
    unique — caller's contract). Readers re-aggregate bucket-locally;
    no existing posting is rewritten."""
    _write_index(batch, text_col, id_col, index, mode="append")


def _write_index(
    corpus: DataFrame, text_col: str, id_col: str, index: Bm25Index, mode: str
) -> None:
    from openaq_data_pipeline_spark.sources.tables import save_bucketed

    spark = corpus.sparkSession
    # No per-bucket sortBy either way: probe joins are
    # hash/broadcast, a sorted order buys nothing and costs a full
    # sort of the postings per write.
    if mode == "overwrite":
        # the bucketed WRITE is the materialization — no in-memory
        # checkpoint needed; batch stats re-derive from the WRITTEN
        # table (it holds exactly this batch) + an id-pruned corpus
        # count, so tokenization never runs twice. The n_docs count
        # only needs the corpus id column — run it concurrently with
        # the tf write (guide §2.6) and inline the scalar.
        from concurrent.futures import ThreadPoolExecutor

        tf, _, _ = corpus_index(corpus, text_col, id_col, materialize=False)
        with ThreadPoolExecutor(max_workers=1) as pool:
            f_n = pool.submit(
                lambda: int(corpus.select(F.col(id_col)).count())
            )
            save_bucketed(
                tf, index.tf_table, "term", index.n_buckets,
                sort=False, mode=mode, path=index._path("tf"),
            )
            n_docs = f_n.result()
        stats = spark.range(1).select(
            F.lit(n_docs).cast("long").alias("n_docs")
        ).crossJoin(
            spark.table(index.tf_table).agg(F.sum("tf").alias("s_tokens"))
        )
    else:
        # APPEND: the stats row must be BATCH-ONLY (readers sum rows
        # across batches — deriving s_tokens from the written table
        # here would double-count history). The checkpointed batch tf
        # keeps it one tokenization pass, batch-sized.
        tf, _, stats = corpus_index(corpus, text_col, id_col)
        save_bucketed(
            tf, index.tf_table, "term", index.n_buckets,
            sort=False, mode=mode, path=index._path("tf"),
        )
    w = stats.write.mode(mode).format("parquet")
    if index.location:
        w = w.option("path", index._path("stats"))
    w.saveAsTable(index.stats_table)
    spark.catalog.refreshTable(index.stats_table)


def bm25_topk_indexed(
    spark,
    queries: DataFrame,
    index: Bm25Index,
    id_col: str,
    q_text_col: str,
    q_id_col: str = "query_id",
    k: int = 5,
    score_mode: str = "fixed_point",
) -> DataFrame:
    """Top-``k`` per query against the PERSISTED index — identical
    semantics to :func:`bm25_topk` over the concatenation of every
    indexed batch (tf/df/dl/N/S are all per-document or additive
    across batches), without touching corpus text. df re-derives
    from the bucketed postings (bucket-local), stats sum across
    batch rows."""
    tf = spark.table(index.tf_table)
    stats = spark.table(index.stats_table).agg(
        F.sum("n_docs").alias("n_docs"), F.sum("s_tokens").alias("s_tokens")
    )
    # df_t=None: df derives from the query-term-pruned bucketed scan
    # (exact and bucket-local; the full-table aggregate was the
    # probe's dominant disk-read cost)
    return _probe_topk(
        tf, None, stats, queries, id_col, q_text_col, q_id_col, k, score_mode
    )


def temp_bm25_index(n_buckets: int = 32) -> Bm25Index:
    """Uniquely-named tempdir-rooted index for self-contained
    queries/tests; context-manage it so tables and tempdir drop on
    exit."""
    from openaq_data_pipeline_spark.tmproots import session_tmpdir

    return Bm25Index(
        name=f"bm25_idx_{_uuid.uuid4().hex}",
        n_buckets=n_buckets,
        location=session_tmpdir("bm25_index_"),
    )


# --- hybrid retrieval: reciprocal-rank fusion --------------------------


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query_id",
    item_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    topk: int | None = None,
    scale: int = 10**12,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of any
    number of per-query rankings — the standard way to combine the
    sparse (BM25) and dense (ANN) retrieval tiers into one hybrid
    ranking without score calibration: each system contributes
    ``1/(k_rrf + rank)`` per item, and items are re-ranked by the
    summed contribution.

    Rank-only fusion is exactly why this composes across tiers whose
    scores live on incomparable scales (BM25 fixed-point integers vs
    cosine floats): only the per-system ``rank`` column is read.

    Determinism contract: contributions are computed as
    ``scale div (k_rrf + rank)`` in 64-bit integer arithmetic and
    summed as BIGINTs — order-free and bit-identical across engines
    (``1/61 + 1/62`` in doubles is not) — so the fused ranking is
    hashable against a SQL oracle. With the default ``scale=1e12``
    the quantization never merges ranks that true RRF would separate
    for ``k_rrf + rank < 10^6``.

    Plan shape: union of k-bounded ranking outputs (each already
    tiny: |queries|·k rows), one groupBy (query, item), one rank
    window per query — no corpus-sized input ever reaches this
    operator, so it is scale-free by construction.

    Each input must carry (query_col, item_col, rank_col); extra
    columns are ignored. ``n_systems`` reports how many rankings
    surfaced the item (2-system agreement is the classic hybrid
    relevance signal).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from pyspark.sql import Window

    parts = [
        r.select(
            F.col(query_col),
            F.col(item_col),
            F.col(rank_col).cast("long").alias("__rank"),
        )
        for r in rankings
    ]
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionByName(p)
    agg = (
        fused.withColumn(
            "__contrib", F.expr(f"{scale} div ({k_rrf} + __rank)")
        )
        .groupBy(query_col, item_col)
        .agg(
            F.sum("__contrib").alias("rrf_score"),
            F.count(F.lit(1)).cast("long").alias("n_systems"),
        )
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(item_col).asc()
    )
    out = agg.withColumn(
        "fused_rank", F.row_number().over(w).cast("long")
    )
    if topk is not None:
        out = out.where(F.col("fused_rank") <= topk)
    return out.select(
        query_col, "fused_rank", item_col, "rrf_score", "n_systems"
    )


# --- diversity re-ranking (MMR) ----------------------------------------


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.7,
    query_col: str = "query_id",
    item_col: str = "doc_id",
    score_col: str = "rrf_score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998) over a
    per-query candidate list: greedily pick the item maximizing
    ``lam·relevance − (1−lam)·max_similarity_to_already_picked`` —
    the standard de-redundancy pass between retrieval and a consumer
    that wants COVERAGE (RAG context assembly, hard-negative
    mining, eval-set construction), and the natural consumer of
    :func:`rrf_fuse` output joined back to its embeddings.

    Scale shape: the greedy loop is inherently sequential PER QUERY
    but embarrassingly parallel ACROSS queries, and candidate lists
    are k-bounded by the upstream probe — exactly the
    ``applyInPandas`` grouped-map case (tiny group, quadratic-in-k
    python work, Arrow both ways). Nothing corpus-sized reaches this
    operator.

    Determinism: relevance is min-max normalized per query (rank
    scores arrive on arbitrary scales), cosine in float64; ties
    break by item id ascending. Emits (query, mmr_rank, item,
    mmr_score rounded 6dp). Id columns keep whatever type they have
    in ``candidates`` (string ids work like :func:`rrf_fuse`) — the
    output schema is derived from the input schema, not hard-coded."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    in_fields = {f.name: f for f in candidates.schema.fields}
    out_schema = StructType(
        [
            StructField(query_col, in_fields[query_col].dataType),
            StructField("mmr_rank", LongType()),
            StructField(item_col, in_fields[item_col].dataType),
            StructField("mmr_score", DoubleType()),
        ]
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(item_col).reset_index(drop=True)
        v = np.array([np.asarray(x, dtype="float64") for x in pdf[vec_col]])
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0] = 1.0
        vn = v / norms[:, None]
        s = pdf[score_col].astype("float64").to_numpy()
        lo, hi = s.min(), s.max()
        rel = np.ones_like(s) if hi == lo else (s - lo) / (hi - lo)
        picked: list[int] = []
        rows = []
        cand = list(range(len(pdf)))
        while cand and len(picked) < k:
            best_i, best_val = None, None
            for i in cand:
                pen = (
                    max(float(vn[i] @ vn[j]) for j in picked)
                    if picked
                    else 0.0
                )
                val = lam * rel[i] - (1 - lam) * pen
                if best_val is None or val > best_val:
                    best_i, best_val = i, val
            picked.append(best_i)
            cand.remove(best_i)
            rows.append(
                (
                    pdf[query_col].iloc[best_i],
                    len(picked),
                    pdf[item_col].iloc[best_i],
                    round(float(best_val), 6),
                )
            )
        return pd.DataFrame(
            rows, columns=[query_col, "mmr_rank", item_col, "mmr_score"]
        )

    return candidates.groupBy(query_col).applyInPandas(
        per_query, schema=out_schema
    )


# --- exact-phrase matching (r12) ------------------------------------------


def phrase_occurrences(
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    phrase: str,
    out_col: str = "n_hits",
) -> DataFrame:
    """(id, n_hits) for documents containing the exact TOKEN
    sequence ``phrase`` at least once — the phrase face the
    tf-postings index cannot express (it stores no positions), used
    for benchmark-contamination scrubs and exact-quote search.

    Semantics are the BM25 family's tokenizer exactly (``normalize``
    + whitespace split): because ``normalize`` collapses whitespace,
    "token sequence match" is equivalent to "substring match on the
    normalized text with token-boundary guards" — which makes the
    whole operator ONE codegen regexp count fused into the corpus
    scan: no explode, no positional self-joins, no shuffle before
    the final filter. Boundary guards are width-1 lookarounds
    (``(?<![^ ]) … (?![^ ])``), so adjacent occurrences both count;
    counts are non-overlapping (string-count convention — a
    self-overlapping phrase like ``'a a'`` in ``'a a a'`` counts
    once, the same answer a SQL replay gives).

    Multi-phrase scrubs: union the per-phrase frames or OR the
    regexes upstream; each phrase stays one scan-fused expression.
    """
    import re as _re

    words = phrase.lower().split()
    if not words:
        raise ValueError("phrase_occurrences: empty phrase")
    pat = (
        "(?<![^ ])"
        + " ".join(_re.escape(w) for w in words)
        + "(?![^ ])"
    )
    norm = normalize(F.col(text_col))
    n = F.size(F.regexp_extract_all(norm, F.lit(pat), 0))
    return (
        corpus.select(
            F.col(id_col), n.cast("long").alias(out_col)
        )
        .where(F.col(out_col) > 0)
    )
