"""Model-based quality filtering: a distributed logistic-regression
trainer over hashed bag-of-words features — the classifier-gate step
of public LLM data pipelines (GPT-3's LR quality filter over
hashed-ngram features, CCNet's fastText gate, LLaMA's
Wikipedia-reference classifier), built Spark-first.

Everything stays a DataFrame — features, labels, weights, gradients.
There is NO driver-side model state: full-batch gradient descent runs
as a fixed number of DataFrame rounds, each one

1. margins: features ⋈ weights (broadcast — the weight table is
   ``n_features + 1`` rows) → doc-keyed sum;
2. residuals: sigmoid(margin) − label, one doc-keyed join;
3. gradient: features ⋈ residuals (doc-co-keyed) → feature-keyed
   sum — PARTIAL-aggregated map-side, so the exchange moves
   O(partitions × features) rows, never O(corpus);
4. weight update: left join of the (tiny) gradient onto weights,
   re-checkpointed per round to keep lineage flat (same discipline
   as the BPE merge loop, operators/tokenizer.py).

Per round: one broadcast join + two doc-keyed hash joins/aggregates
+ one feature-keyed partial-agg exchange. The feature matrix is
materialized ONCE (lazy localCheckpoint) and re-read by all rounds —
at 100 TB you'd persist it to parquet; the loop itself never touches
raw text again.

Feature hashing uses the repo's cross-engine bucket recipe
(``conv(substring(md5(token),1,8),16,10) % n_features`` ==
DuckDB ``CAST('0x' || substr(md5(token),1,8) AS BIGINT) % n``), so a
SQL oracle can replay training bit-for-bit modulo float ulps.

Float determinism contract: double sums are order-sensitive, so
cross-engine outputs must be INTEGER decisions (predicted label),
valid whenever the margin clears the decision boundary by more than
accumulated ulp drift (~1e-12; the catalog query's planted signal
separates with margin ≥ 0.1). Raw weights/probabilities are for
in-engine use and pytest tolerance checks, never driver hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIAS = "__bias__"


def hashed_features(
    docs: DataFrame,
    n_features: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float | None = 0.5,
) -> DataFrame:
    """(doc_id, feature, x): binary presence of each hashed
    bag-of-words bucket, plus a bias term at feature id
    ``n_features``. Binary (not count) features keep the Hessian
    bounded so plain GD converges without per-feature scaling.

    ``max_df_frac`` drops STOP FEATURES — buckets present in more
    than that fraction of documents (same df-guard discipline as the
    Jaccard stop-shingle tier, operators/dedup.py). Near-constant
    columns are collinear with the bias and condition GD so badly
    that the trajectory flips with corpus size (measured: identical
    params converged at 500 docs and oscillated at 5000); they also
    carry no discriminative signal by definition. ``None`` opts out.
    The guard is one feature-keyed count + a broadcast-sized join.

    One explode + one distinct-shaped aggregate (+ the df guard)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    feats = (
        tok.select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
                % n_features
            ).alias("feature"),
        )
        .distinct()
        .withColumn("x", F.lit(1.0))
    )
    if max_df_frac is not None:
        n_docs = docs.select(F.col(id_col)).distinct().count()
        keep = (
            feats.groupBy("feature")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df_frac * n_docs)
            .select("feature")
        )
        feats = feats.join(F.broadcast(keep), "feature").select(
            "doc_id", "feature", "x"
        )
    bias = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit(n_features).cast("long").alias("feature"),
        F.lit(1.0).alias("x"),
    )
    return feats.unionByName(bias)


def _sigmoid(col: F.Column) -> F.Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-col))


def train_logreg(
    feats: DataFrame,
    labels: DataFrame,
    n_features: int = 128,
    n_iters: int = 4,
    lr: float = 4.0,
) -> DataFrame:
    """Full-batch GD on logistic loss; returns the weight table
    (feature, w) with ``n_features + 1`` rows (bias last). ``labels``
    is (doc_id, y) with y in {0.0, 1.0}. Deterministic given its
    inputs up to float summation order (module docstring)."""
    spark = feats.sparkSession
    n = labels.count()
    if n == 0:
        raise ValueError("train_logreg needs at least one labeled row")
    # r16 topology (guide §2.3/§2.4): the feature matrix groups into
    # DOC-LOCAL (feature, x) arrays once, with the label riding the
    # same row — so a GD round is ONE pass: margin and residual are
    # per-row array folds against the weight vector (attached as one
    # broadcast row, the similarity-operator pattern — data, not plan
    # literals, so codegen is round-invariant and cache-hits), and
    # the gradient is one explode + ONE feature-keyed partial-agg
    # exchange of n_features+1 rows. The old round shape shuffled the
    # corpus three times per round (doc-keyed margin aggregate,
    # feats⋈residual join, feature-keyed gradient); this one shuffles
    # it zero times. The weight vector itself is n_features+1 floats
    # — the same bounded driver-finisher class as the IVF centroid
    # table; the returned surface is still the (feature, w)
    # DataFrame, and the decision contract (INTEGER predictions,
    # planted-margin-robust to float summation order) is unchanged.
    doc_rows = (
        feats.groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(F.col("feature"), F.col("x"))
            ).alias("__fx")
        )
        .join(labels, "doc_id")
        .select("doc_id", "__fx", "y")
        .localCheckpoint(eager=False)
    )
    # r17 (guide §2.6/§1.2: remove driver round-trips): ALL GD rounds
    # chain inside ONE lazy plan — each round's gradient aggregate
    # feeds the next round's weight row as a one-row broadcast
    # (map_from_entries of the 129 gradient rows; the weight update
    # w[f] − (lr/n)·g[f] runs in-plan with the SAME IEEE double ops
    # the driver loop performed: one multiply by the precomputed
    # lr/n, one subtract, missing features coalesce to 0.0). The old
    # loop ran one Spark job + one createDataFrame + one collect per
    # round; this shape runs ONE job and collects the final 129-float
    # weight row (the established bounded-collect class). Gradient
    # sums remain shuffle-order nondeterministic exactly as before —
    # inside the documented integer-decision/ulp contract.
    s_step = lr / n
    w_df = spark.createDataFrame(
        [([0.0] * (n_features + 1),)], "__w array<double>"
    )
    for _ in range(n_iters):
        margin = F.aggregate(
            F.col("__fx"),
            F.lit(0.0),
            lambda acc, s: acc
            + s["x"] * F.element_at(F.col("__w"), (s["feature"] + 1).cast("int")),
        )
        resid = (_sigmoid(margin) - F.col("y")).alias("__r")
        grad = (
            doc_rows.crossJoin(F.broadcast(w_df))
            .select(resid, F.explode(F.col("__fx")).alias("__s"))
            .groupBy(F.col("__s.feature").alias("feature"))
            .agg(F.sum(F.col("__s.x") * F.col("__r")).alias("g"))
        )
        gmap = grad.agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(F.col("feature").cast("int"), F.col("g"))
                )
            ).alias("__gm")
        )
        w_df = (
            gmap.crossJoin(F.broadcast(w_df))
            .select(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_features)),
                    lambda f: F.element_at(F.col("__w"), f + 1)
                    - F.lit(s_step)
                    * F.coalesce(
                        F.try_element_at(F.col("__gm"), f), F.lit(0.0)
                    ),
                ).alias("__w")
            )
        )
    w_vec = [float(x) for x in w_df.collect()[0]["__w"]]
    return spark.createDataFrame(
        [(f, w_vec[f]) for f in range(n_features + 1)],
        "feature long, w double",
    )


def predict_logreg(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, score, pred): sigmoid margin under ``weights`` and
    the hard {0,1} decision. One broadcast join + one doc-keyed
    aggregate — the same shape as a training margin pass."""
    margins = (
        feats.join(F.broadcast(weights), "feature")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("w")).alias("m"))
    )
    return margins.select(
        "doc_id",
        _sigmoid(F.col("m")).alias("score"),
        (_sigmoid(F.col("m")) >= 0.5).cast("long").alias("pred"),
    )
