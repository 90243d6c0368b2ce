"""Distributed logistic regression (operators/classifier.py): weights
against an exact numpy replay, the df stop-feature guard, and plan
discipline (broadcast weight joins, no Python UDF, no cartesian)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.classifier import (
    hashed_features,
    predict_logreg,
    train_logreg,
)

NF = 32


def _bucket(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % NF


def _docs(spark):
    rows = []
    for d in range(60):
        words = [f"common{i}" for i in range(3)]  # df = 100% → guarded
        words.append(f"rare{d % 7}")
        if d % 3 == 0:
            words.append("posmarker")
        rows.append((d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def _numpy_replay(rows, n_iters, lr, max_df_frac):
    n = len(rows)
    X = np.zeros((n, NF + 1))
    y = np.zeros(n)
    for r, (d, t) in enumerate(rows):
        for w in set(t.split(" ")):
            X[r, _bucket(w)] = 1.0
        X[r, NF] = 1.0
        y[r] = 1.0 if d % 3 == 0 else 0.0
    if max_df_frac is not None:
        keep = X.sum(0) <= max_df_frac * n
        keep[NF] = True
        X = X * keep
    w = np.zeros(NF + 1)
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        w -= lr / n * (X.T @ (p - y))
    return X, y, w


class TestTrainLogreg:
    def _train(self, spark, max_df_frac=0.5, n_iters=4, lr=4.0):
        docs, rows = self._fixture = _docs(spark)
        labels = docs.select(
            "doc_id",
            F.when(F.col("doc_id") % 3 == 0, 1.0).otherwise(0.0).alias("y"),
        )
        feats = hashed_features(docs, NF, max_df_frac=max_df_frac)
        w = train_logreg(feats, labels, NF, n_iters=n_iters, lr=lr)
        return rows, feats, w

    def test_weights_match_numpy_replay(self, spark):
        for max_df_frac in (0.5, None):
            rows, _, w = self._train(spark, max_df_frac=max_df_frac)
            _, _, ref = _numpy_replay(rows, 4, 4.0, max_df_frac)
            got = {r["feature"]: r["w"] for r in w.collect()}
            assert len(got) == NF + 1
            for f in range(NF + 1):
                assert got[f] == pytest.approx(ref[f], abs=1e-9), (
                    max_df_frac,
                    f,
                )

    def test_predictions_learn_planted_signal(self, spark):
        rows, feats, w = self._train(spark)
        pred = {r["doc_id"]: r for r in predict_logreg(feats, w).collect()}
        for d, _ in rows:
            want = 1 if d % 3 == 0 else 0
            assert pred[d]["pred"] == want
            assert abs(pred[d]["score"] - 0.5) > 0.05

    def test_df_guard_drops_common_features(self, spark):
        docs, _ = _docs(spark)
        guarded = hashed_features(docs, NF, max_df_frac=0.5)
        unguarded = hashed_features(docs, NF, max_df_frac=None)
        common = {_bucket(f"common{i}") for i in range(3)}
        g_feats = {r["feature"] for r in guarded.select("feature").distinct().collect()}
        u_feats = {r["feature"] for r in unguarded.select("feature").distinct().collect()}
        assert common <= u_feats
        assert not (common & g_feats)
        assert _bucket("posmarker") in g_feats  # df = 1/3 survives
        assert NF in g_feats  # bias never guarded

    def test_empty_labels_raise(self, spark):
        docs, _ = _docs(spark)
        feats = hashed_features(docs, NF)
        empty = spark.createDataFrame([], "doc_id long, y double")
        with pytest.raises(ValueError, match="at least one labeled"):
            train_logreg(feats, empty, NF)

    def test_plan_broadcasts_weights_no_udf_no_cartesian(self, spark):
        docs, _ = _docs(spark)
        labels = docs.select("doc_id", F.lit(0.0).alias("y")).withColumn(
            "y", F.when(F.col("doc_id") % 3 == 0, 1.0).otherwise(0.0)
        )
        feats = hashed_features(docs, NF)
        w = train_logreg(feats, labels, NF, n_iters=1)
        scored = predict_logreg(feats, w)
        scored.collect()
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "Cartesian" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
