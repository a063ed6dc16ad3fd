"""Logistic-regression quality classifier: IRLS numpy parity, scoring,
and exact Mann-Whitney AUC (operators/classifier.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _irls_numpy(X, y, iterations=8, ridge=1e-6):
    """Reference IRLS on the driver — the same math logreg_train
    distributes (intercept prepended)."""
    Xb = np.hstack([np.ones((len(y), 1)), X])
    d = Xb.shape[1]
    beta = np.zeros(d)
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-(Xb @ beta)))
        w = p * (1 - p)
        H = Xb.T @ (Xb * w[:, None])
        g = Xb.T @ (y - p)
        beta = beta + np.linalg.solve(H + ridge * np.eye(d), g)
    return beta


def test_logreg_train_matches_numpy(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(400, 2))
    logit = 0.5 + 1.5 * X[:, 0] - 2.0 * X[:, 1]
    y = (logit + rng.normal(scale=0.5, size=400) > 0).astype(int)

    from lwetl_spark.operators.classifier import logreg_score, logreg_train

    rows = [(float(a), float(b), int(t)) for (a, b), t in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, label long")
    beta = logreg_train(df, ["x1", "x2"], "label", iterations=8)
    ref = _irls_numpy(X, y.astype(float), iterations=8)
    assert np.allclose(beta, ref, rtol=1e-6, atol=1e-8), (beta, ref)

    # scoring parity on a probe row
    got = (
        df.limit(5)
        .withColumn("s", logreg_score(df, ["x1", "x2"], beta))
        .collect()
    )
    for r in got:
        eta = beta[0] + beta[1] * r["x1"] + beta[2] * r["x2"]
        assert r["s"] == pytest.approx(1 / (1 + np.exp(-eta)), rel=1e-9)


def test_logreg_train_empty_and_shape_guards(spark):
    from lwetl_spark.operators.classifier import logreg_score, logreg_train

    empty = spark.createDataFrame([], "x1 double, label long")
    with pytest.raises(ValueError, match="empty"):
        logreg_train(empty, ["x1"], "label")
    df = spark.createDataFrame([(1.0, 1)], "x1 double, label long")
    with pytest.raises(ValueError, match="entries"):
        logreg_score(df, ["x1"], [0.1, 0.2, 0.3])


def test_auc_exact_hand_case(spark):
    """Scores 0.1..0.6, positives at the top 2 and one mid -> AUC by the
    pair-count definition: (pairs where pos > neg + 0.5 ties) / (pos*neg)."""
    from lwetl_spark.operators.classifier import auc_exact

    rows = [
        (0.6, 1), (0.5, 1), (0.4, 0), (0.3, 1), (0.2, 0), (0.1, 0),
    ]
    df = spark.createDataFrame(rows, "score double, label long")
    out = auc_exact(df, "score", "label").collect()[0]
    assert out["n_pos"] == 3 and out["n_neg"] == 3
    # concordant pairs: 0.6>all 3 negs, 0.5>all 3, 0.3>two -> 8/9
    assert out["auc_ppm"] == round(1_000_000 * 8 / 9)


def test_auc_exact_tie_handling(spark):
    from lwetl_spark.operators.classifier import auc_exact

    # one tie across classes at 0.5 counts 1/2
    rows = [(0.5, 1), (0.5, 0), (0.9, 1), (0.1, 0)]
    df = spark.createDataFrame(rows, "score double, label long")
    out = auc_exact(df, "score", "label").collect()[0]
    # pairs: (0.9 vs 0.5)=1, (0.9 vs 0.1)=1, (0.5 vs 0.5)=0.5, (0.5 vs 0.1)=1
    assert out["auc_ppm"] == round(1_000_000 * 3.5 / 4)


def test_auc_random_scores_near_half(spark):
    from lwetl_spark.operators.classifier import auc_exact

    rng = np.random.default_rng(11)
    rows = [(float(rng.random()), int(rng.random() < 0.5)) for _ in range(2000)]
    df = spark.createDataFrame(rows, "score double, label long")
    out = auc_exact(df, "score", "label").collect()[0]
    assert 450_000 < out["auc_ppm"] < 550_000


def test_mmr_diversify_hand_case(spark):
    """Four candidates: two near-duplicates with top relevance, two
    diverse lower-rel docs.  Plain top-2 takes both near-dups; MMR at
    lam=0.5 must take one near-dup then a DIVERSE doc."""
    from lwetl_spark.operators.similarity import mmr_diversify

    rows = [
        # (query, doc, rel, vec): docs 1,2 nearly identical; 3 orthogonal
        (1, 1, 0.99, [1.0, 0.0, 0.0]),
        (1, 2, 0.98, [0.999, 0.04, 0.0]),
        (1, 3, 0.60, [0.0, 1.0, 0.0]),
        (1, 4, 0.10, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, rel double, embedding array<double>"
    )
    got = (
        mmr_diversify(df, k=2, lam=0.5)
        .orderBy("mmr_rank")
        .collect()
    )
    assert [r["doc_id"] for r in got] == [1, 3]
    assert [r["mmr_rank"] for r in got] == [1, 2]


def test_mmr_diversify_k_exceeds_candidates(spark):
    from lwetl_spark.operators.similarity import mmr_diversify

    df = spark.createDataFrame(
        [(1, 7, 0.5, [1.0, 0.0])],
        "query_id long, doc_id long, rel double, embedding array<double>",
    )
    got = mmr_diversify(df, k=5).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 7

    with pytest.raises(ValueError, match="lam"):
        mmr_diversify(df, k=2, lam=1.5)
