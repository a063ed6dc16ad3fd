"""Distributed logistic-regression quality classifier (training-pipeline
op, NEW — no reference analog).  The model-based quality-scoring step a
curation pipeline runs AFTER the heuristic gates (Gopher rules, fluency
buckets): train a small linear classifier on weak labels, score every
document, keep the high-probability tail.

Spark-first shape — IRLS (iteratively reweighted least squares, the
Newton method for the logistic MLE) where EACH iteration is ONE
aggregation over the corpus:

- the per-row work is pure column expressions (eta = β·x, p = σ(eta),
  w = p(1−p)) with the current β folded in as literals — whole-stage
  codegen, no UDF;
- the aggregation emits the (d+1)² upper-triangle of X'WX and the
  (d+1)-vector X'(y−p): O(d²) numbers of driver state per iteration,
  independent of corpus size (the PCA d²-combine pattern);
- the driver solves the (d+1)×(d+1) ridge-regularized system with
  numpy and goes round again.  `iterations` is fixed (deterministic
  plans), features should be localCheckpointed by the caller when the
  corpus scan is expensive — 8 iterations = 8 passes over a compact
  columnar cache, not 8 corpus scans.

Scoring is a single row-local sigmoid expression; AUC is the exact
Mann-Whitney rank-sum over the scored set (one global rank window —
fine for evaluation sets; at 100 TB evaluate on a sample, never the
full corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _eta(feature_cols: list[str], beta: list[float]) -> Column:
    e = F.lit(float(beta[0]))
    for c, b in zip(feature_cols, beta[1:]):
        e = e + F.lit(float(b)) * F.col(c).cast("double")
    return e


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 8,
    ridge: float = 1e-6,
) -> list[float]:
    """IRLS-train a logistic regression; returns [intercept, *weights].

    Deterministic up to float-summation order (per-partition partial
    sums) — weights are stable to ~1e-9 across partitionings, which is
    why downstream contracts check AUC bands, not weight bits.  The
    ridge term keeps the Newton step bounded on (near-)separable data.
    """
    import numpy as np

    d = len(feature_cols) + 1
    if d < 2:
        raise ValueError("logreg_train needs at least one feature column")
    probe = df.select(feature_cols[0]).first()
    if probe is None:
        raise ValueError("logreg_train needs at least one row; input is empty")
    beta = [0.0] * d
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    for _ in range(iterations):
        eta = _eta(feature_cols, beta)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = p * (F.lit(1.0) - p)
        aggs = []
        for i in range(d):
            for j in range(i, d):
                aggs.append(F.sum(w * xs[i] * xs[j]).alias(f"h_{i}_{j}"))
        for i in range(d):
            aggs.append(F.sum((y - p) * xs[i]).alias(f"g_{i}"))
        row = df.agg(*aggs).collect()[0]  # O(d²) driver state
        H = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                H[i, j] = H[j, i] = row[f"h_{i}_{j}"]
        g = np.array([row[f"g_{i}"] for i in range(d)])
        step = np.linalg.solve(H + ridge * np.eye(d), g)
        beta = [float(b + s) for b, s in zip(beta, step)]
    return beta


def logreg_score(
    df: DataFrame, feature_cols: list[str], beta: list[float]
) -> Column:
    """Row-local sigmoid score column for trained weights — attach with
    ``df.withColumn("score", logreg_score(df, cols, beta))``."""
    if len(beta) != len(feature_cols) + 1:
        raise ValueError(
            f"beta has {len(beta)} entries for {len(feature_cols)} features"
        )
    eta = _eta(feature_cols, beta)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))


def auc_exact(
    df: DataFrame, score_col: str, label_col: str, scale: int = 1_000_000
) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney rank-sum, as integer ppm:
    AUC = (Σ_pos rank − n_pos(n_pos+1)/2) / (n_pos·n_neg), with average
    ranks for score ties (the textbook tie correction).  One global rank
    window — an EVALUATION-set operator (bounded input), not a corpus
    pass.  Returns one row (n_pos, n_neg, auc_ppm); auc_ppm is NULL
    when either class is empty (AUC is undefined — a raw division
    would be an ANSI divide-by-zero)."""
    w = Window.orderBy(F.col(score_col).asc())
    ranked = df.select(
        F.col(label_col).cast("long").alias("y"),
        F.avg(F.row_number().over(w))
        .over(Window.partitionBy(score_col))
        .alias("r"),
    )
    return ranked.agg(
        F.count_if(F.col("y") == 1).cast("long").alias("n_pos"),
        F.count_if(F.col("y") == 0).cast("long").alias("n_neg"),
        F.expr(
            f"case when count_if(y = 1) > 0 and count_if(y = 0) > 0 then"
            f" cast(round({scale} * (sum(case when y = 1 then r end)"
            f" - count_if(y = 1) * (count_if(y = 1) + 1) / 2)"
            f" / (count_if(y = 1) * count_if(y = 0))) as bigint) end"
        ).alias("auc_ppm"),
    )
