"""PCA projection / whitening over an embedding column (NEW — no
reference analog; the standard preprocessing stage in front of semantic
dedup and ANN: SemDeDup and most IVF/PQ recipes operate in a
PCA-reduced, optionally whitened space).

Spark-first shape — the classic two-phase sufficient-statistics design:

1. **Partial pass (Arrow `mapInPandas`)**: each batch emits ONE row of
   sufficient statistics (n, Σx as d floats, ΣxxT as d² floats).  No
   raw vector survives the stage; the map output is O(batches · d²),
   independent of corpus size.
2. **Combine (keyed agg)**: statistics rows posexplode to (idx, val)
   and sum per idx — a d²-key shuffle, constant in the corpus.
3. **Driver eigendecomposition**: the combined d×d covariance — KBs,
   the bounded driver-state exception (same class as the k-means train
   sample in similarity.py) — is eigendecomposed with numpy
   (`eigh`, exact symmetric solver); components are broadcast back as
   plan literals.
4. **Project (Arrow `pandas_udf`)**: one map-side matmul per batch;
   optional whitening divides by √eigenvalue.

At 100 TB only phases 1 and 4 touch the corpus and both are
shuffle-free map passes; the only wide stage is the d²-row combine.

Eigenvector sign is normalized (largest-|component| coordinate made
positive) so results are deterministic across LAPACK builds.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _covariance_stats(df: DataFrame, vec_col: str, dim: int) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean[d], cov[d,d]) via the two-phase sufficient-stats pass.

    Only the combined (d + d² + 1)-value statistics row is ever
    collected — bounded by the embedding dimension, never the corpus.
    """

    def partials(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            m = _np.vstack(pdf[vec_col].to_numpy()).astype(_np.float64)
            yield _pd.DataFrame(
                {
                    "n": [float(len(m))],
                    "stats": [
                        _np.concatenate([m.sum(axis=0), (m.T @ m).ravel()])
                    ],
                }
            )

    part = df.select(vec_col).mapInPandas(
        partials, schema="n double, stats array<double>"
    )
    combined = (
        part.select("n", F.posexplode("stats").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum("v").alias("v"), F.sum("n").alias("nn"))
    )
    rows = combined.collect()  # d + d² rows — bounded driver state
    if not rows:
        raise ValueError("PCA needs at least one vector; input is empty")
    # every idx row carries the same Σn (each batch contributes to all)
    n = int(rows[0]["nn"])
    flat = np.zeros(dim + dim * dim)
    for r in rows:
        flat[r["idx"]] = r["v"]
    s1 = flat[:dim]
    s2 = flat[dim:].reshape(dim, dim)
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    return n, mean, cov


def pca_components(
    df: DataFrame, vec_col: str, dim: int, k: int
) -> tuple[int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(n, mean, components[k,d], eigvals[k], all_eigvals[d]) — top-k
    principal axes of the embedding cloud, sign-normalized."""
    n, mean, cov = _covariance_stats(df, vec_col, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    comps = vecs[:, :k].T.copy()  # (k, d)
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] *= -1.0
    return n, mean, comps, vals[:k], vals


def pca_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    whiten: bool = False,
    eps: float = 1e-9,
    components: tuple | None = None,
) -> DataFrame:
    """Project every vector onto the top-k principal components:
    (id, proj array<double>[k]).  `whiten=True` scales each coordinate
    by 1/√eigenvalue so the output has identity covariance.

    `components=(mean, comps, eigvals)` (the `pca_components` outputs)
    skips the statistics pass — the reuse hook pca_contract needs to
    keep its claim of two corpus passes honest."""
    probe = df.select(vec_col).first()
    if probe is None:
        raise ValueError("PCA needs at least one vector; input is empty")
    dim = len(probe[0])
    if components is None:
        _, mean, comps, vals, _ = pca_components(df, vec_col, dim, k)
    else:
        mean, comps, vals = components
    scale = 1.0 / np.sqrt(np.maximum(vals, eps)) if whiten else np.ones(k)
    mean_l, comps_l, scale_l = mean.tolist(), list(map(list, comps)), list(scale)

    def project(it):
        import numpy as _np
        import pandas as _pd

        mu = _np.array(mean_l)
        w = _np.array(comps_l)
        sc = _np.array(scale_l)
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = _np.vstack(pdf[vec_col].to_numpy()).astype(_np.float64)
            p = (m - mu) @ w.T * sc
            yield _pd.DataFrame(
                {"id": pdf[id_col], "proj": list(p)}
            )

    out_id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        project, schema=f"id {out_id_type}, proj array<double>"
    ).withColumnRenamed("id", id_col)


def pca_contract(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    tol: float = 1e-6,
) -> DataFrame:
    """Single-row verification contract for the (non-SQL-expressible)
    PCA pipeline — the x_semdedup pattern: every mathematical invariant
    the projection must satisfy, checked IN the engine, emitted as
    booleans the oracle states as literal TRUE:

    - `orthonormal_ok`:  max |C·Cᵀ − I| < tol,
    - `decreasing_var_ok`: projected per-component variances are
      non-increasing and match the eigenvalues to within tol,
    - `centered_ok`: every projected component's mean is ~0,
    - `reconstruction_ok`: MSE of the rank-k reconstruction equals the
      dropped eigenvalue mass (the Eckart–Young identity) within tol,
    - `n_vecs`: projected row count (exact, hash-checked).

    Cost: exactly TWO corpus passes — the sufficient-statistics pass
    (via pca_components) and ONE evaluation of the projection whose
    per-component (n, mean, var) aggregation also yields the row count
    and total kept variance (Σ E[v²] = Σ(var_c + mean_c²)) — nothing is
    recomputed per check.
    """
    probe = df.select(vec_col).first()
    if probe is None:
        raise ValueError("PCA needs at least one vector; input is empty")
    dim = len(probe[0])
    n, mean, comps, vals, all_vals = pca_components(df, vec_col, dim, k)
    orthonormal_ok = bool(
        np.max(np.abs(comps @ comps.T - np.eye(k))) < tol
    )
    proj = pca_project(
        df, id_col=id_col, vec_col=vec_col, k=k, components=(mean, comps, vals)
    )
    stats = (
        proj.select(F.posexplode("proj").alias("c", "v"))
        .groupBy("c")
        .agg(
            F.count("*").alias("n"),
            F.avg("v").alias("m"),
            (F.avg(F.col("v") * F.col("v")) - F.avg("v") * F.avg("v")).alias("var"),
        )
        .orderBy("c")
        .collect()
    )
    variances = [r["var"] for r in stats]
    scale = max(1.0, float(all_vals[0]))
    decreasing_var_ok = all(
        variances[i] >= variances[i + 1] - tol * scale for i in range(len(variances) - 1)
    ) and all(
        abs(variances[i] - vals[i]) < max(tol, tol * scale) for i in range(k)
    )
    centered_ok = all(abs(r["m"]) < max(tol, tol * scale) for r in stats)
    dropped_mass = float(np.sum(all_vals[k:]))
    # Σ E[v_c²] over components, from the same collected stats — no
    # second evaluation of the projection
    kept_mass = sum(r["var"] + r["m"] * r["m"] for r in stats)
    full_mass = float(np.sum(all_vals))
    reconstruction_ok = abs((full_mass - kept_mass) - dropped_mass) < max(
        tol, tol * scale
    )
    n_vecs = stats[0]["n"] if stats else 0
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                int(n_vecs),
                orthonormal_ok,
                decreasing_var_ok,
                centered_ok,
                reconstruction_ok,
            )
        ],
        "n_vecs long, orthonormal_ok boolean, decreasing_var_ok boolean, "
        "centered_ok boolean, reconstruction_ok boolean",
    )
