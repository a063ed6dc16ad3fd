"""PCA projection: numpy ground-truth parity, whitening, invariance
under repartitioning, and the engine-side verification contract."""

from __future__ import annotations

import numpy as np
import pytest


def _toy(spark, n=80, d=6, seed=7):
    rng = np.random.RandomState(seed)
    # anisotropic cloud: distinct eigenvalues so components are unique
    scales = np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    m = rng.randn(n, d) * scales + np.arange(d)
    df = spark.createDataFrame(
        [(i, m[i].tolist()) for i in range(n)], "vec_id long, embedding array<double>"
    )
    return df, m


def _numpy_pca(m, k):
    mu = m.mean(axis=0)
    c = np.cov(m - mu, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    comps = vecs[:, :k].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] *= -1.0
    return mu, comps, vals


def test_pca_project_matches_numpy(spark):
    from lwetl_spark.operators.projection import pca_project

    df, m = _toy(spark)
    k = 3
    mu, comps, _ = _numpy_pca(m, k)
    expected = (m - mu) @ comps.T
    got = {r["vec_id"]: np.array(r["proj"]) for r in pca_project(df, k=k).collect()}
    for i in range(len(m)):
        assert np.allclose(got[i], expected[i], atol=1e-8), i


def test_pca_whiten_unit_variance(spark):
    from lwetl_spark.operators.projection import pca_project

    df, m = _toy(spark)
    p = np.vstack(
        [np.array(r["proj"]) for r in pca_project(df, k=3, whiten=True).collect()]
    )
    assert np.allclose(p.var(axis=0), 1.0, atol=1e-6)
    assert np.allclose(p.mean(axis=0), 0.0, atol=1e-8)


def test_pca_partitioning_invariance(spark):
    from lwetl_spark.operators.projection import pca_project

    df, _ = _toy(spark)
    a = {r["vec_id"]: tuple(np.round(r["proj"], 9)) for r in pca_project(df, k=2).collect()}
    b = {
        r["vec_id"]: tuple(np.round(r["proj"], 9))
        for r in pca_project(df.repartition(13), k=2).collect()
    }
    assert a == b


def test_pca_contract_all_green(spark):
    from lwetl_spark.operators.projection import pca_contract

    df, _ = _toy(spark)
    r = pca_contract(df, k=4).collect()[0]
    assert r["n_vecs"] == 80
    assert r["orthonormal_ok"] and r["decreasing_var_ok"]
    assert r["centered_ok"] and r["reconstruction_ok"]


def test_winsorize_hand_checked(spark):
    from pyspark.sql import functions as F

    from lwetl_spark.operators.sampling import winsorize

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, v double"
    )
    out = winsorize(df, "v", lo=0.05, hi=0.95).collect()
    assert len(out) == 100  # drop-free
    lo = min(r["_lo"] for r in out)
    hi = max(r["_hi"] for r in out)
    assert lo == 5.0 and hi == 95.0
    clipped = sorted(r["v_w"] for r in out)
    assert clipped[0] == 5.0 and clipped[-1] == 95.0
    # interior untouched
    by_id = {r["id"]: r["v_w"] for r in out}
    assert by_id[50] == 50.0


def test_winsorize_rejects_bad_band(spark):
    from lwetl_spark.operators.sampling import winsorize

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError):
        winsorize(df, "v", lo=0.9, hi=0.1)


def test_batch_score_default_stub_portable(spark):
    import hashlib

    from lwetl_spark.operators.inference import batch_score

    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(20)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["score_ppm"] for r in batch_score(docs).collect()}
    for i in range(20):
        expected = int(hashlib.md5(f"text number {i}".encode()).hexdigest()[:8], 16) % 1_000_000
        assert got[i] == expected


def test_batch_score_custom_scorer_and_rechunk(spark):
    """batch_rows bounds what the scorer sees per call; a custom scorer
    slots in without changing the plumbing."""
    from lwetl_spark.operators.inference import batch_score

    docs = spark.createDataFrame(
        [(i, "x" * (i % 7 + 1)) for i in range(50)], "doc_id long, text string"
    ).coalesce(1)

    def scorer(texts):
        n = len(list(texts))
        assert n <= 8, f"scorer saw a chunk of {n} > batch_rows"
        return [len(t) * 1000 for t in texts]

    got = {r["doc_id"]: r["score_ppm"] for r in
           batch_score(docs, batch_rows=8, scorer=scorer).collect()}
    assert got[3] == 4000 and len(got) == 50


def test_winsorize_null_passthrough(spark):
    """NULL values stay NULL (greatest/least skip nulls — a bare
    composition would clip NULL to the lower band edge)."""
    from lwetl_spark.operators.sampling import winsorize

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 100.0), (4, 50.0)], "id long, v double"
    )
    out = {r["id"]: r["v_w"] for r in winsorize(df, "v", lo=0.25, hi=0.75).collect()}
    assert out[2] is None
    assert out[4] == 50.0


def test_batch_score_null_text_scores_as_empty(spark):
    import hashlib

    from lwetl_spark.operators.inference import batch_score

    docs = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    got = {r["doc_id"]: r["score_ppm"] for r in batch_score(docs).collect()}
    assert got[1] == int(hashlib.md5(b"").hexdigest()[:8], 16) % 1_000_000
