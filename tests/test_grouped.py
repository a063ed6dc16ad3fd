"""Grouped analytical operators: closed-form OLS (pure agg) and the
applyInPandas EWMA recursion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_group_ols_recovers_exact_line(spark):
    from lwetl_spark.operators.grouped import group_ols

    # y = 3x + 7 exactly in group a; y = -2x + 1 in group b
    rows = [("a", x, 3 * x + 7) for x in range(10)] + [
        ("b", x, -2 * x + 1) for x in range(10)
    ]
    df = spark.createDataFrame(rows, "g STRING, x LONG, y LONG")
    got = {r.g: (r.n, r.slope, r.intercept) for r in group_ols(df, "g", "x", "y").collect()}
    assert got["a"] == (10, 3.0, 7.0)
    assert got["b"] == (10, -2.0, 1.0)


def test_group_ols_floors_float_inputs(spark):
    from lwetl_spark.operators.grouped import group_ols

    df = spark.createDataFrame(
        [("a", 1.9, 3.2), ("a", 2.7, 5.9), ("a", 3.1, 7.99)],
        "g STRING, x DOUBLE, y DOUBLE",
    )
    # floors to (1,3),(2,5),(3,7): y = 2x + 1
    got = group_ols(df, "g", "x", "y").collect()[0]
    assert (got.slope, got.intercept) == (2.0, 1.0)


def test_grouped_ewma_recursion_and_order(spark):
    from lwetl_spark.operators.grouped import grouped_ewma

    rows = [
        ("u1", 3, 5.0),
        ("u1", 1, 1.0),
        ("u1", 2, 3.0),
        ("u2", 1, 10.0),
    ]
    df = spark.createDataFrame(rows, "u STRING, seq LONG, v DOUBLE")
    got = {
        (r.u, r.seq): r.ewma
        for r in grouped_ewma(df, "u", ["seq"], "v", alpha=0.5).collect()
    }
    # ordered by seq: 1.0 -> .5*3+.5*1=2.0 -> .5*5+.5*2=3.5
    assert got[("u1", 1)] == 1.0
    assert got[("u1", 2)] == 2.0
    assert got[("u1", 3)] == 3.5
    assert got[("u2", 1)] == 10.0


def test_grouped_ewma_alpha(spark):
    from lwetl_spark.operators.grouped import grouped_ewma

    df = spark.createDataFrame([("u", 1, 0.0), ("u", 2, 1.0)], "u STRING, seq LONG, v DOUBLE")
    got = {r.seq: r.ewma for r in grouped_ewma(df, "u", ["seq"], "v", alpha=0.25).collect()}
    assert got[1] == 0.0 and got[2] == 0.25


def test_group_corr_perfect_and_inverse(spark):
    from lwetl_spark.operators.grouped import group_corr

    rows = [("a", x, 2 * x + 1) for x in range(10)] + [
        ("b", x, 30 - 3 * x) for x in range(10)
    ]
    df = spark.createDataFrame(rows, "g STRING, x LONG, y LONG")
    got = {r.g: (r.n, r.corr) for r in group_corr(df, "g", "x", "y").collect()}
    assert got["a"] == (10, 1.0)
    assert got["b"] == (10, -1.0)


def test_group_corr_bounded(spark, sf_smoke_dir="/root/testdata/sf0.001"):
    from lwetl_spark.catalog import load_table
    from lwetl_spark.operators.grouped import group_corr

    li = load_table(spark, sf_smoke_dir, "lineitem")
    for r in group_corr(li, "l_returnflag", "l_quantity", "l_extendedprice").collect():
        assert -1.0 <= r.corr <= 1.0


def test_pagerank_mass_and_node_count(spark):
    from lwetl_spark.operators.graph import pagerank

    # star: a -> b, a -> c, b -> a  (c dangling: leaks mass)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a")], "src STRING, dst STRING"
    )
    out = {r.node: r.rank for r in pagerank(edges, iterations=5).collect()}
    assert set(out) == {"a", "b", "c"}
    assert all(v > 0 for v in out.values())
    assert sum(out.values()) <= 1.0 + 1e-6  # dangling c leaks, never gains
    assert out["a"] > out["c"]  # a has in-links from b; c only from a's split


def test_drift_chi2_identical_batches_zero(spark):
    from lwetl_spark.operators.cardinality import drift_chi2

    df = spark.createDataFrame([(float(i % 7),) for i in range(100)], "v DOUBLE")
    out = drift_chi2(df, df, "v", 2.0).collect()
    assert out and all(r.chi2_term == 0.0 for r in out)
    assert all(r.n_ref == r.n_cur for r in out)


def test_pagerank_checkpoint_every_same_values_20_iters(spark):
    """VERDICT r1 #8: checkpoint_every truncates lineage (plan stays
    bounded at 20 iterations) without changing a single rank value."""
    from lwetl_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(a, b) for a in range(12) for b in range(12) if (a * 7 + b) % 5 == 0 and a != b],
        "src long, dst long",
    )
    plain = {r.node: r.rank for r in pagerank(edges, iterations=20).collect()}
    ckpt = {
        r.node: r.rank
        for r in pagerank(edges, iterations=20, checkpoint_every=5).collect()
    }
    assert plain == ckpt
    # the checkpointed plan must not carry the unrolled 20-join lineage:
    # its logical plan string stays well under the unrolled one
    unrolled = pagerank(edges, iterations=20)
    truncated = pagerank(edges, iterations=20, checkpoint_every=5)
    lp_unrolled = len(unrolled._jdf.queryExecution().logical().toString())
    lp_truncated = len(truncated._jdf.queryExecution().logical().toString())
    assert lp_truncated < lp_unrolled / 2, (lp_truncated, lp_unrolled)
