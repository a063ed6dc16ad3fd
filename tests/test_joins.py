"""Temporal/range join operators (operators/joins.py): semantics vs
pandas.merge_asof and the naive theta join, plus stratified sampling
properties."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _toy_frames(spark):
    # deterministic pseudo-random points: keys 0..3, ts spread with ties
    left = [(i % 4, (i * 37) % 100, i) for i in range(60)]
    right = [(i % 4, (i * 53) % 100, float(i)) for i in range(40)]
    l = spark.createDataFrame(left, "k int, ts int, lid int")
    # dedupe right per (k, ts): asof_join requires unique right keys
    r = (
        spark.createDataFrame(right, "k int, ts int, rv double")
        .groupBy("k", "ts")
        .agg(F.max("rv").alias("rv"))
    )
    return l, r


def test_asof_inner_matches_pandas(spark):
    from lwetl_spark.operators.joins import asof_join

    l, r = _toy_frames(spark)
    got = (
        asof_join(l, r, on="k", left_ts="ts", right_ts="ts", how="inner")
        .toPandas()
        .sort_values(["k", "ts", "lid"])
        .reset_index(drop=True)
    )
    lp = l.toPandas().sort_values("ts").reset_index(drop=True)
    rp = r.toPandas().sort_values("ts").reset_index(drop=True)
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    exp = exp.dropna(subset=["rv"]).sort_values(["k", "ts", "lid"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["lid"].values == exp["lid"].values).all()
    assert (got["rv"].values == exp["rv"].values).all()


def test_asof_left_keeps_unmatched_and_ties_match(spark):
    from lwetl_spark.operators.joins import asof_join

    l = spark.createDataFrame([(1, 5, "a"), (1, 10, "b"), (1, 2, "c")], "k int, ts int, tag string")
    r = spark.createDataFrame([(1, 5, 100.0), (1, 8, 200.0)], "k int, ts int, v double")
    out = {
        row["tag"]: (row["ts_r"], row["v"])
        for row in asof_join(l, r, on="k", how="left").collect()
    }
    assert out["c"] == (None, None)  # before any right row
    assert out["a"] == (5, 100.0)  # tie at equal ts matches
    assert out["b"] == (8, 200.0)  # most recent, not first


def test_asof_tolerance(spark):
    from lwetl_spark.operators.joins import asof_join

    l = spark.createDataFrame([(1, 100, "near"), (1, 500, "far")], "k int, ts int, tag string")
    r = spark.createDataFrame([(1, 90, 1.0)], "k int, ts int, v double")
    got = asof_join(l, r, on="k", how="inner", tolerance_seconds=50)
    assert [row["tag"] for row in got.collect()] == ["near"]


def test_range_join_banded_equals_naive(spark):
    from lwetl_spark.operators.joins import range_join_banded

    pts = spark.createDataFrame([(float(i),) for i in range(0, 120)], "p double")
    iv = spark.createDataFrame(
        [(i, i * 7.0, i * 7.0 + 11.0) for i in range(15)], "iid int, lo double, hi double"
    )
    for band in (3.0, 11.0, 40.0):  # band width shouldn't change the result
        got = sorted(
            (r["p"], r["iid"])
            for r in range_join_banded(pts, iv, "p", "lo", "hi", band_width=band).collect()
        )
        naive = sorted(
            (r["p"], r["iid"])
            for r in pts.crossJoin(iv)
            .filter((F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
            .collect()
        )
        assert got == naive and len(got) > 0


def test_stratified_sample_nested_and_exact(spark):
    from lwetl_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(3000)], "id long, grp string"
    )
    lo = stratified_sample(df, "id", "grp", {"s0": 0.2, "s1": 0.5}, 0.0, salt="t")
    hi = stratified_sample(df, "id", "grp", {"s0": 0.4, "s1": 0.5}, 0.1, salt="t")
    lo_ids = {r["id"] for r in lo.collect()}
    hi_ids = {r["id"] for r in hi.collect()}
    assert lo_ids < hi_ids  # raising rates only adds rows (nested samples)
    # per-stratum rates land near target (hash uniformity, 1000/stratum)
    counts = {g: 0 for g in ("s0", "s1", "s2")}
    for r in hi.collect():
        counts[r["grp"]] += 1
    assert abs(counts["s0"] / 1000 - 0.4) < 0.06
    assert abs(counts["s1"] / 1000 - 0.5) < 0.06
    assert abs(counts["s2"] / 1000 - 0.1) < 0.06
    # default stratum s2 absent at default_fraction=0
    assert all(not g.startswith("s2") for g in {r["grp"] for r in lo.collect()})


def test_interval_overlap_join_equals_naive(spark):
    from lwetl_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [(i, i * 5.0, i * 5.0 + 8.0) for i in range(30)], "aid int, alo double, ahi double"
    )
    b = spark.createDataFrame(
        [(j, j * 11.0, j * 11.0 + 30.0) for j in range(12)], "bid int, blo double, bhi double"
    )
    for band in (4.0, 10.0, 50.0):  # result must be band-width invariant
        got = sorted(
            (r["aid"], r["bid"])
            for r in interval_overlap_join(
                a, b, "alo", "ahi", "blo", "bhi", band_width=band
            ).collect()
        )
        naive = sorted(
            (r["aid"], r["bid"])
            for r in a.crossJoin(b)
            .filter((F.col("alo") < F.col("bhi")) & (F.col("blo") < F.col("ahi")))
            .collect()
        )
        assert got == naive and len(got) > 0
        assert len(got) == len(set(got))  # exactly once per pair, no dup bands


def test_asof_property_random_frames(spark):
    """Randomized as-of property check against a brute-force reference
    (seeded variants rather than hypothesis — one Spark round-trip per
    generated example would be prohibitively slow)."""
    import random

    for seed in (7, 23, 99, 123, 2024):
        rng = random.Random(seed)
        nl, nr = rng.randint(1, 80), rng.randint(0, 60)
        left = [(rng.randint(0, 5), rng.randint(0, 200), i) for i in range(nl)]
        right = {(k, t): float(rng.randint(0, 9)) for k, t in
                 ((rng.randint(0, 5), rng.randint(0, 200)) for _ in range(nr))}
        from lwetl_spark.operators.joins import asof_join

        l = spark.createDataFrame(left, "k int, ts int, lid int")
        r = (
            spark.createDataFrame(
                [(k, t, v) for (k, t), v in right.items()] or [(0, -1, 0.0)],
                "k int, ts int, rv double",
            )
        )
        got = {
            (row["k"], row["lid"]): (row["ts_r"], row["rv"])
            for row in asof_join(l, r, on="k", how="left").collect()
        }
        # reference: per left row, max right ts <= left ts within key
        for k, ts, lid in left:
            cands = [(t, v) for (rk, t), v in right.items() if rk == k and t <= ts]
            exp = max(cands) if cands else (None, None)
            assert got[(k, lid)] == exp, (seed, k, ts, lid, got[(k, lid)], exp)


def test_asof_tolerance_date_ordered(spark):
    """ADVICE r1: DATE-typed order columns must dispatch through datediff
    (day gap x 86400s), not a double cast Spark 4.1 rejects."""
    import datetime as dt

    from lwetl_spark.operators.joins import asof_join

    l = spark.createDataFrame(
        [(1, dt.date(2024, 1, 10), "near"), (1, dt.date(2024, 3, 1), "far")],
        "k int, ts date, tag string",
    )
    r = spark.createDataFrame([(1, dt.date(2024, 1, 8), 1.0)], "k int, ts date, v double")
    got = asof_join(
        l, r, on="k", how="inner", tolerance_seconds=5 * 86400
    )
    assert [row["tag"] for row in got.collect()] == ["near"]
