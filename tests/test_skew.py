"""Skew-operator tests: salted forms must produce results identical to
their unsalted equivalents on a deliberately skewed dataset (one hot key
holding most rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture()
def skewed(spark):
    """200k rows; key 0 holds ~70% of them (the hot key)."""
    return spark.range(200_000).select(
        F.when(F.col("id") % 10 < 7, F.lit(0)).otherwise((F.col("id") % 97).cast("long")).alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )


@pytest.fixture()
def dim(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("k_name")
    )


def test_salted_join_matches_plain(spark, skewed, dim):
    from lwetl_spark.operators.skew import salted_join

    plain = skewed.join(dim, "k").groupBy("k_name").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(skewed, dim, "k", salt=8).groupBy("k_name").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    p = {r["k_name"]: (r["n"], round(r["s"], 2)) for r in plain.collect()}
    s = {r["k_name"]: (r["n"], round(r["s"], 2)) for r in salted.collect()}
    assert p == s


def test_salted_join_left(spark, skewed, dim):
    from lwetl_spark.operators.skew import salted_join

    missing_dim = dim.filter(F.col("k") < 50)  # some keys unmatched
    plain_n = skewed.join(missing_dim, "k", "left").filter(F.col("k_name").isNull()).count()
    salted_n = (
        salted_join(skewed, missing_dim, "k", how="left", salt=8)
        .filter(F.col("k_name").isNull())
        .count()
    )
    assert plain_n == salted_n > 0


def test_salted_topk_matches_plain(spark, skewed):
    from lwetl_spark.operators.skew import salted_topk_per_group

    w = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("row_id").asc())
    plain = (
        skewed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("k", "row_id", "rank")
    )
    salted = salted_topk_per_group(
        skewed, group_col="k", order_col="v", k=5, tiebreak_col="row_id", salt=8
    ).select("k", "row_id", "rank")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


# ---------------------------------------------------------------------------
# deterministic sampling / mixing
# ---------------------------------------------------------------------------


def test_split_disjoint_exhaustive_stable(spark):
    from pyspark.sql import functions as F

    from lwetl_spark.operators.sampling import split_by_key

    df = spark.range(10_000).select(F.col("id").alias("k"))
    train, hold = split_by_key(df, "k", holdout_fraction=0.2)
    n_t, n_h = train.count(), hold.count()
    assert n_t + n_h == 10_000
    assert abs(n_h / 10_000 - 0.2) < 0.02
    # stability: a grown corpus keeps every old assignment
    train2, _ = split_by_key(spark.range(20_000).select(F.col("id").alias("k")), "k", 0.2)
    old_train = {r["k"] for r in train.collect()}
    new_train = {r["k"] for r in train2.filter("k < 10000").collect()}
    assert old_train == new_train


def test_mix_corpora_proportions(spark):
    from pyspark.sql import functions as F

    from lwetl_spark.operators.sampling import mix_corpora

    a = spark.range(20_000).select(F.col("id").alias("k"), F.lit("A").alias("payload"))
    b = spark.range(20_000, 40_000).select(F.col("id").alias("k"), F.lit("B").alias("payload"))
    mixed = mix_corpora({"web": (a, 0.5), "books": (b, 0.1)}, key_col="k")
    counts = {r["source_name"]: r["n"] for r in mixed.groupBy("source_name").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["web"] / 20_000 - 0.5) < 0.03
    assert abs(counts["books"] / 20_000 - 0.1) < 0.02


def test_salted_join_rejects_right_full(spark, skewed, dim):
    import pytest as _pytest

    from lwetl_spark.operators.skew import salted_join

    for how in ("right", "full", "full_outer"):
        with _pytest.raises(ValueError):
            salted_join(skewed, dim, "k", how=how)


def test_percentile_filter_keeps_top_fraction(spark):
    import pytest

    from lwetl_spark.operators.sampling import percentile_filter
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "g1" if i < 100 else "g2", i % 100) for i in range(200)],
        ["id", "g", "v"],
    )
    out = percentile_filter(df, "v", group_col="g", keep_frac=0.3)
    rows = out.collect()
    # threshold is an actual data value; everything kept is >= it
    assert all(r.v >= r._thr for r in rows)
    # ties can only inflate the kept fraction, never shrink it
    for g in ("g1", "g2"):
        kept = sum(1 for r in rows if r.g == g)
        assert kept >= 30
    # ungrouped form
    allv = percentile_filter(df, "v", keep_frac=0.5).collect()
    assert all(r.v >= r._thr for r in allv)
    with pytest.raises(ValueError):
        percentile_filter(df, "v", keep_frac=0.0)


def test_skew_profile_flags_hot_key(spark, skewed):
    from lwetl_spark.operators.cardinality import skew_profile

    rows = skew_profile(skewed, "k", top_n=5).collect()
    assert len(rows) == 5
    top = rows[0]
    assert top["k"] == 0  # the hot key surfaces first
    # key 0 holds ~70% of 200k rows over ~97 distinct keys -> far above mean
    assert top["skew_x100"] > 100 * 10
    assert top["suggested_salt"] >= 10
    # every non-hot key is near mean load: salt suggestion stays small
    assert all(r["suggested_salt"] <= 2 for r in rows[1:])
    # counts descend and arithmetic is self-consistent
    assert [r["cnt"] for r in rows] == sorted((r["cnt"] for r in rows), reverse=True)


def test_skew_profile_rejects_bad_topn(spark, skewed):
    from lwetl_spark.operators.cardinality import skew_profile

    with pytest.raises(ValueError):
        skew_profile(skewed, "k", top_n=0)


def test_shard_assignment_deterministic_and_partition_invariant(spark):
    from lwetl_spark.operators.sampling import shard_by_key

    df = spark.range(5_000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["shard"] for r in shard_by_key(df, "doc_id", 16).collect()}
    b = {
        r["doc_id"]: r["shard"]
        for r in shard_by_key(df.repartition(13), "doc_id", 16).collect()
    }
    assert a == b  # partitioning never changes an assignment
    assert set(a.values()) == set(range(16))
    with pytest.raises(ValueError):
        shard_by_key(df, "doc_id", 0)


def test_write_training_shards_roundtrip(spark, tmp_path):
    from lwetl_spark.operators.sampling import shard_by_key, write_training_shards

    df = spark.range(2_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    )
    out = str(tmp_path / "shards")
    write_training_shards(df, out, "doc_id", 8)
    back = spark.read.parquet(out)
    # every row lands in exactly its deterministic shard
    expect = shard_by_key(df, "doc_id", 8)
    assert (
        back.select("doc_id", "v", F.col("shard").cast("int").alias("shard"))
        .exceptAll(expect.select("doc_id", "v", F.col("shard").cast("int")))
        .count()
        == 0
    )
    assert back.count() == 2_000
    # partition pruning: reading one shard dir touches only that data
    one = spark.read.parquet(out).filter(F.col("shard") == 3)
    assert one.count() == expect.filter(F.col("shard") == 3).count()
