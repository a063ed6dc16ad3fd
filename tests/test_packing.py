"""Sequence packing: two-phase prefix sum must equal the naive global
window, and offsets must tile the token stream exactly."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from lwetl_spark.operators.packing import pack_sequences


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), (F.pmod(F.col("id") * 37, 90) + 1).alias("n_tokens")
    )


def test_matches_naive_global_window(spark):
    docs = _docs(spark)
    got = {
        r.doc_id: (r.seq_id, r.offset_in_seq)
        for r in pack_sequences(docs, 128, "n_tokens").collect()
    }
    okey = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("pack")))
    w = Window.orderBy("_okey").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = (
        docs.withColumn("_okey", okey)
        .withColumn("strt", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select(
            "doc_id",
            F.floor(F.col("strt") / 128).cast("long").alias("seq_id"),
            (F.col("strt") - F.floor(F.col("strt") / 128).cast("long") * 128).alias(
                "offset_in_seq"
            ),
        )
    )
    want = {r.doc_id: (r.seq_id, r.offset_in_seq) for r in naive.collect()}
    assert got == want


def test_offsets_tile_the_stream(spark):
    docs = _docs(spark, 100)
    out = pack_sequences(docs, 64, "n_tokens").collect()
    total = sum(r.n_tokens for r in out)
    # reconstruct global starts; they must be a permutation of the exact
    # prefix sums (no gaps, no overlaps)
    starts = sorted(r.seq_id * 64 + r.offset_in_seq for r in out)
    lens = [r.n_tokens for r in sorted(out, key=lambda r: r.seq_id * 64 + r.offset_in_seq)]
    acc = 0
    for s, ln in zip(starts, lens):
        assert s == acc
        acc += ln
    assert acc == total
    # every offset lies inside the budget window
    assert all(0 <= r.offset_in_seq < 64 for r in out)


def test_bad_budget_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, 5), 0, "n_tokens")
