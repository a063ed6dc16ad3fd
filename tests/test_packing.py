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


# ---------------------------------------------------------------- chunking


def _chunk_docs(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(150))),   # 150 toks -> 3 chunks
        (2, " ".join(f"u{i}" for i in range(64))),    # exactly one window
        (3, "single"),                                # 1 token -> 1 short chunk
        (4, " ".join(f"v{i}" for i in range(112))),   # boundary: (112-64)%48==0
        (5, "   "),                                   # empty after trim -> dropped
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_documents_boundaries(spark):
    from lwetl_spark.operators.packing import chunk_documents

    out = chunk_documents(_chunk_docs(spark), chunk_size=64, stride=48)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_tokens))
    for v in by_doc.values():
        v.sort()
    assert by_doc[1] == [(0, 64), (1, 64), (2, 54)]  # 150 = 2*48 + 54
    assert by_doc[2] == [(0, 64)]
    assert by_doc[3] == [(0, 1)]
    assert by_doc[4] == [(0, 64), (1, 64)]  # last window ends exactly at 112
    assert 5 not in by_doc


def test_chunk_documents_cover_every_token(spark):
    from lwetl_spark.functions.text import tokens
    from lwetl_spark.operators.packing import chunk_documents

    df = _chunk_docs(spark)
    out = chunk_documents(df, chunk_size=64, stride=48)
    # stride coverage: chunk i covers [i*48, i*48 + n_tokens); union must be [0, n)
    cover = {}
    for r in out.collect():
        s = r.chunk_idx * 48
        cover.setdefault(r.doc_id, set()).update(range(s, s + r.n_tokens))
    n_by_doc = {
        r.doc_id: r.n
        for r in df.select("doc_id", F.size(tokens("text")).alias("n")).collect()
    }
    for doc, n in n_by_doc.items():
        if n > 0:
            assert cover[doc] == set(range(n)), doc


def test_batch_by_length_bounds_padding_and_size(spark):
    from pyspark.sql import functions as F

    from lwetl_spark.operators.packing import batch_by_length

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + (i * 37) % 200))) for i in range(300)],
        "doc_id LONG, text STRING",
    )
    out = batch_by_length(docs, bucket_width=32, batch_size=8).collect()
    assert len(out) == 300
    by_batch = {}
    for r in out:
        by_batch.setdefault(r.batch_id, []).append(r)
    for batch_id, rows in by_batch.items():
        assert len(rows) <= 8
        lens = [r.n_tokens for r in rows]
        assert max(lens) - min(lens) <= 31  # padding bound: one bucket wide
        assert len({r.bucket for r in rows}) == 1  # batches never span buckets
    # every doc in exactly one batch
    assert sum(len(v) for v in by_batch.values()) == 300
