"""Sequence packing (training-data pipeline op, NEW — no reference
analog; the nearest reference idea is commit-batch chunking,
lwetl/uploader.py:22-25, which chunks ROWS — this chunks TOKEN BUDGET).

Assigns every document a (seq_id, offset_in_seq) under
concatenate-and-cut semantics: documents are laid end-to-end in a
deterministic hash-shuffled order and the token stream is cut every
`budget` tokens — the standard packing step in front of LLM
pretraining.  A document whose span crosses a cut belongs to the
sequence where it STARTS (its tail spills into the next cut window;
the tokenizer-side splitter consumes offsets, not this op).

Scale design (100 TB): a naive running total is one global
ORDER BY window — a single reducer sees every row.  This implements the
classic two-phase distributed prefix sum instead:

1. bucket by the leading byte of the order key (md5 → buckets are
   ORDERED, uniform ranges of the key space);
2. per-bucket running totals — `buckets`-way parallel windows;
3. per-bucket grand totals (tiny: one row per bucket) get a cumulative
   offset via a window over `buckets` rows on one reducer — trivially
   small — and are broadcast-joined back.

Result is IDENTICAL to the naive global window (the DuckDB oracle runs
the naive form); wall-clock is bounded by the largest bucket, ~1/256 of
the corpus.  Determinism: order key is md5(id ‖ salt) — reproducible
across runs, partitionings, and engines, and doubles as the shuffle
that decorrelates adjacent documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_tokens: Column | str,
    id_col: str = "doc_id",
    salt: str = "pack",
    buckets: int = 256,
    cache_input: bool = False,
) -> DataFrame:
    """Adds (seq_id, offset_in_seq) to `df` — see module docstring.

    `n_tokens` is a column (or name) holding the document's token count;
    `buckets` bounds per-reducer work at corpus_tokens / buckets.

    The plan references `df` in multiple branches (per-bucket windows,
    bucket totals, offset re-join).  Catalyst cannot share the upstream
    between them: column pruning gives each branch a different subtree,
    so canonical exchange reuse never fires, and a lazy persist() races —
    sibling stages of one job launch concurrently and BOTH compute the
    upstream before either fills the cache (measured).  `cache_input=True`
    therefore EAGERLY materializes the (id, n_tokens, okey) projection
    via localCheckpoint — one upstream pass, which is exactly the point
    where a 100 TB campaign would write its curated doc list to storage
    (measured on x_curation_pipeline at sf0.1: ~9.5s → ~5.5s)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n = F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens
    okey = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    staged = df.withColumn("_n", n.cast("long")).withColumn("_okey", okey)
    if cache_input:
        staged = staged.localCheckpoint(eager=True)
    # leading-byte bucket: ordered, uniform ranges of the md5 key space
    staged = staged.withColumn(
        "_bucket", F.conv(F.substring("_okey", 1, 2), 16, 10).cast("int") % buckets
    )
    w_local = (
        Window.partitionBy("_bucket")
        .orderBy("_okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = staged.withColumn("_local_end", F.sum("_n").over(w_local))
    # bucket totals come from the WINDOWED plan (max running sum), not an
    # independent agg over the input: both consumers then share one
    # identical Exchange(_bucket) and Catalyst emits a ReusedExchange —
    # the upstream (possibly a whole curation pipeline) is computed once,
    # where an independent groupBy branch would race the cache and
    # recompute it (measured: x_curation_pipeline ~9.5s → ~5.5s at sf0.1)
    totals = staged.groupBy("_bucket").agg(F.max("_local_end").alias("_tot"))
    w_prev = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bucket", F.coalesce(F.sum("_tot").over(w_prev), F.lit(0)).alias("_off")
    )
    out = staged.join(F.broadcast(offsets), "_bucket")
    start = F.col("_off") + F.col("_local_end") - F.col("_n")
    return (
        out.withColumn("seq_id", F.floor(start / F.lit(budget)).cast("long"))
        .withColumn("offset_in_seq", start - F.col("seq_id") * budget)
        .drop("_n", "_okey", "_bucket", "_local_end", "_off")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Token-window chunking: split each document's token stream into
    windows of `chunk_size` tokens advancing by `stride` (overlap =
    chunk_size - stride), the standard context-window prep for
    pretraining / RAG ingestion.  (Training-pipeline op, NEW — nearest
    reference analog is row-batch chunking, lwetl/uploader.py:22-25.)

    Chunk i covers tokens [i*stride, i*stride + chunk_size); the last
    chunk may be short; every non-empty document yields >= 1 chunk.
    n_chunks = max(1, ceil((n - chunk_size) / stride) + 1) — integer
    ceil over a double division, engine-exact (the DuckDB oracle
    mirrors it term-for-term).

    Scale design (100 TB): entirely row-local — tokenize once into a
    materialized array column (HOF subtrees embedded in a lambda
    re-evaluate PER ELEMENT), build all chunk slices with one
    transform-over-sequence, posexplode.  Zero shuffle; output rows
    ~= corpus tokens / stride, each carrying a fixed-size hash rather
    than the chunk text, so the explode does not amplify bytes.  The
    chunk_hash (md5 of the space-joined window) is the join key a
    downstream exact-dedup or decontamination pass runs on.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError(f"chunk_size and stride must be positive, got {chunk_size}, {stride}")
    from lwetl_spark.functions.text import tokens

    d = df.select(
        F.col(id_col), tokens(text_col).alias("_t")
    ).filter(F.size("_t") > 0)
    n = F.size("_t")
    n_chunks = F.greatest(
        F.lit(1),
        (F.ceil((n - F.lit(chunk_size)) / F.lit(float(stride))) + 1).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice("_t", i * stride + 1, chunk_size),
    )
    return d.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c")
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("_c").cast("int").alias("n_tokens"),
        F.md5(F.array_join("_c", " ")).alias("chunk_hash"),
    )


def batch_by_length(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 32,
    batch_size: int = 8,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Length-bucketed batching (dynamic batching for inference /
    padded training): group documents of similar token length into
    fixed-size batches so per-batch padding waste is bounded by
    ``bucket_width - 1`` tokens per document.  (Training-pipeline op,
    NEW — no reference analog.)

    Plan shape: bucket = n_tokens div bucket_width (a map-side
    expression), then ONE hash exchange on the bucket and a per-bucket
    `row_number` ordered by (n_tokens, id) — batches are
    `row_number div batch_size` within the bucket.  Batching is thus
    embarrassingly parallel ACROSS buckets; a GLOBAL length-sorted
    row_number (the single-reducer formulation) would funnel the whole
    corpus through one task for strictly less useful semantics —
    batches never span buckets anyway by design.

    Skew note (100 TB): natural-language length histograms concentrate
    mass in few buckets; per-bucket windows sort only each bucket's
    rows, and a hot bucket can be split by salting the bucket id with
    `pmod(hash(id), s)` — each salt shard then batches independently
    (batch ids stay unique via the shard term).  Returns (id, n_tokens,
    bucket, batch_id) with batch_id unique across buckets.

    ``n_tokens_col``: pass a PRECOMPUTED count column to skip
    tokenization (pipelines that already counted upstream — avoids a
    second pass over the text); every input column is then carried
    through to the output.
    """
    if n_tokens_col is None:
        from lwetl_spark.functions.text import token_count

        d = df.select(
            F.col(id_col), token_count(text_col).cast("int").alias("n_tokens")
        )
        n_tokens_col = "n_tokens"
    else:
        d = df
    d = d.withColumn("bucket", (F.col(n_tokens_col) / bucket_width).cast("int"))
    w = Window.partitionBy("bucket").orderBy(n_tokens_col, id_col)
    return d.select(
        *d.columns,
        (
            F.col("bucket").cast("long") * 1_000_000
            + ((F.row_number().over(w) - 1) / batch_size).cast("long")
        ).alias("batch_id"),
    )
