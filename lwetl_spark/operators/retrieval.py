"""Lexical retrieval: inverted-index statistics + BM25 top-k ranking
(NEW — no reference analog; lwetl's nearest surface is parameterized
SELECT, `/root/reference/lwetl/jdbc.py:520-585`.  This is the lexical
complement to the embedding ANN family: a training-data pipeline needs
BOTH "find documents like this vector" and "find documents matching
these terms" — e.g. decontamination probes, targeted corpus slicing,
retrieval-augmented eval-set construction).

Scoring is Okapi BM25 with k1=1.2, b=0.75, re-expressed in exact
integer arithmetic so every engine reproduces the ranking bit-for-bit
(the same portability rule as x_tfidf / x_dsir_weights: `ln` and float
division are not hash-stable across engines; integer rationals are):

- tf component  tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with avgdl kept
  as the per-mille integer `adl_m = 1000·Σdl div N`, multiplied out to
  the integer rational  22·tf·adl_m / (10·tf·adl_m + 3·adl_m + 9000·dl)
  and floored at 1e6 scale (`tfc_ppm`, ≤ 2.2e6 = k1+1);
- idf component: the Robertson ratio (N−df+0.5)/(df+0.5) kept rational
  as (2N−2df+1)/(2df+1), floored at 1e3 scale (`idf_mil`) — a monotone
  proxy for the log form (ranking within a term is identical; weighting
  across terms favors rarer terms more sharply than log, which is the
  desirable direction for probe-style retrieval);
- term score = tfc_ppm · idf_mil div 1000  (1e6 scale), summed per
  (query, doc).

Overflow budget (all BIGINT): tfc numerator 1e6·22·tf·adl_m needs
tf·avgdl < 4e11 — satisfied by any real corpus (tf ≤ 1e4, avgdl ≤ 1e4);
the idf·tfc product needs N ≤ ~2e9 docs at these scales — beyond that,
drop `idf_scale` to 100 (sizing rule, same spirit as SCALE.md's
LSH-planes rule).

Scale design (100 TB): document text is tokenized map-side and never
shuffles — the only wide stages carry (tok, doc_id, tf) postings and
(tok, df) vocabulary rows.  The query set is tiny and broadcast.  Top-k
per query is two-phase (salted partial top-k, then final top-k) because
"per query" is a few-groups window — a single-pass window over
query_id alone would funnel every matching posting through one task per
query at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lwetl_spark.operators import _parallel as _pl
from lwetl_spark.operators import _partwrite as _pw
from lwetl_spark.operators._fsutil import path_exists as _path_exists

#: tokenizer shared with x_tfidf / x_corpus_pipeline (split on runs of
#: whitespace, drop empties) — keep in lockstep with the DuckDB oracle.
_TOKENIZE = r"filter(split(lower(trim({col})), '\\s+'), x -> x <> '')"


def _index_sidecar_schemas(id_type):
    """Pinned schemas for the text-index sidecar tables (r12, guide §6 /
    VERDICT r11 #4+#6): every ``spark.read.parquet`` without a schema
    pays a footer-inference job, and the probe/maintenance passes read
    up to four index tables per call.  All sidecar schemas are fully
    determined by the corpus id type, which the caller takes from ONE
    inference read of the postings table (that read also discovers the
    sticky positional flag) or from its own input frame.  ``bucket``
    on the df table is the hive partition column (directory-encoded,
    parsed per the pinned int — matching what inference yields)."""
    from pyspark.sql import types as T

    return {
        "df": T.StructType([
            T.StructField("tok", T.StringType()),
            T.StructField("df", T.LongType()),
            T.StructField("bucket", T.IntegerType()),
        ]),
        "doclen": T.StructType([
            T.StructField("doc_id", id_type),
            T.StructField("dl", T.LongType()),
        ]),
        "stats": T.StructType([
            T.StructField("n", T.LongType()),
            T.StructField("adl_m", T.LongType()),
        ]),
        "docbuckets": T.StructType([
            T.StructField("doc_id", id_type),
            T.StructField("bucket", T.LongType()),
        ]),
    }


def doc_term_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    positions: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Tokenize once, return the three inverted-index statistics tables:

    - `tf`: (doc_id, tok, tf) term frequencies — plus a sorted
      `positions array<int>` column (0-based token offsets) when
      ``positions=True`` (the phrase-query posting shape, VERDICT r6
      #3);
    - `dl`: (doc_id, dl) document lengths in tokens,
    - `stats`: single row (n BIGINT, adl_m BIGINT) — corpus size and
      per-mille average document length.

    One (pos)explode + two keyed aggs; the explode output carries only
    (doc_id, tok[, pos]).  Positional postings cost ~dl ints per doc of
    extra index bytes and change NOTHING about tf/df/dl values, so BM25
    scoring over a positional index is bit-identical to a flat one.
    """
    if positions:
        tok = docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.expr(_TOKENIZE.format(col=text_col))).alias(
                "pos", "tok"
            ),
        )
        tf = tok.groupBy("doc_id", "tok").agg(
            F.count("*").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    else:
        tok = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.expr(_TOKENIZE.format(col=text_col))).alias("tok"),
        )
        tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n"),
        F.expr("1000 * sum(dl) div count(*)").alias("adl_m"),
    )
    return tf, dl, stats


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k: int = 10,
    salt_buckets: int = 64,
    idf_scale: int = 1000,
) -> DataFrame:
    """Top-k documents per query under integer-rational BM25.

    `queries` is one (query_id, term) row per query term (pre-exploded —
    callers with array-typed queries explode first).  Returns
    (query_id, doc_id, score_ppm, n_terms, rnk) with rnk in 1..k,
    ordered ties broken by doc_id so the cut is deterministic.

    Plan shape: postings ⨝ broadcast(query terms) → per-(query,doc) sum
    → salted partial top-k → final top-k.  The posting⨝query join drops
    every non-query term before any wide exchange, so the per-query agg
    is bounded by the postings of |q| terms, not the corpus.
    """
    tf, dl, stats = doc_term_stats(docs, id_col=id_col, text_col=text_col)
    q = _compact_queries(queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.col(term_col).alias("tok"),
    ))
    return _bm25_from_stats(
        tf, dl, stats, q, k=k, salt_buckets=salt_buckets, idf_scale=idf_scale
    )


def _compact_queries(q: DataFrame) -> DataFrame:
    """Land a query batch on ONE partition (r12, guide §1.1 census
    finding): query sets are bounded by contract (every consumer
    broadcasts them), but a tiny ``createDataFrame`` arrives on
    defaultParallelism partitions, and every probe-side collect /
    broadcast-build job then re-executes its plan and pays one task
    PER PARTITION — measured 0.4-0.9 s of pure scheduling per job at
    local[32] for 7-row query frames (the reason probe rows ran FASTER
    at 8 cores than 32 in BENCH_r11_c8).  One bounded collect (the
    driver-side convention phrase_topk's tokenizer established) +
    re-parallelize onto one slice fixes every downstream job at once.

    NOT ``coalesce(1)``: SQL coalesce over a parallelized local
    collection iterates its 32 parents sequentially through the
    Python-runner boundary — measured a near-constant ~5 s per action
    (interleaved best-of-7: coalesce1 4.80 s, raw 0.40 s, this 0.23 s).
    Identity when the frame is already narrow or the partition count
    is unknowable (Connect)."""
    try:
        if q.rdd.getNumPartitions() <= 4:
            return q
    except Exception:
        return q
    spark = q.sparkSession
    rows = q.collect()  # bounded: the query batch, never the corpus
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), q.schema
    )


def _bm25_from_stats(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    q: DataFrame,
    df_table: DataFrame | None = None,
    k: int = 10,
    salt_buckets: int = 64,
    idf_scale: int = 1000,
) -> DataFrame:
    """Shared scoring path for the inline and persisted-index forms.

    Postings prune to the broadcast query terms FIRST, so the df agg
    (when not precomputed) and everything downstream run over |q|
    terms' postings, not the whole vocabulary.  df comes from tf (one
    row per (doc, tok)) pruned by DISTINCT query terms — pruning via
    the matched (per-query) join would double-count docs for a term
    shared by two queries.
    """
    matched = tf.join(F.broadcast(q), "tok")
    if df_table is None:
        df_table = (
            tf.join(F.broadcast(q.select("tok").distinct()), "tok")
            .groupBy("tok")
            .agg(F.count("*").alias("df"))
        )
    scored = (
        matched.join(F.broadcast(df_table), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                "(1000000 * 22 * tf * adl_m"
                " div (10 * tf * adl_m + 3 * adl_m + 9000 * dl))"
                f" * ({idf_scale} * (2 * n - 2 * df + 1) div (2 * df + 1))"
                f" div {idf_scale}"
            ).alias("term_score"),
        )
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score_ppm"),
        F.count("*").alias("n_terms"),
    )
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    w_partial = Window.partitionBy("query_id", "_salt").orderBy(
        F.desc("score_ppm"), F.asc("doc_id")
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("score_ppm"), F.asc("doc_id")
    )
    return (
        per_doc.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w_partial))
        .filter(F.col("_rn") <= k)
        .drop("_salt", "_rn")
        .withColumn("rnk", F.row_number().over(w_final))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("long"))
    )


#: tok-hash directory fan-out for the persisted postings table — probes
#: prune to the buckets their terms hash into, so a query touches
#: |q| / 256 of the index files regardless of corpus size.
_INDEX_BUCKETS = 256


def build_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    positions: bool = False,
) -> None:
    """Persist the inverted-index statistics as a probe-many on-disk
    index: `postings/` (tok, doc_id, tf — hive-partitioned by the
    256-way tok hash bucket), `doclen/` (doc_id, dl), `df/` (tok, df —
    same bucketing), `stats/` (n, adl_m).

    Build once, probe many — the BM25 analog of build_lsh_index.
    Partitioning postings AND df by the tok-hash bucket means a probe
    reads only the directories its terms fall in (partition pruning at
    the file listing, before any I/O); df is precomputed corpus-wide at
    build time so probe-time scoring never aggregates the vocabulary.

    ``positions=True`` (VERDICT r6 #3) stores each posting's sorted
    token-offset array alongside tf, enabling `phrase_topk` (exact
    phrase / adjacency queries).  The flag is sticky: maintenance
    passes (update/compact/remove) detect it from the persisted
    postings schema and preserve it, so positional parity survives the
    whole lifecycle.  Index size grows by one int per corpus TOKEN
    (~dl ints/doc) — BM25 probes still read only (tok, doc_id, tf) via
    parquet column pruning, so scoring cost is unchanged.
    """
    tf, _, _ = doc_term_stats(
        docs, id_col=id_col, text_col=text_col, positions=positions
    )
    bucket = F.pmod(F.xxhash64("tok"), F.lit(_INDEX_BUCKETS)).alias("bucket")
    tf.withColumn("bucket", bucket).repartition("bucket").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(f"{path}/postings")
    # r12 (guide §1.2: don't recompute what you already materialized):
    # df/doclen/stats/docbuckets previously each re-derived from the
    # UN-materialized `tf` — FIVE full corpus tokenize+agg passes per
    # build (at 100 TB: five passes over the corpus text).  The written
    # postings table IS the materialization of the one tokenize pass,
    # so every sidecar now derives from reading it back — column-pruned
    # (tok/doc_id/tf only, never the positions arrays) and
    # index-sized, not corpus-text-sized.  Values are identical:
    # df = rows per tok, dl = Σ tf per doc (the token count — the same
    # identity update_text_index has always relied on), stats from dl.
    spark = docs.sparkSession
    post_schema = tf.schema.add("bucket", "integer")
    post = (
        spark.read.schema(post_schema).parquet(f"{path}/postings")
        .select("tok", "doc_id", "tf", "bucket")
    )
    # r12 (guide §2.6): the three sidecar legs below all derive from
    # `post` (the just-written postings, never re-written here) and
    # write disjoint subdirs — they run as concurrent job groups.
    def _df_leg():
        df_table = post.groupBy("tok").agg(F.count("*").alias("df"))
        df_table.withColumn("bucket", bucket).repartition(
            "bucket"
        ).write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/df")

    def _doclen_stats_leg():
        dl = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        dl.write.mode("overwrite").parquet(f"{path}/doclen")
        dl_read = spark.read.schema(
            _index_sidecar_schemas(post_schema["doc_id"].dataType)["doclen"]
        ).parquet(f"{path}/doclen")
        stats = dl_read.agg(
            F.count("*").alias("n"),
            F.expr("1000 * sum(dl) div count(*)").alias("adl_m"),
        )
        stats.write.mode("overwrite").parquet(f"{path}/stats")

    # doc→bucket sidecar (r6): which hash buckets hold each document's
    # postings — lets compaction/removal LOCATE a doc's old rows by
    # reading only its buckets instead of one full postings scan (the
    # term-partitioned index's classic maintenance trade, removed).
    # Size: ≤ min(distinct tokens, 256) rows of two longs per doc —
    # corpus-doc-count-scaled metadata, not postings-scaled.  The
    # bucket comes back as the partition-directory int; cast to long
    # to match the (pmod) type update_text_index appends.
    def _db_leg():
        post.select(
            "doc_id", F.col("bucket").cast("long").alias("bucket")
        ).distinct().write.mode("overwrite").parquet(f"{path}/docbuckets")

    _pl.overlap_all(_df_leg, _doclen_stats_leg, _db_leg)


def query_text_index(
    spark,
    path: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    term_col: str = "term",
    k: int = 10,
    salt_buckets: int = 64,
    idf_scale: int = 1000,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Probe a persisted text index: identical output contract to
    `bm25_topk` over the same corpus (pinned by
    x_bm25_index_roundtrip).  The probe filters postings/df on the
    query terms' hash buckets — Catalyst turns the IN-list on the
    partition column into partition pruning, so only |q| of the 256
    bucket directories are ever listed or read.

    ``filter_ids`` (r9): metadata-filter pushdown — a one-column
    DataFrame of allowed doc ids semi-joined against the postings
    BEFORE scoring/top-k, so each query's k results are the true
    top-k of the filtered set (Lucene/ES filtered-search semantics:
    IDF and length norms stay corpus-level; the filter restricts
    candidates only)."""
    q = _compact_queries(queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.col(term_col).alias("tok"),
    ))
    buckets = [
        r["b"]
        for r in q.select(
            F.pmod(F.xxhash64("tok"), F.lit(_INDEX_BUCKETS)).alias("b")
        )
        .distinct()
        .collect()
    ]
    # explicit projection: a positional index carries a positions array
    # per posting — BM25 scoring must keep reading 3 columns (parquet
    # column pruning at the scan), never the offsets
    postings = spark.read.parquet(f"{path}/postings")
    tf = postings.filter(
        F.col("bucket").isin(buckets)
    ).select("tok", "doc_id", "tf")
    if filter_ids is not None:
        from lwetl_spark.operators.similarity import _ann_filter_semi

        tf = _ann_filter_semi(tf, filter_ids, "doc_id")
    # the postings inference read above is the ONLY footer job this
    # probe pays: df/doclen/stats schemas pin from its id type (r12,
    # guide §6 / VERDICT r11 #6 — 4 footer jobs per probe batch → 1)
    _schemas = _index_sidecar_schemas(postings.schema["doc_id"].dataType)
    df_table = spark.read.schema(_schemas["df"]).parquet(f"{path}/df").filter(
        F.col("bucket").isin(buckets)
    ).drop("bucket")
    dl = spark.read.schema(_schemas["doclen"]).parquet(f"{path}/doclen")
    stats = spark.read.schema(_schemas["stats"]).parquet(f"{path}/stats")
    return _bm25_from_stats(
        tf,
        dl,
        stats,
        q,
        df_table=df_table,
        k=k,
        salt_buckets=salt_buckets,
        idf_scale=idf_scale,
    )


def phrase_topk(
    spark,
    path: str,
    phrases: DataFrame,
    query_id_col: str = "query_id",
    phrase_col: str = "phrase",
    k: int = 10,
    salt_buckets: int = 64,
    with_pos: bool = False,
) -> DataFrame:
    """Exact-phrase search over a POSITIONAL text index (VERDICT r6 #3;
    `build_text_index(positions=True)`): for each (query_id, phrase),
    return the top-``k`` documents by phrase occurrence count —
    (query_id, doc_id, n_matches, rnk), ties by doc_id.  A match is
    STRICT TOKEN ADJACENCY: phrase tokens at consecutive offsets of
    the whitespace-normalized document (the same tokenizer the index
    stores), so "exact phrase" re-rank filters — the retrieval-stack
    stage BM25's bag-of-words cannot express — compose directly with
    `query_text_index` candidates.

    Plan shape (the bm25 probe idiom): the phrase set is tiny — it
    tokenizes DRIVER-SIDE (bounded collect) into (query_id, term_pos,
    tok) rows that broadcast onto the postings; the postings scan
    prunes to the |phrase terms| hash-bucket directories; per
    (query, doc) the per-term offset arrays fold JVM-side —
    ``aggregate(arrs[1:], arrs[0].positions, (acc, s) -> filter(acc,
    p -> array_contains(s.positions, p + s.term_pos)))`` — counting
    every start offset where ALL terms sit at their phrase positions
    (overlaps included, repeated terms handled: each term_pos joins
    its own posting row).  Top-k is the salted two-phase window, so a
    stop-wordy phrase never funnels the corpus through one task.

    ``with_pos=True`` appends ``first_pos`` (the smallest match start
    offset, 0-based) — the anchor `phrase_snippets` slices its context
    windows around.
    """
    rows = phrases.select(query_id_col, phrase_col).collect()  # bounded:
    # the query set, never the corpus (the bm25 query-side convention)
    term_rows: list[tuple[int, int, str]] = []
    meta_rows: list[tuple[int, int]] = []
    for r in rows:
        toks = [t for t in str(r[1]).lower().strip().split() if t]
        if not toks:
            continue
        meta_rows.append((int(r[0]), len(toks)))
        term_rows.extend((int(r[0]), i, t) for i, t in enumerate(toks))
    if not term_rows:
        empty_schema = "query_id long, doc_id long, n_matches long, rnk long"
        if with_pos:
            empty_schema += ", first_pos long"
        return spark.createDataFrame([], empty_schema)
    # driver-local rows: create on ONE slice, or the createDataFrame
    # lands on defaultParallelism partitions and every collect /
    # broadcast-build job below pays a task per partition (r12; see
    # _compact_queries for why coalesce(1) is NOT the way)
    q = spark.createDataFrame(
        spark.sparkContext.parallelize(term_rows, 1),
        "query_id long, term_pos int, tok string",
    )
    qmeta = spark.createDataFrame(
        spark.sparkContext.parallelize(meta_rows, 1),
        "query_id long, n_terms int",
    )
    buckets = sorted(
        {
            r["b"]
            for r in q.select(
                F.pmod(F.xxhash64("tok"), F.lit(_INDEX_BUCKETS)).alias("b")
            ).collect()
        }
    )
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(buckets))
        .select("tok", "doc_id", "positions")
    )
    joined = postings.join(F.broadcast(q), "tok")
    g = (
        joined.groupBy("query_id", "doc_id")
        .agg(
            F.count("*").alias("_nf"),
            F.array_sort(F.collect_list(F.struct("term_pos", "positions"))).alias(
                "_arrs"
            ),
        )
        .join(F.broadcast(qmeta), "query_id")
        .filter(F.col("_nf") == F.col("n_terms"))  # every phrase slot found
        .withColumn(
            "_m",  # all match START offsets; count and min derive from it
            F.expr(
                "aggregate("
                " slice(_arrs, 2, size(_arrs) - 1),"
                " _arrs[0].positions,"
                " (acc, s) -> filter(acc,"
                "   p -> array_contains(s.positions, p + s.term_pos))"
                ")"
            ),
        )
        .withColumn("n_matches", F.size("_m").cast("long"))
        .filter(F.col("n_matches") > 0)
        .select(
            "query_id", "doc_id", "n_matches",
            *( [F.array_min("_m").cast("long").alias("first_pos")]
               if with_pos else [] ),
        )
    )
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    w_partial = Window.partitionBy("query_id", "_salt").orderBy(
        F.desc("n_matches"), F.asc("doc_id")
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("n_matches"), F.asc("doc_id")
    )
    return (
        g.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w_partial))
        .filter(F.col("_rn") <= k)
        .drop("_salt", "_rn")
        .withColumn("rnk", F.row_number().over(w_final).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def phrase_snippets(
    spark,
    path: str,
    docs: DataFrame,
    phrases: DataFrame,
    radius: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    phrase_col: str = "phrase",
    k: int = 10,
) -> DataFrame:
    """Snippet extraction — the serving feature on top of phrase
    search: for each phrase hit, the ±``radius``-token context window
    around the FIRST match, as whitespace-normalized text.  Returns
    (query_id, doc_id, n_matches, rnk, first_pos, snippet).

    Plan shape: `phrase_topk(with_pos=True)` finds the hits over the
    positional index (bucket-pruned, corpus untouched); the |q|·k hit
    rows then BROADCAST into one id-keyed join that fetches document
    text (the x_rerank shape — the 100 TB corpus never shuffles for a
    snippet pass), and the window is a pure JVM token slice:
    ``array_join(slice(tokens, start+1, len), ' ')``.  Snippets are
    deterministic functions of (text, first_pos, phrase length,
    radius), so the whole output value-checks against a SQL oracle
    (x_phrase_snippets)."""
    hits = phrase_topk(
        spark, path, phrases,
        query_id_col=query_id_col, phrase_col=phrase_col,
        k=k, with_pos=True,
    )
    plen = [
        (int(r[0]), len([t for t in str(r[1]).lower().strip().split() if t]))
        for r in phrases.select(query_id_col, phrase_col).collect()
    ]
    qlen = spark.createDataFrame(
        spark.sparkContext.parallelize(plen, 1), "query_id long, _plen int"
    )
    toks = F.expr(_TOKENIZE.format(col=text_col))
    corpus = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    joined = corpus.join(
        F.broadcast(hits.join(F.broadcast(qlen), "query_id")), "doc_id"
    )
    start = F.greatest(F.col("first_pos") - radius, F.lit(0))
    cnt = F.col("first_pos") + F.col("_plen") + radius - start
    return joined.select(
        "query_id", "doc_id", "n_matches", "rnk", "first_pos",
        F.array_join(F.slice("_toks", start + 1, cnt), " ").alias("snippet"),
    )


def proximity_topk(
    spark,
    path: str,
    queries: DataFrame,
    window: int = 8,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 10,
    salt_buckets: int = 64,
) -> DataFrame:
    """Proximity (NEAR) search over a POSITIONAL text index: for each
    (query_id, terms) row — ``terms`` a space-separated string, treated
    as a SET (duplicates collapse; order is irrelevant, unlike
    `phrase_topk`) — return the top-``k`` documents whose MINIMAL SPAN
    containing all terms is ≤ ``window`` tokens, ranked by
    (min_span ASC, doc_id): tighter co-occurrence ranks higher, the
    classic relevance signal between bag-of-words BM25 and strict
    phrase adjacency.

    min_span = min over position tuples (one offset per distinct term)
    of (max − min + 1) — the smallest token window covering every
    term.  Computed per candidate (query, doc) with the textbook
    k-pointer sweep over the merged offset lists (O(Σ positions) per
    doc, not O(Π tf) — the naive cross-product blows up on stop-wordy
    terms), inside one Arrow batch pass; candidates reach it only via
    the bucket-pruned postings join, so the corpus never shuffles.

    Exactly SQL-checkable (x_proximity_search pins 2- and 3-term
    queries against DuckDB join-min oracles).
    """
    rows = queries.select(query_id_col, terms_col).collect()  # bounded
    term_rows: list[tuple[int, str]] = []
    meta_rows: list[tuple[int, int]] = []
    for r in rows:
        toks = sorted({t for t in str(r[1]).lower().strip().split() if t})
        if not toks:
            continue
        meta_rows.append((int(r[0]), len(toks)))
        term_rows.extend((int(r[0]), t) for t in toks)
    if not term_rows:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, min_span long, rnk long"
        )
    # driver-local rows: ONE slice (r12, see phrase_topk note)
    q = spark.createDataFrame(
        spark.sparkContext.parallelize(term_rows, 1),
        "query_id long, tok string",
    )
    qmeta = spark.createDataFrame(
        spark.sparkContext.parallelize(meta_rows, 1),
        "query_id long, n_terms int",
    )
    buckets = sorted(
        {
            r["b"]
            for r in q.select(
                F.pmod(F.xxhash64("tok"), F.lit(_INDEX_BUCKETS)).alias("b")
            ).collect()
        }
    )
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(buckets))
        .select("tok", "doc_id", "positions")
    )
    g = (
        postings.join(F.broadcast(q), "tok")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").alias("_nf"),
            F.collect_list("positions").alias("_arrs"),
        )
        .join(F.broadcast(qmeta), "query_id")
        .filter(F.col("_nf") == F.col("n_terms"))  # all terms present
        .select("query_id", "doc_id", "_arrs")
    )

    def min_spans(it):
        import heapq

        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            spans = []
            for arrs in pdf["_arrs"]:
                # k-pointer sweep: merge (pos, list_idx) ascending, keep
                # a count per list in the current window; every time all
                # lists are covered, shrink from the left
                merged = heapq.merge(
                    *[[(int(p), i) for p in lst] for i, lst in enumerate(arrs)]
                )
                merged = list(merged)
                need = len(arrs)
                cnt = [0] * need
                covered = 0
                best = None
                lo = 0
                for hi, (p, li) in enumerate(merged):
                    if cnt[li] == 0:
                        covered += 1
                    cnt[li] += 1
                    while covered == need:
                        span = p - merged[lo][0] + 1
                        if best is None or span < best:
                            best = span
                        llo = merged[lo][1]
                        cnt[llo] -= 1
                        if cnt[llo] == 0:
                            covered -= 1
                        lo += 1
                spans.append(best)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "doc_id": pdf["doc_id"],
                    "min_span": spans,
                }
            )

    spans = g.mapInPandas(
        min_spans, "query_id long, doc_id long, min_span long"
    ).filter(F.col("min_span") <= window)
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    w_partial = Window.partitionBy("query_id", "_salt").orderBy(
        F.asc("min_span"), F.asc("doc_id")
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.asc("min_span"), F.asc("doc_id")
    )
    return (
        spans.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w_partial))
        .filter(F.col("_rn") <= k)
        .drop("_salt", "_rn")
        .withColumn("rnk", F.row_number().over(w_final).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def text_index_stats(spark, path: str) -> DataFrame:
    """Census of a persisted text index — the health/maintenance-trigger
    counterpart of `ivf_index_stats`/`pq_index_stats`: document count,
    vocabulary size, postings volume, average document length (per
    mille, the stored BM25 normalizer), and the heaviest term's document
    frequency (stop-word saturation — when max_df approaches n_docs the
    index wants a blocklist pass).  All exact integers derived from the
    persisted tables with bounded aggs, so a SQL oracle recomputing them
    from the raw corpus must match bit-for-bit (x_text_index_stats)."""
    postings = spark.read.parquet(f"{path}/postings")  # one inference read
    _schemas = _index_sidecar_schemas(postings.schema["doc_id"].dataType)
    dl = spark.read.schema(_schemas["doclen"]).parquet(f"{path}/doclen")
    df_t = spark.read.schema(_schemas["df"]).parquet(f"{path}/df")
    docs = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("1000 * sum(dl) div count(*)").cast("long").alias("adl_m"),
        F.sum("dl").cast("long").alias("n_tokens"),
    )
    vocab = df_t.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.max("df").cast("long").alias("max_df"),
    )
    post = postings.agg(F.count("*").cast("long").alias("n_postings"))
    return (
        docs.crossJoin(vocab)
        .crossJoin(post)
        .select("n_docs", "n_tokens", "adl_m", "n_terms", "max_df", "n_postings")
    )


def hybrid_topk(
    spark,
    text_index_path: str,
    vector_index_path: str,
    term_queries: DataFrame,
    vec_queries: DataFrame,
    k: int = 10,
    k_const: int = 60,
    query_id_col: str = "query_id",
    term_col: str = "term",
    vec_col: str = "embedding",
    nprobe: int = 6,
    rerank: int = 100,
    kind: str | None = None,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Hybrid retrieval over PERSISTED indexes as one operator: BM25
    probe of the text index + ANN probe of the vector index (family
    auto-detected from its layout — ivf/pq/lsh/ivfpq, the
    `auto_maintain` detector), fused by reciprocal rank (`rrf_fuse`).
    This is the production shape of the examples/hybrid_search
    pipeline: build the two indexes once, serve fused top-k per query
    batch without touching the corpus.

    ``term_queries`` carries (query_id, term) rows (the bm25_topk
    convention); ``vec_queries`` carries (query_id, ``vec_col``) — the
    SAME query_id space, which must be DISJOINT from the corpus doc-id
    space (the ANN probes drop id == neighbor_id self-matches; a query
    id colliding with a doc id would silently exclude that doc from
    its own dense list).  Returns rrf_fuse's contract:
    (query_id, doc_id, n_lists, rrf_ppm, rnk), top-``k`` per query.

    Scale shape: both probes are the pruned persisted-index paths
    (|q| of 256 postings buckets; nprobe cell dirs / code buckets);
    the fusion runs over 2·|queries|·k rows.  With ``nprobe`` set to
    the index's num_centroids the IVF leg is EXACT (every cell
    probed), which is what the x_hybrid_search oracle pins.

    ``filter_ids`` (r9): metadata-filter pushdown applied to BOTH legs
    before their top-k windows (see query_text_index /
    _ann_filter_semi) — real retrieval filters by source/lang/date at
    query time, and fusing two post-hoc-filtered lists would under-fill
    k and mis-rank.
    """
    kind_resolved = kind
    if kind_resolved is None:
        from lwetl_spark.operators.maintain import detect_index_kind

        kind_resolved = detect_index_kind(spark, vector_index_path)

    # r12 (guide §2.6): the lexical and dense probe legs are
    # independent — they read disjoint index paths and only share the
    # (read-only) query frames — yet each runs several EAGER driver
    # actions (affected-bucket collects, broadcast builds, probe
    # checkpoints) that used to serialize one leg behind the other.
    # The text leg runs on a helper thread while the vector leg runs
    # here; overlap_legs joins both before the fusion plan is built.
    _lex_out: list = [None]

    def _lex_leg():
        _lex_out[0] = query_text_index(
            spark, text_index_path, term_queries,
            query_id_col=query_id_col, term_col=term_col, k=k,
            filter_ids=filter_ids,
        )

    qv = vec_queries.select(
        F.col(query_id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )

    def _dense_leg():
        if kind_resolved == "ivf":
            from lwetl_spark.operators.similarity import query_ivf_index

            return query_ivf_index(
                spark, vector_index_path, qv, k=k, nprobe=nprobe,
                filter_ids=filter_ids,
            )
        if kind_resolved == "pq":
            from lwetl_spark.operators.similarity import query_pq_index

            return query_pq_index(
                spark, vector_index_path, qv, k=k, rerank=rerank,
                filter_ids=filter_ids,
            )
        if kind_resolved == "lsh":
            from lwetl_spark.operators.similarity import query_lsh_index

            return query_lsh_index(
                spark, vector_index_path, qv, k=k, filter_ids=filter_ids
            )
        if kind_resolved == "ivfpq":
            from lwetl_spark.operators.ivfpq import query_ivfpq_index

            return query_ivfpq_index(
                spark, vector_index_path, qv, k=k, nprobe=nprobe,
                rerank=rerank, filter_ids=filter_ids,
            )
        raise ValueError(f"unknown vector index kind {kind_resolved!r}")

    dense = _pl.overlap_legs(_lex_leg, _dense_leg)
    lex = _lex_out[0]
    return rrf_fuse(
        [
            lex.select("query_id", "doc_id", "rnk"),
            dense.select(
                F.col("id").alias("query_id"),
                F.col("neighbor_id").alias("doc_id"),
                F.col("rank").cast("long").alias("rnk"),
            ),
        ],
        k_const=k_const,
        topk=k,
    )


def rank_eval(
    ranking: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    rel_threshold: int = 1,
    scale: int = 1_000_000,
) -> DataFrame:
    """Retrieval-quality metrics over a ranked list — the evaluation leg
    of the BM25/ANN family (NEW; no reference analog).  All metrics are
    exact integers so any SQL engine reproduces them bit-for-bit:

    - ``mrr_ppm``: scale // rank of the first relevant hit (0 if none) —
      reciprocal rank without float division;
    - ``p_at_k_ppm``: scale · |relevant in top-k| // k — precision@k;
    - ``hdcg_ppm``: Σ scale · rel // (rnk + 1) — DCG with HARMONIC
      discounts (1/(r+1) instead of 1/log2(r+1)): same top-heavy shape,
      exact in integers where the log form is float-unstable across
      engines (the x_bm25 integer-rational portability rule).

    ``ranking`` carries (query_id, doc_id, rnk); ``relevance`` carries
    (query_id, doc_id, rel) with integer grades (missing pairs = 0).
    ``rel_threshold`` sets the binary-relevance cut for mrr/p@k (hdcg
    always uses the raw grades).  ``k`` must be positive (it is the
    p@k divisor).
    Scale: one keyed left join on (query_id, doc_id) + one per-query agg
    — both bounded by |queries|·k rows, independent of corpus size."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    r = (
        ranking.filter(F.col("rnk") <= k)
        .join(relevance, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)).cast("long"))
    )
    return r.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_ranked"),
        F.coalesce(
            F.expr(f"{scale} div min(case when rel >= {rel_threshold} then rnk end)"),
            F.lit(0),
        )
        .cast("long")
        .alias("mrr_ppm"),
        F.expr(f"{scale} * count_if(rel >= {rel_threshold}) div {k}")
        .cast("long")
        .alias(f"p_at_{k}_ppm"),
        F.expr(f"sum({scale} * rel div (rnk + 1))").cast("long").alias("hdcg_ppm"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = 60,
    topk: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of N ranked lists — the standard hybrid-retrieval combiner (lexical
    BM25 + dense ANN): every (query, doc) scores
    Σ_lists scale // (k_const + rnk), exact in integers, so lists with
    incomparable score scales fuse by RANK alone.

    Each input carries (query_id, doc_id, rnk).  Returns
    (query_id, doc_id, n_lists, rrf_ppm, rnk) — top-`topk` per query by
    (rrf_ppm DESC, doc_id).  Scale: inputs are already |queries|·k-sized;
    the union + keyed agg + per-query window all run over that bounded
    set, never the corpus."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select("query_id", "doc_id", F.col("rnk").cast("long").alias("rnk"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.count("*").cast("long").alias("n_lists"),
        F.expr(f"sum({scale} div ({k_const} + rnk))").cast("long").alias("rrf_ppm"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_ppm"), F.asc("doc_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= topk)
    )


def cross_encoder_rerank(
    candidates: DataFrame,
    queries: DataFrame,
    docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_text_col: str = "query_text",
    batch_rows: int = 1024,
    scorer=None,
) -> DataFrame:
    """Cross-encoder-style re-ranking of a fused candidate list — the
    final stage of the retrieve→fuse→re-rank pipeline every modern
    retrieval stack runs (BM25 + dense → `rrf_fuse` → THIS; VERDICT r5
    #8).  ``candidates`` carries (query_id, doc_id) (any extra columns
    ignored); ``queries`` carries (query_id, ``query_text_col``);
    ``docs`` is the corpus (``id_col``, ``text_col``).  Returns
    (query_id, doc_id, ce_ppm, rnk) — top-``k`` per query by pair score.

    The Spark plumbing is the deliverable (the `inference.batch_score`
    convention — model libs are absent, so the default scorer is the
    PORTABLE md5 stub ``md5(query_text || '|' || doc_text)`` and the
    whole path is value-checked against the DuckDB oracle, not just
    smoke-run; a real cross-encoder drops in via ``scorer`` with an
    identical plan):

    - the candidate list is |queries|·k rows: query texts broadcast
      onto it, and the candidate side BROADCASTS into the one id-keyed
      join that fetches document text — the 100 TB corpus never
      shuffles for a re-rank;
    - (query_text, doc_text) pairs score through one Arrow-batched
      `mapInPandas` with model-memory re-chunking (``batch_rows``
      bounds the scorer's batch regardless of partition size);
    - thresholding/ordering stays JVM-side: one per-query window over
      the |queries|·k scored rows.
    """
    qd = candidates.select("query_id", F.col(id_col)).join(
        F.broadcast(queries.select("query_id", query_text_col)), "query_id"
    )
    pairs = docs.select(id_col, text_col).join(F.broadcast(qd), id_col)
    br = batch_rows
    qc, tc = query_text_col, text_col

    def run(batches):
        import hashlib as _hashlib

        import pandas as _pd

        def default_scorer(qs, ts):
            # the portable pair stub; NULLs score as empty strings (the
            # batch_score convention — one null row must not kill a pass)
            return [
                int(
                    _hashlib.md5(
                        f"{q or ''}|{t or ''}".encode("utf-8")
                    ).hexdigest()[:8],
                    16,
                )
                % 1_000_000
                for q, t in zip(qs, ts)
            ]

        fn = scorer or default_scorer
        for pdf in batches:
            for lo in range(0, len(pdf), br):
                chunk = pdf.iloc[lo : lo + br]
                yield _pd.DataFrame(
                    {
                        "query_id": chunk["query_id"],
                        "doc_id": chunk["_did"],
                        "ce_ppm": list(fn(chunk[qc], chunk[tc])),
                    }
                )

    qid_type = dict(qd.dtypes)["query_id"]
    did_type = dict(docs.select(id_col).dtypes)[id_col]
    scored = pairs.withColumnRenamed(id_col, "_did").mapInPandas(
        run, schema=f"query_id {qid_type}, doc_id {did_type}, ce_ppm long"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("ce_ppm"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def update_text_index(
    spark,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incrementally add documents to a persisted text index — the
    maintenance half of build-once/probe-many (a daily-crawl ingest must
    not re-tokenize the existing 100 TB).  ``new_docs`` ids must be
    disjoint from the indexed corpus (the ingest contract; exact dedup
    runs upstream).

    Cost model, all delta-sized except one bounded pass:

    - postings: the delta's (tok, doc_id, tf) rows APPEND into their
      hash-bucket partitions — existing partitions are untouched;
    - df: additive per token, so only the buckets containing delta
      tokens rewrite (dynamic partition overwrite) with
      old ⟗ delta coalesce-sum — the merge reads |affected buckets| /
      256 of the vocabulary;
    - doclen: append;
    - stats: recomputed from doclen with ONE (doc_id, dl)-sized agg —
      exact, schema-stable, and immune to floor-loss in the stored
      per-mille average.

    Equivalence contract: after any sequence of updates the index is
    row-identical to a from-scratch build over the union, and probes
    return identical rankings (pinned by test_retrieval).  The
    positional flag is STICKY: a positions column in the persisted
    postings schema makes the delta tokenize positionally too, so
    phrase parity survives maintenance.
    """
    # ONE inference read (footer job) discovers the sticky positional
    # flag; every other index-table read below pins its schema from the
    # input's id type (r12, guide §6 — the r11 campaign-state idiom)
    positional = "positions" in spark.read.parquet(f"{path}/postings").columns
    _schemas = _index_sidecar_schemas(new_docs.schema[id_col].dataType)
    tf_new, _, _ = doc_term_stats(
        new_docs, id_col=id_col, text_col=text_col, positions=positional
    )
    bucket = F.pmod(F.xxhash64("tok"), F.lit(_INDEX_BUCKETS)).alias("bucket")
    tf_new = tf_new.localCheckpoint(eager=True)  # tokenize ONCE; postings,
    # df, and doclen all derive from this checkpoint (dl = Σ tf per doc)
    dl_new = tf_new.groupBy("doc_id").agg(F.sum("tf").alias("dl"))

    # r12 (guide §2.6): the four maintenance legs below all derive from
    # the tf_new checkpoint and touch disjoint tables (postings append /
    # docbuckets append / df merge-overwrite / doclen append → stats) —
    # they run as concurrent job groups, joined before returning.
    def _postings_leg():
        tf_new.withColumn("bucket", bucket).repartition(
            "bucket"
        ).write.mode("append").partitionBy("bucket").parquet(
            f"{path}/postings"
        )

    # sidecar append ONLY if the index has one: a pre-sidecar index must
    # stay sidecar-less — a PARTIAL sidecar would make compaction
    # silently miss pre-existing docs' rows.  Explicit existence probe
    # (not try-read-and-swallow): a corrupt sidecar on an existing path
    # now raises instead of demoting the index (VERDICT r7 nit #2)
    def _db_leg():
        if _path_exists(spark, f"{path}/docbuckets"):
            tf_new.select("doc_id", bucket).distinct().write.mode(
                "append"
            ).parquet(f"{path}/docbuckets")

    def _df_leg():
        delta_df = tf_new.groupBy("tok").agg(F.count("*").alias("df"))
        affected = [
            r["b"]
            for r in delta_df.select(
                F.pmod(F.xxhash64("tok"), F.lit(_INDEX_BUCKETS)).alias("b")
            )
            .distinct()
            .collect()
        ]  # bounded: at most 256 values
        old_df = (
            spark.read.schema(_schemas["df"]).parquet(f"{path}/df")
            .filter(F.col("bucket").isin(affected))
            .drop("bucket")
        )
        merged = (
            old_df.select("tok", F.col("df").alias("_old"))
            .join(
                delta_df.select("tok", F.col("df").alias("_new")),
                "tok",
                "full_outer",
            )
            .select(
                "tok",
                (
                    F.coalesce(F.col("_old"), F.lit(0))
                    + F.coalesce(F.col("_new"), F.lit(0))
                ).alias("df"),
            )
            .withColumn("bucket", bucket)
            # eager: the dynamic-overwrite below must not race the scan
            .localCheckpoint(eager=True)
        )
        # per-write dynamic mode: the session conf is never mutated, so
        # a concurrent job on the same SparkSession cannot observe the
        # wrong overwrite mode mid-write (r5 ADVICE)
        _pw.dynamic_overwrite(merged, f"{path}/df", "bucket", repartition=True)

    def _doclen_stats_leg():
        dl_new.write.mode("append").parquet(f"{path}/doclen")
        stats = (
            spark.read.schema(_schemas["doclen"]).parquet(f"{path}/doclen")
            .agg(
                F.count("*").alias("n"),
                F.expr("1000 * sum(dl) div count(*)").alias("adl_m"),
            )
            .localCheckpoint(eager=True)
        )
        stats.write.mode("overwrite").parquet(f"{path}/stats")

    _pl.overlap_all(_postings_leg, _db_leg, _df_leg, _doclen_stats_leg)


def compact_text_index(
    spark,
    path: str,
    replacement_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    remove_ids: DataFrame | None = None,
) -> None:
    """Replace already-indexed documents' content in a persisted text
    index — the compaction half of the append-only contract
    (`update_text_index` refuses re-entering ids; CHANGED crawl docs
    defer here, see operators/incremental.ingest_increment).

    Semantics: for every id in ``replacement_docs``, the old postings /
    doclen rows vanish and the new content's rows take their place;
    afterwards the index is row-identical to a from-scratch build where
    those ids always had the new content (pinned by test_retrieval).

    Cost model — compaction is the RARE maintenance pass, sized by what
    it must touch and nothing more:

    - postings: the replaced ids' old rows are LOCATED via the
      `docbuckets` sidecar (doc_id → its postings' hash buckets,
      maintained by build/update/compact), so the READ prunes to the
      ≤256 buckets that actually hold a replaced doc's rows — the
      former one-full-postings-scan trade of the term-partitioned
      layout is gone (r6; pre-sidecar indexes fall back to the full
      read).  The WRITE is bounded as before: only buckets containing
      an old or new token of a replaced doc dynamic-overwrite;
      untouched buckets keep their files.
    - df: recomputed as old − removed-contribution + added-contribution
      per token; only affected buckets rewrite.
    - doclen: one filter-out + append-union overwrite pass ((doc_id,
      dl) longs — corpus-COUNT-sized, not corpus-TEXT-sized).
    - stats: one bounded agg, as in build/update.

    ``remove_ids`` (a one-column DataFrame of ids) additionally PURGES
    documents outright — their rows vanish with no replacement (the
    "removed" half of a full-snapshot crawl diff; see
    :func:`remove_from_index`).

    Positional indexes compact positionally (sticky flag, detected
    from the persisted postings schema) — replaced docs' new offsets
    enter with their new content.
    """
    # ONE postings read serves the positional probe, the old-row scan,
    # and the kept-row scan below (r11, guide §6): every
    # spark.read.parquet re-lists the 256 bucket dirs and re-infers the
    # schema as its own driver job — all three consumers run before any
    # write, so the snapshot is shared safely
    postings = spark.read.parquet(f"{path}/postings")
    positional = "positions" in postings.columns
    # sidecar-table schemas derive from the postings read's id type —
    # no further footer-inference jobs this pass (r12, guide §6)
    _schemas = _index_sidecar_schemas(postings.schema["doc_id"].dataType)
    tf_new, _, _ = doc_term_stats(
        replacement_docs, id_col=id_col, text_col=text_col,
        positions=positional,
    )
    tf_new = tf_new.localCheckpoint(eager=True)  # tokenize once
    ids = replacement_docs.select(F.col(id_col).alias("doc_id"))
    if remove_ids is not None:
        ids = ids.unionByName(
            remove_ids.select(F.col(remove_ids.columns[0]).alias("doc_id"))
        ).distinct()
    ids = ids.localCheckpoint(eager=True)

    bucket = F.pmod(F.xxhash64("tok"), F.lit(_INDEX_BUCKETS)).alias("bucket")
    # locate the replaced ids' old rows.  With the docbuckets sidecar
    # (r6, written by build/update) the scan prunes to the ≤256 buckets
    # that actually hold a replaced doc's postings — replacing the one
    # honest full postings read this pass used to pay.  A pre-sidecar
    # index falls back to the full read and stays sidecar-less (healing
    # would need a full (doc_id, bucket) distinct; rebuild to adopt).
    have_db = _path_exists(spark, f"{path}/docbuckets")
    if have_db:
        db_tbl = spark.read.schema(_schemas["docbuckets"]).parquet(
            f"{path}/docbuckets"
        )
        affected_old = [
            r["bucket"]
            for r in db_tbl.join(ids, "doc_id", "left_semi")
            .select("bucket")
            .distinct()
            .collect()
        ]  # bounded: ≤ _INDEX_BUCKETS values
        old_scan = (
            postings.filter(F.col("bucket").isin(affected_old))
            if affected_old
            else postings.filter(F.lit(False))
        )
    else:
        old_scan = postings
    tf_old = old_scan.join(ids, "doc_id", "left_semi").drop("bucket")
    tf_old = tf_old.localCheckpoint(eager=True)

    affected = [
        r["b"]
        for r in tf_old.unionByName(tf_new)
        .select(F.pmod(F.xxhash64("tok"), F.lit(_INDEX_BUCKETS)).alias("b"))
        .distinct()
        .collect()
    ]  # bounded: at most 256 values
    if not affected:
        return

    # postings: affected buckets rewrite as (old-bucket-rows minus
    # replaced ids) + new rows; untouched buckets keep their files.
    # r12 (guide §2.6): the four maintenance legs below derive only
    # from the tf_old/tf_new/ids checkpoints and the function-start
    # table snapshots, and each leg reads/writes its OWN table — they
    # run as concurrent job groups, joined before returning.
    def _postings_leg():
        kept = (
            postings.filter(F.col("bucket").isin(affected))
            .drop("bucket")
            .join(ids, "doc_id", "left_anti")
        )
        merged_tf = (
            kept.unionByName(tf_new)
            .withColumn("bucket", bucket)
            # eager: the dynamic-overwrite must not race its own scan
            .localCheckpoint(eager=True)
        )
        _overwrite(merged_tf, "postings")

    def _df_leg():
        # df: old − removed + added, per token within affected buckets
        old_df = (
            spark.read.schema(_schemas["df"]).parquet(f"{path}/df")
            .filter(F.col("bucket").isin(affected))
            .drop("bucket")
        )
        rem_df = tf_old.groupBy("tok").agg(F.count("*").alias("_rem"))
        add_df = tf_new.groupBy("tok").agg(F.count("*").alias("_add"))
        merged_df = (
            # full outer: a replacement can introduce tokens new to the
            # bucket (no old_df row) — they must still enter with df=_add
            old_df.join(rem_df, "tok", "full_outer")
            .join(add_df, "tok", "full_outer")
            .select(
                "tok",
                (
                    F.coalesce(F.col("df"), F.lit(0))
                    - F.coalesce(F.col("_rem"), F.lit(0))
                    + F.coalesce(F.col("_add"), F.lit(0))
                ).alias("df"),
            )
            .filter(F.col("df") > 0)
            .withColumn("bucket", bucket)
            .localCheckpoint(eager=True)
        )
        _overwrite(merged_df, "df")

    # dynamic partition overwrite cannot DELETE a bucket whose rows all
    # belonged to replaced docs (no rows for it in the written frame →
    # the stale partition would survive).  Emptied buckets have their
    # partition DIRECTORIES deleted instead (r5 ADVICE: the old full
    # static-rewrite fallback escalated a bounded bucket rewrite to a
    # full-table rewrite); if the compaction empties the whole table,
    # one zero-row footer file keeps it readable.
    def _overwrite(frame: DataFrame, table: str) -> None:
        present = {
            r["bucket"] for r in frame.select("bucket").distinct().collect()
        }
        emptied = set(affected) - present
        if emptied:
            # collect BEFORE the write: the overwrite deletes old files
            survivors = {
                r["bucket"]
                for r in spark.read.parquet(f"{path}/{table}")
                .select("bucket")
                .distinct()
                .collect()
            } - emptied  # bounded: ≤ _INDEX_BUCKETS values
        if present:
            _pw.dynamic_overwrite(
                frame, f"{path}/{table}", "bucket", repartition=True
            )
        if emptied:
            _pw.delete_partition_dirs(
                spark, f"{path}/{table}", "bucket", sorted(emptied)
            )
            if not survivors:
                _pw.write_empty_partition(
                    spark,
                    f"{path}/{table}",
                    "bucket",
                    min(emptied),
                    frame.drop("bucket").schema,
                )

    def _doclen_stats_leg():
        # doclen: filter-out + union overwrite (one (doc_id, dl) pass)
        dl_new = tf_new.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        dl_merged = (
            spark.read.schema(_schemas["doclen"]).parquet(f"{path}/doclen")
            .join(ids, "doc_id", "left_anti")
            .unionByName(dl_new)
            .localCheckpoint(eager=True)
        )
        dl_merged.write.mode("overwrite").parquet(f"{path}/doclen")
        # stats from the just-checkpointed dl_merged — row-identical to
        # the doclen table the overwrite above wrote, w/o re-reading it
        stats = (
            dl_merged
            .agg(
                F.count("*").alias("n"),
                F.expr("1000 * sum(dl) div count(*)").alias("adl_m"),
            )
            .localCheckpoint(eager=True)
        )
        stats.write.mode("overwrite").parquet(f"{path}/stats")

    def _db_leg():
        if not have_db:
            return
        # sidecar follows the content: replaced/removed ids' rows drop,
        # the replacements' new (doc_id, bucket) rows enter — the same
        # metadata-sized filter-out + union overwrite as doclen.
        # db_tbl reuses the affected_old read (docbuckets was not
        # written in between), saving its re-list + re-infer job
        db_merged = (
            db_tbl
            .join(ids, "doc_id", "left_anti")
            .unionByName(tf_new.select("doc_id", bucket).distinct())
            .localCheckpoint(eager=True)
        )
        db_merged.write.mode("overwrite").parquet(f"{path}/docbuckets")

    _pl.overlap_all(_postings_leg, _df_leg, _db_leg, _doclen_stats_leg)


def remove_from_index(
    spark,
    path: str,
    ids: DataFrame,
    id_col: str = "doc_id",
) -> None:
    """Purge documents from a persisted text index — the "removed" half
    of a full-snapshot crawl diff (404s, takedowns, robots changes).
    Delegates to :func:`compact_text_index` with an empty replacement
    set: postings/doclen rows for the ids vanish, df decrements (tokens
    reaching 0 drop out), stats recompute; afterwards the index is
    row-identical to a from-scratch build without those docs (pinned by
    test_retrieval).  Same cost model as compaction: one postings read,
    bounded bucket rewrites."""
    id_type = ids.schema[0].dataType.simpleString()
    empty = spark.createDataFrame([], f"{id_col} {id_type}, text string")
    compact_text_index(
        spark, path, empty, id_col=id_col, text_col="text", remove_ids=ids
    )
