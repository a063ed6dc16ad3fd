from lwetl_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_normalized,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
    embedding_near_dups,
)
from lwetl_spark.operators.similarity import (
    build_ivf_index,
    build_lsh_index,
    cosine_topk,
    cosine_topk_blocked,
    cosine_topk_pandas,
    ivf_topk,
    lsh_ann_topk,
    pq_topk,
    query_ivf_index,
    query_lsh_index,
    semantic_dedup,
)
from lwetl_spark.operators.windows import tumbling_agg, sessionize
from lwetl_spark.operators.cardinality import column_cardinality, table_cardinality

__all__ = [
    "exact_dedup",
    "exact_dedup_normalized",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_buckets",
    "embedding_near_dups",
    "cosine_topk",
    "cosine_topk_blocked",
    "cosine_topk_pandas",
    "semantic_dedup",
    "lsh_ann_topk",
    "ivf_topk",
    "pq_topk",
    "build_lsh_index",
    "query_lsh_index",
    "build_ivf_index",
    "query_ivf_index",
    "tumbling_agg",
    "sessionize",
    "column_cardinality",
    "table_cardinality",
]
