from lwetl_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_normalized,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
    embedding_near_dups,
)
from lwetl_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_blocked,
    cosine_topk_pandas,
    lsh_ann_topk,
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
    "tumbling_agg",
    "sessionize",
    "column_cardinality",
    "table_cardinality",
]
