from lwetl_spark.functions.scalars import md5_row_hash, epoch_millis, grouped_string_agg
from lwetl_spark.functions.vectors import cosine_similarity, dot, l2_norm
from lwetl_spark.functions.text import (
    tokens,
    token_count,
    char_ngrams,
    word_shingles,
    quality_features,
    lang_id,
    simhash64_df,
    rolling_fingerprint,
    fingerprint_md5,
)

__all__ = [
    "md5_row_hash",
    "epoch_millis",
    "grouped_string_agg",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "tokens",
    "token_count",
    "char_ngrams",
    "word_shingles",
    "quality_features",
    "lang_id",
    "simhash64_df",
    "rolling_fingerprint",
    "fingerprint_md5",
]
