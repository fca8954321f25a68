from es_analytics_spark.operators.joins import asof_join, topk_per_group
from es_analytics_spark.operators.sessionize import sessionize
from es_analytics_spark.operators.dedup import (
    dedup_exact,
    document_fingerprint,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    ngram_jaccard_pairs,
)
from es_analytics_spark.operators.similarity import (
    with_norm,
    cosine_topk,
    cosine_pairs_above,
)
from es_analytics_spark.operators.text import text_features, language_id

__all__ = [
    "asof_join",
    "topk_per_group",
    "sessionize",
    "dedup_exact",
    "document_fingerprint",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard_pairs",
    "with_norm",
    "cosine_topk",
    "cosine_pairs_above",
    "text_features",
    "language_id",
]
