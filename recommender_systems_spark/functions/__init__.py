from recommender_systems_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from recommender_systems_spark.functions.text import (
    char_ngrams,
    language_id,
    quality_score,
    rolling_fingerprint,
    token_count,
    tokens,
    word_shingles,
)

__all__ = [
    "char_ngrams",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "language_id",
    "quality_score",
    "rolling_fingerprint",
    "token_count",
    "tokens",
    "word_shingles",
]
