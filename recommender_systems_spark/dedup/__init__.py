from recommender_systems_spark.dedup.constants import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_COEFFS,
    MINHASH_PRIME,
    SIMHASH_BITS,
    lcg_stream,
)

__all__ = [
    "LSH_BANDS",
    "LSH_ROWS",
    "MINHASH_COEFFS",
    "MINHASH_PRIME",
    "SIMHASH_BITS",
    "lcg_stream",
]
