"""Similarity search over embedding columns.

- ``ann``: hyperplane-LSH bucketed approximate nearest neighbour — the
  100 TB-scale path. Brute-force cosine top-k (the exact baseline)
  lives in ``queries.core.v_cosine_topk``.
"""

from recommender_systems_spark.similarity.ann import (  # noqa: F401
    MAX_PLANES,
    N_PLANES,
    N_TABLES,
    adaptive_bits,
    bucket_keys,
    hyperplane_bucket,
    sql_adaptive_bits,
    sql_bucket_keys,
    sql_hyperplane_bucket,
)
