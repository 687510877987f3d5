"""Hyperplane-LSH bucketing for approximate nearest neighbour search.

Brute-force cosine top-k (``queries.core.v_cosine_topk``) is O(Q×N) —
correct for tens of query vectors, a non-starter for all-pairs or
many-query workloads at 100 TB. The scale path: random-hyperplane
sign sketches (Charikar's SimHash for angles). Each vector gets a
``N_PLANES``-bit bucket id: bit j = sign(v · h_j). Cosine-close vectors
agree on most signs, so candidates come from an equi-join on the bucket
id and only candidates pay the exact cosine re-rank.

The hyperplanes are deterministic Rademacher (±1) rows from the shared
LCG (``dedup.constants.hyperplanes``) — exactly representable in every
engine, so the DuckDB oracle computes the identical buckets.

Recall/latency knob: more planes → smaller buckets → faster but lower
recall. 6 planes = 64 buckets keeps ~N/64 candidates per query. For
higher recall at scale, union several independent plane sets
(multi-table LSH) — the query shape stays the same equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from recommender_systems_spark.dedup.constants import hyperplanes
from recommender_systems_spark.functions.vector import dot_product

N_PLANES = 6
EMBEDDING_DIM = 64

PLANES: list[list[float]] = hyperplanes(N_PLANES, EMBEDDING_DIM)


def hyperplane_bucket(vec: Column | str) -> Column:
    """int bucket id: bit j set iff vec · plane_j ≥ 0."""
    v = F.col(vec) if isinstance(vec, str) else vec
    out = F.lit(0)
    for j, plane in enumerate(PLANES):
        p = F.array(*[F.lit(x) for x in plane])
        out = out + F.when(dot_product(v, p) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def sql_hyperplane_bucket(vec_expr: str) -> str:
    """DuckDB twin of ``hyperplane_bucket`` from the same plane matrix."""
    terms = " + ".join(
        f"(CASE WHEN list_dot_product({vec_expr}, "
        f"[{', '.join(str(x) for x in plane)}]) >= 0 THEN {1 << j} ELSE 0 END)"
        for j, plane in enumerate(PLANES)
    )
    return f"({terms})"
