"""Multi-table hyperplane-LSH bucketing for approximate nearest
neighbour search.

Brute-force cosine top-k (``queries.core.v_cosine_topk``) is O(Q×N) —
correct for tens of query vectors, a non-starter for all-pairs or
many-query workloads at 100 TB. The scale path: random-hyperplane
sign sketches (Charikar's SimHash for angles). Each vector gets one
``N_PLANES``-bit bucket id PER TABLE: bit j of table t = sign(v · h_tj).
Cosine-close vectors agree on most signs, so candidates come from an
equi-join on the bucket key and only candidates pay the exact cosine
re-rank.

Single-table sign LSH has recall p^b per pair (p = 1 − θ/π); unioning
``N_TABLES`` independent plane sets lifts it to 1 − (1 − p^b)^T at T×
the candidate volume — the standard recall/cost knob. The (table,
bucket) pair is packed into ONE int key (``table << N_PLANES | bucket``)
so the candidate join stays a plain equi-join on an int column; the
per-vector sketch is an ``array<int>`` of T keys, exploded to key rows
exactly like MinHash band keys.

The hyperplanes are deterministic Rademacher (±1) rows from the shared
LCG (``dedup.constants.hyperplanes``, one seed per table) — exactly
representable in every engine, so the DuckDB oracle computes the
identical buckets.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from recommender_systems_spark.dedup.constants import hyperplanes

N_PLANES = 6
N_TABLES = 8
EMBEDDING_DIM = 64

# One independent Rademacher plane set per table.
PLANE_TABLES: list[list[list[float]]] = [
    hyperplanes(N_PLANES, EMBEDDING_DIM, seed=7 + 101 * t) for t in range(N_TABLES)
]

# Back-compat: the single-table plane set (table 0).
PLANES: list[list[float]] = PLANE_TABLES[0]


def _spark_bucket_sql(vec_name: str, planes: list[list[float]]) -> str:
    """One table's bucket id as a Spark SQL fragment. The dot product is
    the same zip_with+aggregate fold as functions.vector.dot_product —
    identical arithmetic order to the DuckDB twin's list_dot_product."""
    terms = " + ".join(
        "(CASE WHEN aggregate(zip_with({v}, array({p}), (x, y) -> x * y), "
        "0D, (acc, x) -> acc + x) >= 0 THEN {w} ELSE 0 END)".format(
            v=vec_name,
            p=", ".join(f"{x}D" for x in plane),
            w=1 << j,
        )
        for j, plane in enumerate(planes)
    )
    return f"({terms})"


def hyperplane_bucket(vec: str) -> Column:
    """int bucket id for table 0: bit j set iff vec · plane_j ≥ 0.
    ``vec`` is a column NAME — the expression is assembled as one SQL
    string (one py4j call) because the plane literals make the Column-
    builder form thousands of driver round-trips."""
    return F.expr(_spark_bucket_sql(vec, PLANE_TABLES[0]))


def bucket_keys(vec: str) -> Column:
    """array<int> of N_TABLES packed keys: (t << N_PLANES) | bucket_t.
    Explode to key rows for the candidate equi-join; ``arrays_overlap``
    of two vectors' keys = "collide in at least one table". ``vec`` is
    a column name (see hyperplane_bucket)."""
    keys = ", ".join(
        f"({_spark_bucket_sql(vec, planes)} + {t << N_PLANES})"
        for t, planes in enumerate(PLANE_TABLES)
    )
    return F.expr(f"array({keys})")


def _sql_bucket(vec_expr: str, planes: list[list[float]]) -> str:
    terms = " + ".join(
        f"(CASE WHEN list_dot_product({vec_expr}, "
        f"[{', '.join(str(x) for x in plane)}]) >= 0 THEN {1 << j} ELSE 0 END)"
        for j, plane in enumerate(planes)
    )
    return f"({terms})"


def sql_hyperplane_bucket(vec_expr: str) -> str:
    """DuckDB twin of ``hyperplane_bucket`` (table 0)."""
    return _sql_bucket(vec_expr, PLANE_TABLES[0])


def sql_bucket_keys(vec_expr: str) -> str:
    """DuckDB twin of ``bucket_keys`` — a list literal of packed keys."""
    keys = ", ".join(
        f"({_sql_bucket(vec_expr, planes)} + {t << N_PLANES})"
        for t, planes in enumerate(PLANE_TABLES)
    )
    return f"[{keys}]"
