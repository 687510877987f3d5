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

# Adaptive signature width: a FIXED bucket count is the classic LSH
# scale failure — mean occupancy grows linearly with the corpus, so
# within-bucket candidate pairs grow QUADRATICALLY (measured: the
# 6-bit form hit 566× wall at 100× data). The signature therefore
# widens with the corpus: the smallest b ∈ [N_PLANES, MAX_PLANES]
# with n ≤ TARGET_BUCKET·2^b, keeping mean occupancy ≈ TARGET_BUCKET
# and candidate volume linear. The ladder is pure integer compares —
# both engines pick the identical width (no float log2 at the
# boundary). Recall per pair drops as p^b; the TABLE count rises on
# the same ladder to hold it (below) — the standard n^ρ trade.
MAX_PLANES = 14
TARGET_BUCKET = 32

# Recall ladder: widening b drops per-table pair collision to p^b, so
# a FIXED T=8 would let recall 1−(1−p^b)^T collapse as the corpus
# grows (0.90 → 0.28 at the design similarity between b=6 and b=14).
# T therefore rises with b to hold per-pair recall at the design
# point s* = 0.8 (p* = 1 − arccos(0.8)/π ≈ 0.79517): T(b) =
# ceil(8 · (1/p*)^(b−6)), frozen here as integer literals so neither
# engine does float math. Both engines read THIS dict (the oracle's
# CASE ladder is generated from it), and b=6 keeps the historical 8
# tables, so every output at sf ≤ 0.1 is unchanged. Cost: candidate
# volume grows ~T/8 at the widest rungs — linear in the corpus by
# the occupancy bound, which is the point.
N_TABLES_BY_BITS = {6: 8, 7: 11, 8: 13, 9: 16, 10: 21, 11: 26, 12: 32, 13: 40, 14: 51}
MAX_TABLES = N_TABLES_BY_BITS[MAX_PLANES]

# One independent Rademacher plane set per table, drawn at full width;
# the LCG streams planes sequentially, so planes[:N_PLANES] are
# byte-identical to the historical 6-plane tables and every b=6
# bucket (all SFs ≤ 0.1) is unchanged.
PLANE_TABLES: list[list[list[float]]] = [
    hyperplanes(MAX_PLANES, EMBEDDING_DIM, seed=7 + 101 * t)
    for t in range(MAX_TABLES)
]


def adaptive_bits(n_rows: int) -> int:
    """Signature width for a corpus of ``n_rows`` vectors: smallest
    b ∈ [N_PLANES, MAX_PLANES] with n_rows ≤ TARGET_BUCKET·2^b."""
    b = N_PLANES
    while b < MAX_PLANES and n_rows > (TARGET_BUCKET << b):
        b += 1
    return b


def sql_adaptive_bits(table: str = "embeddings") -> str:
    """DuckDB twin of ``adaptive_bits`` over ``count(*) FROM table``:
    an integer CASE ladder (scalar subquery), exact at the boundaries
    where float log2 could disagree across engines."""
    ladder = " ".join(
        f"WHEN n <= {TARGET_BUCKET << b} THEN {b}"
        for b in range(N_PLANES, MAX_PLANES)
    )
    return (
        f"(SELECT CASE {ladder} ELSE {MAX_PLANES} END "
        f"FROM (SELECT count(*) AS n FROM {table}))"
    )

# Back-compat: the single-table plane set (table 0, floor width).
PLANES: list[list[float]] = PLANE_TABLES[0][:N_PLANES]


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
    return F.expr(_spark_bucket_sql(vec, PLANE_TABLES[0][:N_PLANES]))


def bucket_keys(vec: str, bits: int = N_PLANES) -> Column:
    """array<int> of N_TABLES_BY_BITS[bits] packed keys:
    (t << MAX_PLANES) | bucket_t. Explode to key rows for the candidate
    equi-join; ``arrays_overlap`` of two vectors' keys = "collide in at
    least one table". ``vec`` is a column name (see hyperplane_bucket).
    ``bits`` is the signature width (``adaptive_bits(corpus_rows)`` for
    the scale-safe form); the Spark side slices the plane list, which
    equals the oracle's full-signature ``% 2^bits`` because bit j
    carries weight 2^j. The table count rides the same ladder
    (``N_TABLES_BY_BITS``) so per-pair recall holds as b widens."""
    keys = ", ".join(
        f"({_spark_bucket_sql(vec, planes[:bits])} + {t << MAX_PLANES})"
        for t, planes in enumerate(PLANE_TABLES[: N_TABLES_BY_BITS[bits]])
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
    return _sql_bucket(vec_expr, PLANE_TABLES[0][:N_PLANES])


def sql_n_tables(bits_expr: str) -> str:
    """DuckDB twin of ``N_TABLES_BY_BITS[bits]`` — an integer CASE
    ladder generated from the SAME dict the Spark side reads."""
    arms = " ".join(
        f"WHEN {b} THEN {t}" for b, t in sorted(N_TABLES_BY_BITS.items())
    )
    return f"(CASE ({bits_expr}) {arms} END)"


def sql_bucket_keys(vec_expr: str, bits_expr: str | None = None) -> str:
    """DuckDB twin of ``bucket_keys`` — a list literal of packed keys.
    ``bits_expr`` is a SQL expression for the signature width (pass
    ``sql_adaptive_bits()`` for the scale-safe form); the full-width
    signature masked to its low ``bits`` bits equals the Spark side's
    sliced-plane signature exactly. With ``bits_expr`` the full
    MAX_TABLES key list is sliced to ``sql_n_tables(bits_expr)``
    entries — the same table ladder the Spark side applies (gated-off
    tables cost the oracle per-row evaluation only; results match the
    sliced form exactly because keys are independent per table)."""
    if bits_expr is None:
        keys = ", ".join(
            f"({_sql_bucket(vec_expr, planes[:N_PLANES])} + {t << MAX_PLANES})"
            for t, planes in enumerate(PLANE_TABLES[:N_TABLES])
        )
        return f"[{keys}]"
    keys = ", ".join(
        f"(({_sql_bucket(vec_expr, planes)} % (1 << ({bits_expr}))) "
        f"+ {t << MAX_PLANES})"
        for t, planes in enumerate(PLANE_TABLES)
    )
    return f"list_slice([{keys}], 1, {sql_n_tables(bits_expr)})"
