"""Count-Min sketch (training-data-pipeline extension: approximate
heavy-hitter counting with a bounded-size summary).

The sketch is the standard D×W counter grid: row d counts key k in
cell h_d(k) = ((a_d·k + b_d) mod p) mod W, and the point estimate for
a key is the MINIMUM of its D cells (an upper bound on the true count
— collisions only inflate). The affine hash family reuses the shared
LCG coefficients (``dedup.constants.MINHASH_COEFFS``), so the DuckDB
oracle executes the IDENTICAL hash arithmetic and both engines build
the same sketch bit-for-bit.

Scale shape: building the sketch is ONE map-side-combinable grouped
count over D×|rows| exploded (d, cell) pairs — the shuffle carries at
most D×W cells per mapper regardless of input size (the whole point
of a sketch: 100 TB of keys reduce to a 4×64 grid of longs). The
estimate join broadcasts the finished grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommender_systems_spark.dedup.constants import MINHASH_COEFFS, MINHASH_PRIME
from recommender_systems_spark.registry import _t, register

CM_DEPTH = 4
CM_WIDTH = 64
CM_COEFFS = MINHASH_COEFFS[:CM_DEPTH]
TOP_N = 5


def _cell_col(key: F.Column, d: int) -> F.Column:
    a, b = CM_COEFFS[d]
    return F.pmod(
        F.pmod(F.lit(a) * key + F.lit(b), F.lit(MINHASH_PRIME)), F.lit(CM_WIDTH)
    ).cast("int")


def _cell_sql(key: str, d: int) -> str:
    a, b = CM_COEFFS[d]
    return f"((({a} * {key} + {b}) % {MINHASH_PRIME}) % {CM_WIDTH})"


def countmin_sketch(df: DataFrame, key: str) -> DataFrame:
    """(d, cell, n): the D×W counter grid for ``key``. Partial (map-side)
    aggregation caps the shuffle at D×W cells per task."""
    k = F.col(key).cast("long")
    cells = df.select(
        F.posexplode(
            F.array(*[_cell_col(k, d) for d in range(CM_DEPTH)])
        ).alias("d", "cell")
    )
    return cells.groupBy("d", "cell").agg(F.count(F.lit(1)).alias("n"))


_CM_SQL = f"""
    WITH cells AS (
        {" UNION ALL ".join(
            f"(SELECT {d} AS d, {_cell_sql('l_partkey', d)} AS cell FROM lineitem)"
            for d in range(CM_DEPTH)
        )}
    ),
    sketch AS (
        SELECT d, cell, CAST(count(*) AS BIGINT) AS n
        FROM cells GROUP BY d, cell
    ),
    topk AS (
        SELECT l_partkey AS pkey, CAST(count(*) AS BIGINT) AS exact_n
        FROM lineitem GROUP BY l_partkey
        ORDER BY exact_n DESC, pkey LIMIT {TOP_N}
    )
    SELECT t.pkey, t.exact_n,
           (SELECT min(s.n) FROM sketch s
            WHERE {" OR ".join(
                f"(s.d = {d} AND s.cell = {_cell_sql('t.pkey', d)})"
                for d in range(CM_DEPTH)
            )}) AS cm_estimate
    FROM topk t
"""


@register("a_countmin", _CM_SQL)
def a_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch extension: Count-Min over lineitem part keys — build the
    4×64 grid in one map-combinable grouped count, then report the
    exact count vs the CM point estimate (min over the key's 4 cells)
    for the 5 most frequent keys. cm_estimate ≥ exact_n always (CM
    never undercounts); the oracle builds the identical grid from the
    shared hash coefficients."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    sketch = countmin_sketch(li, "l_partkey")
    topk = (
        li.groupBy(F.col("l_partkey").alias("pkey"))
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("pkey"))
        .limit(TOP_N)
    )
    probes = topk.select(
        "pkey",
        "exact_n",
        F.posexplode(
            F.array(*[_cell_col(F.col("pkey"), d) for d in range(CM_DEPTH)])
        ).alias("d", "cell"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "cell"])
        .groupBy("pkey", "exact_n")
        .agg(F.min("n").alias("cm_estimate"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct — bounded-error contract
# ---------------------------------------------------------------------------

HLL_RSD = 0.05  # requested relative standard deviation
HLL_BOUND = 0.15  # 3σ acceptance band checked against the exact count

_HLL_SQL = f"""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_bound
    FROM events
    GROUP BY event_type
"""


@register("a_hll_distinct", _HLL_SQL)
def a_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate count-distinct per group — the
    sketch that replaces exact `count(DISTINCT)` at 100 TB, where the
    exact form shuffles every distinct (group, key) pair while the HLL
    dense register array is a fixed few KB per group and merges
    map-side (partial aggregation), making the shuffle independent of
    cardinality.

    The oracle contract is the sketch's accuracy guarantee, not its
    internals: the query computes BOTH the exact count and the HLL
    estimate in one aggregation pass and emits (exact, estimate within
    3σ of requested rsd) — the oracle independently computes the exact
    count and asserts the bound held (TRUE). Estimator drift beyond
    the band would hash-mismatch. SURVEY A5 note: exact count stays
    the right call when the number SIZES an allocation; the sketch is
    for monitoring/cardinality-estimation paths."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=HLL_RSD)
                - F.countDistinct("user_id")
            )
            <= F.countDistinct("user_id") * F.lit(HLL_BOUND)
        ).alias("within_bound"),
    )


_AQ_SQL = """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS exact_p50,
           round(quantile_cont(value, 0.9), 6) AS exact_p90,
           TRUE AS p50_within_bound,
           TRUE AS p90_within_bound
    FROM events
    GROUP BY event_type
"""


@register("a_approx_quantiles", _AQ_SQL)
def a_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna via percentile_approx) —
    the sketch that replaces exact percentiles at 100 TB: the GK
    summary is bounded-size per group and merges map-side, where the
    exact form ships every value through the group's partition.

    Same oracle contract as a_hll_distinct: the query computes the
    EXACT p50/p90 (Spark `percentile`, already proven bit-equal to
    DuckDB's quantile_cont by e_boxplot_summary) AND asserts the
    sketch's rank-error guarantee in-plan — with accuracy=100 the
    approx p50 must land between the exact p45 and p55 values (±5
    rank-percentiles is 5× the 1/accuracy guarantee, so the flag is
    robustly TRUE unless the estimator breaks). The oracle recomputes
    the exact values and the literal TRUE flags."""
    ev = _t(spark, sf_dir, "events")
    ap = F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.9)), 100)
    ex = F.percentile("value", F.array(*[F.lit(x) for x in (0.45, 0.5, 0.55, 0.85, 0.9, 0.95)]))
    return ev.groupBy("event_type").agg(
        F.round(ex.getItem(1), 6).alias("exact_p50"),
        F.round(ex.getItem(4), 6).alias("exact_p90"),
        ap.getItem(0).between(ex.getItem(0), ex.getItem(2)).alias(
            "p50_within_bound"
        ),
        ap.getItem(1).between(ex.getItem(3), ex.getItem(5)).alias(
            "p90_within_bound"
        ),
    )


# ---------------------------------------------------------------------------
# Sketch set operations: audience overlap via HLL union + inclusion-exclusion
# ---------------------------------------------------------------------------

_OVL_CUT = "2024-01-16"
_OVL_TOL = 0.05  # |estimate − exact| / exact tolerance for lgConfigK=12

_OVL_SQL = f"""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE ts < TIMESTAMP '{_OVL_CUT}'),
    b AS (SELECT DISTINCT user_id FROM events
          WHERE ts >= TIMESTAMP '{_OVL_CUT}'),
    x AS (
        SELECT (SELECT count(*) FROM a) AS na,
               (SELECT count(*) FROM b) AS nb,
               (SELECT count(*) FROM a JOIN b USING (user_id)) AS nab,
               (SELECT count(*) FROM (SELECT user_id FROM a
                                      UNION SELECT user_id FROM b)) AS nu
    )
    SELECT CAST(na AS BIGINT) AS exact_a,
           CAST(nb AS BIGINT) AS exact_b,
           CAST(nu AS BIGINT) AS exact_union,
           CAST(nab AS BIGINT) AS exact_overlap,
           1 AS union_in_band, 1 AS overlap_in_band
    FROM x
"""


@register("a_hll_overlap", _OVL_SQL)
def a_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set operations: audience overlap between two time windows
    from MERGEABLE HLL sketches — union via sketch merge, intersection
    via inclusion-exclusion (|A|+|B|−|A∪B|) — the pattern that answers
    "how many users did both campaigns reach?" at 100 TB without ever
    co-shuffling the two audiences: each side's sketch is a few KB,
    builds with map-side partial aggregation, and the set algebra
    happens on the driver-sized sketches.

    Oracle contract is a_hll_distinct's: the query computes the exact
    counts AND asserts in-plan that the sketch estimates land within
    {_OVL_TOL:.0%} of them (≫ the lgConfigK=12 rsd), emitting the
    exact values + in-band flags — the oracle recomputes the exact
    side and expects both flags TRUE. The estimates themselves stay
    out of the output: they are implementation-specific and would
    never hash across engines."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit(_OVL_CUT).cast("timestamp")
    sk = ev.agg(
        F.hll_sketch_agg(
            F.when(F.col("ts") < cut, F.col("user_id"))
        ).alias("ska"),
        F.hll_sketch_agg(
            F.when(F.col("ts") >= cut, F.col("user_id"))
        ).alias("skb"),
        F.countDistinct(
            F.when(F.col("ts") < cut, F.col("user_id"))
        ).alias("na"),
        F.countDistinct(
            F.when(F.col("ts") >= cut, F.col("user_id"))
        ).alias("nb"),
        F.countDistinct("user_id").alias("nu"),
    )
    est_a = F.hll_sketch_estimate("ska")
    est_b = F.hll_sketch_estimate("skb")
    est_u = F.hll_sketch_estimate(F.hll_union("ska", "skb"))
    est_ab = est_a + est_b - est_u
    exact_ab = F.col("na") + F.col("nb") - F.col("nu")
    in_band = lambda est, exact: (  # noqa: E731
        F.abs(est.cast("double") - exact) <= _OVL_TOL * exact + F.lit(2.0)
    ).cast("int")
    return sk.select(
        F.col("na").cast("long").alias("exact_a"),
        F.col("nb").cast("long").alias("exact_b"),
        F.col("nu").cast("long").alias("exact_union"),
        exact_ab.cast("long").alias("exact_overlap"),
        in_band(est_u, F.col("nu")).alias("union_in_band"),
        in_band(est_ab, exact_ab).alias("overlap_in_band"),
    )
