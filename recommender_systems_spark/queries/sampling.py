"""Sampling / randomisation queries (SURVEY §2: W6 seeded shuffle, M8
weighted sampling, M10 uniform sampling without replacement + user
simulation, E2 group equalisation).

Seeded randomness is engine-deterministic, not cross-engine: Spark's
``rand(seed)`` stream cannot be reproduced in DuckDB (SURVEY §7
"What's hard" #4), so per the driver contract the row-level outputs
register WITHOUT an oracle (rows-only check), while every
DETERMINISTIC projection of a seeded op (group sizes after
equalisation, sample cardinalities) gets a full value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recommender_systems_spark.operators.relational import (
    equalize_groups,
    seeded_shuffle,
    weighted_sample,
)
from recommender_systems_spark.registry import _t, register

def _grp():
    return F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B"))


@register("w_seeded_shuffle")  # rows-only: rand(seed) is engine-local
def w_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: deterministic order randomisation (reference:
    np.random.shuffle per epoch, prac_2.py:90-92). Same seed + same
    partitioning ⇒ same order on re-run; first 100 rows returned."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return seeded_shuffle(orders, seed=42).limit(100)


@register("m_weighted_sample")  # rows-only: seeded exponential race keys
def m_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8: weighted sampling without replacement via Efraimidis-Spirakis
    race keys (replaces np.random.choice(p=probs),
    implicit_feedback/functions.py:47-58). Weight = order price; one
    TakeOrderedAndProject, no driver-side CDF."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return weighted_sample(orders, "o_totalprice", n=50, seed=7)


@register(
    "e_equalize_groups",
    """
    WITH g AS (
        SELECT DISTINCT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
               user_id
        FROM events
    ),
    sizes AS (SELECT grp, count(*) AS n FROM g GROUP BY grp),
    m AS (SELECT min(n) AS t FROM sizes)
    SELECT grp, CAST(m.t AS BIGINT) AS n_units FROM sizes, m
    """,
)
def e_equalize_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: downsample the larger experiment arm to the smaller arm's
    size (reference ab_test.py:238-265 random-removal loop → here a
    seeded per-group rank + keep-first-min). WHICH units are kept is
    seeded (engine-local); HOW MANY is deterministic — both arms must
    equal min(group sizes), which is exactly what the oracle checks."""
    ev = _t(spark, sf_dir, "events").withColumn("grp", _grp())
    eq = equalize_groups(ev, "grp", "user_id", seed=3)
    return eq.groupBy("grp").agg(F.countDistinct("user_id").alias("n_units"))


@register(
    "m_uniform_sample_sizes",
    """
    WITH g AS (
        SELECT string_split(p_name, ' ')[2] AS genre, p_partkey FROM part
    ),
    sizes AS (SELECT genre, count(*) AS n FROM g GROUP BY genre)
    SELECT genre, CAST(least(n, 7) AS BIGINT) AS n_sampled FROM sizes
    """,
)
def m_uniform_sample_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10: uniform sampling without replacement per group (reference
    simulate_user samples 5-10 movies per preferred genre w/o
    replacement, functions.py:491-519). Spark shape: per-genre window
    over rand(seed) + row_number ≤ 7 — sampling without replacement by
    construction. Oracle checks the deterministic projection: each
    genre yields min(|genre|, 7) distinct parts."""
    part = _t(spark, sf_dir, "part").select(
        F.split(F.col("p_name"), " ").getItem(1).alias("genre"), "p_partkey"
    )
    w = Window.partitionBy("genre").orderBy(F.rand(11), "p_partkey")
    sampled = part.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= 7
    )
    return sampled.groupBy("genre").agg(
        F.countDistinct("p_partkey").alias("n_sampled")
    )


_SIM_N = 200
_SIM_SQL_TEMPLATE = """
    SELECT user_id,
           CAST(floor({u_genre} * 16) AS INT) AS preferred_genre,
           CAST(5 + floor({u_hist} * 6) AS INT) AS n_history,
           CASE WHEN {u_arm} < 0.5 THEN 'A' ELSE 'B' END AS grp
    FROM (SELECT unnest(range({n})) AS user_id)
"""


def _sim_sql() -> str:
    return _SIM_SQL_TEMPLATE.format(
        n=_SIM_N,
        u_genre=_u01_sql("user_id", "simg"),
        u_hist=_u01_sql("user_id", "simh"),
        u_arm=_u01_sql("user_id", "sima"),
    )


@register("m_simulate_users", None)  # SQL attached below once _u01_sql exists
def m_simulate_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10/A-B step 3: simulate experiment users — preferred genre,
    history size U(5,10), A/B arm ~ Bernoulli(1/2) (reference
    simulate_user + ab_test.py:87-97). Round 5 upgraded the uniforms
    from rand(seed) (engine-local ⇒ rows-only) to md5-derived (`_u01`
    below) — the identical simulation in both engines, so the driver
    value-hashes the actual simulated rows."""
    return spark.range(_SIM_N).select(
        F.col("id").alias("user_id"),
        F.floor(_u01(F.col("id"), "simg") * 16).cast("int").alias(
            "preferred_genre"
        ),
        (5 + F.floor(_u01(F.col("id"), "simh") * 6)).cast("int").alias(
            "n_history"
        ),
        F.when(_u01(F.col("id"), "sima") < 0.5, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("grp"),
    )


# Per-stratum sampling fractions, hex-encoded as 4-digit md5-prefix
# thresholds (65536 buckets): keep a row iff its hash prefix sorts
# below the stratum's threshold. Computed once here so the Spark CASE
# and the oracle CASE embed the identical literals.
STRATA_FRACTIONS = {
    "click": 0.20,
    "view": 0.05,
    "purchase": 0.50,
    "signup": 0.10,
    "error": 0.02,
}
_STRATA_HEX = {
    k: format(int(v * 65536), "04x") for k, v in STRATA_FRACTIONS.items()
}

_STRAT_CASE_SQL = " ".join(
    f"WHEN '{k}' THEN '{h}'" for k, h in _STRATA_HEX.items()
)

_STRATIFIED_SQL = f"""
    SELECT event_id, event_type
    FROM events
    WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 4)
          < CASE event_type {_STRAT_CASE_SQL} ELSE '0000' END
"""


@register("m_stratified_sample", _STRATIFIED_SQL)
def m_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 at pipeline scale: stratified sampling with per-stratum
    fractions (the `sampleBy` shape — downsample over-represented
    event types when assembling a training mix) implemented as a
    deterministic hash-Bernoulli filter: keep a row iff the first 4
    md5(event_id) hex chars sort below the stratum's threshold.

    Why hash instead of rand(seed): the decision depends only on the
    row's stable key, so it is reproducible across engines (full
    row-level oracle — `sampleBy` would be rows-only), stable under
    repartitioning/backfill, and consistent between runs that sample
    different tables on the same key. Zero shuffle: the filter is a
    projection-time predicate, map-side at any scale."""
    expr = None
    for k, h in _STRATA_HEX.items():
        expr = (
            F.when(F.col("event_type") == k, F.lit(h))
            if expr is None
            else expr.when(F.col("event_type") == k, F.lit(h))
        )
    thr = expr.otherwise(F.lit("0000"))
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 4) < thr
    ).select("event_id", "event_type")


# ---------------------------------------------------------------------------
# Hash-deterministic twins of the seeded ops: rand(seed) is engine-local
# (rows-only by contract), but a uniform derived from md5 is identical
# in both engines, which upgrades W6/M8 to FULL value-hash oracles.
# u = (md5 13-hex-digit prefix + 1) / (16^13 + 1) ∈ (0, 1] — 52 bits of
# hash, exactly representable; +1 keeps log() off u=0.
# ---------------------------------------------------------------------------

from recommender_systems_spark.queries._shared import (
    HEX13 as _HEX13,
    u01_col,
    u01_sql,
)


# _u01/_u01_sql moved to queries._shared (u01_col/u01_sql) so abtest
# oracles can embed them; aliased here for existing importers.
_u01 = u01_col
_u01_sql = u01_sql


@register(
    "w_hash_shuffle",
    f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY {_u01_sql("o_orderkey", "w6")}, o_orderkey
    LIMIT 100
    """,
)
def w_hash_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6, oracle-backed: order randomisation keyed on an md5-derived
    uniform instead of rand(seed) — the same 'shuffled' order in ANY
    engine, stable under re-partitioning and retries (the property
    prac_2.py:90-92's np.random.shuffle needs from its fixed seed).
    One TakeOrderedAndProject, no exchange beyond the top-k."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return orders.orderBy(
        _u01(F.col("o_orderkey"), "w6"), F.col("o_orderkey")
    ).limit(100)


@register(
    "m_weighted_sample_hash",
    f"""
    SELECT o_orderkey, o_totalprice,
           round(-ln({_u01_sql("o_orderkey", "m8")}) / o_totalprice, 6)
               AS race_key
    FROM orders
    ORDER BY -ln({_u01_sql("o_orderkey", "m8")}) / o_totalprice, o_orderkey
    LIMIT 50
    """,
)
def m_weighted_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8, oracle-backed: Efraimidis-Spirakis weighted sampling without
    replacement (key = −ln(u)/w, keep the n smallest — the distributed
    replacement for np.random.choice(p=probs),
    implicit_feedback/functions.py:47-58) with the uniform drawn from
    md5 instead of rand(seed), so BOTH engines select the identical
    sample and the driver value-hashes the actual sampled rows — the
    seeded variant (``m_weighted_sample``) can only be rows-only.
    Weight = order price; one TakeOrderedAndProject."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    key = -F.log(_u01(F.col("o_orderkey"), "m8")) / F.col("o_totalprice")
    return (
        orders.withColumn("race_key", F.round(key, 6))
        .orderBy(key, "o_orderkey")
        .limit(50)
    )


# m_simulate_users' oracle references _u01_sql, which is defined after
# the query's registration point — attach it now that it exists.
from recommender_systems_spark.registry import ORACLE  # noqa: E402

ORACLE["m_simulate_users"] = _sim_sql()
