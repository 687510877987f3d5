"""Scale-pattern queries: the shuffle-avoidance techniques the engine
relies on at 100 TB, demonstrated as oracle-checked queries (results
must equal the straightforward plan — the ORACLE is the plain SQL, the
Spark plan is the optimised physical strategy).

- ``j_bucketed_join``: co-located join via bucketed tables — both
  sides pre-hash-partitioned on the join key into the same bucket
  count, so the join is a zero-shuffle sort-merge over aligned buckets.
  This is THE technique for repeated large-fact ⋈ large-fact joins
  (orders ⋈ lineitem at 100 TB): pay the shuffle once at write time,
  never again at read time.
- ``j_salted_skew``: hot-key mitigation by salting — the skewed build
  side explodes each key into SALT replicas, the probe side draws a
  random salt, so one hot key spreads over SALT reducers. AQE's skew
  join handles this adaptively; explicit salting is the deterministic
  fallback when a key is pathological (here the salt is rand-seeded on
  the probe, so the rows land spread but results are exact).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommender_systems_spark.registry import _t, register

_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".data_cache"
)
N_BUCKETS = 8
SALT = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> str:
    """Write orders+lineitem bucketed by the join key (once per
    session+sf; bucket metadata lives in the session catalog)."""
    digest = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    suffix = digest
    if not spark.catalog.tableExists(f"orders_b_{suffix}"):
        warehouse = os.path.join(os.path.abspath(_CACHE), "warehouse")
        (
            _t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(warehouse, f"orders_b_{suffix}"))
            .saveAsTable(f"orders_b_{suffix}")
        )
        (
            _t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_quantity")
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(warehouse, f"lineitem_b_{suffix}"))
            .saveAsTable(f"lineitem_b_{suffix}")
        )
    return suffix


@register(
    "j_bucketed_join",
    """
    SELECT o.o_orderkey,
           CAST(count(*) AS BIGINT) AS n_items,
           sum(l.l_quantity) AS sum_qty,
           round(max(o.o_totalprice), 2) AS total
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey < 5000
    GROUP BY o.o_orderkey
    """,
)
def j_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact⋈fact join over bucketed tables: both sides are
    hash-bucketed and sorted on orderkey at write time, so the join
    plans as a sort-merge over aligned buckets with NO exchange on
    either side (`.explain` shows no Exchange below the SortMergeJoin)
    and the following aggregation reuses the same partitioning. The
    oracle is the plain join — identical results, different physics."""
    suffix = _bucketed_tables(spark, sf_dir)
    orders = spark.table(f"orders_b_{suffix}").filter(F.col("o_orderkey") < 5000)
    li = spark.table(f"lineitem_b_{suffix}")
    return (
        # merge hint: keep the sort-merge path (broadcast would also be
        # correct here at test scale, but the point is the exchange-free
        # bucket alignment a 100 TB fact⋈fact join depends on).
        orders.hint("merge").join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.max("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "j_salted_skew",
    """
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(s.s_acctbal), 2) AS weight
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY l.l_returnflag
    """,
)
def j_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join: the dimension side replicates each key SALT times
    (explode), the fact side attaches a seeded random salt, and the
    join key becomes (key, salt) — a pathologically hot supplier now
    spreads across SALT reducers instead of melting one. Results are
    exactly the unsalted join's (every fact row still matches exactly
    one replica), which is what the plain-SQL oracle checks."""
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_returnflag")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    salted_dim = sup.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    salted_fact = li.withColumn(
        "__salt", F.floor(F.rand(17) * SALT).cast("int")
    )
    joined = salted_fact.join(
        salted_dim.hint("shuffle_hash"),
        (F.col("l_suppkey") == F.col("s_suppkey"))
        & (salted_fact["__salt"] == salted_dim["__salt"]),
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("s_acctbal"), 2).alias("weight"),
    )
