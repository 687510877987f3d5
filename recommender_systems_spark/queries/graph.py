"""Graph analytics over the interaction graph: fixed-iteration
PageRank on the item co-occurrence graph.

Link-graph importance scoring is a first-class curation signal at
100-TB corpus scale (domain/page authority feeding quality filters);
here the same power-iteration shape runs on the item-item
co-occurrence graph the CF neighbour query builds, so the operator is
exercised end-to-end on the warehouse tables without external edges.

The iteration count is FIXED and the init deterministic, so the whole
loop unrolls into the DuckDB oracle (the m_kmeans pattern for
oracle-backed iterative algorithms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommender_systems_spark.queries._shared import (
    CF_CAP as _CF_CAP,
    CF_MIN_COOC as _CF_MIN_COOC,
)
from recommender_systems_spark.registry import _t, register

PR_ITERS = 3
PR_DAMPING = 0.85

_EDGES_SQL = f"""
    hist AS (
        SELECT l_suppkey AS uid, l_partkey AS iid,
               SUM(CAST(l_quantity AS DOUBLE)) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    capped AS (
        SELECT uid, iid FROM (
            SELECT uid, iid,
                   row_number() OVER (PARTITION BY uid
                                      ORDER BY w DESC, iid) AS rn
            FROM hist)
        WHERE rn <= {_CF_CAP}
    ),
    cooc AS (
        SELECT a.iid AS ia, b.iid AS ib, COUNT(*) AS c
        FROM capped a JOIN capped b
          ON a.uid = b.uid AND a.iid < b.iid
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT ia AS src, ib AS dst FROM cooc WHERE c >= {_CF_MIN_COOC}
        UNION ALL
        SELECT ib AS src, ia AS dst FROM cooc WHERE c >= {_CF_MIN_COOC}
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    nn AS (SELECT COUNT(*) AS c FROM nodes)
"""


def _sql_iter(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
        SELECT e.dst AS id,
               (1.0 - {PR_DAMPING}) / (SELECT c FROM nn)
               + {PR_DAMPING} * SUM({prev}.r / deg.d) AS r
        FROM edges e
        JOIN {prev} ON {prev}.id = e.src
        JOIN deg ON deg.src = e.src
        GROUP BY e.dst
    )"""


_PR_SQL = (
    "WITH "
    + _EDGES_SQL
    + ", r0 AS (SELECT id, 1.0 / (SELECT c FROM nn) AS r FROM nodes),"
    + ",".join(_sql_iter(f"r{i}", f"r{i + 1}") for i in range(PR_ITERS))
    + f"""
    SELECT id AS item,
           round(r * (SELECT c FROM nn), 5) AS pr_scaled
    FROM r{PR_ITERS}
"""
)


@register("g_pagerank", _PR_SQL)
def g_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank ({PR_ITERS} power iterations, damping
    {PR_DAMPING}) over the undirected item co-occurrence graph (edges =
    capped-history co-purchases with support ≥ {_CF_MIN_COOC}, the
    m_item_item_cooc edge set). Emits per-item rank scaled by N (≈1 for
    an average item) — the link-authority signal curation pipelines use
    for domain/page quality weighting.

    Scale shape per iteration: ONE equi-join (ranks onto edge sources —
    degree rides the pre-joined edge frame, computed once) + ONE hash
    aggregate on dst with map-side partial sums. Rank state is (id,
    double) pairs only; the edge frame is checkpointed once and reused
    every iteration, so lineage stays flat and nothing recomputes the
    pair explode. Hot pages (high in-degree) are exactly what AQE
    skew-split handles on the contribution aggregate. N and the
    iteration count are the only driver-side scalars."""
    hist = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_suppkey").alias("uid"), F.col("l_partkey").alias("iid")
        )
        .agg(F.sum(F.col("l_quantity").cast("double")).alias("w"))
    )
    from pyspark.sql import Window

    wcap = Window.partitionBy("uid").orderBy(F.col("w").desc(), F.col("iid"))
    capped = (
        hist.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= _CF_CAP)
        .select("uid", "iid")
    )
    cooc = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.uid") == F.col("b.uid")) & (F.col("a.iid") < F.col("b.iid")),
        )
        .groupBy(F.col("a.iid").alias("ia"), F.col("b.iid").alias("ib"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _CF_MIN_COOC)
    )
    edges = (
        cooc.select(F.col("ia").alias("src"), F.col("ib").alias("dst"))
        .unionAll(cooc.select(F.col("ib").alias("src"), F.col("ia").alias("dst")))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # Degree rides the edge frame once — every iteration reuses it.
    edges_d = edges.join(deg, "src").localCheckpoint()
    nodes = edges_d.select(F.col("src").alias("id")).distinct().localCheckpoint()
    n = nodes.count()
    base = (1.0 - PR_DAMPING) / n
    r = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(PR_ITERS):
        r = (
            edges_d.join(r.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(
                (F.lit(base) + F.lit(PR_DAMPING) * F.sum(F.col("r") / F.col("d"))).alias(
                    "r"
                )
            )
            .localCheckpoint()  # flat lineage: each iteration is one join+agg
        )
    return r.select(
        F.col("id").alias("item"), F.round(F.col("r") * n, 5).alias("pr_scaled")
    )
