"""Similarity-search queries: multi-table LSH-bucketed ANN over the
embeddings table.

``v_cosine_topk`` (queries.core) is the exact brute-force baseline;
``sim_ann_topk`` here is the bucketed scale path — same output shape,
candidates restricted to vectors sharing at least one hyperplane-table
bucket with the query. ``sim_ann_recall`` measures the approximation
against the exact ranking in one plan, so the recall/cost knob
(``similarity.ann.N_PLANES`` / ``N_TABLES``) has a built-in feedback
loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recommender_systems_spark.functions.vector import cosine_similarity
from recommender_systems_spark.registry import _t, register
from recommender_systems_spark.similarity.ann import (
    bucket_keys,
    sql_bucket_keys,
)

N_QUERIES = 10
TOP_K = 5

_ANN_SQL = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               {sql_bucket_keys('CAST(embedding AS DOUBLE[])')} AS keys
        FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv, keys AS qkeys FROM e
          WHERE vec_id < {N_QUERIES}),
    eb AS (SELECT vec_id, unnest(keys) AS key FROM e),
    qb AS (SELECT qid, unnest(qkeys) AS key FROM q),
    cand AS (
        SELECT DISTINCT qb.qid, eb.vec_id
        FROM eb JOIN qb ON eb.key = qb.key AND eb.vec_id <> qb.qid
    ),
    scored AS (
        SELECT c.qid, c.vec_id,
               round(list_dot_product(e.v, q.qv)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(q.qv, q.qv))), 5) AS cos_sim
        FROM cand c JOIN e ON e.vec_id = c.vec_id
                    JOIN q ON q.qid = c.qid
    ),
    ranked AS (
        SELECT qid, vec_id, cos_sim,
               CAST(row_number() OVER (
                   PARTITION BY qid ORDER BY cos_sim DESC, vec_id
               ) AS INT) AS rank
        FROM scored
    )
    SELECT qid, vec_id, cos_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


_RECALL_SQL = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               {sql_bucket_keys('CAST(embedding AS DOUBLE[])')} AS keys
        FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv, keys AS qkeys FROM e
          WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.qid, e.vec_id,
               len(list_intersect(e.keys, q.qkeys)) > 0 AS same_bucket,
               round(list_dot_product(e.v, q.qv)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(q.qv, q.qv))), 5) AS cos_sim
        FROM q JOIN e ON e.vec_id <> q.qid
    ),
    exact AS (
        SELECT qid, vec_id, same_bucket,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT qid,
           CAST(sum(CASE WHEN same_bucket THEN 1 ELSE 0 END) AS BIGINT)
               AS ann_hits,
           sum(CASE WHEN same_bucket THEN 1 ELSE 0 END) / {TOP_K}.0
               AS recall_at_{TOP_K}
    FROM exact WHERE rnk <= {TOP_K}
    GROUP BY qid
"""


@register("sim_ann_recall", _RECALL_SQL)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality metric: what fraction of each query's EXACT top-5
    collides with the query in at least one LSH table (= the recall the
    bucketed path achieves). Computed as one plan: exact brute-force
    ranking with an arrays_overlap collision flag, then per-query hit
    counting — the engine measures its own approximation instead of
    asserting it. Raising recall = fewer planes per table or more
    tables; this query is the feedback loop for that knob. (On this
    driver's near-random synthetic embeddings the exact top-5 sits at
    cos ≈ 0.4 — the adversarial case for sign LSH; clustered real
    corpora collide far more often at the same configuration.)"""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("keys", bucket_keys("v"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("keys").alias("qkeys"),
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        F.arrays_overlap("keys", "qkeys").alias("same_bucket"),
        F.round(cosine_similarity("v", "qv"), 5).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    exact = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )
    hits = F.sum(F.when(F.col("same_bucket"), 1).otherwise(0))
    return exact.groupBy("qid").agg(
        hits.cast("long").alias("ann_hits"),
        (hits / float(TOP_K)).alias(f"recall_at_{TOP_K}"),
    )


@register("sim_ann_topk", _ANN_SQL)
def sim_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN extension: multi-table hyperplane-LSH cosine top-k. One
    projection computes the packed (table, bucket) key array per vector
    (all JVM-side HOFs over the Rademacher planes); both sides explode
    to key rows; candidates come from the key equi-join (query side
    broadcast) and are deduped BEFORE the exact re-rank, so each
    (query, candidate) pays exactly one cosine regardless of how many
    tables it collided in. A per-query window takes the top-5. Cosine
    is rounded BEFORE ranking so tie-breaks are engine-independent.

    At 100 TB: same plan — the explode carries (int key, long id) rows
    only (vectors join back AFTER dedup), the key join shuffles
    T×|catalog| small rows; skew (dense bucket) handled by AQE; recall
    tuned by N_PLANES/N_TABLES without changing the plan shape."""
    e = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("keys", bucket_keys("v"))
        .localCheckpoint()  # three consumers: q, key explode, join-back
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("keys").alias("qkeys"),
    )
    eb = e.select("vec_id", F.explode("keys").alias("key"))
    qb = q.select("qid", F.explode("qkeys").alias("key"))
    cand = (
        eb.join(F.broadcast(qb), "key")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(e.select("vec_id", "v")), "vec_id")
        .join(F.broadcast(q.select("qid", "qv")), "qid")
        .select(
            "qid",
            "vec_id",
            F.round(cosine_similarity("v", "qv"), 5).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "cos_sim", "rank")
    )
