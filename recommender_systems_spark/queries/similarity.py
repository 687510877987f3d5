"""Similarity-search queries: bucketed ANN over the embeddings table.

``v_cosine_topk`` (queries.core) is the exact brute-force baseline;
``sim_ann_topk`` here is the LSH-bucketed scale path — same output
shape, candidates restricted to the query's hyperplane bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recommender_systems_spark.functions.vector import cosine_similarity
from recommender_systems_spark.registry import _t, register
from recommender_systems_spark.similarity.ann import (
    hyperplane_bucket,
    sql_hyperplane_bucket,
)

N_QUERIES = 10
TOP_K = 5

_ANN_SQL = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               {sql_hyperplane_bucket('CAST(embedding AS DOUBLE[])')} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv, bucket FROM e
          WHERE vec_id < {N_QUERIES}),
    cand AS (
        SELECT q.qid, e.vec_id,
               round(list_dot_product(e.v, q.qv)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(q.qv, q.qv))), 5) AS cos_sim
        FROM q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.qid
    ),
    ranked AS (
        SELECT qid, vec_id, cos_sim,
               CAST(row_number() OVER (
                   PARTITION BY qid ORDER BY cos_sim DESC, vec_id
               ) AS INT) AS rank
        FROM cand
    )
    SELECT qid, vec_id, cos_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


_RECALL_SQL = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               {sql_hyperplane_bucket('CAST(embedding AS DOUBLE[])')} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv, bucket FROM e
          WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.qid, e.vec_id, e.bucket = q.bucket AS same_bucket,
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
    lives in the query's hyperplane bucket (i.e. the recall the
    bucketed path achieves). Computed as one plan: exact brute-force
    ranking with a same-bucket flag, then per-query hit counting —
    the engine measures its own approximation instead of asserting it.
    Raising recall = fewer planes or multi-table union; this query is
    the feedback loop for that knob."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("bucket", hyperplane_bucket("v"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        (F.col("bucket") == F.col("qbucket")).alias("same_bucket"),
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
    """ANN extension: hyperplane-LSH bucketed cosine top-k. One
    projection computes the 6-bit sign bucket per vector (all JVM-side
    HOFs over the Rademacher planes), the query side (vec_id < 10) is
    broadcast, candidates come from the bucket equi-join — O(N/64)
    exact re-ranks per query instead of O(N) — and a per-query window
    takes the top-5. Cosine is rounded BEFORE ranking so tie-breaks are
    engine-independent.

    At 100 TB: same plan, bucket join shuffles (int, vector) pairs;
    skew (dense bucket) handled by AQE; recall tuned by plane count or
    multi-table union (similarity.ann docstring)."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("bucket", hyperplane_bucket("v"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cand = e.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
    ).select(
        "qid",
        "vec_id",
        F.round(cosine_similarity("v", "qv"), 5).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "cos_sim", "rank")
    )
