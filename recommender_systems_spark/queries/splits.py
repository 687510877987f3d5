"""Dataset-split & contamination queries (training-data-pipeline
extensions): deterministic hash-based train/val/test assignment and
eval-set n-gram contamination detection.

Both operators are pure functions of the data — split membership is a
range test on md5(doc_id) hex, contamination is an equi-join on the
portable base-31 n-gram hashes shared with ``dedup.minhash`` — so both
carry full value-hash oracles. The same property is what makes them the
right design at 100 TB:

- A split keyed on md5(doc_id) is stable under re-partitioning,
  re-ingestion order, and incremental appends (no ``rand()``, no global
  sort, no state to persist); any engine recomputes the identical
  assignment.
- The contamination check never joins on text: train-side n-grams
  collapse to a distinct 8-byte hash set, eval docs probe it with one
  shuffle equi-join. Train/eval asymmetry (train >> eval) means the
  probe side is small; at 100 TB the train hash set is the big side and
  AQE picks the join strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from recommender_systems_spark.dedup.minhash import (
    shingle_hashes_pandas,
    sql_shingle_hashes,
    sql_shingles,
    sql_tokens,
)
from recommender_systems_spark.functions.text import token_count
from recommender_systems_spark.registry import _t, register

# Split boundaries on the first two md5 hex chars (256 buckets):
# '00'..'cc' → train (205/256 ≈ 80.1%), 'cd'..'e5' → val (25/256 ≈
# 9.8%), 'e6'..'ff' → test (26/256 ≈ 10.2%). Hex compares are plain
# ASCII-lexicographic in both engines.
TRAIN_UPPER = "cd"
VAL_UPPER = "e6"
CONTAM_NGRAM = 8  # word 8-grams — the usual eval-contamination width

_H2_SQL = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)"


def _h2_col() -> Column:
    return F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)


@register(
    "t_split_train_test",
    f"""
    SELECT doc_id,
           CASE WHEN {_H2_SQL} < '{TRAIN_UPPER}' THEN 'train'
                WHEN {_H2_SQL} < '{VAL_UPPER}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def t_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by md5(doc_id) hex range —
    the standard reproducible-split pattern for training corpora
    (~80/10/10). Zero shuffle, zero state: the assignment is a
    projection, so it survives repartitioning and incremental appends
    unchanged, and any engine (here: the DuckDB oracle) reproduces it
    bit-for-bit. Contrast with ``randomSplit``, whose output depends on
    partitioning and seed plumbing."""
    h2 = _h2_col()
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(h2 < TRAIN_UPPER, F.lit("train"))
        .when(h2 < VAL_UPPER, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


_GRAMS_SQL = sql_shingle_hashes(sql_shingles(sql_tokens("text"), CONTAM_NGRAM))

_CONTAM_SQL = f"""
    WITH d AS (SELECT doc_id, text, {_H2_SQL} AS h2 FROM documents),
    g AS (SELECT doc_id, h2, list_distinct({_GRAMS_SQL}) AS hs FROM d),
    tr AS (SELECT DISTINCT unnest(hs) AS h FROM g WHERE h2 < '{TRAIN_UPPER}'),
    ev AS (SELECT doc_id, hs FROM g WHERE h2 >= '{VAL_UPPER}'),
    exp AS (SELECT doc_id, len(hs) AS n_ngrams, unnest(hs) AS h FROM ev),
    hit AS (SELECT e.doc_id, e.n_ngrams, count(tr.h) AS n_cont
            FROM exp e LEFT JOIN tr ON tr.h = e.h
            GROUP BY e.doc_id, e.n_ngrams)
    SELECT doc_id, CAST(n_ngrams AS BIGINT) AS n_ngrams,
           CAST(n_cont AS BIGINT) AS n_contaminated,
           round(n_cont / CAST(n_ngrams AS DOUBLE), 5) AS contamination
    FROM hit
"""


@register("t_contamination", _CONTAM_SQL)
def t_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination detection: for every TEST-split document,
    the fraction of its distinct word 8-grams that also appear anywhere
    in the TRAIN split — the standard leakage check run before training
    on a scraped corpus (a test doc whose n-grams are largely inside
    the train set is memorisable, not held out).

    Plan shape: one projection computes each doc's distinct 8-gram
    hashes (portable base-31 — the oracle runs the same fold), the
    train side collapses to a distinct hash set, and eval docs probe it
    with a LEFT equi-join on the 8-byte hash followed by a per-doc
    count. No text ever shuffles; no cross join exists. Docs shorter
    than 8 tokens contribute their whole-text shingle, matching the
    oracle's CASE."""
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("h2", _h2_col())
        .withColumn("hs", shingle_hashes_pandas(F.col("text"), CONTAM_NGRAM))
        .drop("text")
    )
    train_grams = (
        docs.filter(F.col("h2") < TRAIN_UPPER)
        .select(F.explode("hs").alias("h"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    exp = (
        docs.filter(F.col("h2") >= VAL_UPPER)
        .select("doc_id", F.size("hs").cast("long").alias("n_ngrams"), F.explode("hs").alias("h"))
    )
    return (
        exp.join(train_grams, "h", "left")
        .groupBy("doc_id", "n_ngrams")
        .agg(F.count("__hit").alias("n_contaminated"))
        .select(
            "doc_id",
            "n_ngrams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("n_ngrams").cast("double"), 5
            ).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# Training-shard manifest (export planning for sharded training data)
# ---------------------------------------------------------------------------

N_SHARDS = 16

# Shard = value of the first md5 hex digit (16 shards). `instr` has
# identical semantics in Spark and DuckDB, so the digit→int map is the
# same expression string on both sides.
_SHARD_SQL = (
    "(instr('0123456789abcdef', "
    "substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)"
)

_MANIFEST_SQL = f"""
    SELECT CAST({_SHARD_SQL} AS INTEGER) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
                AS BIGINT) AS n_tokens,
           CAST(sum(length(text)) AS BIGINT) AS n_bytes,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents
    GROUP BY 1
"""


@register("t_shard_manifest", _MANIFEST_SQL)
def t_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment + export manifest — the planning
    artifact for writing a curated corpus out as N training shards
    (shard sizes for the data loader, an id checksum for audit, token
    counts for step-budget math). The companion of t_split_train_test:
    same md5-projection idea, but keyed to a shard NUMBER that a writer
    would feed straight to ``df.repartition(N, "shard")
    .write.partitionBy("shard")``.

    Scale shape: assignment is an in-scan projection (no shuffle,
    stable under appends/repartitioning — a new ingest batch lands in
    the same shards); the manifest itself is one 16-group hash
    aggregate with map-side partials, so the only shuffled rows are
    16 partial tuples per task. All outputs are exact integers —
    bit-for-bit across engines. The shard-balance spread visible in
    n_docs is the empirical answer to "is md5 uniform enough", the
    same evidence a file-size-balanced exporter needs."""
    docs = _t(spark, sf_dir, "documents")
    shard = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
    ).cast("int")
    return (
        docs.select(
            shard.alias("shard"),
            F.col("doc_id"),
            token_count(F.col("text")).alias("nt"),
            F.length("text").alias("nb"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
            F.sum("nb").cast("long").alias("n_bytes"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
    )
