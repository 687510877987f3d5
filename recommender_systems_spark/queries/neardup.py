"""The remaining two near-dup flavours as first-class queries:
char-n-gram Jaccard (exact verify over LSH candidates) and
embedding-cosine near-dup (bucketed pair search).

Together with ``dedup_exact`` (dual fingerprint), ``dedup_minhash``
(word-shingle MinHash-LSH) and ``dedup_simhash`` (bit-sketch
pigeonhole), this completes the dedup family: every flavour is its own
``queries()`` entry with a full value-hash oracle, and none of them
contains a cross join — candidates always come from an equi-join on a
sketch key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommender_systems_spark.dedup.minhash import (
    LSH_BANDS,
    band_key,
    minhash_struct_pandas,
    sql_band_key,
    sql_char_ngrams,
    sql_minhash_signature,
    sql_shingle_hashes,
    sql_shingles,
    sql_tokens,
)
from recommender_systems_spark.functions.vector import dot_product
from recommender_systems_spark.registry import _t, register
from recommender_systems_spark.similarity.ann import (
    bucket_keys,
    sql_bucket_keys,
)

NGRAM_N = 5
COSINE_THRESHOLD = 0.35

_BANDS_SQL = " UNION ALL ".join(
    f"(SELECT doc_id, {b} AS band, {sql_band_key('sig', b)} AS key FROM sig)"
    for b in range(LSH_BANDS)
)

_NGRAM_SQL = f"""
    WITH sh AS (
        SELECT doc_id, {sql_shingles(sql_tokens('text'))} AS shingles,
               list_distinct({sql_char_ngrams('text', NGRAM_N)}) AS grams
        FROM documents
    ),
    hs AS (SELECT doc_id, grams, {sql_shingle_hashes('shingles')} AS hs FROM sh),
    sig AS (SELECT doc_id, grams, {sql_minhash_signature('hs')} AS sig FROM hs),
    bands AS ({_BANDS_SQL}),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.key = b.key
                    AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           round(CAST(len(list_distinct(list_intersect(ga.grams, gb.grams)))
                      AS DOUBLE)
                 / (len(ga.grams) + len(gb.grams)
                    - len(list_distinct(list_intersect(ga.grams, gb.grams)))),
                 5) AS ngram_jaccard
    FROM pairs p
    JOIN sig ga ON ga.doc_id = p.doc_a
    JOIN sig gb ON gb.doc_id = p.doc_b
"""


@register("dedup_ngram_jaccard", _NGRAM_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup flavour: exact char-5-gram Jaccard, verified on
    MinHash-LSH candidates only — the standard two-stage funnel
    (sketch candidates → exact measure). Character grams catch
    near-dups that word shingles miss (whitespace/punctuation edits);
    the candidate set is the band equi-join, so the exact O(|gramsets|)
    comparison runs on ~25 pairs, not 125k."""
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # Arrow kernel: value-identical to array_distinct(char_ngrams(text))
    # + minhash_signature(shingle_hashes(text)) — see
    # dedup.minhash.minhash_struct_pandas.
    sh = (
        docs.select(
            "doc_id",
            minhash_struct_pandas(F.col("text"), char_gram_n=NGRAM_N).alias("s"),
        )
        .select("doc_id", F.col("s.da").alias("grams"), F.col("s.sig").alias("sig"))
        .localCheckpoint()
    )
    bands = sh.select(
        "doc_id",
        F.posexplode(
            F.array(*[band_key(F.col("sig"), b) for b in range(LSH_BANDS)])
        ).alias("band", "key"),
    )
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ver = pairs.join(
        sh.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga")),
        "doc_a",
    ).join(
        sh.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    return ver.select(
        "doc_a",
        "doc_b",
        F.round(
            inter / (F.size("ga") + F.size("gb") - inter), 5
        ).alias("ngram_jaccard"),
    )


_EMB_COS_SQL = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               {sql_bucket_keys('CAST(embedding AS DOUBLE[])')} AS keys
        FROM embeddings
    ),
    eb AS (SELECT vec_id, unnest(keys) AS key FROM e),
    pairs AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM eb a JOIN eb b ON a.key = b.key AND a.vec_id < b.vec_id
    )
    SELECT p.vec_a, p.vec_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 5) AS cos_sim
    FROM pairs p
    JOIN e a ON a.vec_id = p.vec_a
    JOIN e b ON b.vec_id = p.vec_b
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= {COSINE_THRESHOLD}
"""


@register("dedup_embedding_cosine", _EMB_COS_SQL)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup flavour: embedding-cosine — semantically-near pairs
    (cos ≥ 0.35) found WITHOUT an all-pairs product: candidates share
    at least one multi-table hyperplane bucket (similarity.ann), exact
    cosine filters the candidates. Cosine-close vectors agree on
    hyperplane signs with high probability, so recall concentrates
    exactly where near-dup detection needs it; N_TABLES unions raise it
    at the same plan shape.

    Scale shape: the key explode carries (int, long) rows only; pairs
    are deduped across tables BEFORE the vectors join back, so each
    candidate pair pays exactly one dot product + one divide. Norms are
    computed ONCE per vector (not per pair) — ‖a‖ is the same double
    either way, so cos = dot/(‖a‖·‖b‖) stays bit-identical to the
    oracle's per-pair sqrt form. The join-backs broadcast here (the
    sketch table is dimension-sized at sf0.1); at 100 TB they become
    ordinary shuffle joins on vec_id with the same plan shape."""
    from recommender_systems_spark.functions.vector import l2_norm

    e = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", "v", l2_norm("v").alias("nrm"), bucket_keys("v").alias("keys"))
        .localCheckpoint()
    )
    eb = e.select("vec_id", F.explode("keys").alias("key"))
    pairs = (
        eb.alias("a")
        .join(
            eb.alias("b"),
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    scored = (
        pairs.join(
            F.broadcast(
                e.select(
                    F.col("vec_id").alias("vec_a"),
                    F.col("v").alias("va"),
                    F.col("nrm").alias("na"),
                )
            ),
            "vec_a",
        )
        .join(
            F.broadcast(
                e.select(
                    F.col("vec_id").alias("vec_b"),
                    F.col("v").alias("vb"),
                    F.col("nrm").alias("nb"),
                )
            ),
            "vec_b",
        )
        .select(
            "vec_a",
            "vec_b",
            (dot_product("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos_raw"),
        )
    )
    return (
        scored.filter(F.col("cos_raw") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cos_raw", 5).alias("cos_sim"))
    )
