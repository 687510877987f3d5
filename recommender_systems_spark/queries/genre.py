"""Genre-pipeline queries (SURVEY §2: S2 list-column parse, F1 split,
F2 dict mapping over arrays, F3 size, F6 dict reversal, A11 grouped
inversion, M5 genre feature-vector update).

The reference's genre pipeline (incl_genre.py:17-69,
explicit_ratings/functions.py:442-488) parses a movie→[genre names]
list column, maps names to ids with a Python dict, inverts it to
genre→[movies], and couples a per-genre feature vector into the ALS
update. Here the 'genre' list of a part is the word list of ``p_name``
(16-word vocabulary — the analogue of MovieLens' 20 genres), the
name→id dict is a literal ``create_map`` (F2's dict mapping, exact
semantics), and both directions of the dict appear (F6 reversal =
id→name CASE in the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommender_systems_spark.registry import _t, register

# The name→id dict (reference incl_genre.py:25-46 hardcodes the 20
# MovieLens genres the same way). Sorted ⇒ ids are rank-stable.
# Single source of truth lives in queries._shared (dependency-free) so
# sibling oracles (abtest) can embed the same fragment without a
# module-level cross-import; re-exported here as the public home.
from recommender_systems_spark.queries._shared import (  # noqa: F401
    GENRE_CTE as _SHARED_GENRE_CTE,
    GENRE_IDS,
    GENRE_WORDS,
)

TAU, BETA = 0.01, 0.01  # incl_genre.py regularisers
EMB_MOD = 500
EMB_DIM = 64

_REV_CASE = "CASE genre_id " + " ".join(
    f"WHEN {i} THEN '{w}'" for w, i in GENRE_IDS.items()
) + " END"

_GENRE_CTE = _SHARED_GENRE_CTE


def _genre_map_col() -> F.Column:
    return F.create_map(
        *[x for w, i in GENRE_IDS.items() for x in (F.lit(w), F.lit(i))]
    )


def _parts_with_genres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+F1+F2+F3: parse the list column and map names→ids."""
    part = _t(spark, sf_dir, "part")
    names = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.transform(names, lambda x: F.element_at(_genre_map_col(), x)).alias(
            "genre_values"
        ),
        F.size(names).alias("genre_count"),
    )


@register(
    "g_genre_invert",
    f"""
    WITH {_GENRE_CTE}
    SELECT genre_id,
           {_REV_CASE} AS genre_name,
           CAST(count(*) AS BIGINT) AS n_parts,
           COALESCE(array_to_string(
               list_sort(list(p_partkey) FILTER (WHERE p_partkey < 300)), ','),
               '') AS parts_sample
    FROM x GROUP BY genre_id
    """,
)
def g_genre_invert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11+F6: invert part→[genre ids] to genre→[parts] (reference's
    genre_key_dict, functions.py:455-488 — a Python dict loop; here
    explode + groupBy + collect_list, one shuffle on the genre id).
    The reverse dict (F6, ab_test.py:218) surfaces as genre_name."""
    m = _parts_with_genres(spark, sf_dir)
    rev = F.create_map(
        *[x for w, i in GENRE_IDS.items() for x in (F.lit(i), F.lit(w))]
    )
    x = m.select("p_partkey", F.explode("genre_values").alias("genre_id"))
    return x.groupBy("genre_id").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("p_partkey") < 300, F.col("p_partkey")))
                ),
                lambda v: v.cast("string"),
            ),
            ",",
        ).alias("parts_sample"),
    ).select(
        "genre_id",
        F.element_at(rev, F.col("genre_id")).alias("genre_name"),
        "n_parts",
        "parts_sample",
    )


@register(
    "g_genre_feature_update",
    f"""
    WITH {_GENRE_CTE},
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    jx AS (SELECT x.genre_id, x.genre_count, e.v
           FROM x JOIN e ON e.vec_id = x.p_partkey % {EMB_MOD}),
    dims AS (SELECT unnest(range(1, {EMB_DIM + 1})) AS dim)
    SELECT jx.genre_id, CAST(dims.dim AS INT) AS dim,
           round({TAU} * sum(v[dim] / sqrt(genre_count))
                 / ({BETA} + {TAU} * sum(1.0 / genre_count)), 6) AS value
    FROM jx, dims
    GROUP BY jx.genre_id, dims.dim
    """,
)
def g_genre_feature_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: the genre feature-vector update (incl_genre.py:199-219) —
    first sweep with F=0, where the reference's formula reduces to

        f_g = τ Σ_{{n∈g}} v_n/√|g_n|  /  (β + τ Σ_{{n∈g}} 1/|g_n|)

    computed per (genre, dimension): explode genres, broadcast-join the
    item vectors, explode dimensions, one hash aggregation. Output is
    16 genres × 64 dims. (Subsequent sweeps subtract the Σf_other pull
    term — same plan shape with F broadcast back in; the 16×64 state is
    driver-resident per SURVEY §7 Phase 4.)"""
    m = _parts_with_genres(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("__k"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    x = m.select(
        "p_partkey", "genre_count", F.explode("genre_values").alias("genre_id")
    ).withColumn("__k", F.col("p_partkey") % EMB_MOD)
    jx = x.join(F.broadcast(e), "__k")
    d = jx.select(
        "genre_id",
        "genre_count",
        "v",
        F.explode(F.sequence(F.lit(1), F.lit(EMB_DIM))).alias("dim"),
    )
    return d.groupBy("genre_id", "dim").agg(
        F.round(
            F.lit(TAU)
            * F.sum(
                F.element_at("v", F.col("dim"))
                / F.sqrt(F.col("genre_count").cast("double"))
            )
            / (
                F.lit(BETA)
                + F.lit(TAU) * F.sum(F.lit(1.0) / F.col("genre_count"))
            ),
            6,
        ).alias("value")
    )
