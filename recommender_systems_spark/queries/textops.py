"""Text-analysis extension queries: language ID and quality scoring.

The DuckDB oracle SQL is *generated from the same constants* as the
Spark implementation (stopword inventories, weights) so the two can
never drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommender_systems_spark.functions.text import (
    STOPWORDS,
    language_id,
    quality_score,
)
from recommender_systems_spark.registry import _t, register


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _hits_sql(lang: str) -> str:
    return (
        f"len(list_filter(toks, t -> list_contains({_sql_list(STOPWORDS[lang])}, t)))"
    )


_LANG_CASE = " ".join(
    f"WHEN best > 0 AND s_{lang} = best THEN '{lang}'" for lang in STOPWORDS
)

_LANG_SQL = f"""
    WITH t AS (
        SELECT doc_id, lang AS lang_actual,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id, lang_actual,
               {", ".join(f"{_hits_sql(lang)} AS s_{lang}" for lang in STOPWORDS)}
        FROM t
    ),
    b AS (
        SELECT *, greatest({", ".join(f"s_{lang}" for lang in STOPWORDS)}) AS best
        FROM s
    )
    SELECT doc_id, lang_actual,
           CASE {_LANG_CASE} ELSE 'und' END AS lang_guess
    FROM b
"""


@register("t_language_id", _LANG_SQL)
def t_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: heuristic language ID (stopword-hit argmax over small
    per-language inventories; 'und' when no hits — e.g. zh text with
    latin tokenisation). Ties resolve to the earlier language."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        language_id(F.col("text")).alias("lang_guess"),
    )


_QUALITY_SQL = f"""
    WITH t AS (
        SELECT doc_id, text,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) AS alpha_ratio,
               CAST({_hits_sql("en")} AS DOUBLE) / greatest(len(toks), 1)
                   AS stop_ratio,
               CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / greatest(len(toks), 1) AS mean_tok_len
        FROM t
    )
    SELECT doc_id,
           round(0.25 * (CASE WHEN n_tok >= 10 AND n_tok <= 100000
                              THEN 1.0 ELSE 0.0 END)
                 + 0.25 * least(alpha_ratio * 1.25, 1.0)
                 + 0.25 * least(stop_ratio * 4.0, 1.0)
                 + 0.25 * (CASE WHEN mean_tok_len >= 2.0 AND mean_tok_len <= 12.0
                                THEN 1.0 ELSE 0.0 END), 6) AS quality
    FROM m
"""


@register("t_quality_score", _QUALITY_SQL)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: composite document-quality score in [0,1] for
    training-data curation (length band + alpha ratio + stopword ratio
    + token-length band). All built-ins, codegen'd."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(quality_score(F.col("text")), 6).alias("quality")
    )
