"""Constants shared across query modules.

Lives in a dependency-free module so that sibling query modules can
share tuning constants without importing each other: a module-level
cross-import (graph ← ml) breaks whenever the IMPORTED module is the
process's first entry into the package — registry's import chain then
re-enters it partially initialized (observed: `import queries.ml` →
registry → graph → partially-initialized ml → ImportError).
"""

# Item-item CF / co-occurrence graph (queries.ml.m_item_item_cooc and
# queries.graph.g_pagerank build the same capped-history edge list).
CF_CAP = 40        # per-user history cap bounding the pair explode
CF_MIN_COOC = 2    # minimum co-occurrence for an edge

# ---------------------------------------------------------------------------
# Cross-module SQL fragments.  These live here (not in the query module
# that "owns" them) because sibling query modules that embed them in
# their own oracle strings would otherwise need a module-level
# cross-import — the circular-import class described above.  Only
# dependency-free imports are allowed here (functions.* is fine; query
# modules and registry are not).
# ---------------------------------------------------------------------------

from recommender_systems_spark.functions.text import STOPWORDS as _STOPWORDS

# The A/B arm rule (user-id parity — FIXTURES.md split) as SQL; the
# Spark twin is queries.stats._events_grouped / analytics._events_grouped.
GRP_SQL = """
    SELECT *, CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp
    FROM events
"""


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def sql_stopword_hits(lang: str) -> str:
    """DuckDB twin of functions.text._stopword_hits over a `toks` list."""
    return (
        f"len(list_filter(toks, t -> list_contains({_sql_list(_STOPWORDS[lang])}, t)))"
    )


LANG_CASE = " ".join(
    f"WHEN best > 0 AND s_{lang} = best THEN '{lang}'" for lang in _STOPWORDS
)

# Full stopword-argmax language-ID SQL twin (functions.text.language_id).
LANG_SQL = f"""
    WITH t AS (
        SELECT doc_id, lang AS lang_actual,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id, lang_actual,
               {", ".join(f"{sql_stopword_hits(lang)} AS s_{lang}" for lang in _STOPWORDS)}
        FROM t
    ),
    b AS (
        SELECT *, greatest({", ".join(f"s_{lang}" for lang in _STOPWORDS)}) AS best
        FROM s
    )
    SELECT doc_id, lang_actual,
           CASE {LANG_CASE} ELSE 'und' END AS lang_guess
    FROM b
"""

# ---------------------------------------------------------------------------
# md5-derived uniform U(0,1] — the cross-engine replacement for
# rand(seed) (identical doubles in Spark and DuckDB, stable under
# re-partitioning/retries), shared by sampling.py and abtest.py.
# ---------------------------------------------------------------------------

from pyspark.sql import functions as _F

HEX13 = 16 ** 13


def u01_col(col, salt: str):
    """Spark Column: U(0,1] from the first 13 hex chars of
    md5(f"{col}_{salt}")."""
    return (
        _F.conv(
            _F.substring(_F.md5(_F.concat_ws("_", col, _F.lit(salt))), 1, 13),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / float(HEX13 + 1)


def u01_sql(expr: str, salt: str) -> str:
    """DuckDB twin of ``u01_col`` — byte-identical doubles."""
    return (
        f"(CAST('0x' || substring(md5(CAST({expr} AS VARCHAR) || '_{salt}'), 1, 13)"
        f" AS BIGINT) + 1.0) / {float(HEX13 + 1)!r}"
    )


# ---------------------------------------------------------------------------
# Genre dimension (p_name words → genre ids) — owned by queries.genre,
# SQL fragment hosted here so sibling oracles (abtest) can embed it.
# ---------------------------------------------------------------------------

GENRE_WORDS = [
    "anvil", "blue", "bolt", "cold", "gear", "gizmo", "hot", "large",
    "new", "old", "plate", "red", "ring", "rod", "small", "widget",
]
GENRE_IDS = {w: i for i, w in enumerate(GENRE_WORDS)}

_MAP_CASE = "CASE x " + " ".join(
    f"WHEN '{w}' THEN {i}" for w, i in GENRE_IDS.items()
) + " END"

GENRE_CTE = f"""
    m AS (
        SELECT p_partkey,
               list_transform(string_split(p_name, ' '), x -> {_MAP_CASE})
                   AS genre_values,
               CAST(len(string_split(p_name, ' ')) AS INT) AS genre_count
        FROM part
    ),
    x AS (SELECT p_partkey, genre_count, unnest(genre_values) AS genre_id
          FROM m)
"""
