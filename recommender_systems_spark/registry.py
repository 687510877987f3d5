"""Query registry — the driver-facing catalogue of implemented operators.

Every operator family from SURVEY.md §2 (plus the training-data-pipeline
extensions) is exposed as a named query: a Spark implementation
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, a DuckDB
oracle string over the same parquet tables. ``__spark_entry__.py``
re-exports these to the driver.

Engine-parity rules applied throughout (so the order-insensitive
value-hash matches bit-for-bit):

- Alias every computed column identically on both sides.
- Round float aggregates whose accumulation order differs between
  engines (sums of non-integer doubles); leave exact arithmetic raw.
- Integer-valued double sums (quantities) are exact in IEEE — no round.
- Make every top-k tie-break total (append key columns to the ordering).
- Cast Spark ``size``/INT outputs to long to match DuckDB's BIGINT.
- Vector math upcasts float arrays to double before multiplying, and
  the oracle casts to DOUBLE[] — both engines then do identical IEEE.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from recommender_systems_spark.io import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Every query funnels through here: make sure executor workers can
    # import this package even when the driver session was built
    # elsewhere (the UDF stages reference module functions by path).
    from recommender_systems_spark.deploy import ensure_shipped

    ensure_shipped(spark)
    return load_table(spark, sf_dir, name)


# Populate the registry (import side effects — keep at the bottom).
from recommender_systems_spark.queries import core as _core  # noqa: E402,F401
from recommender_systems_spark.queries import stats as _stats  # noqa: E402,F401
from recommender_systems_spark.queries import textops as _textops  # noqa: E402,F401
from recommender_systems_spark.queries import ml as _ml  # noqa: E402,F401
from recommender_systems_spark.queries import dedup as _dedup  # noqa: E402,F401
from recommender_systems_spark.queries import similarity as _sim  # noqa: E402,F401
from recommender_systems_spark.queries import genre as _genre  # noqa: E402,F401
from recommender_systems_spark.queries import sampling as _sampling  # noqa: E402,F401
from recommender_systems_spark.queries import io_roundtrip as _io_rt  # noqa: E402,F401
from recommender_systems_spark.queries import abtest as _abtest  # noqa: E402,F401
from recommender_systems_spark.queries import multimodal as _mm  # noqa: E402,F401
from recommender_systems_spark.queries import scale as _scale  # noqa: E402,F401
from recommender_systems_spark.queries import neardup as _neardup  # noqa: E402,F401
from recommender_systems_spark.queries import sessions as _sessions  # noqa: E402,F401
from recommender_systems_spark.queries import sketch as _sketch  # noqa: E402,F401
from recommender_systems_spark.queries import splits as _splits  # noqa: E402,F401
