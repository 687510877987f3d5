"""Sources and sinks (SURVEY §2.1, S1-S6).

The reference ingests header CSVs with inferred types
(``explicit_ratings/functions.py:20``) and persists model state as ``.npy``
tensors (``prac_1.py:163-204``). Here every source declares an explicit
schema (no inference — determinism at scale) and model state is Parquet
``(id, features array)`` DataFrames, which is also MLlib's native model
shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Driver-provided star-schema tables (TESTDATA.md / FIXTURES.md §B).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcast-join these.
DIMENSION_TABLES = frozenset({"region", "nation", "supplier", "part"})

# Reference-shaped schemas (FIXTURES.md §A). Declared, never inferred.
RATINGS_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.LongType(), False),
        T.StructField("movieId", T.LongType(), False),
        T.StructField("rating", T.DoubleType(), False),
        T.StructField("timestamp", T.LongType(), True),
    ]
)

MOVIES_SCHEMA = T.StructType(
    [
        T.StructField("movieId", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("genres", T.StringType(), True),
    ]
)

FACTOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)

BIAS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("bias", T.DoubleType(), False),
    ]
)


def cache_key(sf_dir: str, *source_tables: str) -> str:
    """12-hex digest identifying ``sf_dir`` AND the identity (size,
    mtime) of the named source parquet files. Derived caches keyed on
    this digest invalidate automatically when the driver regenerates
    the test data — a path-only key would silently serve a stale cache
    while the DuckDB oracle recomputes from the live files."""
    import hashlib

    key = sf_dir
    for t in source_tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            key += f"|{t}:{st.st_size}:{st.st_mtime_ns}"
        except OSError:
            key += f"|{t}:missing"
    return hashlib.sha1(key.encode()).hexdigest()[:12]


def cache_path(prefix: str, sf_dir: str, *source_tables: str) -> str:
    """Directory under the repo's ``.data_cache`` for a derived artifact
    (fingerprint store, IVF index, bucketed tables), keyed by source
    data identity via ``cache_key``."""
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".data_cache")
    return os.path.join(
        os.path.abspath(root), f"{prefix}_{cache_key(sf_dir, *source_tables)}"
    )


_ROW_COUNT_CACHE: dict[str, int] = {}


def table_rows(sf_dir: str, name: str) -> int:
    """Row count of a driver parquet table from footer METADATA — a
    driver-local pyarrow read, zero Spark jobs. Memoized per file
    identity (path+size+mtime): the adaptive-LSH capacity ladders
    (``similarity.ann.adaptive_bits``, ``dedup.minhash.simhash_n_tables``)
    need only this scalar, and an eager ``df.count()`` per query was a
    measured fixed-overhead regression (VERDICT r10 #2). At 100 TB the
    same scalar comes from the table catalog / manifest statistics —
    never from a full scan."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        key = f"{path}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        key = path
    if key not in _ROW_COUNT_CACHE:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            n = sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        else:
            n = pq.ParquetFile(path).metadata.num_rows
        _ROW_COUNT_CACHE[key] = n
    return _ROW_COUNT_CACHE[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1/S6: read one driver parquet table. Column pruning and predicate
    pushdown reach the scan because callers express plans declaratively.

    Fallback: Spark's parquet reader rejects INT64 TIMESTAMP(NANOS)
    columns (the driver's ``events.ts``); those files are transparently
    rewritten once with nanoseconds truncated to microseconds (exactly
    what DuckDB's reader does) into a local cache, preserving the
    distributed scan path.
    """
    path = f"{sf_dir}/{name}.parquet"
    if _needs_microsecond_copy(path):
        path = _microsecond_copy(path)
    return spark.read.parquet(path)


def _needs_microsecond_copy(path: str) -> bool:
    """Driver-side footer sniff: does this file carry a timestamp[ns]
    column Spark's reader would reject? Costs one local footer read (no
    Spark job) instead of letting ``spark.read`` launch a schema-inference
    job that fails and falls back."""
    if path in _NANOS_CACHE:
        return _NANOS_CACHE[path]
    needs = False
    if os.path.isfile(path):
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq

            schema = pq.read_schema(path)
            needs = any(
                pa.types.is_timestamp(f.type) and f.type.unit == "ns"
                for f in schema
            )
        except Exception:
            needs = False
    _NANOS_CACHE[path] = needs
    return needs


_NANOS_CACHE: dict[str, bool] = {}


def _microsecond_copy(path: str) -> str:
    """Rewrite a parquet file with timestamp[ns] columns cast to
    timestamp[us], cached under the repo. Truncation (not rounding)
    matches DuckDB's ns→us conversion."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    digest = hashlib.sha1(path.encode()).hexdigest()[:12]
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".data_cache"
    )
    out = os.path.join(os.path.abspath(out_dir), f"{digest}.parquet")
    if not os.path.exists(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        table = pq.read_table(path)
        fields = []
        for f in table.schema:
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
                fields.append(pa.field(f.name, pa.timestamp("us")))
            else:
                fields.append(f)
        tmp = out + ".tmp"
        pq.write_table(table.cast(pa.schema(fields), safe=False), tmp)
        os.replace(tmp, out)
    return out


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TESTDATA_TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def read_ratings_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: ratings CSV with declared schema (reference:
    explicit_ratings/functions.py:20 uses pd.read_csv with inference)."""
    return spark.read.schema(RATINGS_SCHEMA).option("header", True).csv(path)


def read_movies_csv(spark: SparkSession, path: str) -> DataFrame:
    """S3: movies dim CSV — titles contain commas/quotes, so quoting on."""
    return (
        spark.read.schema(MOVIES_SCHEMA)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S4: CSV sink (reference: ab_test.py:234 ``to_csv``). ``single_file``
    mirrors pandas' one-file output for small results; large results keep
    their partitioning."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_factors(df: DataFrame, path: str) -> None:
    """S5: model-state sink — Parquet replaces .npy (prac_1.py:163-204)."""
    df.write.mode("overwrite").parquet(path)


def read_factors(spark: SparkSession, path: str) -> DataFrame:
    """S6: model-state source (ab_test.py:72-85 ``np.load``)."""
    return spark.read.parquet(path)
