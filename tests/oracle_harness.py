"""Local replica of the driver's correctness gate: run each registered
Spark query and its DuckDB oracle side by side and compare row count,
schema-compatible values, and an order-insensitive canonical form.

Values are compared EXACTLY (after each engine's own rounding inside the
query) — if this harness passes, the driver's value-hash comparison
passes too.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from recommender_systems_spark.io import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalise cell values to hash-stable python
    objects, sort rows."""
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            return repr(v)
        if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
            # The DRIVER's canonicalizer pandas-sorts raw cell values and
            # dies on container cells (`TypeError: unhashable type:
            # 'list'`) — round 4 shipped exactly that bug because this
            # replica used to stringify lists first.  Mirror the driver:
            # refuse, loudly.  Queries must serialise arrays to strings
            # (see queries/multimodal.py house hashing rule).
            raise TypeError(
                "unhashable container cell (driver canonicalizer would "
                f"raise): {type(v).__name__} {str(v)[:60]!r} — serialise "
                "array columns to strings in the query"
            )
        return repr(v)

    for c in df.columns:
        df[c] = df[c].map(norm)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def flat_schema_violations(sdf) -> list[str]:
    """Top-level complex-typed columns — the driver's canonicalizer
    cannot sort/hash these (round-4 mm_* failure).  Empty list = safe."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def compare_query(spark, name: str, q_fn, sql: str | None, sf_dir: str):
    """Return (ok, message). Rows-only check when sql is None."""
    sdf = q_fn(spark, sf_dir)
    complex_cols = flat_schema_violations(sdf)
    if complex_cols:
        return False, (
            f"complex top-level columns (driver canonicalizer would "
            f"TypeError): {complex_cols} — serialise to strings"
        )
    spark_pd = sdf.toPandas()
    if sql is None:
        return True, f"rows-only: {len(spark_pd)} rows"
    con = duckdb_connection(sf_dir)
    duck_pd = con.execute(sql).fetchdf()
    con.close()
    if len(spark_pd) != len(duck_pd):
        return False, f"row count: spark={len(spark_pd)} duckdb={len(duck_pd)}"
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        return (
            False,
            f"columns: spark={sorted(spark_pd.columns)} duckdb={sorted(duck_pd.columns)}",
        )
    a, b = canonicalize(spark_pd), canonicalize(duck_pd)
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        n_diff = int(diff_mask.sum())
        sample = pd.concat(
            [a[diff_mask].head(3).assign(engine="spark"),
             b[diff_mask].head(3).assign(engine="duckdb")]
        )
        return False, f"{n_diff}/{len(a)} rows differ:\n{sample.to_string()}"
    return True, f"match: {len(spark_pd)} rows"
