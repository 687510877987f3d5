"""Vector kernels over array columns — all JVM-side higher-order
functions, no Python UDFs (SURVEY M1/M14: np.dot at prac_1.py:72,
np.linalg.norm at prac_1_results.py:104).

These Column builders keep dot products / norms inside whole-stage
codegen, which is what makes full-catalog scoring (M13) and brute-force
cosine ANN viable at scale: the inner loop never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(u: Column | str, v: Column | str) -> Column:
    """u · v for two equal-length array columns (any width)."""
    return F.aggregate(
        F.zip_with(_c(u), _c(v), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# Measured dead end, kept as a note: unrolling the dot product into a
# 64-term element_at chain ("stay in codegen") is ~4× SLOWER than the
# HOF fold at dim=64 — per-element bounds/null checks and a deep Add
# tree beat the interpreter's tight array loop. The HOF form wins; the
# actual scoring-join lever is scan parallelism (see queries.ml._scored).


def l2_norm(v: Column | str) -> Column:
    """‖v‖₂ (reference: np.linalg.norm(V, axis=1))."""
    return F.sqrt(F.aggregate(_c(v), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(u: Column | str, v: Column | str) -> Column:
    """cos(u, v) with 0 for zero-norm inputs."""
    denom = l2_norm(u) * l2_norm(v)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_product(u, v) / denom)
