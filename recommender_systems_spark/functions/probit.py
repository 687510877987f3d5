"""Acklam inverse-normal-CDF (probit) as both a Spark Column
expression and the character-identical DuckDB SQL string.

Dependency-free (pyspark only) so any query module can import it at
module scope: it used to live in queries.abtest, where a module-level
import from a sibling query module re-created the registry import-order
cycle documented in queries/_shared.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (widely published; relative error < 1.15e-9 over (0,1)).
_A = [
    -3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
    1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00,
]
_B = [
    -5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
    6.680131188771972e01, -1.328068155288572e01,
]
_C = [
    -7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
    -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00,
]
_D = [
    7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
    3.754408661907416e00,
]
P_LOW = 0.02425


def _horner_col(coeffs: list[float], x: Column) -> Column:
    out: Column = F.lit(coeffs[0])
    for c in coeffs[1:]:
        out = out * x + F.lit(c)
    return out


def _horner_sql(coeffs: list[float], x: str) -> str:
    out = repr(coeffs[0])
    for c in coeffs[1:]:
        out = f"({out} * {x} + {c!r})"
    return out


def probit_col(p: Column) -> Column:
    """Acklam inverse normal CDF as a Spark expression."""
    q_low = F.sqrt(-2.0 * F.log(p))
    x_low = _horner_col(_C, q_low) / (_horner_col(_D, q_low) * q_low + F.lit(1.0))
    q_high = F.sqrt(-2.0 * F.log(1.0 - p))
    x_high = -(
        _horner_col(_C, q_high) / (_horner_col(_D, q_high) * q_high + F.lit(1.0))
    )
    q_mid = p - F.lit(0.5)
    r = q_mid * q_mid
    x_mid = (
        _horner_col(_A, r)
        * q_mid
        / (_horner_col(_B, r) * r + F.lit(1.0))
    )
    return (
        F.when(p < P_LOW, x_low)
        .when(p > 1.0 - P_LOW, x_high)
        .otherwise(x_mid)
    )


def probit_sql(p: str) -> str:
    """The same approximation, same Horner order, as DuckDB SQL."""
    q_low = f"sqrt(-2.0 * ln({p}))"
    x_low = f"({_horner_sql(_C, q_low)} / ({_horner_sql(_D, q_low)} * {q_low} + 1.0))"
    q_high = f"sqrt(-2.0 * ln(1.0 - ({p})))"
    x_high = (
        f"(-({_horner_sql(_C, q_high)} / "
        f"({_horner_sql(_D, q_high)} * {q_high} + 1.0)))"
    )
    q_mid = f"(({p}) - 0.5)"
    r = f"({q_mid} * {q_mid})"
    x_mid = f"({_horner_sql(_A, r)} * {q_mid} / ({_horner_sql(_B, r)} * {r} + 1.0))"
    return (
        f"(CASE WHEN ({p}) < {P_LOW} THEN {x_low} "
        f"WHEN ({p}) > {1.0 - P_LOW} THEN {x_high} "
        f"ELSE {x_mid} END)"
    )
