"""Driver-side p-values for the A/B harness (SURVEY §2.8 E3-E6, E4).

The distributed side of every test statistic lives in ``queries.stats``
(Welch t, rank-sum z, Brown-Forsythe W) and ``queries.abtest``
(Shapiro-Francia W′): cluster-side aggregations that ship ONE row to
the driver. The p-values need distribution CDFs, which SQL engines
lack; the reference calls scipy (ab_test.py:271-391). This container
has no SciPy, so the CDFs are implemented here from the standard
special-function identities in pure Python:

- Φ via ``math.erf``.
- Student-t and F tail probabilities via the regularised incomplete
  beta function I_x(a,b), computed with the modified-Lentz continued
  fraction (the textbook algorithm; converges in <100 iterations for
  all (a,b) used by these tests).
- Shapiro-Francia significance via Royston's ln(1−W′) normal
  approximation.
"""

from __future__ import annotations

import math

# ---------------------------------------------------------------------------
# Special functions (pure Python, driver-side, O(1) per test)
# ---------------------------------------------------------------------------


def normal_sf(z: float) -> float:
    """P(Z > z) for standard normal."""
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 200):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularised incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf(t: float, df: float) -> float:
    """P(T > t) for Student-t with ``df`` degrees of freedom."""
    if t < 0:
        return 1.0 - t_sf(-t, df)
    return 0.5 * betainc_reg(df / 2.0, 0.5, df / (df + t * t))


def f_sf(f: float, d1: float, d2: float) -> float:
    """P(F > f) for the F distribution with (d1, d2) dof."""
    if f <= 0:
        return 1.0
    return betainc_reg(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))


# ---------------------------------------------------------------------------
# p-values for the harness statistics (reference ab_test.py:271-391)
# ---------------------------------------------------------------------------


def t_test_pvalues(t: float, df: float) -> dict[str, float]:
    """E5: two-tailed + both one-tailed p-values (ttest_ind
    alternatives 'two-sided'/'greater'/'less', ab_test.py:304-347)."""
    greater = t_sf(t, df)
    return {
        "two_sided": 2.0 * min(greater, 1.0 - greater),
        "greater": greater,
        "less": 1.0 - greater,
    }


def rank_sum_pvalues(z: float) -> dict[str, float]:
    """E6: normal-approximation p-values for the Wilcoxon rank-sum z
    (scipy.stats.ranksums, ab_test.py:348-391)."""
    greater = normal_sf(z)
    return {
        "two_sided": 2.0 * min(greater, 1.0 - greater),
        "greater": greater,
        "less": 1.0 - greater,
    }


def levene_pvalue(w_stat: float, k: int, n: int) -> float:
    """E3: P(F_{k-1, n-k} > W) for the Levene/Brown-Forsythe statistic
    (scipy.stats.levene, ab_test.py:271-285)."""
    return f_sf(w_stat, k - 1, n - k)


def shapiro_francia_pvalue(w_prime: float, n: int) -> float:
    """E4: Royston (1993) normal approximation for the Shapiro-Francia
    statistic: ln(1−W′) ~ N(μ, σ) with μ, σ polynomial in ln n /
    ln ln n. Valid for 5 ≤ n ≤ 5000-ish; beyond that normality tests
    reject everything anyway (the reference's scipy.stats.shapiro has
    the same caveat, ab_test.py:287-302)."""
    u = math.log(math.log(n))
    v = math.log(n)
    mu = -1.2725 + 1.0521 * (u - v)
    sigma = 1.0308 - 0.26758 * (u + 2.0 / v)
    z = (math.log(1.0 - w_prime) - mu) / sigma
    return normal_sf(z)
