"""Implicit-feedback ALS (Hu, Koren & Volinsky, "Collaborative
Filtering for Implicit Feedback Datasets", ICDM 2008) — the canonical
third trainer next to the reference's explicit bias-ALS
(explicit_ratings/prac_1.py) and BPR (implicit_feedback/prac_2.py).
The reference curates implicit feedback for BPR
(implicit_feedback/functions.py:278-325); iALS is the
confidence-weighted least-squares treatment of the SAME signal, and
the engine exposes both so a reference user can switch objectives
without leaving the API.

Model: every (user, item) pair has preference p = 1[observed] and
confidence c = 1 + α·r. Alternating ridge solves minimize

    L = Σ_{ALL u,i} c_ui (p_ui − x_u·y_i)² + λ(‖X‖² + ‖Y‖²)

The 100-TB trick is the paper's own: the normal matrix for user u is

    YᵀY + Yᵀ(C_u − I)Y + λI

where YᵀY is ONE k×k Gram shared by every user — computed once per
half-sweep from dimension-sized partials — and the (C_u − I) correction
touches only u's observed items. Per-user work is O(|Ω_u|·k² + k³),
independent of the catalog size; the unobserved majority is never
materialised.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recommender_systems_spark.ml.als import SOLVE_BUCKETS, init_factors

IALS_ALPHA = 1.0   # confidence slope: c = 1 + α r
IALS_LMD = 0.1     # L2 regularisation
IALS_RANK = 8


def _gram(factors: DataFrame, k: int) -> np.ndarray:
    """FᵀF as a k×k driver matrix from per-batch BLAS partials — each
    Arrow batch ships exactly k² doubles regardless of row count (the
    v_embedding_spectrum shape; the k×k rule allows the driver hop)."""

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["features"]]
            )
            g = x.T @ x
            ii, jj = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "s": g.ravel()}
            )

    rows = (
        factors.select("features")
        .mapInPandas(partial, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    g = np.zeros((k, k))
    for r in rows:
        g[r["i"], r["j"]] = r["s"]
    return g


def _half_sweep(
    ratings: DataFrame,
    self_col: str,
    other_col: str,
    rating_col: str,
    other_factors: DataFrame,
    k: int,
    alpha: float,
    lmd: float,
    gram: np.ndarray | None = None,
) -> DataFrame:
    """Re-solve every `self_col` entity against frozen other-side
    factors. One join (ratings ⋈ other factors), one bucketed
    applyInPandas; the shared Gram rides the closure (k² doubles).
    Callers that already hold Gram(other_factors) — the objective
    monitor computes it every iteration — pass it via ``gram`` to skip
    the recomputation job."""
    if gram is None:
        gram = _gram(other_factors, k)

    data = ratings.select(
        F.col(self_col).cast("long").alias("id"),
        F.col(other_col).cast("long").alias("other_id"),
        F.col(rating_col).cast("double").alias("r"),
    ).join(
        other_factors.select(
            F.col("id").alias("other_id"), F.col("features").alias("of")
        ),
        "other_id",
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_feat = [], []
        y_all = np.stack(pdf["of"].to_numpy())
        r_all = pdf["r"].to_numpy(dtype=np.float64)
        lam_eye = lmd * np.eye(k)
        for eid, idx in pdf.groupby("id", sort=False).indices.items():
            y = y_all[idx]
            cm1 = alpha * r_all[idx]  # c − 1, observed rows only
            a_mat = gram + (y.T * cm1) @ y + lam_eye
            rhs = y.T @ (1.0 + cm1)  # Yᵀ C p, p = 1 on observed
            vec = np.linalg.solve(a_mat, rhs)
            out_ids.append(int(eid))
            out_feat.append(vec.tolist())
        return pd.DataFrame({"id": out_ids, "features": out_feat})

    return (
        data.withColumn("__b", F.pmod(F.col("id"), F.lit(SOLVE_BUCKETS)))
        .groupBy("__b")
        .applyInPandas(solve, schema="id long, features array<double>")
    )


def _gram_partials(factors: DataFrame, k: int, tag: str) -> DataFrame:
    """Gram partials as a composable (t, i, j, s) subtree — the union
    leg of the fused monitor (same per-batch BLAS as ``_gram``, merged
    by the same (i, j) aggregate, collected by the CALLER's single
    action instead of its own)."""

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["features"]]
            )
            g = x.T @ x
            ii, jj = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "s": g.ravel()}
            )

    return (
        factors.select("features")
        .mapInPandas(partial, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .select(F.lit(tag).alias("t"), "i", "j", "s")
    )


def ials_monitor(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    user_factors: DataFrame,
    item_factors: DataFrame,
    k: int,
    alpha: float = IALS_ALPHA,
    lmd: float = IALS_LMD,
    gram_x: np.ndarray | None = None,
) -> tuple[float, np.ndarray]:
    """Exact confidence-weighted objective over ALL pairs in ONE Spark
    action; returns (objective, Gram(item_factors)) so the next user
    half-sweep reuses the Gram without another job.

    The Gram identity does all the work: Σ_all (x·y)² =
    trace(YᵀY · XᵀX), and the regulariser norms are the two traces —
    so the whole background term needs only the two k×k Grams, whose
    partials (k² doubles per Arrow batch) UNION with the 1-row
    observed-correction aggregate c(1−x·y)² − (x·y)² into a single
    collect. Pass ``gram_x`` = Gram(user_factors) if the item
    half-sweep already computed it; then only the Y-partials and the
    correction ride the union. Never materialises M×N anything."""
    parts = _gram_partials(item_factors, k, "y")
    if gram_x is None:
        parts = parts.unionByName(_gram_partials(user_factors, k, "x"))
    # Observed correction: c(1 − x·y)² − (x·y)²
    pred_part = (
        ratings.select(
            F.col(user_col).cast("long").alias("uid"),
            F.col(item_col).cast("long").alias("iid"),
            F.col(rating_col).cast("double").alias("r"),
        )
        .join(
            user_factors.select(F.col("id").alias("uid"), F.col("features").alias("xu")),
            "uid",
        )
        .join(
            item_factors.select(F.col("id").alias("iid"), F.col("features").alias("yi")),
            "iid",
        )
        .select(
            F.col("r"),
            F.aggregate(
                F.zip_with("xu", "yi", lambda a, b: a * b),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("s"),
        )
        .select(
            (
                (1.0 + F.lit(alpha) * F.col("r"))
                * (1.0 - F.col("s")) * (1.0 - F.col("s"))
                - F.col("s") * F.col("s")
            ).alias("contrib")
        )
        .agg(F.coalesce(F.sum("contrib"), F.lit(0.0)).alias("s"))
        .select(
            F.lit("p").alias("t"),
            F.lit(-1).alias("i"),
            F.lit(-1).alias("j"),
            "s",
        )
    )
    rows = parts.unionByName(pred_part).collect()
    gram_y = np.zeros((k, k))
    gx = np.zeros((k, k)) if gram_x is None else gram_x
    pred = 0.0
    for row in rows:
        if row["t"] == "y":
            gram_y[row["i"], row["j"]] = row["s"]
        elif row["t"] == "x":
            gx[row["i"], row["j"]] = row["s"]
        else:
            pred = float(row["s"])
    all_sq = float(np.trace(gx @ gram_y))  # Σ_all (x·y)², background
    obj = all_sq + pred + lmd * (float(np.trace(gx)) + float(np.trace(gram_y)))
    return float(obj), gram_y


def ials_objective(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    user_factors: DataFrame,
    item_factors: DataFrame,
    k: int,
    alpha: float = IALS_ALPHA,
    lmd: float = IALS_LMD,
    gram_y: np.ndarray | None = None,
) -> float:
    """Standalone objective — thin wrapper over the fused
    ``ials_monitor`` (one Spark action regardless of ``gram_y``, which
    is accepted for API compatibility; the monitor's union recomputes
    both Grams in the same single action, so passing it saves
    nothing)."""
    del gram_y
    obj, _ = ials_monitor(
        ratings, user_col, item_col, rating_col,
        user_factors, item_factors, k, alpha, lmd,
    )
    return obj


def train_ials(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    rank: int = IALS_RANK,
    max_iter: int = 2,
    alpha: float = IALS_ALPHA,
    lmd: float = IALS_LMD,
    seed: int = 7,
    monitor: bool = True,
) -> tuple[DataFrame, DataFrame, list[float]]:
    """Alternating confidence-weighted sweeps; returns (user factors,
    item factors, per-iteration objective trajectory). Each full
    iteration is two half-sweeps (users, then items) + one objective
    pass; factor frames are localCheckpointed so lineage stays flat
    across sweeps (the train_als_bias pattern).

    ``monitor=False`` (the train_als_genre pattern) skips the
    per-iteration objective passes and returns history = [final
    objective] — for callers that only need the trained factors plus a
    convergence sanity number. On the monitored path, the objective's
    Gram(Y) is handed to the next iteration's user half-sweep, so
    monitoring adds no duplicate Gram job."""
    users = ratings.select(
        F.col(user_col).cast("long").alias("id")
    ).distinct()
    items = ratings.select(
        F.col(item_col).cast("long").alias("id")
    ).distinct()
    # Lazy user-side checkpoints + Gram chaining keep each iteration at
    # THREE Spark actions on the monitored path: the Gram(uf) collect
    # (which materialises the lazy user-side checkpoint and feeds the
    # item half-sweep's closure), the eager item-side checkpoint, and
    # the fused monitor collect (objective AND Gram(vf) for the next
    # user half-sweep in one job). The old path paid ~6 actions per
    # iteration (2 eager checkpoints, 2 sweep-internal Grams, quad +
    # correction collects). A round-12 experiment that split the fused
    # monitor into a Gram collect + a background pred-correction job
    # measured 60% SLOWER (9.3 → 15.1 s at sf0.1): the split re-runs
    # the ratings⋈factors join as an extra data-sized job per
    # iteration, which costs more than the serial monitor it hides —
    # keep the fusion.
    uf = (
        init_factors(users, "id", rank, seed, scale=0.1)
        .drop("bias")
        .localCheckpoint(eager=False)
    )
    vf = (
        init_factors(items, "id", rank, seed + 1, scale=0.1)
        .drop("bias")
        .localCheckpoint(eager=False)
    )
    history: list[float] = []
    gram_v = _gram(vf, rank)  # materialises vf; carried across iterations
    for _ in range(max_iter):
        uf = _half_sweep(
            ratings, user_col, item_col, rating_col, vf, rank, alpha, lmd,
            gram=gram_v,
        ).localCheckpoint(eager=False)
        gram_u = _gram(uf, rank)  # materialises uf
        # EAGER: the monitor reads vf from TWO subtrees (Gram partials
        # + the observed-correction join); a lazy checkpoint would
        # re-run the applyInPandas solve once per subtree inside the
        # monitor's job (measured: +0.8 s/iteration at sf0.1).
        vf = _half_sweep(
            ratings, item_col, user_col, rating_col, uf, rank, alpha, lmd,
            gram=gram_u,
        ).localCheckpoint()
        if monitor:
            obj, gram_v = ials_monitor(
                ratings, user_col, item_col, rating_col, uf, vf, rank,
                alpha, lmd, gram_x=gram_u,
            )
            history.append(obj)
        else:
            gram_v = _gram(vf, rank)  # materialises vf for the next sweep
    if not monitor:
        history.append(
            ials_objective(
                ratings, user_col, item_col, rating_col, uf, vf, rank,
                alpha, lmd,
            )
        )
    return uf, vf, history
