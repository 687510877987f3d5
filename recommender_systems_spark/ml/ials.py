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

from recommender_systems_spark.ml.als import SOLVE_BUCKETS, bucketed, init_factors

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
    with_objective_stats: bool = False,
) -> DataFrame:
    """Re-solve every `self_col` entity against frozen other-side
    factors. One join (ratings ⋈ other factors), one bucketed
    applyInPandas; the shared Gram rides the closure (k² doubles).
    Callers that already hold Gram(other_factors) — the objective
    monitor computes it every iteration — pass it via ``gram`` to skip
    the recomputation job.

    ``with_objective_stats=True`` (the fused-monitor item sweep) adds a
    ``corr`` column: each entity's observed-correction contribution
    Σ_obs [c·(1 − x·y)² − (x·y)²] evaluated with the FRESHLY solved
    vector — the solve already holds y (other-side features) and the
    confidence weights, so the term is a free GEMV per entity and the
    exact objective needs no separate ratings⋈factors pass (round-13:
    this is what took the iteration from 3 Spark actions to 2)."""
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
        out_ids, out_feat, out_corr = [], [], []
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
            if with_objective_stats:
                s = y @ vec  # x·y over this entity's observed rows
                out_corr.append(
                    float((((1.0 + cm1) * (1.0 - s) ** 2) - s**2).sum())
                )
        cols = {"id": out_ids, "features": out_feat}
        if with_objective_stats:
            cols["corr"] = out_corr
        return pd.DataFrame(cols)

    schema = "id long, features array<double>"
    if with_objective_stats:
        schema += ", corr double"
    # NOT `bucketed`-pinned — same adjudication as als.als_half_sweep:
    # this sweep is Arrow-I/O-bound, AQE coalescing wins (pin measured
    # ~2× slower per phase at sf0.1, round-13 A/B).
    return (
        data.withColumn("__b", F.pmod(F.col("id"), F.lit(SOLVE_BUCKETS)))
        .groupBy("__b")
        .applyInPandas(solve, schema=schema)
    )


def _gram_and_corr(factors: DataFrame, k: int) -> tuple[np.ndarray, float]:
    """ONE traversal of a (features, corr) factor frame → (FᵀF, Σcorr)
    on the driver. Reads ``factors`` exactly once, so a LAZY
    localCheckpoint upstream is materialised by this very collect with
    no double-compute — the fused item-sweep/monitor action."""

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
                {
                    "i": np.append(ii.ravel(), -1),
                    "j": np.append(jj.ravel(), -1),
                    "s": np.append(g.ravel(), pdf["corr"].to_numpy().sum()),
                }
            )

    rows = (
        factors.select("features", "corr")
        .mapInPandas(partial, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    g = np.zeros((k, k))
    corr = 0.0
    for r in rows:
        if r["i"] < 0:
            corr = float(r["s"])
        else:
            g[r["i"], r["j"]] = r["s"]
    return g, corr


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
    # TWO Spark actions per iteration (round-13, was three): the
    # Gram(uf) collect (materialises the lazy user-side checkpoint and
    # feeds the item half-sweep's closure), and the fused
    # sweep+monitor collect — the item solve emits each entity's
    # observed-correction term alongside its fresh vector
    # (`with_objective_stats`), so `_gram_and_corr`'s single traversal
    # of the lazily-checkpointed item factors yields Gram(vf) for the
    # next user sweep AND the exact objective via the Gram identity
    #     L = tr(Gx·Gy) + Σ corr + λ(tr Gx + tr Gy)
    # with no separate ratings⋈factors monitor pass at all. The r12
    # shape paid a third action (eager item checkpoint) because the
    # old monitor read vf from two subtrees; the fused stats remove
    # the second subtree, so the checkpoint can go lazy and be
    # materialised by the monitor collect itself. (A r12 experiment
    # that split monitor work into extra data-sized jobs measured 60%
    # SLOWER — fusion into existing passes is the only direction that
    # pays.)
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
    obj = None
    for _ in range(max_iter):
        uf = _half_sweep(
            ratings, user_col, item_col, rating_col, vf, rank, alpha, lmd,
            gram=gram_v,
        ).localCheckpoint(eager=False)
        gram_u = _gram(uf, rank)  # materialises uf
        vf = _half_sweep(
            ratings, item_col, user_col, rating_col, uf, rank, alpha, lmd,
            gram=gram_u, with_objective_stats=True,
        ).localCheckpoint(eager=False)
        # Single-read fused collect: materialises vf, returns Gram(vf)
        # + Σcorr; the exact objective is then pure driver arithmetic.
        gram_v, corr = _gram_and_corr(vf, rank)
        obj = float(
            np.trace(gram_u @ gram_v)
            + corr
            + lmd * (np.trace(gram_u) + np.trace(gram_v))
        )
        if monitor:
            history.append(obj)
        vf = vf.drop("corr")
    if not monitor and obj is not None:
        history.append(obj)
    return uf, vf, history
