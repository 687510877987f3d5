"""Genre-coupled ALS (SURVEY §2.7 M5 + genre variants of M2/M3/A10;
reference explicit_ratings/incl_genre.py).

The genre model ties each item vector to the sum of its genres' feature
vectors: the item solve gains an RHS pull term
(τ/√|g_n|)·Σ_{g∈g_n} f_g (incl_genre.py:185-193), and after each
item sweep the 20-genre feature matrix F is re-solved
(incl_genre.py:199-219):

    f_g = τ Σ_{n∈g} (v_n − Σ_{f∈g_n, f≠g} f_f / √|g_n|) / √|g_n|
          / (β + τ Σ_{n∈g} 1/|g_n|)

Spark-first split: F is tiny (G×k ≈ 16×64 doubles) and the update is
SEQUENTIAL over genres (each f_g uses the already-updated earlier
genres, exactly like the reference's in-place loop) — so F lives on
the driver, while everything that touches the ITEM dimension is
distributed and collapses into three tiny aggregates:

    A_g   = Σ_{n∈g} v_n/√c_n              (G×k)
    B_g   = Σ_{n∈g} 1/c_n                 (G)
    C_g,f = Σ_{n∈g, f∈g_n} 1/c_n          (G×G)

after which numerator_g = τ·(A_g − Σ_{f≠g} C_g,f·f_f) and the
sequential driver loop is O(G²k) — microseconds. One distributed pass
per sweep, G²+Gk+G floats to the driver, regardless of item count.

Note: the reference's ITEM-BIAS accumulator has a bug (incl_genre.py
:164-169 assigns instead of summing, so only the last rating
contributes); we implement the mathematically intended sum, matching
the user-side update it mirrors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recommender_systems_spark.ml.als import (
    DEFAULT_ALPHA,
    DEFAULT_LMD,
    DEFAULT_RANK,
    DEFAULT_TAU,
    AlsBiasModel,
    als_half_sweep,
    init_factors,
    rmse,
)

DEFAULT_BETA = 0.01  # genre-feature regulariser (incl_genre.py)


def genre_pull(
    genres: DataFrame, f_state: np.ndarray, spark, tau: float
) -> DataFrame:
    """(id, pull) with pull = (τ/√c_n)·Σ_{g∈g_n} f_g — the RHS term for
    the item half-sweep. F is broadcast as a literal nested array (G×k
    = 128 doubles — constant-sized at any data scale); the per-item sum
    is a map-side fold over ≤|g_n| genres, no exchange. (A data-driven
    explode→join→groupBy variant was measured ~1 s/iteration SLOWER at
    sf0.1: the per-sweep literal recompile costs less than the extra
    item-keyed shuffle it would avoid.)"""
    g, k = f_state.shape
    f_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in f_state]
    )
    zeros = F.array(*[F.lit(0.0) for _ in range(k)])
    summed = F.aggregate(
        F.col("genre_values"),
        zeros,
        lambda acc, gv: F.zip_with(
            acc, F.element_at(f_lit, gv + 1), lambda a, b: a + b
        ),
    )
    scale = F.lit(tau) / F.sqrt(F.col("genre_count").cast("double"))
    return genres.select(
        F.col("item").cast("long").alias("id"),
        F.transform(summed, lambda x: x * scale).alias("pull"),
    )


def genre_feature_stats(
    item_factors: DataFrame, genres: DataFrame, n_genres: int, rank: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One distributed pass building the A (G×k), B (G), C (G×G)
    aggregates over the item dimension."""
    base = genres.select(
        F.col("item").cast("long").alias("id"),
        "genre_values",
        F.col("genre_count").cast("double").alias("c"),
    ).join(item_factors.select("id", "features"), "id")
    # One distributed pass: double-explode to (g, f) granularity, fold
    # ALL THREE aggregates into a single groupBy(g, f) — the A terms sum
    # only over the f==g diagonal rows (each item appears exactly once
    # per containing genre there), B is the diagonal of the C weights.
    # G² result rows regardless of item count; halves the per-sweep
    # driver round-trips vs separate A/B and C collections.
    pairs = base.select(
        F.explode("genre_values").alias("g"),
        "genre_values",
        "c",
        "features",
    ).select("g", F.explode("genre_values").alias("f"), "c", "features")
    diag = F.col("f") == F.col("g")
    rows = (
        pairs.groupBy("g", "f")
        .agg(
            F.sum(1.0 / F.col("c")).alias("w"),
            *[
                F.sum(
                    F.when(diag, F.element_at("features", i + 1) / F.sqrt("c"))
                ).alias(f"a_{i}")
                for i in range(rank)
            ],
        )
        .collect()
    )
    a_mat = np.zeros((n_genres, rank))
    b_vec = np.zeros(n_genres)
    c_mat = np.zeros((n_genres, n_genres))
    for r in rows:
        g, f = int(r["g"]), int(r["f"])
        c_mat[g, f] = r["w"]
        if g == f:
            b_vec[g] = r["w"]
            a_mat[g] = [r[f"a_{i}"] for i in range(rank)]
    return a_mat, b_vec, c_mat


def update_genre_features(
    f_state: np.ndarray,
    a_mat: np.ndarray,
    b_vec: np.ndarray,
    c_mat: np.ndarray,
    tau: float,
    beta: float,
) -> np.ndarray:
    """The reference's sequential per-genre solve (incl_genre.py:199-219)
    on the collected aggregates: each genre sees the already-updated
    values of earlier genres, exactly like the in-place NumPy loop."""
    f_new = f_state.copy()
    g = f_state.shape[0]
    for key in range(g):
        cross = c_mat[key] @ f_new - c_mat[key, key] * f_new[key]
        numerator = tau * (a_mat[key] - cross)
        denominator = beta + tau * b_vec[key]
        f_new[key] = numerator / denominator
    return f_new


def train_als_genre(
    ratings: DataFrame,
    genres: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    n_genres: int,
    rank: int = DEFAULT_RANK,
    lmd: float = DEFAULT_LMD,
    tau: float = DEFAULT_TAU,
    alpha: float = DEFAULT_ALPHA,
    beta: float = DEFAULT_BETA,
    max_iter: int = 10,
    seed: int = 42,
    rmse_every_iter: bool = True,
) -> tuple[AlsBiasModel, np.ndarray]:
    """The incl_genre.py training loop: user half-sweep (plain), item
    half-sweep with the genre pull in the RHS, then the driver F solve
    from one distributed stats pass. ``genres`` is
    (item, genre_values array<int>, genre_count int).

    Monitoring cost: per-iteration RMSE jobs run on a background
    thread over the iteration's CHECKPOINTED (immutable) factor
    snapshots, so they overlap the next iteration's sweeps instead of
    sitting on the critical path; only the final iteration's RMSE is
    awaited serially. ``rmse_every_iter=False`` drops the intermediate
    monitors entirely (history = [final]) for callers that only need
    the converged error."""
    spark = ratings.sparkSession
    r = ratings.select(
        F.col(user_col).cast("long").alias("u"),
        F.col(item_col).cast("long").alias("i"),
        F.col(rating_col).cast("double").alias("r"),
    ).localCheckpoint()
    # Three consumers per iteration (pull, A/B stats, C stats) re-derive
    # the genre parse otherwise — materialise the small dimension once.
    genres = genres.localCheckpoint()
    u_f = init_factors(r.select("u").distinct(), "u", rank, seed).localCheckpoint()
    v_f = init_factors(
        r.select("i").distinct(), "i", rank, seed + 1
    ).localCheckpoint()
    f_state = np.zeros((n_genres, rank))

    from concurrent.futures import ThreadPoolExecutor

    monitor = ThreadPoolExecutor(max_workers=1)
    rmse_futures = []
    try:
        for it in range(max_iter):
            new_u = als_half_sweep(
                r, "u", "i", "r", u_f, v_f, lmd, tau, alpha, rank
            ).localCheckpoint()
            pull = genre_pull(genres, f_state, spark, tau)
            new_v = als_half_sweep(
                r, "i", "u", "r", v_f, new_u, lmd, tau, alpha, rank, rhs_pull=pull
            ).localCheckpoint()
            u_f, v_f = new_u, new_v
            a_mat, b_vec, c_mat = genre_feature_stats(v_f, genres, n_genres, rank)
            f_state = update_genre_features(f_state, a_mat, b_vec, c_mat, tau, beta)
            if rmse_every_iter or it == max_iter - 1:
                rmse_futures.append(
                    monitor.submit(rmse, r, "u", "i", "r", u_f, v_f, dim=rank)
                )
        rmse_hist = [fut.result() for fut in rmse_futures]
    finally:
        monitor.shutdown(wait=True)
    return AlsBiasModel(u_f, v_f, rmse_hist, [], False), f_state
