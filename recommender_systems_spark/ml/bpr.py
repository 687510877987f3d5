"""Bayesian Personalised Ranking on implicit feedback (SURVEY §2.7
M7-M9, §3 entry point 3).

The reference (implicit_feedback/functions.py:6-210, prac_2.py:88-115)
trains BPR with per-triplet SGD: for each user and each positive item,
sample a popularity-weighted negative the user has NOT interacted with
(optionally genre-disjoint from the positive), then update u, v_i, v_j
with sigmoid-weighted gradients. Update-per-triplet is inherently
sequential, so the execution contract changes while the learning
objective stays (SURVEY §7 "What's hard" #1):

- **Triplet sampling (M8/M9) is distributed set-semantics**: the
  rejection loop becomes "draw A candidates per positive from a
  broadcast popularity pool → reject watched (anti-join) and
  genre-overlapping (arrays_overlap) → keep the first survivor".
  The popularity pool is an inverse-CDF sample materialised once per
  epoch from the item-popularity aggregate (items are dimension-sized
  — MovieLens: 59k; for truly huge catalogs swap in a distributed
  alias table, the plan shape is unchanged).
- **SGD (M7) is partition-parallel with per-epoch sync**: positives
  shuffle-group by user; ``applyInPandas`` runs the reference's exact
  gradient math over each user's positives against a broadcast copy of
  V, sampling the negative INSIDE the worker (``_sgd_sample_bucket`` —
  the user's positive set is exactly the group's rows, so rejection is
  a local set probe instead of a distributed anti-join); per-partition
  V-deltas are summed element-wise and applied once per epoch (parallel
  SGD à la Zinkevich et al.), matching the reference's per-epoch
  granularity. The training loop costs three Spark jobs per epoch.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recommender_systems_spark.ml.als import init_factors

POOL_SIZE = 1024
ATTEMPTS = 4


def popularity_dist(positives: DataFrame, item_col: str):
    """Collect the (dimension-sized) item-popularity aggregate once:
    (ids array, probability array) — the empirical distribution A2 that
    drives negative sampling (prac_2.py:16-25). One Spark job per
    TRAINING RUN; per-epoch pools redraw from it driver-side."""
    pop = (
        positives.groupBy(item_col).agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    items = np.array([r[item_col] for r in pop])
    freq = np.array([r["cnt"] for r in pop], dtype=np.float64)
    freq /= freq.sum()
    return items, freq


def popularity_pool(positives: DataFrame, item_col: str, size: int, seed: int):
    """M8: with-replacement popularity sample as a driver-side pool.
    Inverse-CDF samples ``size`` ids with a NumPy generator — the
    distributed twin of np.random.choice(p=probs)
    (implicit_feedback/functions.py:47-58)."""
    items, freq = popularity_dist(positives, item_col)
    rng = np.random.default_rng(seed)
    return rng.choice(items, size=size, p=freq, replace=True).tolist()


def sample_triplets(
    positives: DataFrame,
    user_col: str,
    item_col: str,
    seed: int,
    genres: DataFrame | None = None,
    attempts: int = ATTEMPTS,
) -> DataFrame:
    """M8/M9: one (user, pos, neg) triplet per positive, set-semantics.

    Candidates come from the broadcast popularity pool; rejection
    (watched / genre overlap) happens as joins over ALL candidates at
    once — no per-row loop. ``genres`` is an optional (item, genre_ids
    array) dimension for the genre-disjoint constraint
    (functions.py:84-131)."""
    pool = popularity_pool(positives, item_col, POOL_SIZE, seed)
    spark = positives.sparkSession
    pool_df = F.broadcast(
        spark.createDataFrame(
            [(idx, int(item)) for idx, item in enumerate(pool)],
            "__pi int, j long",
        )
    )
    cand = (
        positives.select(
            F.col(user_col).alias("u"), F.col(item_col).alias("i")
        )
        .withColumn("__att", F.explode(F.sequence(F.lit(1), F.lit(attempts))))
        .withColumn("__pi", F.floor(F.rand(seed) * POOL_SIZE).cast("int"))
        .join(pool_df, "__pi")
        .drop("__pi")
    )
    # Reject candidates the user already interacted with (F4 anti-join).
    watched = positives.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("j")
    )
    cand = cand.join(watched, ["u", "j"], "left_anti")
    if genres is not None:
        gi = genres.select(
            F.col("item").alias("i"), F.col("genre_ids").alias("__gi")
        )
        gj = genres.select(
            F.col("item").alias("j"), F.col("genre_ids").alias("__gj")
        )
        cand = (
            cand.join(F.broadcast(gi), "i")
            .join(F.broadcast(gj), "j")
            .filter(~F.arrays_overlap("__gi", "__gj"))
            .drop("__gi", "__gj")
        )
    # "First surviving attempt" = min_by over the attempt index — one
    # partial+final hash aggregation instead of a sort window over
    # |positives| single-digit-row partitions.
    return cand.groupBy("u", "i").agg(F.min_by("j", "__att").alias("j"))


SGD_BUCKETS = 64


def _sgd_sample_bucket(
    pdf: pd.DataFrame,
    v_map: dict,
    pool: np.ndarray,
    genre_map: dict | None,
    k: int,
    lr: float,
    reg: float,
    attempts: int,
    seed: int,
) -> pd.DataFrame:
    """Fused M8/M9 + M7: negative sampling AND the gradient loop in one
    Arrow pass. The standalone ``sample_triplets`` expresses sampling as
    set-semantics DataFrame ops (the M8/M9 operator surface); inside the
    training loop the same semantics — draw from the broadcast
    popularity pool, reject watched / genre-overlapping, give up after
    ``attempts`` — run against the user's own group rows, which ARE the
    user's positive set. That deletes three shuffles per epoch (the
    candidate explode, the watched anti-join, the first-survivor agg);
    the shuffled bytes drop from ~4×|positives| candidate rows to
    |positives| (u, i, uf) rows.

    Determinism: per-user generators seeded with (seed, u), positives
    visited in item order — bucket composition and scheduling cannot
    change the result."""
    import math

    rng_k = range(k)
    zeros = [0.0] * k
    pool_n = len(pool)
    rows: list[dict] = []
    i_all = pdf["i"].to_numpy()

    for u_id, idx in pdf.groupby("u", sort=False).indices.items():
        u_vec = [float(x) for x in pdf["uf"].iloc[idx[0]]]
        watched = {int(i_all[p]) for p in idx}
        deltas: dict[int, list[float]] = {}
        rng = np.random.default_rng([int(seed), int(u_id)])
        draws = rng.integers(0, pool_n, size=attempts * len(idx))

        def v_of(item: int) -> list[float]:
            base = v_map.get(item)
            b = [0.0] * k if base is None else [float(x) for x in base]
            d = deltas.get(item)
            if d is not None:
                for t in rng_k:
                    b[t] += d[t]
            return b

        for pos_no, i in enumerate(sorted(int(i_all[p]) for p in idx)):
            j = None
            g_pos = genre_map.get(i) if genre_map is not None else None
            for a in range(attempts):
                cand = int(pool[draws[pos_no * attempts + a]])
                if cand in watched:
                    continue
                if g_pos is not None:
                    g_neg = genre_map.get(cand)
                    if g_neg is not None and not g_pos.isdisjoint(g_neg):
                        continue
                j = cand
                break
            if j is None:
                continue
            v_i, v_j = v_of(i), v_of(j)
            x_uij = sum(u_vec[t] * (v_i[t] - v_j[t]) for t in rng_k)
            e = math.exp(-x_uij)
            coef = e / (1.0 + e)
            di = deltas.setdefault(i, list(zeros))
            dj = deltas.setdefault(j, list(zeros))
            for t in rng_k:
                u_t = u_vec[t]
                di[t] += lr * (coef * u_t + reg * v_i[t])
                dj[t] += lr * (-coef * u_t + reg * v_j[t])
                u_vec[t] = u_t + lr * (coef * (v_i[t] - v_j[t]) + reg * u_t)

        rows.append(
            {"kind": "u", "id": int(u_id), **{f"d{t}": u_vec[t] for t in rng_k}}
        )
        rows += [
            {"kind": "dv", "id": item, **{f"d{t}": d[t] for t in rng_k}}
            for item, d in deltas.items()
        ]
    return pd.DataFrame(rows)


@dataclass
class BprModel:
    user_factors: DataFrame  # (id, features)
    item_factors: DataFrame  # (id, features)
    metrics_history: list[tuple[float, float]]  # (P@k, R@k) per epoch


def train_bpr(
    positives: DataFrame,
    user_col: str,
    item_col: str,
    rank: int = 12,
    lr: float = 0.02,
    reg: float = 0.01,
    epochs: int = 2,
    seed: int = 42,
    genres: DataFrame | None = None,
    eval_k: int | None = None,
    eval_every_epoch: bool = True,
    eval_user_mod: int | None = None,
) -> BprModel:
    """The prac_2.py training loop re-contracted for Spark: per epoch,
    user-partitioned fused sampling + SGD (``_sgd_sample_bucket``) →
    element-wise V-delta reduction (k-column grouped sum) → optional
    ranking-metric eval (E1). Three Spark jobs per epoch: the V
    snapshot collect, the SGD pass, the V sync."""
    pos = positives.select(
        F.col(user_col).cast("long").alias("u"),
        F.col(item_col).cast("long").alias("i"),
    ).localCheckpoint()
    u_f = (
        init_factors(pos.select("u").distinct(), "u", rank, seed, scale=0.1)
        .drop("bias")
        .localCheckpoint()
    )
    v_f = (
        init_factors(pos.select("i").distinct(), "i", rank, seed + 1, scale=0.1)
        .drop("bias")
        .localCheckpoint()
    )
    spark = positives.sparkSession
    metrics: list[tuple[float, float]] = []

    # Popularity distribution: ONE collect for the whole run; per-epoch
    # pools redraw driver-side. Genre dimension: collected once and
    # broadcast as item→genre-id-set (dimension-sized, like the
    # reference's genre dict; at catalogue scales past broadcast reach,
    # pre-partition the pool by genre bucket — same worker loop).
    pop_items, pop_freq = popularity_dist(pos, "i")
    g_map = None
    if genres is not None:
        g_map = {
            int(r["item"]): frozenset(int(g) for g in r["genre_ids"])
            for r in genres.collect()
        }
    bc_g = spark.sparkContext.broadcast(g_map)
    dims = [f"d{t}" for t in range(rank)]
    schema = "kind string, id long, " + ", ".join(f"{d} double" for d in dims)
    pos_uf = pos.join(
        u_f.select(F.col("id").alias("u"), F.col("features").alias("uf")), "u"
    ).withColumn("__b", F.pmod(F.col("u"), F.lit(SGD_BUCKETS)))

    for epoch in range(epochs):
        pool_rng = np.random.default_rng(seed + 100 + epoch)
        pool = pool_rng.choice(pop_items, size=POOL_SIZE, p=pop_freq, replace=True)
        # Epoch-frozen V snapshot, broadcast into the Arrow workers.
        v_map = {
            int(r["id"]): np.asarray(r["features"], dtype=np.float64)
            for r in v_f.collect()
        }
        bc = spark.sparkContext.broadcast(v_map)
        ep_seed = seed + 100 + epoch

        def sgd(pdf: pd.DataFrame) -> pd.DataFrame:
            return _sgd_sample_bucket(
                pdf, bc.value, pool, bc_g.value, rank, lr, reg, ATTEMPTS, ep_seed
            )

        src = (
            pos_uf
            if epoch == 0
            else pos.join(
                u_f.select(F.col("id").alias("u"), F.col("features").alias("uf")),
                "u",
            ).withColumn("__b", F.pmod(F.col("u"), F.lit(SGD_BUCKETS)))
        )
        out = src.groupBy("__b").applyInPandas(sgd, schema).localCheckpoint()
        # u_f / dv both derive lazily from the checkpointed SGD output —
        # no separate materialisation jobs.
        u_f = out.filter(F.col("kind") == "u").select(
            "id", F.array(*dims).alias("features")
        )
        # Per-epoch sync: k-column grouped sum of the V-deltas, then
        # repack into the array shape.
        dv = (
            out.filter(F.col("kind") == "dv")
            .groupBy("id")
            .agg(*[F.sum(d).alias(d) for d in dims])
            .select("id", F.array(*dims).alias("delta"))
        )
        v_f = (
            v_f.join(dv, v_f["id"] == dv["id"], "left")
            .select(
                v_f["id"],
                F.when(
                    dv["delta"].isNotNull(),
                    F.zip_with("features", "delta", lambda a, b: a + b),
                )
                .otherwise(F.col("features"))
                .alias("features"),
            )
            .localCheckpoint()
        )
        if eval_k and (eval_every_epoch or epoch == epochs - 1):
            # The E1 eval is a |U|×|I| scoring product; ``eval_user_mod``
            # restricts it to a deterministic user sample (id % mod == 0)
            # — standard practice when the full sweep is the cost driver.
            eval_users = (
                u_f.filter(F.col("id") % eval_user_mod == 0)
                if eval_user_mod
                else u_f
            )
            metrics.append(
                precision_recall_at_k(pos, eval_users, v_f, eval_k, rank=rank)
            )
    return BprModel(u_f, v_f, metrics)


def precision_recall_at_k(
    positives: DataFrame,
    user_factors: DataFrame,
    item_factors: DataFrame,
    k: int | list[int],
    rank: int | None = None,
) -> tuple[float, float] | dict[int, tuple[float, float]]:
    """E1: mean P@k / R@k over users (functions.py:212-246): score the
    full catalogue per user, per-user top-k, hits = |top-k ∩ positives|
    via a semi-join.

    ``k`` may be a list (reference prac_2.py:124-138 sweeps
    k ∈ {40,50,60} in one pass): ONE top-max(k) GEMM is computed and
    each smaller k is a rank-prefix slice of it — the per-k metrics
    come from a single aggregation, so the sweep costs the same as the
    largest single k. Returns (p, r) for a scalar k, {k: (p, r)} for a
    list.

    Scale shape: full-catalog scoring is a dense (users × items) GEMM,
    not a relational join — user blocks × a broadcast item matrix inside
    ``applyInPandas``, with the top-k computed in the same NumPy frame.
    Only |users|×max(k) (id, id, rank) rows ever materialise as Spark
    rows. At 100 TB the item matrix partitions too (score against item
    blocks, merge per-user top-k) — same plan shape, one more groupBy."""
    import numpy as np

    ks = sorted({k} if isinstance(k, int) else set(k))
    kmax = ks[-1]
    spark = positives.sparkSession
    item_rows = item_factors.collect()
    item_ids = np.array([r["id"] for r in item_rows], dtype=np.int64)
    item_mat = np.stack([np.asarray(r["features"], dtype=np.float64) for r in item_rows])
    bc = spark.sparkContext.broadcast((item_ids, item_mat))

    def topk_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, mat = bc.value
        u_ids = pdf["id"].to_numpy()
        u_mat = np.stack(
            [np.asarray(f, dtype=np.float64) for f in pdf["features"]]
        )
        scores = u_mat @ mat.T  # (block_users, n_items)
        out_u: list[int] = []
        out_i: list[int] = []
        out_r: list[int] = []
        for r in range(scores.shape[0]):
            # score desc, item id asc — the same tie order as a
            # struct(score, -i) max-heap.
            order = np.lexsort((ids, -scores[r]))[:kmax]
            out_u.extend([int(u_ids[r])] * len(order))
            out_i.extend(int(ids[o]) for o in order)
            out_r.extend(range(1, len(order) + 1))
        return pd.DataFrame({"u": out_u, "i": out_i, "rnk": out_r})

    top = (
        user_factors.withColumn("__b", F.pmod(F.col("id"), F.lit(SGD_BUCKETS)))
        .groupBy("__b")
        .applyInPandas(topk_block, "u long, i long, rnk int")
    )
    hits = (
        top.join(positives, ["u", "i"], "left_semi")
        .groupBy("u")
        .agg(
            *[
                F.sum(F.when(F.col("rnk") <= kk, 1).otherwise(0)).alias(f"tp_{kk}")
                for kk in ks
            ]
        )
    )
    per_user = (
        # Average over the SCORED users only (user_factors may be a
        # sample); a bare positives-side mean would count unscored
        # users as zero hits.
        positives.join(
            user_factors.select(F.col("id").alias("u")), "u", "left_semi"
        )
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("n_pos"))
        .join(hits, "u", "left")
        .fillna(0, subset=[f"tp_{kk}" for kk in ks])
    )
    row = per_user.agg(
        *[F.avg(F.col(f"tp_{kk}") / F.lit(kk)).alias(f"p_{kk}") for kk in ks],
        *[F.avg(F.col(f"tp_{kk}") / F.col("n_pos")).alias(f"r_{kk}") for kk in ks],
    ).collect()[0]
    out = {kk: (float(row[f"p_{kk}"]), float(row[f"r_{kk}"])) for kk in ks}
    return out[k] if isinstance(k, int) else out
