"""A/B-harness completion queries: Shapiro-Francia normality statistic
(E4) distributed with a cross-engine probit, and the full test-selection
report (reference ab_test.py's driver flow).

The probit (inverse normal CDF) needed for the Blom order-statistic
scores is not built into either engine, so both sides evaluate the SAME
Acklam rational approximation — the Spark Column expression and the
DuckDB SQL are generated from one coefficient table in identical Horner
order, giving bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recommender_systems_spark.queries._shared import (
    GENRE_CTE as _AB_GENRE_CTE,
    GENRE_WORDS as _AB_GENRE_WORDS,
    u01_col,
    u01_sql,
)
from recommender_systems_spark.registry import _t, register

# Acklam's inverse-normal-CDF rational approximation coefficients
from recommender_systems_spark.functions.probit import (  # noqa: F401
    probit_col,
    probit_sql,
)

_BLOM_SQL = "((rnk - 0.375) / (n + 0.25))"

_SF_SQL = f"""
    WITH g AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp, value
        FROM events
    ),
    r AS (
        SELECT grp, value,
               CAST(row_number() OVER (PARTITION BY grp ORDER BY value)
                    AS DOUBLE) AS rnk,
               CAST(count(*) OVER (PARTITION BY grp) AS DOUBLE) AS n
        FROM g
    ),
    m AS (SELECT grp, value, n, {probit_sql(_BLOM_SQL)} AS m_i FROM r),
    agg AS (
        SELECT grp, max(n) AS n,
               sum(m_i * value) AS smx, sum(m_i * m_i) AS smm,
               sum(value) AS sx, sum(value * value) AS sxx,
               CAST(count(*) AS BIGINT) AS cnt
        FROM m GROUP BY grp
    )
    SELECT grp, cnt AS n,
           round(pow(smx, 2) / (smm * (sxx - sx * sx / n)), 6) AS w_prime
    FROM agg
"""


@register("e_shapiro_francia", _SF_SQL)
def e_shapiro_francia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: Shapiro-Francia normality statistic per experiment arm — the
    order-statistic cousin of the reference's scipy.stats.shapiro
    (ab_test.py:287-302): W′ = corr(x₍ᵢ₎, m_i)² with Blom scores
    m_i = Φ⁻¹((i−3/8)/(n+1/4)). Ranks come from a per-group window
    (A/B arms are sample-bounded — the reference logs ≤20 rows/user;
    for unbounded inputs swap in the two-phase midrank operator), the
    probit is the shared Acklam expression, and W′ reduces to five
    aggregates per group. p-value: ml.abtest.shapiro_francia_pvalue
    (Royston's ln(1−W′) normal approximation) on the driver."""
    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B")).alias(
            "grp"
        ),
        "value",
    )
    return shapiro_francia_from(ev)


def shapiro_francia_from(g: DataFrame) -> DataFrame:
    """E4 over a pre-grouped (grp, value) frame — shared with
    e_ab_report so the harness scans events once."""
    ev = g.select("grp", "value")
    w = Window.partitionBy("grp").orderBy("value")
    wn = Window.partitionBy("grp")
    r = ev.select(
        "grp",
        "value",
        F.row_number().over(w).cast("double").alias("rnk"),
        F.count(F.lit(1)).over(wn).cast("double").alias("n"),
    )
    blom = (F.col("rnk") - 0.375) / (F.col("n") + 0.25)
    m = r.withColumn("m_i", probit_col(blom))
    agg = m.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.sum(F.col("m_i") * F.col("value")).alias("smx"),
        F.sum(F.col("m_i") * F.col("m_i")).alias("smm"),
        F.sum("value").alias("sx"),
        F.sum(F.col("value") * F.col("value")).alias("sxx"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return agg.select(
        "grp",
        F.col("cnt").alias("n"),
        F.round(
            F.pow(F.col("smx"), 2)
            / (F.col("smm") * (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))),
            6,
        ).alias("w_prime"),
    )


@register("e_ab_report")  # rows-only: p-values need driver-side CDFs
def e_ab_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full A/B decision flow (ab_test.py:236-391):
    run Levene (E3) on the arms; if variances look equal use the pooled
    t-test, else Welch (E5); also report the rank-sum fallback (E6) and
    per-arm Shapiro-Francia normality (E4). All statistics computed
    distributed (one collected row each); p-values via ml.abtest's
    pure-Python CDFs. Rows-only check (CDFs are not SQL)."""
    from recommender_systems_spark.ml.abtest import (
        levene_pvalue,
        rank_sum_pvalues,
        shapiro_francia_pvalue,
        t_test_pvalues,
    )
    from recommender_systems_spark.io import table_rows as _tr
    from recommender_systems_spark.queries.stats import (
        levene_bf_from,
        rank_sum_from,
        t_test_stats_from,
    )

    # ONE scan: the grouped (grp, value) frame is checkpointed and every
    # statistic reads the materialised copy.
    g = (
        _t(spark, sf_dir, "events")
        .select(
            F.when(F.col("user_id") % 2 == 0, F.lit("A"))
            .otherwise(F.lit("B"))
            .alias("grp"),
            "value",
        )
        .localCheckpoint()
    )
    # The four statistics are independent jobs over the same checkpointed
    # frame — submit them concurrently (Spark's scheduler interleaves
    # them across the executor pool; wall-clock = slowest job, not sum).
    # A round-12 experiment fused them into ONE tagged-JSON union action
    # instead and measured 1.76× SLOWER interleaved-warm: under AQE the
    # union's independent subtrees materialise as sequential query-stage
    # waves, while four ThreadPool jobs genuinely overlap — keep the
    # concurrent-jobs form.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        f_lev = pool.submit(lambda: levene_bf_from(g).collect()[0])
        f_t = pool.submit(lambda: t_test_stats_from(g).collect()[0])
        f_rs = pool.submit(
            lambda: rank_sum_from(
                g, approx_rows=_tr(sf_dir, "events")
            ).collect()[0]
        )
        f_sf = pool.submit(lambda: shapiro_francia_from(g).collect())
        lev, t_row, rs, sf_rows = (
            f_lev.result(), f_t.result(), f_rs.result(), f_sf.result()
        )

    # P8 row-count guard (reference ab_test.py:240-246: the experiment
    # must contain exactly two arms before any statistic is reported).
    # Levene's k IS the arm count — no dedicated distinct job needed.
    if int(lev["k"]) != 2:
        raise ValueError(f"expected exactly 2 experiment arms, got {int(lev['k'])}")

    lev_p = levene_pvalue(lev["w_stat"], int(lev["k"]), int(lev["n"]))
    df_w = float(t_row["df_welch"])
    t_p = t_test_pvalues(float(t_row["t_welch"]), df_w)
    rs_p = rank_sum_pvalues(float(rs["z"]))
    rows = [
        ("levene_bf", float(lev["w_stat"]), lev_p),
        ("welch_t", float(t_row["t_welch"]), t_p["two_sided"]),
        ("rank_sum_z", float(rs["z"]), rs_p["two_sided"]),
    ] + [
        (
            f"shapiro_francia_{r['grp']}",
            float(r["w_prime"]),
            shapiro_francia_pvalue(float(r["w_prime"]), int(r["n"])),
        )
        for r in sorted(sf_rows, key=lambda r: r["grp"])
    ]
    return spark.createDataFrame(
        [(name, round(stat, 6), round(p, 6)) for name, stat, p in rows],
        "test string, statistic double, p_two_sided double",
    )


_BOXPLOT_SQL = """
    WITH g AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp, value
        FROM events
    ),
    s AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n, min(value) AS mn,
               quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.5) AS med,
               quantile_cont(value, 0.75) AS q3, max(value) AS mx
        FROM g GROUP BY grp
    ),
    f AS (
        SELECT *, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
        FROM s
    )
    SELECT f.grp, f.n, round(f.mn, 6) AS mn, round(f.q1, 6) AS q1,
           round(f.med, 6) AS med, round(f.q3, 6) AS q3, round(f.mx, 6) AS mx,
           round(f.lo, 6) AS lo_fence, round(f.hi, 6) AS hi_fence,
           CAST(sum(CASE WHEN g.value < f.lo OR g.value > f.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM g JOIN f USING (grp)
    GROUP BY f.grp, f.n, f.mn, f.q1, f.med, f.q3, f.mx, f.lo, f.hi
    ORDER BY f.grp
"""


@register("e_boxplot_summary", _BOXPLOT_SQL)
def e_boxplot_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7's data side: the per-arm five-number summary, Tukey fences
    (q1/q3 ± 1.5·IQR), and outlier count that drive the reference's
    plt.boxplot of both experiment arms (ab_test.py:393-416). Rendering
    stays out-of-engine per SURVEY; everything the figure encodes is
    computed here.

    Exact ``percentile`` (linear interpolation — bit-identical to
    DuckDB's quantile_cont, verified) rather than percentile_approx: the
    summary is 2 rows, correctness is the point. Scale shape: one
    partial+final agg builds the 2-row summary, which broadcasts back
    onto the fact table for the outlier count — no per-arm window, so
    neither pass funnels an arm through a single partition (the naive
    ``percentile OVER (PARTITION BY grp)`` would)."""
    g = _t(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("grp"),
        "value",
    )
    iqr = F.col("q3") - F.col("q1")
    # 2-row summary; checkpointed because both the fence join and the
    # final projection consume it (re-running the percentile agg twice
    # would double-scan events).
    s = (
        g.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("mn"),
            F.percentile("value", F.lit(0.25)).alias("q1"),
            F.percentile("value", F.lit(0.5)).alias("med"),
            F.percentile("value", F.lit(0.75)).alias("q3"),
            F.max("value").alias("mx"),
        )
        .withColumn("lo", F.col("q1") - 1.5 * iqr)
        .withColumn("hi", F.col("q3") + 1.5 * iqr)
        .localCheckpoint()
    )
    outliers = (
        g.join(F.broadcast(s.select("grp", "lo", "hi")), "grp")
        .groupBy("grp")
        .agg(
            F.sum(
                F.when(
                    (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
                ).otherwise(0)
            ).alias("n_outliers")
        )
    )
    return (
        s.join(outliers, "grp")
        .select(
            "grp",
            "n",
            F.round("mn", 6).alias("mn"),
            F.round("q1", 6).alias("q1"),
            F.round("med", 6).alias("med"),
            F.round("q3", 6).alias("q3"),
            F.round("mx", 6).alias("mx"),
            F.round("lo", 6).alias("lo_fence"),
            F.round("hi", 6).alias("hi_fence"),
            "n_outliers",
        )
        .orderBy("grp")
    )


# Catalogs under this row count are broadcast to the serving kernel as one
# dense NumPy block (item + 2·K float64 factors + 2 biases ≈ 150 B/row →
# ~75 MB at the threshold); past it the top-N stage swaps to the blocked
# tile shape below, which broadcasts nothing catalog-sized.
AB_CATALOG_BROADCAST_THRESHOLD = 500_000

# --- deterministic A/B simulation population (shared by e_ab_simulation
# and its oracle-backed sub-frame twins below) ---------------------------
_AB_G = len(_AB_GENRE_WORDS)
_AB_N_USERS = 200
_AB_MIN_RATERS = 2
# M11 fold-in constants (= ml/als.py DEFAULT_LMD / DEFAULT_ALPHA).
_AB_LMD, _AB_ALPHA = 0.1, 0.01


# In-process cache of the dual-model serving blocks, keyed by the
# content-addressed catalog dir (see e_ab_simulation).
_AB_CAT_BLOCKS: dict[str, tuple] = {}


def _ab_big(sf_dir: str) -> bool:
    """True past the corpus size where multi-consumer LAZY checkpoints
    become unsafe (concurrent first-computation of an unmaterialised
    RDD under memory pressure — the sf10 "Block rdd_N does not exist"
    failure mode). Row count from the parquet footer, zero Spark jobs."""
    from recommender_systems_spark.io import table_rows

    return table_rows(sf_dir, "lineitem") > 5_000_000


def _ab_sim_users(spark: SparkSession) -> DataFrame:
    """Simulated experiment users (ab_test.py:87-97: preferred genre
    pair, history size U(5,10), Bernoulli(1/2) arm) on md5-derived
    uniforms — the IDENTICAL population in Spark and DuckDB, so the
    simulation's deterministic sub-frames carry full value-hash
    oracles (round-5 m_simulate_users convention; rand(seed) would be
    engine-local ⇒ rows-only)."""
    base = spark.range(_AB_N_USERS).select(
        F.col("id").alias("user_id"),
        F.floor(u01_col(F.col("id"), "abg1") * _AB_G).cast("int").alias("g1"),
        F.floor(u01_col(F.col("id"), "abg2") * (_AB_G - 1))
        .cast("int")
        .alias("__o"),
        (5 + F.floor(u01_col(F.col("id"), "abh") * 6))
        .cast("int")
        .alias("n_history"),
        F.when(u01_col(F.col("id"), "aba") < 0.5, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("grp"),
    )
    return base.withColumn(  # distinct second genre
        "g2", F.pmod(F.col("g1") + 1 + F.col("__o"), F.lit(_AB_G)).cast("int")
    ).drop("__o")


_AB_USERS_CTE = f"""
    ub0 AS (
        SELECT t.user_id,
               CAST(floor({u01_sql('t.user_id', 'abg1')} * {_AB_G}) AS INT)
                   AS g1,
               CAST(floor({u01_sql('t.user_id', 'abg2')} * {_AB_G - 1}) AS INT)
                   AS o,
               CAST(5 + floor({u01_sql('t.user_id', 'abh')} * 6) AS INT)
                   AS n_history,
               CASE WHEN {u01_sql('t.user_id', 'aba')} < 0.5
                    THEN 'A' ELSE 'B' END AS grp
        FROM range(0, {_AB_N_USERS}) t(user_id)
    ),
    users AS (
        SELECT user_id, g1, CAST((g1 + 1 + o) % {_AB_G} AS INT) AS g2,
               n_history, grp
        FROM ub0
    )
"""


def _ab_hist(users: DataFrame, parts_g: DataFrame) -> DataFrame:
    """Every simulated user's rating history from ONE genre-keyed join:
    candidate items share a genre with the user's preferred pair, the
    md5 race key picks the top n_history deterministically, and the
    rating derives from the same hash — (user_id, item, r). Shared by
    e_ab_simulation and the fold-in bias twin."""
    ug = users.select(
        "user_id", "n_history", F.explode(F.array("g1", "g2")).alias("g")
    )
    pg = parts_g.select(
        F.col("p_partkey").alias("item"), F.explode("genre_values").alias("g")
    )
    h_col = F.conv(
        F.substring(F.md5(F.concat_ws("_", "user_id", "item")), 1, 8), 16, 10
    ).cast("long")
    return (
        ug.join(pg, "g")
        .select("user_id", "n_history", "item")
        .distinct()
        .withColumn("__h", h_col)
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("__h", "item")
            ),
        )
        .filter(F.col("__rk") <= F.col("n_history"))
        .withColumn("r", F.pmod(F.col("__h"), F.lit(9)) * 0.5 + 1.0)
        .select("user_id", "item", "r")
    )


@register(
    "e_ab_arm_sizes_hash",
    f"""
    WITH {_AB_USERS_CTE}
    SELECT grp, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_history) AS BIGINT) AS sum_history,
           CAST(count(DISTINCT g1) AS BIGINT) AS n_genres_g1
    FROM users GROUP BY grp
    """,
)
def e_ab_arm_sizes_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/A-B step 1, oracle-backed: the simulated population's arm
    composition (size, total history budget, genre coverage per arm) —
    the deterministic sub-frame of e_ab_simulation that the two-arm
    guard (ab_test.py:240-246) inspects, value-hashed cross-engine via
    the shared md5-uniform population (``_ab_sim_users``). The
    e_ab_simulation run itself stays rows-only (per-user ridge solves),
    but its population is now PROVEN identical to the oracle's."""
    return _ab_sim_users(spark).groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_history").cast("long").alias("sum_history"),
        F.countDistinct("g1").cast("long").alias("n_genres_g1"),
    )


_AB_FOLDIN_SQL = f"""
    WITH {_AB_GENRE_CTE},
    {_AB_USERS_CTE},
    ug AS (
        SELECT user_id, n_history, g1 AS g FROM users
        UNION ALL
        SELECT user_id, n_history, g2 FROM users
    ),
    pg AS (SELECT p_partkey AS item, genre_id AS g FROM x),
    cand AS (
        SELECT DISTINCT u.user_id, u.n_history, p.item
        FROM ug u JOIN pg p ON u.g = p.g
    ),
    h AS (
        SELECT user_id, n_history, item,
               CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || '_'
                    || CAST(item AS VARCHAR)), 1, 8) AS BIGINT) AS hh
        FROM cand
    ),
    rk AS (
        SELECT user_id, item, hh, n_history,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY hh, item) AS rk
        FROM h
    ),
    hist AS (
        SELECT user_id, item, (hh % 9) * 0.5 + 1.0 AS r
        FROM rk WHERE rk <= n_history
    ),
    cat AS (
        SELECT m.p_partkey AS item,
               ((m.p_partkey * 29) % 11) * 0.04 - 0.2 AS ba,
               ((m.p_partkey * 31) % 13) * 0.03 - 0.18 AS bb
        FROM m
        JOIN (SELECT l_partkey AS ritem, count(*) AS c
              FROM lineitem GROUP BY 1) rt
          ON rt.ritem = m.p_partkey AND rt.c >= {_AB_MIN_RATERS}
    ),
    hm AS (
        SELECT h.user_id, h.r,
               CASE WHEN u.grp = 'A' THEN c.ba ELSE c.bb END AS bn
        FROM hist h
        JOIN users u ON u.user_id = h.user_id
        JOIN cat c ON c.item = h.item
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_hist,
           round({_AB_LMD} * sum(r - bn)
                 / ({_AB_ALPHA} + {_AB_LMD} * count(*)), 6) AS ub
    FROM hm GROUP BY user_id
"""


@register("e_ab_foldin_bias_hash", _AB_FOLDIN_SQL)
def e_ab_foldin_bias_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11/A-B step 4, oracle-backed: every simulated user's fold-in
    bias λ·Σ(r−b_n)/(α+λ·|hist|) (functions.py:527-548) over the md5
    histories and the arm-dependent item-bias table — the deterministic
    half of e_ab_simulation's fold-in, value-hashed cross-engine (only
    the k×k ridge solves stay rows-only). The item biases replicate
    e_ab_simulation's catalog arithmetic exactly; the embeddings join
    there never filters (vec_id covers 0..EMB_MOD−1 at every SF), so
    this twin's catalog membership — the rarely-rated cut — is the
    same set. Scale shape: one genre equi-join, one per-user window
    over history-bounded candidates, one aggregation; the 6dp round on
    the order-dependent double sum is the house parity rule."""
    from recommender_systems_spark.queries.genre import _parts_with_genres

    parts_g = _parts_with_genres(spark, sf_dir)
    users = _ab_sim_users(spark).localCheckpoint()
    hist = _ab_hist(users, parts_g)
    raters = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("item"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= _AB_MIN_RATERS)
        .select("item")
    )
    cat = parts_g.select(F.col("p_partkey").alias("item")).join(
        raters, "item"
    ).select(
        "item",
        (F.pmod(F.col("item") * 29, F.lit(11)) * 0.04 - 0.2).alias("ba"),
        (F.pmod(F.col("item") * 31, F.lit(13)) * 0.03 - 0.18).alias("bb"),
    )
    hm = (
        hist.join(F.broadcast(users.select("user_id", "grp")), "user_id")
        .join(F.broadcast(cat), "item")
        .select(
            "user_id",
            "r",
            F.when(F.col("grp") == "A", F.col("ba"))
            .otherwise(F.col("bb"))
            .alias("bn"),
        )
    )
    return hm.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hist"),
        F.round(
            F.lit(_AB_LMD)
            * F.sum(F.col("r") - F.col("bn"))
            / (F.lit(_AB_ALPHA) + F.lit(_AB_LMD) * F.count(F.lit(1))),
            6,
        ).alias("ub"),
    )


def _ab_topn_blocked(
    users_grp: DataFrame,
    catalog: DataFrame,
    n_rec: int,
    bias_w: float,
    n_blocks: int = 8,
    n_buckets: int = 16,
) -> DataFrame:
    """Past-broadcast-reach serving stage for ``e_ab_simulation``: the
    dual-model analogue of ``ml.bpr._topk_blocked``. Catalog items hash
    into ``n_blocks`` blocks and users into ``n_buckets`` buckets; each
    (bucket, block) tile is a cogroup whose kernel runs the identical
    arm-selected dense scoring product (``mat @ u + bias_w·bias``) and
    keeps the tile-local top-``n_rec`` — a superset of each user's
    global top-``n_rec``. A row_number window merges the
    |U|·n_blocks·n_rec candidates. Per-item scores are the same float64
    dot products in the same order as the broadcast kernel, and the tie
    order (score desc, item asc) matches, so results are bit-identical.
    Tile memory is (|U|/buckets + |I|/blocks)·K floats — nothing
    driver-side or broadcast-side grows with the catalog."""
    import numpy as np
    import pandas as pd

    cat_rep = catalog.withColumn(
        "__blk", F.pmod(F.col("item"), F.lit(n_blocks)).cast("int")
    ).withColumn("__b", F.explode(F.array(*[F.lit(b) for b in range(n_buckets)])))
    users_rep = users_grp.withColumn(
        "__b", F.pmod(F.col("user_id"), F.lit(n_buckets)).cast("int")
    ).withColumn("__blk", F.explode(F.array(*[F.lit(b) for b in range(n_blocks)])))

    def tile(updf: pd.DataFrame, itdf: pd.DataFrame) -> pd.DataFrame:
        if updf.empty or itdf.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "item": pd.Series(dtype="int64"),
                    "score": pd.Series(dtype="float64"),
                }
            )
        c_ids = itdf["item"].to_numpy()
        c_va = np.stack([np.asarray(v, dtype=np.float64) for v in itdf["va"]])
        c_vb = np.stack([np.asarray(v, dtype=np.float64) for v in itdf["vb"]])
        c_ba = itdf["ba"].to_numpy(dtype=np.float64)
        c_bb = itdf["bb"].to_numpy(dtype=np.float64)
        out_u, out_i, out_s = [], [], []
        for _, row in updf.iterrows():
            u = np.asarray(row["uvec"], dtype=np.float64)
            mat, bias = (c_va, c_ba) if row["grp"] == "A" else (c_vb, c_bb)
            scores = mat @ u + bias_w * bias
            order = np.lexsort((c_ids, -scores))[:n_rec]
            out_u += [int(row["user_id"])] * len(order)
            out_i += [int(c_ids[o]) for o in order]
            out_s += [float(scores[o]) for o in order]
        return pd.DataFrame({"user_id": out_u, "item": out_i, "score": out_s})

    tiles = (
        users_rep.groupBy("__b", "__blk")
        .cogroup(cat_rep.groupBy("__b", "__blk"))
        .applyInPandas(tile, "user_id long, item long, score double")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("score").desc(), F.col("item"))
    return (
        tiles.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_rec)
        .select("user_id", "item", "score", F.col("rank").cast("int").alias("rank"))
    )


@register("e_ab_simulation")  # rows-only: seeded simulation + per-user ridge solves
def e_ab_simulation(
    spark: SparkSession,
    sf_dir: str,
    catalog_broadcast_threshold: int = AB_CATALOG_BROADCAST_THRESHOLD,
) -> DataFrame:
    """The reference's END-TO-END A/B serving run (ab_test.py:72-234):
    simulate users (preferred genre pair, 5-10-item history, A/B arm) →
    fold each user into their arm's model (M11 bias aggregate + M12
    ridge solve) → per-arm top-20 with the 0.05·b_n bias blend and the
    rarely-rated-item exclusion (M13+P6/P7) → the recommendation log in
    the reference's AB_test_with_bias.csv schema (user, genre names,
    item, title, score, group; ab_test.py:222-232), 20 rows per user.

    Spark-first re-expression: the reference's per-user Python loop
    becomes four set-level stages — ONE genre-keyed join builds all
    histories, ONE aggregation folds in every user's bias, ONE
    applyInPandas group solves every user's k×k ridge system, ONE
    bucketed GEMM scores all users against the (dimension-sized,
    broadcast) dual-model catalog. Nothing iterates per user on the
    driver; past ``catalog_broadcast_threshold`` rows the scoring stage
    swaps to ``_ab_topn_blocked`` (the coded tile cogroup above —
    bit-identical results, nothing catalog-sized collected or
    broadcast). The two 'loaded models'
    (ab_test.py:73-86 .npy files) are deterministic constructions over
    the embeddings table — arm A and arm B differ in factor lookup and
    bias formula, like the reference's 25-iter vs 30-iter+genre
    checkpoints. Rows-only: the per-user Cholesky ridge solves are not
    SQL-expressible — but the population and fold-in-bias sub-frames
    ARE value-hashed via the e_ab_arm_sizes_hash /
    e_ab_foldin_bias_hash twins (md5-uniform simulation)."""
    import numpy as np
    import pandas as pd

    from recommender_systems_spark.queries.genre import _parts_with_genres
    from recommender_systems_spark.queries.ml import ALPHA, EMB_MOD, LMD, TAU

    K, N_REC, MIN_RATERS, BIAS_W = 8, 20, _AB_MIN_RATERS, 0.05

    # --- simulate users (ab_test.py:87-97) on md5 uniforms — shared
    # with the oracle-backed e_ab_arm_sizes_hash / e_ab_foldin_bias_hash
    # twins, which value-check this run's deterministic sub-frames ------
    # Scale-guarded (VERDICT r12 #7): lazy below the big-corpus
    # threshold (the arm_rows collect right below materialises it
    # serially — one action instead of two); EAGER past it, where a
    # still-unmaterialised lazy checkpoint read by the serving job's
    # multiple subtrees is the documented "Block rdd_N does not exist"
    # failure mode under memory pressure.
    users = _ab_sim_users(spark).localCheckpoint(eager=_ab_big(sf_dir))
    # P8 two-arm guard (ab_test.py:240-246) before any serving work —
    # folded into the e_ab_arm_sizes_hash frame shape (grp-keyed
    # count), whose single collect ALSO materialises the lazy users
    # checkpoint: one action where checkpoint + distinct previously
    # cost two.
    arm_rows = users.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    arms = sorted(r["grp"] for r in arm_rows)
    if arms != ["A", "B"]:
        raise ValueError(f"expected exactly arms A and B, got {arms}")

    # --- the two 'loaded models' + eligibility filter ------------------
    parts_g = _parts_with_genres(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.slice(F.col("embedding").cast("array<double>"), 1, K).alias("f")
    )
    raters = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("item"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    catalog = (
        parts_g.select(F.col("p_partkey").alias("item"))
        .join(raters, "item")
        .filter(F.col("__n") >= MIN_RATERS)  # P6/P7 rarely-rated cut
        .withColumn("__ka", F.pmod(F.col("item"), F.lit(EMB_MOD)))
        .join(
            F.broadcast(emb.select(F.col("vec_id").alias("__ka"), F.col("f").alias("va"))),
            "__ka",
        )
        .withColumn("__kb", F.pmod(F.col("item") * 7 + 3, F.lit(EMB_MOD)))
        .join(
            F.broadcast(emb.select(F.col("vec_id").alias("__kb"), F.col("f").alias("vb"))),
            "__kb",
        )
        .select(
            "item",
            "va",
            "vb",
            (F.pmod(F.col("item") * 29, F.lit(11)) * 0.04 - 0.2).alias("ba"),
            (F.pmod(F.col("item") * 31, F.lit(13)) * 0.03 - 0.18).alias("bb"),
        )
    )
    # The reference LOADS its two serving models from disk
    # (ab_test.py:73-86 reads pre-trained .npy checkpoints); the dual-
    # model catalog here is its exact analogue and is likewise
    # materialised ONCE per source-data identity, then read back — the
    # rebuild (lineitem rater counts + two embedding joins) was ~2 s of
    # every serving run. Deterministic content, so the cache never
    # invalidates while the source parquet is unchanged.
    import os

    from recommender_systems_spark.io import cache_path, cache_ready

    # Prefix carries the constants baked into the artifact (k, embedding
    # modulus, rater cut, bias formula weights) — editing any of them
    # must miss the cache, or a stale catalog would silently diverge
    # from the recomputing oracle.
    cat_dir = cache_path(
        f"ab_catalog_k{K}e{EMB_MOD}r{MIN_RATERS}b29x04_31x03",
        sf_dir,
        "part",
        "lineitem",
        "embeddings",
    )
    if not cache_ready(cat_dir):
        catalog.write.mode("overwrite").parquet(cat_dir)
        # A same-process wipe+rebuild must not serve the pre-wipe NumPy
        # blocks: the memo is keyed by path only, so invalidate it on
        # the rebuild branch or a build-path divergence would be masked
        # and the cold bench would omit the collect+packing cost
        # (ADVICE r12).
        _AB_CAT_BLOCKS.pop(cat_dir, None)
    catalog = spark.read.parquet(cat_dir)

    # --- all histories from ONE genre-keyed join (simulate_user's
    # genre-constrained draw, made deterministic via md5 order) ---------
    hist = _ab_hist(users, parts_g)

    # --- fold-in: M11 bias for every user in one aggregation, M12 ridge
    # solve for every user in one applyInPandas pass --------------------
    hm = (
        hist.join(F.broadcast(users.select("user_id", "grp")), "user_id")
        .join(F.broadcast(catalog), "item")
        .select(
            "user_id",
            "r",
            F.when(F.col("grp") == "A", F.col("va")).otherwise(F.col("vb")).alias("v"),
            F.when(F.col("grp") == "A", F.col("ba")).otherwise(F.col("bb")).alias("bn"),
        )
        # Two consumers (bias agg + ridge solve) sit in the ONE final
        # action. Lazy at bench SFs: the first stage materialises the
        # blocks once and the eager form paid a separate blocking
        # driver action. Past the big-corpus threshold the checkpoint
        # goes EAGER — two branches racing the first computation of a
        # lazy checkpoint under memory pressure is the documented
        # "Block rdd_N does not exist" failure (see dedup_clusters'
        # near-table note), and one extra driver action is noise at
        # that scale.
        .localCheckpoint(eager=_ab_big(sf_dir))
    )
    ub = hm.groupBy("user_id").agg(
        (
            F.lit(LMD)
            * F.sum(F.col("r") - F.col("bn"))
            / (F.lit(ALPHA) + F.lit(LMD) * F.count(F.lit(1)))
        ).alias("ub")
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        resid = (pdf["r"] - pdf["bn"] - pdf["ub"]).to_numpy(dtype=np.float64)
        a = LMD * (v.T @ v) + TAU * np.eye(K)
        rhs = LMD * (v.T @ resid)
        c = np.linalg.cholesky(a)
        u = np.linalg.solve(c.T, np.linalg.solve(c, rhs))
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"].iloc[0])], "uvec": [u.tolist()]}
        )

    uvecs = (
        hm.join(ub, "user_id")
        .groupBy("user_id")
        .applyInPandas(solve, "user_id long, uvec array<double>")
    )

    # --- top-20 per user against the dual-model catalog (M13): bucketed
    # GEMM with the catalog broadcast while it is dimension-sized; past
    # the threshold, the blocked tile cogroup (nothing catalog-sized
    # ever reaches the driver) ------------------------------------------
    ug = uvecs.join(F.broadcast(users.select("user_id", "grp")), "user_id")
    # The catalog is the part dimension minus inner-join pruning, so the
    # part row count is a cheap upper bound: conservative in the safe
    # direction (switches to the blocked path no later than the exact
    # count would). Read from the parquet FOOTER on the driver — zero
    # Spark jobs where the old df.count() paid one scheduler round
    # trip per run.
    from recommender_systems_spark.io import table_rows

    n_items_bound = table_rows(sf_dir, "part")
    if n_items_bound > catalog_broadcast_threshold:
        recs = _ab_topn_blocked(ug, catalog, N_REC, BIAS_W)
        return _ab_log(spark, sf_dir, recs, users)

    # Driver-side model blocks memoized per catalog artifact (keyed by
    # the content-addressed cache dir, so data changes invalidate):
    # the collect + NumPy packing is identical every serving run — a
    # production server holds the loaded model in memory, it does not
    # re-read the checkpoint per request. Result-deterministic in any
    # collect order: scoring is per-id and the top-N lexsort ties break
    # on the id.
    blocks = _AB_CAT_BLOCKS.get(cat_dir)
    if blocks is None:
        cat_rows = catalog.collect()
        ids = np.array([r["item"] for r in cat_rows], dtype=np.int64)
        mva = np.stack([np.asarray(r["va"], dtype=np.float64) for r in cat_rows])
        mvb = np.stack([np.asarray(r["vb"], dtype=np.float64) for r in cat_rows])
        vba = np.array([r["ba"] for r in cat_rows], dtype=np.float64)
        vbb = np.array([r["bb"] for r in cat_rows], dtype=np.float64)
        blocks = (ids, mva, vba, mvb, vbb)
        _AB_CAT_BLOCKS.clear()  # hold one catalog at a time
        _AB_CAT_BLOCKS[cat_dir] = blocks
    bc = spark.sparkContext.broadcast(blocks)

    def topn(pdf: pd.DataFrame) -> pd.DataFrame:
        c_ids, c_va, c_ba, c_vb, c_bb = bc.value
        out_u, out_i, out_s, out_r = [], [], [], []
        for _, row in pdf.iterrows():
            u = np.asarray(row["uvec"], dtype=np.float64)
            mat, bias = (c_va, c_ba) if row["grp"] == "A" else (c_vb, c_bb)
            scores = mat @ u + BIAS_W * bias
            order = np.lexsort((c_ids, -scores))[:N_REC]
            out_u += [int(row["user_id"])] * len(order)
            out_i += [int(c_ids[o]) for o in order]
            out_s += [float(scores[o]) for o in order]
            out_r += list(range(1, len(order) + 1))
        return pd.DataFrame(
            {"user_id": out_u, "item": out_i, "score": out_s, "rank": out_r}
        )

    from recommender_systems_spark.ml.als import bucketed

    recs = (
        bucketed(
            ug.withColumn("__b", F.pmod(F.col("user_id"), F.lit(16))),
            "__b",
            16,
        )
        .groupBy("__b")
        .applyInPandas(topn, "user_id long, item long, score double, rank int")
    )
    return _ab_log(spark, sf_dir, recs, users)


def _ab_log(
    spark: SparkSession, sf_dir: str, recs: DataFrame, users: DataFrame
) -> DataFrame:
    """The AB_test_with_bias.csv log schema (ab_test.py:222-232), shared
    by the broadcast and blocked serving paths."""
    from recommender_systems_spark.queries.genre import GENRE_WORDS

    gname = F.array(*[F.lit(w) for w in GENRE_WORDS])
    titles = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("item"), F.col("p_name").alias("item_title")
    )
    return (
        recs.join(F.broadcast(users), "user_id")
        .join(F.broadcast(titles), "item")
        .select(
            "user_id",
            F.element_at(gname, F.col("g1") + 1).alias("genre_1_name"),
            F.element_at(gname, F.col("g2") + 1).alias("genre_2_name"),
            F.col("item").alias("item_id"),
            "item_title",
            F.round("score", 4).alias("score"),
            "grp",
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Experiment power analysis (minimum detectable effect / required n)
# ---------------------------------------------------------------------------

_PW_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
_PW_Z_BETA = 0.841621   # power = 0.8
_PW_EFFECTS = [0.01, 0.02, 0.05]  # relative-to-mean effect sizes

_POWER_SQL = f"""
    WITH s AS (
        SELECT count(*) AS n, sum(value) AS s1, sum(value * value) AS s2
        FROM events
    ),
    base AS (
        SELECT n, s1 / n AS mean,
               sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd,
               CAST(n // 2 AS BIGINT) AS n_arm
        FROM s
    ),
    eff(rel) AS (VALUES {", ".join(f"({e!r})" for e in _PW_EFFECTS)})
    SELECT eff.rel,
           CAST(base.n_arm AS BIGINT) AS n_arm,
           round(base.mean, 4) AS mean,
           round(base.sd, 4) AS sd,
           round(({_PW_Z_ALPHA} + {_PW_Z_BETA}) * base.sd
                 * sqrt(2.0 / base.n_arm), 4) AS mde_abs,
           round(({_PW_Z_ALPHA} + {_PW_Z_BETA}) * base.sd
                 * sqrt(2.0 / base.n_arm) / base.mean, 5) AS mde_rel,
           CAST(ceil(2.0 * pow(({_PW_Z_ALPHA} + {_PW_Z_BETA}) * base.sd
                               / (eff.rel * base.mean), 2)) AS BIGINT)
               AS n_required_per_arm
    FROM base, eff
"""


@register("e_power_mde", _POWER_SQL)
def e_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis: from pilot data's (n, mean, sd),
    the minimum detectable effect at the CURRENT sample size and the
    required per-arm n for target relative effects — the planning
    computation that runs BEFORE e_ab_simulation spends traffic and
    e_t_test_stats reads the result (α=0.05 two-sided, power=0.8;
    z constants are shared literals, the same pairing the reference's
    hypothesis tests use post-hoc).

    One scalar aggregate (Σ, Σ², n — the same sufficient-statistic
    shape as m_hyperparam_sweep) crossed with a literal effect grid;
    sd uses the explicit identity written identically in both
    engines."""
    ev = _t(spark, sf_dir, "events")
    s = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    base = s.select(
        n,
        (s1 / n).alias("mean"),
        F.sqrt((s2 - s1 * s1 / n) / (n - 1)).alias("sd"),
        F.floor(n / 2).cast("long").alias("n_arm"),
    )
    eff = spark.createDataFrame([(e,) for e in _PW_EFFECTS], "rel double")
    zsum = _PW_Z_ALPHA + _PW_Z_BETA
    mde = zsum * F.col("sd") * F.sqrt(F.lit(2.0) / F.col("n_arm"))
    return base.crossJoin(F.broadcast(eff)).select(
        "rel",
        "n_arm",
        F.round("mean", 4).alias("mean"),
        F.round("sd", 4).alias("sd"),
        F.round(mde, 4).alias("mde_abs"),
        F.round(mde / F.col("mean"), 5).alias("mde_rel"),
        F.ceil(
            2.0 * F.pow(zsum * F.col("sd") / (F.col("rel") * F.col("mean")), 2)
        )
        .cast("long")
        .alias("n_required_per_arm"),
    )


# ---------------------------------------------------------------------------
# e_interleave_teamdraft — team-draft interleaving for online ranker eval
# ---------------------------------------------------------------------------

_TD_K = 12   # per-ranker list length
_TD_R = 6    # draft rounds (2 picks/round); K >= 2R guarantees a pick
             # always exists even if the other team drains this list
_TD_CTR = 0.35  # deterministic click-model threshold

_TD_SQL = f"""
    WITH RECURSIVE
    agg AS (
        SELECT l_partkey AS item,
               CAST(SUM(l_quantity) AS BIGINT) AS qty,
               COUNT(DISTINCT l_orderkey) AS nord
        FROM lineitem GROUP BY 1
    ),
    ra AS (SELECT list(item ORDER BY qty DESC, item) AS l
           FROM (SELECT * FROM agg ORDER BY qty DESC, item LIMIT {_TD_K})),
    rb AS (SELECT list(item ORDER BY nord DESC, item) AS l
           FROM (SELECT * FROM agg ORDER BY nord DESC, item LIMIT {_TD_K})),
    draft(r, picked) AS (
        SELECT 0, CAST([] AS BIGINT[])
        UNION ALL
        SELECT s.r + 1,
               list_append(s.p1ed,
                   list_filter(s.second_l,
                               y -> NOT list_contains(s.p1ed, y))[1])
        FROM (
            SELECT d.r,
                   list_append(d.picked,
                       list_filter(CASE WHEN {{COIN_R1}} < 0.5
                                        THEN ra.l ELSE rb.l END,
                                   x -> NOT list_contains(d.picked, x))[1])
                       AS p1ed,
                   CASE WHEN {{COIN_R1}} < 0.5
                        THEN rb.l ELSE ra.l END AS second_l
            FROM draft d, ra, rb
            WHERE d.r < {_TD_R}
        ) s
    ),
    final AS (SELECT picked FROM draft WHERE r = {_TD_R}),
    pos AS (
        SELECT CAST(i AS INT) AS pos, picked[i + 1] AS item
        FROM final CROSS JOIN (SELECT unnest(range({2 * _TD_R})) AS i)
    )
    SELECT pos, item,
           CASE WHEN ({{COIN_POS}} < 0.5) = (pos % 2 = 0)
                THEN 'A' ELSE 'B' END AS team,
           CAST(CASE WHEN {{CLICK}} < {_TD_CTR} THEN 1 ELSE 0 END AS INT)
               AS clicked
    FROM pos ORDER BY pos
""".format(
    COIN_R1=u01_sql("d.r + 1", "tdraft"),
    COIN_POS=u01_sql("pos // 2 + 1", "tdraft"),
    CLICK=u01_sql("item", "tdclick"),
)


@register("e_interleave_teamdraft", _TD_SQL)
def e_interleave_teamdraft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Team-draft interleaving (Radlinski et al. 2008) — the online
    ranker-comparison mechanism production serving uses instead of a
    traffic-split A/B: two rankers (A = parts by total quantity, B =
    parts by distinct-order reach) alternately draft their best
    not-yet-picked item into ONE interleaved list, a per-round
    deterministic coin deciding who drafts first; clicks then credit
    the team that contributed the clicked item. The whole experiment —
    coins and the click model — runs on md5-uniforms, so the
    interleaved list, team attribution, and click column are
    byte-identical across engines.

    The draft itself is a {_TD_R}-round FOLD: Spark runs it as ONE
    in-plan ``F.aggregate`` over a literal round sequence on a 1-row
    frame holding both top-{_TD_K} lists (collected via TakeOrdered —
    K is constant, never data-sized), with array state; the oracle is
    the same fold as a recursive CTE with list state. K >= 2R
    guarantees a team's list can never be drained before its pick
    (at round r at most 2(r-1)+1 items are gone). Candidate-list
    construction is the only distributed work — two top-K
    TakeOrderedAndProject passes over one (item) aggregate — so the
    op is linear in interactions at any scale, and team credit per
    query-session in production is this exact plan keyed by session.

    Output: (pos, item, team, clicked) for the 2R interleaved
    positions."""
    li = _t(spark, sf_dir, "lineitem")
    agg = (
        li.groupBy(F.col("l_partkey").alias("item"))
        .agg(
            F.sum("l_quantity").cast("long").alias("qty"),
            F.countDistinct("l_orderkey").alias("nord"),
        )
        # Both rankers read this catalog-sized frame — materialise it
        # so the fact table is scanned once, not once per ranker.
        .localCheckpoint()
    )

    def toplist(key: str) -> DataFrame:
        return (
            agg.orderBy(F.col(key).desc(), "item")
            .limit(_TD_K)
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct((-F.col(key)).alias("s"),
                                     F.col("item").alias("i"))
                        )
                    ),
                    lambda s: s["i"],
                ).alias("l")
            )
        )

    one = (
        toplist("qty").select(F.col("l").alias("la"))
        .crossJoin(toplist("nord").select(F.col("l").alias("lb")))
    )

    def step(acc, r):
        c = u01_col(r, "tdraft") < 0.5
        first_l = F.when(c, F.col("la")).otherwise(F.col("lb"))
        second_l = F.when(c, F.col("lb")).otherwise(F.col("la"))
        p1 = F.element_at(
            F.filter(first_l, lambda x: ~F.array_contains(acc, x)), 1
        )
        acc1 = F.concat(acc, F.array(p1))
        p2 = F.element_at(
            F.filter(second_l, lambda y: ~F.array_contains(acc1, y)), 1
        )
        return F.concat(acc1, F.array(p2))

    picked = F.aggregate(
        F.sequence(F.lit(1), F.lit(_TD_R)),
        F.array().cast("array<bigint>"),
        step,
    )
    pos = one.select(F.posexplode(picked).alias("pos", "item"))
    rnd = (F.floor(F.col("pos") / 2) + 1).cast("long")
    first_of_round = F.col("pos") % 2 == 0
    coin = u01_col(rnd, "tdraft") < 0.5
    return pos.select(
        F.col("pos").cast("int").alias("pos"),
        "item",
        F.when(coin == first_of_round, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("team"),
        (u01_col(F.col("item"), "tdclick") < _TD_CTR)
        .cast("int")
        .alias("clicked"),
    ).orderBy("pos")


# ---------------------------------------------------------------------------
# e_conformal_coverage — split-conformal prediction intervals
# ---------------------------------------------------------------------------

_CONF_ALPHA = 0.1  # target miscoverage: intervals should cover 90%

_CONF_SQL = f"""
    WITH rows_ AS (
        SELECT l_partkey AS item,
               CAST(l_quantity * 1000000 AS BIGINT) AS y_ppm,
               {{SPLIT_U}} AS u
        FROM lineitem
    ),
    tr AS (SELECT item, CAST(round(avg(y_ppm)) AS BIGINT) AS yhat_ppm
           FROM rows_ WHERE u < 0.5 GROUP BY item),
    cal AS (
        SELECT abs(r.y_ppm - tr.yhat_ppm) AS res
        FROM rows_ r JOIN tr USING (item)
        WHERE r.u >= 0.5 AND r.u < 0.75
    ),
    nc AS (SELECT count(*) AS n FROM cal),
    q AS (
        SELECT res AS q_ppm FROM (
            SELECT res, row_number() OVER (ORDER BY res) AS rn FROM cal
        ), nc
        WHERE rn = least(CAST(ceil((nc.n + 1) * {1 - _CONF_ALPHA})
                              AS BIGINT), nc.n)
    ),
    te AS (
        SELECT abs(r.y_ppm - tr.yhat_ppm) AS res
        FROM rows_ r JOIN tr USING (item)
        WHERE r.u >= 0.75
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM rows_ WHERE u < 0.5)
               AS n_train,
           (SELECT CAST(n AS BIGINT) FROM nc) AS n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           round((SELECT q_ppm FROM q) / 1000000.0, 6) AS q_hat,
           round(avg(CASE WHEN te.res <= (SELECT q_ppm FROM q)
                          THEN 1.0 ELSE 0.0 END), 6) AS coverage
    FROM te
""".format(SPLIT_U=u01_sql("l_orderkey * 10 + l_linenumber", "conf"))


@register("e_conformal_coverage", _CONF_SQL)
def e_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction (Vovk et al.; Lei et al. 2018) — the
    distribution-free way to put FINITE-SAMPLE-VALID intervals around
    any point predictor, and the calibration step a serving system
    runs before shipping uncertainty estimates: fit on a train split
    (here the per-item mean quantity), take the ⌈(n+1)(1−α)⌉-th
    smallest absolute residual on a held-out calibration split as the
    interval half-width q̂, then verify empirical coverage ≥ 1−α on a
    test split. The guarantee needs nothing but exchangeability — no
    model assumptions — which is why it composes with any predictor.

    Exactness: quantities are integer-valued, so residuals live in
    exact integer micro-units; the conformal quantile is an ORDER
    STATISTIC (row_number, no interpolation — the finite-sample-valid
    form); coverage is a ratio of exact integers. The only floats are
    display rounding. Splits are md5-uniform on the row key (the
    FIXTURES.md convention), so both engines hold out identical rows.

    Scale shape: one fact scan into the 3-way split; the model is an
    item-keyed aggregate (broadcastable dimension); the quantile is a
    global sort of the CALIBRATION split only (25% sample — at 100 TB
    swap for approx_percentile with a documented validity tweak or a
    fixed-count calibration sample); coverage is one reduce."""
    li = _t(spark, sf_dir, "lineitem")
    rows = li.select(
        F.col("l_partkey").alias("item"),
        (F.col("l_quantity") * 1_000_000).cast("long").alias("y_ppm"),
        u01_col(
            F.col("l_orderkey") * 10 + F.col("l_linenumber"), "conf"
        ).alias("u"),
    ).localCheckpoint()  # consumed by train/cal/test splits
    tr = (
        rows.filter(F.col("u") < 0.5)
        .groupBy("item")
        .agg(F.round(F.avg("y_ppm")).cast("long").alias("yhat_ppm"))
    )
    res = F.abs(F.col("y_ppm") - F.col("yhat_ppm"))
    cal = (
        rows.filter((F.col("u") >= 0.5) & (F.col("u") < 0.75))
        .join(tr, "item")
        .select(res.alias("res"))
    )
    nc = cal.agg(F.count(F.lit(1)).alias("n"))
    wq = Window.orderBy("res")
    k = F.least(
        F.ceil((F.col("n") + 1) * (1 - _CONF_ALPHA)).cast("long"), F.col("n")
    )
    q = (
        cal.withColumn("rn", F.row_number().over(wq))
        .crossJoin(F.broadcast(nc))
        .filter(F.col("rn") == k)
        .select(F.col("res").alias("q_ppm"))
    )
    te = (
        rows.filter(F.col("u") >= 0.75)
        .join(tr, "item")
        .select(res.alias("res"))
    )
    n_train = rows.filter(F.col("u") < 0.5).agg(
        F.count(F.lit(1)).cast("long").alias("n_train")
    )
    return (
        te.crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(F.first("q_ppm") / 1_000_000.0, 6).alias("q_hat"),
            F.round(
                F.avg(
                    F.when(F.col("res") <= F.col("q_ppm"), 1.0).otherwise(0.0)
                ),
                6,
            ).alias("coverage"),
        )
        .crossJoin(F.broadcast(n_train))
        .crossJoin(F.broadcast(nc.select(F.col("n").cast("long").alias("n_cal"))))
        .select("n_train", "n_cal", "n_test", "q_hat", "coverage")
    )


# ---------------------------------------------------------------------------
# e_cluster_design_effect — cluster-randomized experiment design audit
# ---------------------------------------------------------------------------

_CDE_SQL = """
    WITH cust AS (
        SELECT c_custkey AS uid, c_nationkey AS cluster FROM customer
    ),
    y AS (
        SELECT cust.cluster, o.o_custkey AS uid,
               CAST(count(*) AS BIGINT) AS yv
        FROM orders o JOIN cust ON cust.uid = o.o_custkey
        GROUP BY 1, 2
    ),
    g AS (SELECT count(*) AS n, sum(yv) AS s, sum(yv * yv) AS s2 FROM y),
    cb AS (SELECT cluster, count(*) AS nc, sum(yv) AS sc FROM y
           GROUP BY cluster),
    k AS (SELECT count(*) AS k, sum(nc * nc) AS sn2 FROM cb),
    msb AS (
        SELECT sum(sc * sc / (1.0 * nc)) AS ssb_raw FROM cb
    )
    SELECT CAST(g.n AS BIGINT) AS n_units,
           CAST(k.k AS BIGINT) AS n_clusters,
           round(g.n / (1.0 * k.k), 4) AS mean_cluster_size,
           round(
             ((msb.ssb_raw - g.s * g.s / g.n) / (k.k - 1)
              - (g.s2 - msb.ssb_raw) / (g.n - k.k))
             / ((msb.ssb_raw - g.s * g.s / g.n) / (k.k - 1)
                + ((g.n - k.sn2 / (1.0 * g.n)) / (k.k - 1) - 1)
                  * (g.s2 - msb.ssb_raw) / (g.n - k.k)),
             6) AS icc,
           round(1.0 + (g.n / (1.0 * k.k) - 1.0)
                 * greatest(
                     ((msb.ssb_raw - g.s * g.s / g.n) / (k.k - 1)
                      - (g.s2 - msb.ssb_raw) / (g.n - k.k))
                     / ((msb.ssb_raw - g.s * g.s / g.n) / (k.k - 1)
                        + ((g.n - k.sn2 / (1.0 * g.n)) / (k.k - 1) - 1)
                          * (g.s2 - msb.ssb_raw) / (g.n - k.k)),
                     0.0),
             4) AS deff
    FROM g, k, msb
"""


@register("e_cluster_design_effect", _CDE_SQL)
def e_cluster_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-randomized experiment design audit — when treatment
    must be assigned at the CLUSTER level (here: nation ≈ market) to
    avoid interference, individual-level variance formulas understate
    noise by the design effect DEFF = 1 + (m̄ − 1)·ICC (Kish): this
    query computes the one-way ANOVA intraclass correlation (ANOVA
    estimator with the unequal-cluster-size n₀ correction) and the
    implied DEFF / effective-sample deflation BEFORE the experiment
    runs — the power-planning step every geo/market test needs.

    Determinism: the outcome (orders per customer) is integer; ICC is
    built from three exact integer sums (n, Σy, Σy², per-cluster
    Σy and n) combined in ONE identical parenthesised expression —
    both engines produce bit-equal doubles; rounding is display-only.

    Scale shape: one orders aggregate (user-keyed), one cluster-keyed
    aggregate over the user frame, 1-row algebra — corpus-linear with
    cluster-dimension-sized intermediates."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("uid"), F.col("c_nationkey").alias("cluster")
    )
    orders = _t(spark, sf_dir, "orders")
    y = (
        orders.join(cust, orders["o_custkey"] == cust["uid"])
        .groupBy("cluster", "uid")
        .agg(F.count(F.lit(1)).alias("yv"))
    ).localCheckpoint()  # grand + cluster aggregates share it
    g = y.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("yv").alias("s"),
        F.sum(F.col("yv") * F.col("yv")).alias("s2"),
    )
    cb = y.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("nc"), F.sum("yv").alias("sc")
    )
    k = cb.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("nc") * F.col("nc")).alias("sn2"),
    )
    msb = cb.agg(
        F.sum(F.col("sc") * F.col("sc") / (1.0 * F.col("nc"))).alias(
            "ssb_raw"
        )
    )
    one = g.crossJoin(F.broadcast(k)).crossJoin(F.broadcast(msb))
    ssb = F.col("ssb_raw") - F.col("s") * F.col("s") / F.col("n")
    msb_ = ssb / (F.col("k") - 1)
    msw = (F.col("s2") - F.col("ssb_raw")) / (F.col("n") - F.col("k"))
    n0 = (F.col("n") - F.col("sn2") / (1.0 * F.col("n"))) / (F.col("k") - 1)
    icc = (msb_ - msw) / (msb_ + (n0 - 1) * msw)
    mbar = F.col("n") / (1.0 * F.col("k"))
    return one.select(
        F.col("n").cast("long").alias("n_units"),
        F.col("k").cast("long").alias("n_clusters"),
        F.round(mbar, 4).alias("mean_cluster_size"),
        F.round(icc, 6).alias("icc"),
        F.round(
            1.0 + (mbar - 1.0) * F.greatest(icc, F.lit(0.0)), 4
        ).alias("deff"),
    )


# ---------------------------------------------------------------------------
# e_switchback_effect — time-period (switchback) randomization
# ---------------------------------------------------------------------------

_SWB_BUCKET_US = 3_600_000_000  # 1-hour randomization periods

_SWB_SQL = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {_SWB_BUCKET_US} AS b, value FROM events
    ),
    lab AS (
        SELECT b, value,
               {{ARM_B}} < 0.5 AS arm_a,
               ({{ARM_B}} < 0.5) <> ({{ARM_PREV}} < 0.5) AS washout
        FROM ev
    ),
    kept AS (SELECT * FROM lab WHERE NOT washout),
    arms AS (
        SELECT arm_a,
               CAST(count(DISTINCT b) AS BIGINT) AS n_buckets,
               CAST(count(*) AS BIGINT) AS n_events,
               round(avg(value), 4) AS mean_value
        FROM kept GROUP BY arm_a
    ),
    wash AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_washout
             FROM lab WHERE washout)
    SELECT a.n_buckets AS buckets_a, b.n_buckets AS buckets_b,
           wash.n_washout AS buckets_washed_out,
           a.n_events AS events_a, b.n_events AS events_b,
           a.mean_value AS mean_a, b.mean_value AS mean_b,
           round(a.mean_value - b.mean_value, 4) AS effect
    FROM (SELECT * FROM arms WHERE arm_a) a,
         (SELECT * FROM arms WHERE NOT arm_a) b,
         wash
""".format(
    ARM_B=u01_sql("b", "swb"),
    ARM_PREV=u01_sql("b - 1", "swb"),
)


@register("e_switchback_effect", _SWB_SQL)
def e_switchback_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Switchback (time-period) randomization — the design
    marketplaces and logistics platforms use when user-level
    randomization would interfere with itself (shared supply, shared
    couriers): randomize ARM BY HOUR, discard the first period after
    every switch (carryover washout — the period where yesterday's
    treatment still contaminates the metric), then difference the arm
    means over the surviving periods (Bojinov et al. 2022 for the
    variance story; this query is the effect point estimate + design
    accounting a platform dashboards).

    Determinism: the arm is a pure md5-uniform function of the hour
    bucket, so the washout flag needs NO lag window — arm(b−1) is the
    same pure function evaluated at b−1, computable row-side in both
    engines. Counts are exact integers; means round at 4 (house float
    rule for order-dependent double sums).

    Scale shape: one events scan with row-side labeling (zero
    windows, zero joins), one (arm) aggregate with map-side combine,
    a 2×1-row assembly. The cheapest possible experiment readout at
    any scale."""
    ev = _t(spark, sf_dir, "events").select(
        F.expr(
            f"unix_micros(cast(ts as timestamp)) div {_SWB_BUCKET_US}"
        ).alias("b"),
        "value",
    )
    arm_b = u01_col(F.col("b"), "swb") < 0.5
    arm_prev = u01_col(F.col("b") - 1, "swb") < 0.5
    lab = ev.select(
        "b",
        "value",
        arm_b.alias("arm_a"),
        (arm_b != arm_prev).alias("washout"),
    ).localCheckpoint()  # arm aggregate + washout count share it
    kept = lab.filter(~F.col("washout"))
    arms = kept.groupBy("arm_a").agg(
        F.countDistinct("b").cast("long").alias("n_buckets"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.avg("value"), 4).alias("mean_value"),
    )
    wash = lab.filter(F.col("washout")).agg(
        F.countDistinct("b").cast("long").alias("buckets_washed_out")
    )
    a = arms.filter(F.col("arm_a")).select(
        F.col("n_buckets").alias("buckets_a"),
        F.col("n_events").alias("events_a"),
        F.col("mean_value").alias("mean_a"),
    )
    b = arms.filter(~F.col("arm_a")).select(
        F.col("n_buckets").alias("buckets_b"),
        F.col("n_events").alias("events_b"),
        F.col("mean_value").alias("mean_b"),
    )
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(wash))
        .select(
            "buckets_a",
            "buckets_b",
            "buckets_washed_out",
            "events_a",
            "events_b",
            "mean_a",
            "mean_b",
            F.round(F.col("mean_a") - F.col("mean_b"), 4).alias("effect"),
        )
    )


# ---------------------------------------------------------------------------
# e_aa_calibration — A/A re-randomization calibration of the test stack
# ---------------------------------------------------------------------------

_AA_REPS = 20

_AA_SQL = f"""
    WITH us AS (
        SELECT user_id, count(*) AS cnt, sum(value) AS s,
               sum(value * value) AS ss
        FROM events GROUP BY user_id
    ),
    reps AS (
        SELECT u.user_id, u.cnt, u.s, u.ss, r.rep
        FROM us u CROSS JOIN (SELECT unnest(range({_AA_REPS})) AS rep) r
    ),
    lab AS (
        SELECT rep, cnt, s, ss,
               {{ARM}} < 0.5 AS arm_a
        FROM reps
    ),
    sums AS (
        SELECT rep, arm_a, sum(cnt) AS n, sum(s) AS sv, sum(ss) AS ssv
        FROM lab GROUP BY rep, arm_a
    ),
    agg AS (
        SELECT rep, arm_a, n, sv / n AS m,
               (ssv - sv * sv / n) / (n - 1) AS v
        FROM sums
    ),
    w AS (
        SELECT rep,
               max(CASE WHEN arm_a THEN m END) AS ma,
               max(CASE WHEN NOT arm_a THEN m END) AS mb,
               max(CASE WHEN arm_a THEN v END) AS va,
               max(CASE WHEN NOT arm_a THEN v END) AS vb,
               max(CASE WHEN arm_a THEN n END) AS na,
               max(CASE WHEN NOT arm_a THEN n END) AS nb
        FROM agg GROUP BY rep
    ),
    z AS (
        SELECT rep,
               round((ma - mb) / sqrt(va / na + vb / nb), 6) AS z6
        FROM w
    ),
    p AS (
        SELECT rep, z6,
               round(1.0 - abs(z6) / sqrt(2.0 + z6 * z6), 6) AS p6
        FROM z
    ),
    r AS (
        SELECT p6, row_number() OVER (ORDER BY p6, rep) AS i FROM p
    ),
    ks AS (
        SELECT max(greatest(i / {_AA_REPS}.0 - p6,
                            p6 - (i - 1) / {_AA_REPS}.0)) AS d
        FROM r
    )
    SELECT CAST({_AA_REPS} AS BIGINT) AS n_reps,
           round(ks.d, 6) AS ks_stat,
           (SELECT round(max(abs(z6)), 6) FROM z) AS max_abs_z,
           (SELECT CAST(sum(CASE WHEN p6 < 0.05 THEN 1 ELSE 0 END)
                        AS BIGINT) FROM p) AS n_sig_at_05
    FROM ks
""".format(ARM=u01_sql("user_id * {} + rep".format(_AA_REPS + 1), "aa"))


def _aa_replicate_pvals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-sized half of e_aa_calibration, pre-checkpoint: one
    events scan → replicate explode → map-side-combined (rep, arm)
    aggregate → {_AA_REPS}-row (rep, z6, p6) frame. Factored out so
    plan audits can see the scan→Generate→partial-agg lineage that
    the checkpoint hides from the final plan."""
    # Arm draws happen at the UNIT OF RANDOMIZATION (user), not per
    # event row: events first collapse to exact per-user partial sums
    # (cnt, Σv, Σv²), then the ×R replicate explode and its md5 arm
    # draw run over |users|×R rows instead of |events|×R — measured 6×
    # less hash work at sf0.1, and the difference GROWS with events-
    # per-user at scale. Arm mean/variance reassemble exactly:
    # v = (Σv² − (Σv)²/n)/(n−1), the same formula in the oracle.
    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    us = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    reps = us.select(
        "user_id",
        "cnt",
        "s",
        "ss",
        F.explode(F.sequence(F.lit(0), F.lit(_AA_REPS - 1))).alias("rep"),
    )
    arm = (
        u01_col(
            F.col("user_id") * (_AA_REPS + 1) + F.col("rep"), "aa"
        )
        < 0.5
    )
    sums = reps.select("rep", "cnt", "s", "ss", arm.alias("arm_a")).groupBy(
        "rep", "arm_a"
    ).agg(
        F.sum("cnt").alias("n"),
        F.sum("s").alias("sv"),
        F.sum("ss").alias("ssv"),
    )
    agg = sums.select(
        "rep",
        "arm_a",
        "n",
        (F.col("sv") / F.col("n")).alias("m"),
        (
            (F.col("ssv") - F.col("sv") * F.col("sv") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v"),
    )
    def pick(col, a):
        cond = F.col("arm_a") if a else ~F.col("arm_a")
        return F.max(F.when(cond, F.col(col)))
    w = agg.groupBy("rep").agg(
        pick("m", True).alias("ma"), pick("m", False).alias("mb"),
        pick("v", True).alias("va"), pick("v", False).alias("vb"),
        pick("n", True).alias("na"), pick("n", False).alias("nb"),
    )
    z6 = F.round(
        (F.col("ma") - F.col("mb"))
        / F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb")),
        6,
    )
    return w.select(
        "rep",
        z6.alias("z6"),
    ).select(
        "rep",
        "z6",
        F.round(
            1.0 - F.abs(F.col("z6")) / F.sqrt(2.0 + F.col("z6") * F.col("z6")),
            6,
        ).alias("p6"),
    )


@register("e_aa_calibration", _AA_SQL)
def e_aa_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A calibration — the hygiene run an experimentation platform
    executes BEFORE trusting its A/B stack: {_AA_REPS} fake
    re-randomizations of the same traffic (no treatment anywhere),
    a Welch z + p per replicate, then (1) the KS distance of the
    p-value set from U(0,1) and (2) the false-positive count at
    α=0.05 — inflated significance here means broken variance
    estimates, interference, or a bad bucketing hash, and invalidates
    every real experiment downstream (Kohavi's canonical pre-launch
    check).

    Determinism: each replicate's arm is the md5-uniform of
    (user_id·{_AA_REPS + 1} + rep) — distinct per (user, rep), same
    rows in both engines; z and p snap to the 6dp grid (e_bh_fdr's t₂
    convention — exact in +,×,÷,√) before the order statistics, so
    the KS statistic is computed from identical operands.

    Scale shape: the replicate explode stays inside one codegen stage
    feeding a (rep, arm)-keyed map-side-combined aggregate
    (2·{_AA_REPS} groups); everything after is a {_AA_REPS}-row
    frame. At 100 TB this is the e_bootstrap_ci economics — one scan,
    sketch-sized state."""
    # Scale-guarded (VERDICT r12 #7): the final action reads `p` from
    # TWO subtrees (KS ranks + the z/sig aggregate) — at big-corpus
    # scale a lazy checkpoint's concurrent first computation is the
    # documented failure mode, so it goes eager there; below the
    # threshold lazy saves the extra action.
    p = _aa_replicate_pvals(spark, sf_dir).localCheckpoint(
        eager=_ab_big(sf_dir)
    )
    # 20 rows; KS + z-max + sig-count read the one materialization
    wr = Window.orderBy("p6", "rep")
    r = p.select("p6", F.row_number().over(wr).alias("i"))
    ks = r.agg(
        F.max(
            F.greatest(
                F.col("i") / float(_AA_REPS) - F.col("p6"),
                F.col("p6") - (F.col("i") - 1) / float(_AA_REPS),
            )
        ).alias("d")
    )
    stats = p.agg(
        F.round(F.max(F.abs("z6")), 6).alias("max_abs_z"),
        F.sum(F.when(F.col("p6") < 0.05, 1).otherwise(0))
        .cast("long")
        .alias("n_sig_at_05"),
    )
    return (
        ks.crossJoin(F.broadcast(stats))
        .select(
            F.lit(_AA_REPS).cast("long").alias("n_reps"),
            F.round("d", 6).alias("ks_stat"),
            "max_abs_z",
            "n_sig_at_05",
        )
    )
