"""Classical-analytics extensions: contingency / distribution tests,
regression aggregates, classifier evaluation, deterministic mode, and
non-hierarchical grouping sets.

These widen the E-family (SURVEY §2.8 — the reference's A/B harness
runs t / Wilcoxon / Levene / Shapiro tests, ab_test.py:304-414) with the
two standard remaining hypothesis tests (chi-squared independence,
two-sample Kolmogorov-Smirnov) and the evaluation ops a serving team
runs on engine output (confusion matrix over the language-ID operator,
OLS trend fits). Everything is built-in-only JVM expressions — one
aggregation pass each, no Python in any plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recommender_systems_spark.operators.relational import global_running_totals
from recommender_systems_spark.registry import _t, register
# SQL fragments come from the dependency-free _shared module, NEVER from
# sibling query modules: a module-level import of queries.stats/.textops
# here breaks whenever one of THOSE is the process's first entry into the
# package (their registration stops at their own registry import, so this
# module would see them partially initialised — the documented
# circular-import class in _shared.py).
from recommender_systems_spark.queries._shared import (
    GRP_SQL as _GRP_SQL,
    LANG_SQL as _LANG_SQL,
)


def _events_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + the A/B arm from user_id parity (FIXTURES.md split) —
    the Spark twin of _shared.GRP_SQL (same 4 lines as
    queries.stats._events_grouped, duplicated to keep this module free
    of sibling imports)."""
    ev = _t(spark, sf_dir, "events")
    return ev.withColumn(
        "grp", F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B"))
    )


# ---------------------------------------------------------------------------
# e_chi2_test — chi-squared independence (arm × event_type)
# ---------------------------------------------------------------------------

@register(
    "e_chi2_test",
    f"""
    WITH g AS ({_GRP_SQL}),
    cells AS (
        SELECT grp, event_type, CAST(count(*) AS BIGINT) AS o
        FROM g GROUP BY grp, event_type
    ),
    rowm AS (SELECT grp, sum(o) AS rm FROM cells GROUP BY grp),
    colm AS (SELECT event_type, sum(o) AS cm FROM cells GROUP BY event_type),
    tot AS (SELECT sum(o) AS n FROM cells)
    SELECT round(sum(pow(c.o - (rm * cm / n), 2) / (rm * cm / n)), 6) AS chi2,
           CAST((count(DISTINCT c.grp) - 1)
                * (count(DISTINCT c.event_type) - 1) AS BIGINT) AS dof,
           CAST(max(n) AS BIGINT) AS n
    FROM cells c
    JOIN rowm USING (grp) JOIN colm USING (event_type) CROSS JOIN tot
    """,
)
def e_chi2_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of independence between the experiment arm and
    the event-type distribution (completes the reference's hypothesis-
    test battery, ab_test.py:304-414 — it runs t/rank-sum/Levene/
    Shapiro; a categorical outcome needs chi2).

    Scale shape: the contingency table is ONE hash aggregation on
    (grp, event_type) — cells are dimension-sized (arms × types), so
    the margin joins and the final statistic run on a handful of rows
    regardless of input size. The p-value (CDF lookup) stays driver-
    side scipy as with every other test here (ml.abtest pattern)."""
    cells = (
        _events_grouped(spark, sf_dir)
        .groupBy("grp", "event_type")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rowm = cells.groupBy("grp").agg(F.sum("o").alias("rm"))
    colm = cells.groupBy("event_type").agg(F.sum("o").alias("cm"))
    tot = cells.agg(F.sum("o").alias("n"))
    e = F.col("rm") * F.col("cm") / F.col("n")
    return (
        cells.join(F.broadcast(rowm), "grp")
        .join(F.broadcast(colm), "event_type")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 6).alias("chi2"),
            (
                (F.count_distinct(F.col("grp")) - 1)
                * (F.count_distinct(F.col("event_type")) - 1)
            ).alias("dof"),
            F.max("n").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# e_ks_test — two-sample Kolmogorov-Smirnov statistic
# ---------------------------------------------------------------------------

@register(
    "e_ks_test",
    f"""
    WITH g AS ({_GRP_SQL}),
    per_value AS (
        SELECT value,
               sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS a_cnt,
               sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS b_cnt
        FROM g GROUP BY value
    ),
    cum AS (
        SELECT CAST(sum(a_cnt) OVER w AS BIGINT) AS cum_a,
               CAST(sum(b_cnt) OVER w AS BIGINT) AS cum_b
        FROM per_value
        WINDOW w AS (ORDER BY value ROWS UNBOUNDED PRECEDING)
    ),
    tot AS (
        SELECT CAST(sum(a_cnt) AS BIGINT) AS na,
               CAST(sum(b_cnt) AS BIGINT) AS nb
        FROM per_value
    )
    SELECT na, nb,
           max(abs(CAST(cum_a AS DOUBLE) / na
                   - CAST(cum_b AS DOUBLE) / nb)) AS ks_d
    FROM cum CROSS JOIN tot
    GROUP BY na, nb
    """,
)
def e_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the A and B
    arms: D = max over pooled values of |ECDF_A - ECDF_B| (the
    remaining distribution-shape test next to Levene E3 / Shapiro-
    Francia E4; reference battery at ab_test.py:304-414).

    Scale shape: pre-aggregate to one row per DISTINCT value (the only
    shuffle on raw data), then BOTH group ECDFs cumulate in a single
    two-phase range-partitioned pass (operators.relational.
    global_running_totals) — no single-partition window, so a billion
    distinct values flow through balanced range partitions. The final
    max is an ordinary scalar aggregate. Exact arithmetic end-to-end
    (integer counts, one division) — no rounding needed for parity."""
    per_value = (
        _events_grouped(spark, sf_dir)
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("a_cnt"),
            F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("b_cnt"),
        )
    )
    cum = global_running_totals(
        per_value, "value", [("a_cnt", "cum_a"), ("b_cnt", "cum_b")]
    )
    tot = per_value.agg(
        F.sum("a_cnt").alias("na"), F.sum("b_cnt").alias("nb")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a").cast("double") / F.col("na")
                    - F.col("cum_b").cast("double") / F.col("nb")
                )
            ).alias("ks_d")
        )
    )


# ---------------------------------------------------------------------------
# m_ols_regression — closed-form OLS via regression aggregates
# ---------------------------------------------------------------------------

@register(
    "m_ols_regression",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(value, extract(hour FROM ts)), 6) AS slope,
           round(regr_intercept(value, extract(hour FROM ts)), 6) AS intercept,
           round(regr_r2(value, extract(hour FROM ts)), 6) AS r2
    FROM events
    GROUP BY event_type
    """,
)
def m_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend fit (value ~ hour-of-day) via the SQL
    regression aggregates — the closed-form baseline model a serving
    team fits before reaching for ALS (the reference's bias-only model,
    prac_1_bias_only.py, is the intercept-only special case M4).

    Scale shape: regr_slope/intercept/r2 are single-pass partial-
    aggregable moments (sums of x, y, xy, x², y²) — one map-side-
    combined hash aggregation, identical cost to a grouped mean."""
    ev = _t(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope(F.col("value"), x), 6).alias("slope"),
        F.round(F.regr_intercept(F.col("value"), x), 6).alias("intercept"),
        F.round(F.regr_r2(F.col("value"), x), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# e_confusion_matrix — binary classifier evaluation of the language-ID op
# ---------------------------------------------------------------------------

@register(
    "e_confusion_matrix",
    f"""
    WITH pred AS ({_LANG_SQL}),
    c AS (
        SELECT
            sum(CASE WHEN lang_guess = 'en' AND lang_actual = 'en'
                     THEN 1 ELSE 0 END) AS tp,
            sum(CASE WHEN lang_guess = 'en' AND lang_actual <> 'en'
                     THEN 1 ELSE 0 END) AS fp,
            sum(CASE WHEN lang_guess <> 'en' AND lang_actual = 'en'
                     THEN 1 ELSE 0 END) AS fn,
            sum(CASE WHEN lang_guess <> 'en' AND lang_actual <> 'en'
                     THEN 1 ELSE 0 END) AS tn
        FROM pred
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_en,
           round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_en,
           round(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1_en
    FROM c
    """,
)
def e_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 of the engine's own
    language-ID operator as an is-English detector, judged against the
    corpus's true lang label — the standard classifier-evaluation op
    (extends E1's ranking metrics to classification; the oracle replays
    the full stopword-argmax SQL twin from t_language_id).

    Scale shape: the classifier is a per-row JVM expression; the four
    cells are one map-side-combined scalar aggregation. No shuffle
    wider than a single row."""
    from recommender_systems_spark.functions.text import language_id

    docs = _t(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("lang_actual"),
        language_id(F.col("text")).alias("lang_guess"),
    )
    is_tp = (F.col("lang_guess") == "en") & (F.col("lang_actual") == "en")
    is_fp = (F.col("lang_guess") == "en") & (F.col("lang_actual") != "en")
    is_fn = (F.col("lang_guess") != "en") & (F.col("lang_actual") == "en")
    is_tn = (F.col("lang_guess") != "en") & (F.col("lang_actual") != "en")
    c = pred.agg(
        F.sum(F.when(is_tp, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(is_fp, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(is_fn, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(is_tn, 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(tp.cast("double") / (tp + fp), 6).alias("precision_en"),
        F.round(tp.cast("double") / (tp + fn), 6).alias("recall_en"),
        F.round(F.lit(2.0) * tp / (F.lit(2.0) * tp + fp + fn), 6).alias("f1_en"),
    )


# ---------------------------------------------------------------------------
# a_mode — deterministic per-group mode
# ---------------------------------------------------------------------------

@register(
    "a_mode",
    """
    WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        FROM events WHERE user_id < 100
        GROUP BY user_id, event_type
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn
        FROM c
    )
    SELECT user_id, event_type AS mode_event_type, n
    FROM r WHERE rn = 1
    """,
)
def a_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type with a TOTAL tie-break (count desc,
    then lexicographic type asc) — ``F.mode`` is non-deterministic on
    ties across engines, so the house pattern is count + row_number
    (A-family extension; same shape as W4 group-top-k).

    Scale shape: one hash aggregation on (user, type), then a window
    over the per-user handful of type rows — the window input is the
    AGGREGATE, dimension-bounded per user, not the raw events."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), "n")
    )


# ---------------------------------------------------------------------------
# a_grouping_sets — non-hierarchical grouping sets in one pass
# ---------------------------------------------------------------------------

@register(
    "a_grouping_sets",
    """
    WITH src AS (
        SELECT event_type, date_trunc('day', ts) AS day, value FROM events
    )
    SELECT event_type, day,
           CASE WHEN event_type IS NOT NULL THEN 'by_type'
                WHEN day IS NOT NULL THEN 'by_day'
                ELSE 'all' END AS set_name,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM src
    GROUP BY GROUPING SETS ((event_type), (day), ())
    """,
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independent marginals (by event type, by day, grand total) from
    ONE scan via GROUPING SETS — the non-hierarchical cousin of
    a_rollup/a_cube: {(type), (day), ()} is NOT a rollup prefix chain
    and NOT the full cube, so neither existing operator expresses it.

    Scale shape: Spark plans one Expand (3 grouping sets) over a single
    scan feeding one hash aggregation — at 100 TB this replaces three
    separate jobs with one, and the shuffle carries only the tiny
    (type, day) key space. The set label derives from key nullness
    (both columns are non-null in the data) so both engines agree
    without relying on engine-specific grouping_id bit orders."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    return (
        ev.groupingSets([["event_type"], ["day"], []], "event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "event_type",
            "day",
            F.when(F.col("event_type").isNotNull(), F.lit("by_type"))
            .when(F.col("day").isNotNull(), F.lit("by_day"))
            .otherwise(F.lit("all"))
            .alias("set_name"),
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# e_qte_deciles — quantile treatment effect (per-decile A/B lift)
# ---------------------------------------------------------------------------

@register(
    "e_qte_deciles",
    f"""
    WITH g AS ({_GRP_SQL}),
    per_value AS (
        SELECT value,
               sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS a_cnt,
               sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS b_cnt,
               count(*) AS tot
        FROM g GROUP BY value
    ),
    cum AS (
        SELECT value, a_cnt, b_cnt,
               sum(tot) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cumt
        FROM per_value
    ),
    tot AS (SELECT sum(tot) AS n FROM per_value),
    b AS (
        SELECT least(10, CAST(ceil(10.0 * cumt / n) AS BIGINT)) AS decile,
               value, a_cnt, b_cnt
        FROM cum CROSS JOIN tot
    )
    SELECT decile,
           CAST(sum(a_cnt) AS BIGINT) AS na,
           CAST(sum(b_cnt) AS BIGINT) AS nb,
           round(sum(value * a_cnt) / sum(a_cnt), 6) AS mean_a,
           round(sum(value * b_cnt) / sum(b_cnt), 6) AS mean_b,
           CASE WHEN sum(a_cnt) = 0 OR sum(b_cnt) = 0 THEN NULL
                ELSE round(sum(value * a_cnt) / sum(a_cnt)
                           - sum(value * b_cnt) / sum(b_cnt), 6) END AS qte
    FROM b GROUP BY decile
    """,
)
def e_qte_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effect: the A-vs-B mean difference WITHIN
    each decile of the pooled outcome distribution — the
    distributional A/B view (a treatment that helps the tail but hurts
    the median is invisible to e_t_test_stats's single mean).

    Scale shape: deciles come from the pooled ECDF — per-distinct-value
    pre-aggregate, then the two-phase `global_running_total` cumsum
    (no single-partition window; the e_ks_test shape), bucket =
    ceil(10·cum/n) clamped, then one decile-keyed aggregation. Every
    shuffle after the first carries distinct values or 10 decile
    keys."""
    from recommender_systems_spark.operators.relational import global_running_total

    per_value = (
        _events_grouped(spark, sf_dir)
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("a_cnt"),
            F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("b_cnt"),
            F.count(F.lit(1)).alias("tot"),
        )
    )
    cum = global_running_total(per_value, "value", "tot", out_col="cumt")
    tot = per_value.agg(F.sum("tot").alias("n"))
    b = cum.crossJoin(F.broadcast(tot)).select(
        F.least(
            F.lit(10),
            F.ceil(F.lit(10.0) * F.col("cumt") / F.col("n")).cast("long"),
        ).alias("decile"),
        "value",
        "a_cnt",
        "b_cnt",
    )
    sa, sb = F.sum("a_cnt"), F.sum("b_cnt")
    mean_a = F.sum(F.col("value") * F.col("a_cnt")) / sa
    mean_b = F.sum(F.col("value") * F.col("b_cnt")) / sb
    return b.groupBy("decile").agg(
        sa.alias("na"),
        sb.alias("nb"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.when((sa == 0) | (sb == 0), F.lit(None).cast("double"))
        .otherwise(F.round(mean_a - mean_b, 6))
        .alias("qte"),
    )


# ---------------------------------------------------------------------------
# e_cuped — variance-reduced A/B estimate (CUPED)
# ---------------------------------------------------------------------------

@register(
    "e_cuped",
    f"""
    WITH g AS ({_GRP_SQL}),
    ts_us AS (SELECT *, epoch_us(ts) AS us FROM g),
    bounds AS (SELECT min(us) AS lo, max(us) AS hi FROM ts_us),
    u AS (
        SELECT user_id, max(grp) AS grp,
               round(avg(CASE WHEN us * 2 < lo + hi THEN value END), 6) AS pre,
               round(avg(CASE WHEN us * 2 >= lo + hi THEN value END), 6) AS post
        FROM ts_us CROSS JOIN bounds
        GROUP BY user_id
    ),
    k AS (SELECT * FROM u WHERE pre IS NOT NULL AND post IS NOT NULL),
    s AS (
        SELECT round(covar_pop(post, pre) / var_pop(pre), 6) AS theta,
               round(avg(pre), 6) AS mu
        FROM k
    ),
    adj AS (
        SELECT grp, post, post - theta * (pre - mu) AS a
        FROM k CROSS JOIN s
    )
    SELECT grp, CAST(count(*) AS BIGINT) AS n_users,
           round(avg(post), 6) AS mean_post,
           round(avg(a), 6) AS mean_adjusted,
           round(1 - var_samp(a) / var_samp(post), 4) AS var_reduction
    FROM adj GROUP BY grp
    """,
)
def e_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): adjust each user's
    experiment-period outcome by their pre-period covariate,
    a' = post − θ·(pre − mean(pre)) with θ = cov(post,pre)/var(pre) —
    the industry-standard way to shrink A/B confidence intervals
    without more traffic. Pre/post here split the event stream at its
    time midpoint (the midpoint test is the integer comparison
    us·2 < lo+hi — no division, exact in both engines).

    Scale shape: one user-keyed aggregation builds (pre, post) pairs;
    θ and mean(pre) are a 1-row broadcast; the adjusted arm means are
    one more partial-aggregable pass. Per-user and global statistics
    are rounded to the 6dp grid before reuse (the m_kmeans
    shared-rounded-values pattern) so both engines adjust with the
    IDENTICAL θ."""
    g = _events_grouped(spark, sf_dir).withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    bounds = g.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
    u = (
        g.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.max("grp").alias("grp"),
            F.round(
                F.avg(F.when(F.col("us") * 2 < F.col("lo") + F.col("hi"),
                             F.col("value"))), 6
            ).alias("pre"),
            F.round(
                F.avg(F.when(F.col("us") * 2 >= F.col("lo") + F.col("hi"),
                             F.col("value"))), 6
            ).alias("post"),
        )
    )
    k = u.filter(F.col("pre").isNotNull() & F.col("post").isNotNull())
    s = k.agg(
        F.round(
            F.covar_pop("post", "pre") / F.var_pop("pre"), 6
        ).alias("theta"),
        F.round(F.avg("pre"), 6).alias("mu"),
    )
    adj = k.crossJoin(F.broadcast(s)).select(
        "grp",
        "post",
        (F.col("post") - F.col("theta") * (F.col("pre") - F.col("mu"))).alias("a"),
    )
    return adj.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("post"), 6).alias("mean_post"),
        F.round(F.avg("a"), 6).alias("mean_adjusted"),
        F.round(
            F.lit(1) - F.var_samp("a") / F.var_samp("post"), 4
        ).alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# e_diff_in_diff — 2×2 difference-in-differences estimator
# ---------------------------------------------------------------------------

@register(
    "e_diff_in_diff",
    f"""
    WITH g AS ({_GRP_SQL}),
    ts_us AS (SELECT *, epoch_us(ts) AS us FROM g),
    bounds AS (SELECT min(us) AS lo, max(us) AS hi FROM ts_us),
    cells AS (
        SELECT
            avg(CASE WHEN grp = 'A' AND us * 2 <  lo + hi THEN value END) AS pre_a,
            avg(CASE WHEN grp = 'A' AND us * 2 >= lo + hi THEN value END) AS post_a,
            avg(CASE WHEN grp = 'B' AND us * 2 <  lo + hi THEN value END) AS pre_b,
            avg(CASE WHEN grp = 'B' AND us * 2 >= lo + hi THEN value END) AS post_b,
            CAST(count(*) AS BIGINT) AS n
        FROM ts_us CROSS JOIN bounds
    )
    SELECT n,
           round(pre_a, 6) AS pre_a, round(post_a, 6) AS post_a,
           round(pre_b, 6) AS pre_b, round(post_b, 6) AS post_b,
           round((post_b - pre_b) - (post_a - pre_a), 6) AS did
    FROM cells
    """,
)
def e_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator over the 2×2 (arm ×
    pre/post) design: DiD = (post_B − pre_B) − (post_A − pre_A),
    treating arm A as the control trend — the causal-inference
    workhorse when randomisation is imperfect (complements e_cuped's
    variance reduction; same integer-time midpoint split).

    Scale shape: ONE conditional-aggregate pass over the events scan
    (four cell means from the same map-side-combined aggregation) after
    a 1-row bounds broadcast. Nothing shuffles but partial
    aggregates."""
    g = _events_grouped(spark, sf_dir).withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    bounds = g.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
    is_pre = F.col("us") * 2 < F.col("lo") + F.col("hi")
    cells = g.crossJoin(F.broadcast(bounds)).agg(
        F.avg(F.when((F.col("grp") == "A") & is_pre, F.col("value"))).alias("pre_a"),
        F.avg(F.when((F.col("grp") == "A") & ~is_pre, F.col("value"))).alias("post_a"),
        F.avg(F.when((F.col("grp") == "B") & is_pre, F.col("value"))).alias("pre_b"),
        F.avg(F.when((F.col("grp") == "B") & ~is_pre, F.col("value"))).alias("post_b"),
        F.count(F.lit(1)).alias("n"),
    )
    return cells.select(
        "n",
        F.round("pre_a", 6).alias("pre_a"),
        F.round("post_a", 6).alias("post_a"),
        F.round("pre_b", 6).alias("pre_b"),
        F.round("post_b", 6).alias("post_b"),
        F.round(
            (F.col("post_b") - F.col("pre_b")) - (F.col("post_a") - F.col("pre_a")),
            6,
        ).alias("did"),
    )
