"""Event-time session operators: gap-based sessionization and the
as-of join — the two timeseries primitives a training-data pipeline
needs over an events stream (batch forms fully SQL-expressible →
oracle-checked; the streaming sessionizer in ``streaming.sessions``
shares the same semantics via ``applyInPandasWithState``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recommender_systems_spark.registry import _t, register

SESSION_GAP_MIN = 30

_SESSION_SQL = f"""
    WITH ordered AS (
        SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ),
    marked AS (
        SELECT user_id, ts, value,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('microsecond', prev_ts, ts)
                            > {SESSION_GAP_MIN} * 60000000
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ),
    sess AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_no
        FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sess
    GROUP BY user_id, session_no
"""


@register("s_sessionize", _SESSION_SQL)
def s_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity
    timeout): lag → new-session flag → running sum = session number →
    per-session aggregate. Both windows partition by user, so the whole
    plan is ONE shuffle on user_id and scales with the user count, not
    the event count per partition. The streaming twin
    (streaming.sessions.sessionize_stream) holds the same gap logic in
    applyInPandasWithState with an event-time timeout."""
    ev = _t(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Exact integer microsecond gap on both engines (double epoch
    # seconds lose sub-µs precision at 2026-era epochs). The NTZ→TZ
    # cast is safe for differences (session tz is UTC).
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("prev_ts").cast("timestamp")
    )
    marked = ev.withColumn("prev_ts", F.lag("ts").over(w_lag)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull() | (gap_us > SESSION_GAP_MIN * 60_000_000),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn("session_no", F.sum("new_session").over(w_run))
    return sess.groupBy("user_id", F.col("session_no").cast("long").alias("session_no")).agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


_ASOF_SQL = """
    WITH purchases AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    ),
    matched AS (
        SELECT p.event_id, p.user_id, p.value,
               max(c.click_ts) AS last_click_ts
        FROM purchases p LEFT JOIN clicks c
          ON c.user_id = p.user_id AND c.click_ts <= p.ts
        GROUP BY p.event_id, p.user_id, p.value, p.ts
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN last_click_ts IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_prior_click,
           round(sum(value), 2) AS sum_value
    FROM matched
    GROUP BY user_id
"""


@register("j_asof_join", _ASOF_SQL)
def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest click at-or-
    before it by the same user. Spark has no ASOF keyword; the
    scale-safe plan is the union-and-window form — interleave both
    sides ordered by (user, ts), carry the last click time forward with
    last_value(ignorenulls) — ONE shuffle on user_id, no range join,
    no per-row subquery (the oracle uses the naive inequality-join
    form; identical results, different physics)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value", F.lit(1).alias("is_p")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("is_p"),
    )
    both = purchases.unionByName(clicks)
    # Order clicks before purchases at identical timestamps so an
    # exactly-simultaneous click counts as "at-or-before" (ties: the
    # oracle's c.click_ts <= p.ts includes equality).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    matched = carried.filter(F.col("is_p") == 1)
    return matched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.when(F.col("last_click_ts").isNotNull(), 1).otherwise(0)).alias(
            "n_with_prior_click"
        ),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# Non-uniform value bands (exponential-ish edges): a real interval
# join — not expressible as floor(value/width) bucketing, which is the
# point of the operator.
BAND_EDGES = [0.0, 1.0, 5.0, 10.0, 25.0, 50.0, 100.0, 200.0, 350.0, 500.0]
_BANDS = list(zip(BAND_EDGES[:-1], BAND_EDGES[1:]))

_RANGE_SQL = f"""
    WITH bands(lo, hi) AS (VALUES {", ".join(f"({lo}, {hi})" for lo, hi in _BANDS)})
    SELECT b.lo AS band_lo, b.hi AS band_hi,
           CAST(count(e.value) AS BIGINT) AS n,
           round(coalesce(sum(e.value), 0.0), 2) AS sum_value
    FROM bands b LEFT JOIN events e ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.lo, b.hi
"""


@register("j_range_join", _RANGE_SQL)
def j_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: every event lands in the non-uniform
    value band containing it. The tiny band table broadcasts, so the
    plan is a broadcast nested-loop join — the correct physics for
    fact × small-interval-set (each fact row tests ≤|bands| intervals
    map-side, no shuffle of the fact). For interval×interval at scale
    the same query runs over bucketized prefixes (equi-join on
    floor(value/step) plus the residual predicate) — the bands here
    stay a LEFT join so empty bands surface with n = 0, which the
    oracle checks."""
    ev = _t(spark, sf_dir, "events").select("value")
    bands = spark.createDataFrame(_BANDS, "lo double, hi double")
    joined = F.broadcast(bands).join(
        ev, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")), "left"
    )
    return joined.groupBy(
        F.col("lo").alias("band_lo"), F.col("hi").alias("band_hi")
    ).agg(
        F.count("value").alias("n"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# CDC log → snapshot compaction (lakehouse MERGE semantics)
# ---------------------------------------------------------------------------

_CDC_SQL = """
    WITH ranked AS (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        FROM events
    )
    SELECT user_id, CAST(n_changes AS BIGINT) AS n_changes,
           round(value, 5) AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
"""


@register("s_cdc_snapshot", _CDC_SQL)
def s_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture compaction — the lakehouse MERGE / SCD-1
    step that folds an append-only change log into the current
    snapshot: per key, latest change wins ('error' events act as the
    delete marker, so a key whose newest change is a delete drops out
    of the snapshot entirely). This is how a 100-TB ingest keeps a
    queryable current-state table next to the immutable log.

    ONE shuffle on the key: both the latest-wins row_number and the
    change count ride the same user_id window partitioning, and the
    delete/keep decision is a post-window filter — no join, no second
    exchange. At scale the key-partitioned window is exactly the
    shape Delta/Iceberg MERGE compaction jobs run; a billion keys
    spread over ordinary hash partitions."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("n_changes").cast("long").alias("n_changes"),
            F.round("value", 5).alias("last_value"),
        )
    )


# ---------------------------------------------------------------------------
# Ordered funnel analysis (view → click → purchase)
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ["view", "click", "purchase"]

_FUNNEL_SQL = """
    WITH s1 AS (
        SELECT user_id, ts, event_type,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ),
    s2 AS (
        SELECT *,
               min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                   OVER (PARTITION BY user_id) AS t2
        FROM s1
    ),
    s3 AS (
        SELECT *,
               min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                   OVER (PARTITION BY user_id) AS t3
        FROM s2
    ),
    u AS (
        SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
        FROM s3 GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t1) AS BIGINT) AS n_view,
           CAST(count(t2) AS BIGINT) AS n_view_click,
           CAST(count(t3) AS BIGINT) AS n_full_funnel,
           round(CAST(count(t2) AS DOUBLE) / count(t1), 4) AS click_rate,
           round(CAST(count(t3) AS DOUBLE) / count(t2), 4) AS purchase_rate
    FROM u
"""


@register("s_funnel", _FUNNEL_SQL)
def s_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis over the events stream: how many users
    progressed view → click (strictly after their first view) →
    purchase (strictly after that click). The product-analytics
    staple next to sessionization (s_sessionize) and retention.

    The strict event-ORDER constraint is what makes this non-trivial:
    stage N's timestamp must come after stage N−1's, so a per-stage
    conditional ``min`` can't be computed in one grouped pass. Instead
    three chained window aggregates over the SAME partitioning
    (partitionBy(user_id), unbounded frame, no sort needed) — Catalyst
    plans ONE hash exchange on user_id and evaluates the three Window
    operators back-to-back on the partitioned stream, each one reading
    the previous one's column. Per-user reduction then final global
    count land in the same exchange; conversion rates are exact
    int/int rationals in both engines."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    t1, t2, t3 = _FUNNEL_STEPS
    step = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == t1, F.col("ts"))).over(w)
    )
    step = step.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == t2) & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    step = step.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == t3) & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = step.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    n1, n2, n3 = F.count("t1"), F.count("t2"), F.count("t3")
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        n1.cast("long").alias("n_view"),
        n2.cast("long").alias("n_view_click"),
        n3.cast("long").alias("n_full_funnel"),
        F.round(n2.cast("double") / n1, 4).alias("click_rate"),
        F.round(n3.cast("double") / n2, 4).alias("purchase_rate"),
    )


# ---------------------------------------------------------------------------
# Cohort retention analysis
# ---------------------------------------------------------------------------

_RETENTION_SQL = """
    WITH activity AS (
        SELECT DISTINCT user_id,
               date_trunc('week', ts) AS week
        FROM events
    ),
    cohort AS (
        SELECT user_id, min(week) AS cohort_week
        FROM activity GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_week, count(*) AS cohort_size
        FROM cohort GROUP BY cohort_week
    ),
    ret AS (
        SELECT c.cohort_week,
               CAST(datediff('day', c.cohort_week, a.week) // 7 AS BIGINT)
                   AS week_offset,
               count(*) AS n_active
        FROM activity a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY 1, 2
    )
    SELECT ret.cohort_week, ret.week_offset,
           CAST(ret.n_active AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           round(CAST(ret.n_active AS DOUBLE) / s.cohort_size, 4) AS retention
    FROM ret JOIN sizes s ON ret.cohort_week = s.cohort_week
"""


@register("s_retention", _RETENTION_SQL)
def s_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention analysis — the third leg of the product-
    analytics triad (sessionization, funnel, retention): users are
    cohorted by the week of their first activity and each cohort's
    weekly active fraction is tracked forward.

    Plan shape: ONE distinct over (user_id, week) collapses the event
    volume to user-weeks immediately (everything downstream is
    user-dimension-sized); the cohort assignment is a per-user min that
    REUSES the distinct's hash partitioning on user_id, as does the
    activity⋈cohort join — so the only event-volume shuffle is the
    initial distinct, and it carries (id, date) pairs. Cohort sizes
    are a week-sized table joined broadcast. Retention is an int/int
    rational — exact in both engines. Weeks stay TIMESTAMP (not DATE)
    on both sides: Spark date columns surface as datetime.date objects
    while DuckDB's surface as Timestamps, which breaks the driver's
    repr-based canonical form even when values agree."""
    ev = _t(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    ret = (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return ret.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        F.col("n_active").cast("long").alias("n_active"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 4
        ).alias("retention"),
    )


# ---------------------------------------------------------------------------
# Time-grid gap filling (forward fill)
# ---------------------------------------------------------------------------

_GAP_USERS = 12  # bound the emitted grid; the op is per-user-partition anyway

_GAP_SQL = f"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
               round(sum(value), 2) AS obs
        FROM events WHERE user_id < {_GAP_USERS}
        GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, min(hour) AS h0, max(hour) AS h1
        FROM hourly GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM span
    ),
    j AS (
        SELECT g.user_id, g.hour, h.obs
        FROM grid g LEFT JOIN hourly h USING (user_id, hour)
    )
    SELECT user_id, hour,
           last_value(obs IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           CAST(obs IS NULL AS INTEGER) AS is_gap
    FROM j
"""


@register("s_gap_fill", _GAP_SQL)
def s_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: densify each user's hourly aggregate
    onto a complete hour grid and forward-fill missing hours with the
    last observation — the regularisation step before any
    fixed-step time-series model (demand forecasting, feature
    snapshots, monitoring rollups) consumes an irregular event stream.

    Plan shape: the hourly pre-aggregate collapses event volume first
    (everything after is grid-sized); each user's grid is GENERATED
    in-plan (``sequence`` + explode over the per-user [min,max] span —
    no driver-side calendar table, no cross join against a global
    grid, so a user active for a day doesn't pay for the corpus's full
    span); the left join and the forward-fill window both ride
    user-keyed exchanges. ``last(ignorenulls)`` over the running frame
    is the canonical Spark forward fill; DuckDB's IGNORE NULLS
    last_value mirrors it exactly."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < _GAP_USERS)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.round(F.sum("value"), 2).alias("obs"))
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    j = grid.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "hour",
        F.last("obs", ignorenulls=True).over(w).alias("value"),
        F.col("obs").isNull().cast("int").alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# Snapshot reconciliation diff (full-outer audit join)
# ---------------------------------------------------------------------------

_DIFF_SPLIT = "2024-01-16"

_DIFF_SQL = f"""
    WITH a AS (
        SELECT user_id, round(sum(value), 2) AS v
        FROM events WHERE ts < TIMESTAMP '{_DIFF_SPLIT}'
        GROUP BY user_id
    ),
    b AS (
        SELECT user_id, round(sum(value), 2) AS v
        FROM events WHERE ts >= TIMESTAMP '{_DIFF_SPLIT}'
        GROUP BY user_id
    ),
    d AS (
        SELECT coalesce(a.user_id, b.user_id) AS user_id,
               CASE WHEN a.user_id IS NULL THEN 'added'
                    WHEN b.user_id IS NULL THEN 'removed'
                    WHEN a.v = b.v THEN 'unchanged'
                    ELSE 'changed' END AS status,
               coalesce(b.v, 0) - coalesce(a.v, 0) AS delta
        FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    )
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_keys,
           round(sum(delta), 2) AS total_delta
    FROM d GROUP BY status
"""


@register("j_snapshot_diff", _DIFF_SQL)
def j_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: FULL OUTER join two per-key aggregate
    snapshots (here: each user's value total before/after a cut date)
    and classify every key as added / removed / changed / unchanged
    with the value drift per class — the audit query run after every
    backfill, migration, or CDC replay to prove the new snapshot
    moved only what it should have (the verification counterpart to
    s_cdc_snapshot's MERGE).

    The one join type the engine's query surface didn't yet exercise:
    full-outer hash join on the key, both sides pre-aggregated to
    key-sized tables first (events volume collapses BEFORE the join,
    and both pre-aggregates partition on user_id so the join reuses
    their exchanges). Values compare after the house round-2, making
    'unchanged' a bit-exact predicate in both engines."""
    ev = _t(spark, sf_dir, "events")
    split = F.lit(_DIFF_SPLIT).cast("timestamp")

    def snap(pred):
        return (
            ev.filter(pred)
            .groupBy("user_id")
            .agg(F.round(F.sum("value"), 2).alias("v"))
        )

    a = snap(F.col("ts") < split).withColumnsRenamed(
        {"user_id": "ka", "v": "va"}
    )
    b = snap(F.col("ts") >= split).withColumnsRenamed(
        {"user_id": "kb", "v": "vb"}
    )
    d = a.join(b, F.col("ka") == F.col("kb"), "full_outer").select(
        F.when(F.col("ka").isNull(), "added")
        .when(F.col("kb").isNull(), "removed")
        .when(F.col("va") == F.col("vb"), "unchanged")
        .otherwise("changed")
        .alias("status"),
        (
            F.coalesce(F.col("vb"), F.lit(0.0))
            - F.coalesce(F.col("va"), F.lit(0.0))
        ).alias("delta"),
    )
    return d.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.round(F.sum("delta"), 2).alias("total_delta"),
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection
# ---------------------------------------------------------------------------

_ZS_HIST = 6     # trailing history window (hours)
_ZS_MIN_N = 3    # minimum history before scoring
_ZS_THRESH = 2.0

_ZSCORE_SQL = f"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
               round(sum(value), 2) AS x
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT user_id, hour, x,
               count(*) OVER tw AS n,
               sum(x) OVER tw AS s,
               sum(x * x) OVER tw AS ss
        FROM hourly
        WINDOW tw AS (PARTITION BY user_id ORDER BY hour
                      ROWS BETWEEN {_ZS_HIST} PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, hour, x,
           CAST(n AS BIGINT) AS n_hist,
           round((x - s / n) / sqrt((ss - s * s / n) / (n - 1)), 3) AS z,
           CAST(abs(round((x - s / n) / sqrt((ss - s * s / n) / (n - 1)), 3))
                > {_ZS_THRESH} AS INTEGER) AS is_anomaly
    FROM w
    WHERE n >= {_ZS_MIN_N} AND (ss - s * s / n) / (n - 1) > 0
"""


@register("s_anomaly_zscore", _ZSCORE_SQL)
def s_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each user-hour's aggregate is
    scored against the mean/stddev of that user's TRAILING {_ZS_HIST}
    observed hours (strictly before it — no leakage from the scored
    point) and flagged past {_ZS_THRESH}σ — the streaming-monitoring
    staple (metric spike detection) in its batch form.

    Mean and variance come from explicit windowed Σx/Σx² with the
    textbook identity written CHARACTER-IDENTICAL in both engines —
    not the builtin stddev, whose internal accumulation
    (Welford vs two-pass) differs between engines; over a ≤{_ZS_HIST}-
    row frame both engines sum in frame order, so z matches to the
    3-decimal round and the threshold flag derives from the ROUNDED z
    (no boundary flicker). One user-keyed exchange: the hourly
    pre-agg, the trailing window, and the filter share it."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.round(F.sum("value"), 2).alias("x"))
    tw = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(-_ZS_HIST, -1)
    )
    w = hourly.select(
        "user_id",
        "hour",
        "x",
        F.count(F.lit(1)).over(tw).alias("n"),
        F.sum("x").over(tw).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(tw).alias("ss"),
    )
    n, s_, ss = F.col("n"), F.col("s"), F.col("ss")
    var = (ss - s_ * s_ / n) / (n - 1)
    z = F.round((F.col("x") - s_ / n) / F.sqrt(var), 3)
    return w.filter((n >= _ZS_MIN_N) & (var > 0)).select(
        "user_id",
        "hour",
        "x",
        n.cast("long").alias("n_hist"),
        z.alias("z"),
        (F.abs(z) > _ZS_THRESH).cast("int").alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (state + batch merge == recompute)
# ---------------------------------------------------------------------------

_INC_CUT = "2024-01-20"

_INC_SQL = """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY user_id
"""


@register("s_incremental_agg", _INC_SQL)
def s_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a per-key aggregate STATE table
    (events before the cut) merged with a NEW BATCH's partial aggregate
    (events after the cut) via full-outer coalesce — the nightly-merge
    shape every lakehouse metric table runs instead of recomputing
    history (count/sum are the self-mergeable aggregates; the oracle
    recomputes from the FULL table, so the hash match IS the proof
    that merge(state, batch) == recompute — the invariant an
    incremental pipeline must certify before it can replace its
    batch job).

    Both partials and the merge share one user_id hash partitioning
    (the join reuses the aggs' exchanges); at 100 TB the state side is
    a stored table and only the batch partial is computed fresh."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit(_INC_CUT).cast("timestamp")

    def partial(pred):
        return (
            ev.filter(pred)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        )

    state = partial(F.col("ts") < cut).withColumnsRenamed(
        {"user_id": "ku", "n": "n0", "s": "s0"}
    )
    batch = partial(F.col("ts") >= cut)
    merged = state.join(
        batch, F.col("ku") == F.col("user_id"), "full_outer"
    ).select(
        F.coalesce(F.col("ku"), F.col("user_id")).alias("user_id"),
        (
            F.coalesce(F.col("n0"), F.lit(0)) + F.coalesce(F.col("n"), F.lit(0))
        ).cast("long").alias("n_events"),
        F.round(
            F.coalesce(F.col("s0"), F.lit(0.0))
            + F.coalesce(F.col("s"), F.lit(0.0)),
            2,
        ).alias("sum_value"),
    )
    return merged


# ---------------------------------------------------------------------------
# SCD type-2 history (validity intervals from a change log)
# ---------------------------------------------------------------------------

_SCD2_SQL = """
    SELECT user_id,
           round(value, 2) AS value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           CAST(lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL AS INTEGER)
               AS is_current
    FROM events
    WHERE event_type = 'purchase'
"""


@register("s_scd2_history", _SCD2_SQL)
def s_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: each change event becomes a validity
    interval [valid_from, valid_to) closed by the NEXT change of the
    same key, the open interval marked current — the slowly-changing-
    dimension shape every warehouse keeps next to the SCD-1 snapshot
    (s_cdc_snapshot); a point-in-time feature join (j_asof_join) reads
    exactly this table.

    One window over one user-keyed exchange: lead() closes the
    interval and derives the current flag from the same shuffle+sort;
    the event_id tie-break makes simultaneous changes deterministic in
    both engines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.round("value", 2).alias("value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------------

_CUSUM_SQL = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               round(avg(value), 4) AS x
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, count(*) AS n, sum(x) AS s, sum(x * x) AS ss
        FROM hourly GROUP BY event_type
    ),
    z AS (
        SELECT h.event_type, h.hour,
               (h.x - st.s / st.n)
                   / sqrt((st.ss - st.s * st.s / st.n) / (st.n - 1)) AS zx,
               st.n
        FROM hourly h JOIN stats st USING (event_type)
    ),
    cum AS (
        SELECT event_type, hour, n,
               round(abs(sum(zx) OVER (
                   PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
                   AS abs_s
        FROM z
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_hours, hour AS cp_hour,
           round(abs_s, 3) AS max_abs_s
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY abs_s DESC, hour) AS rn
          FROM cum)
    WHERE rn = 1
"""


@register("s_changepoint", _CUSUM_SQL)
def s_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection: per event_type, standardise the
    hourly mean series and locate the hour where the cumulative sum of
    deviations peaks in magnitude — the classic estimator of WHERE a
    level shift happened (the retrospective counterpart to
    s_anomaly_zscore's online flagging; a_psi_drift says IF the
    distribution moved, CUSUM says WHEN).

    Series statistics use the explicit Σ/Σ² identity (engine-identical
    ordering, as in s_anomaly_zscore); the running sum is one ordered
    window per type, |S| rounds to 6dp BEFORE the argmax so the peak
    pick cannot straddle an ulp, and the argmax is a row_number pick
    over (|S| desc, hour) — a total ordering both engines resolve
    identically.
    Everything after the hourly pre-agg is series-sized."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.round(F.avg("value"), 4).alias("x"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    n, s_, ss = F.col("n"), F.col("s"), F.col("ss")
    z = hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hour",
        "n",
        (
            (F.col("x") - s_ / n)
            / F.sqrt((ss - s_ * s_ / n) / (n - 1))
        ).alias("zx"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = z.select(
        "event_type",
        "hour",
        "n",
        F.round(F.abs(F.sum("zx").over(w)), 6).alias("abs_s"),
    )
    wpick = Window.partitionBy("event_type").orderBy(
        F.col("abs_s").desc(), "hour"
    )
    return (
        cum.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_hours"),
            F.col("hour").alias("cp_hour"),
            F.round("abs_s", 3).alias("max_abs_s"),
        )
    )


# ---------------------------------------------------------------------------
# Point-in-time feature join (feature-store correctness join)
# ---------------------------------------------------------------------------

_PIT_SQL = """
    WITH scd AS (
        SELECT user_id,
               round(value, 2) AS feat,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM events WHERE event_type = 'purchase'
    ),
    label AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'click'
    )
    SELECT l.event_id, l.user_id, l.ts AS label_ts, s.feat,
           s.valid_from AS feat_from
    FROM label l
    JOIN scd s
      ON s.user_id = l.user_id
     AND s.valid_from <= l.ts
     AND (s.valid_to IS NULL OR l.ts < s.valid_to)
"""


@register("j_pit_features", _PIT_SQL)
def j_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join: each label event (clicks) picks up
    the feature value that was CURRENT at its timestamp from the SCD-2
    validity table (purchases as the change log) — the feature-store
    correctness join that prevents label leakage (training must never
    see a feature written after the label; an ordinary latest-value
    join silently does).

    Because SCD-2 intervals partition each user's timeline, interval
    containment is logically an as-of lookup; the plan is one
    user-keyed equi-join with the containment as a residual filter —
    both sides pre-partition on user_id (the SCD build's window and
    the join share the exchange) and per-user interval counts are
    bounded by that user's change count, so the residual never
    explodes. Labels before a user's first change simply drop (inner
    join) — exactly the rows a leak-free training set must exclude."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scd = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.round("value", 2).alias("feat"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .withColumnsRenamed({"user_id": "su"})
    )
    label = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("label_ts")
    )
    return label.join(
        scd,
        (F.col("user_id") == F.col("su"))
        & (F.col("valid_from") <= F.col("label_ts"))
        & (F.col("valid_to").isNull() | (F.col("label_ts") < F.col("valid_to"))),
    ).select(
        "event_id",
        "user_id",
        "label_ts",
        "feat",
        F.col("valid_from").alias("feat_from"),
    )


# ---------------------------------------------------------------------------
# Watermark sizing: event-time lateness profile in arrival order
# ---------------------------------------------------------------------------

_WM_SQL = """
    WITH arr AS (
        SELECT event_id, ts,
               max(ts) OVER (ORDER BY epoch_us(ts) // 300000000,
                                      substring(md5(CAST(event_id AS VARCHAR)),
                                                1, 8),
                                      event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS hwm
        FROM events
    ),
    late AS (
        SELECT (epoch_us(hwm) - epoch_us(ts)) / 1000000.0 AS late_s,
               CAST(ts < hwm AS INTEGER) AS is_late
        FROM arr
    )
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(is_late) AS BIGINT) AS n_late,
           round(CAST(sum(is_late) AS DOUBLE) / count(*), 5) AS late_frac,
           round(quantile_cont(late_s, 0.5), 2) AS p50_late_s,
           round(quantile_cont(late_s, 0.95), 2) AS p95_late_s,
           round(quantile_cont(late_s, 0.99), 2) AS p99_late_s,
           round(max(late_s), 2) AS max_late_s
    FROM late
"""


@register("s_watermark_sizing", _WM_SQL)
def s_watermark_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing: replay the stream in ARRIVAL order (event_id)
    and measure each event's lateness against the running event-time
    high-water mark — the p95/p99 of exactly this distribution is what
    a production job sets `withWatermark` to (too small drops data,
    too large bloats every stateful operator's store; the streaming
    queries here use '1 hour' — this profile is the evidence that
    number needs).

    The driver's synthetic events file is perfectly time-ordered, so
    ARRIVAL order is simulated deterministically: events shuffle
    (md5-keyed) WITHIN 5-minute ingestion blocks — the consumer-
    interleaving pattern a kafka-fed job actually sees, bounding true
    lateness at one block. The running max rides one ordered window
    (at scale this runs per source-partition, which is exactly what
    Spark's per-partition watermark tracks); lateness is exact
    integer-µs arithmetic, and the quantiles reduce a number-sized
    column."""
    ev = _t(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    w = Window.orderBy(
        F.floor(us("ts") / F.lit(300_000_000)),
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
        "event_id",
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    arr = ev.select(
        "event_id", "ts", F.max("ts").over(w).alias("hwm")
    )
    late = arr.select(
        ((us("hwm") - us("ts")) / F.lit(1e6)).alias("late_s"),
        (F.col("ts") < F.col("hwm")).cast("int").alias("is_late"),
    )
    return late.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("is_late").cast("long").alias("n_late"),
        F.round(
            F.sum("is_late").cast("double") / F.count(F.lit(1)), 5
        ).alias("late_frac"),
        F.round(F.percentile("late_s", F.lit(0.5)), 2).alias("p50_late_s"),
        F.round(F.percentile("late_s", F.lit(0.95)), 2).alias("p95_late_s"),
        F.round(F.percentile("late_s", F.lit(0.99)), 2).alias("p99_late_s"),
        F.round(F.max("late_s"), 2).alias("max_late_s"),
    )


# ---------------------------------------------------------------------------
# Peak concurrency (interval sweep-line / occupancy curve)
# ---------------------------------------------------------------------------

OCCUPANCY_MIN = 15  # each event holds a slot for 15 minutes

# Composite integer order key: µs×2, ends get +1 so starts at the same
# instant land first (overlap-inclusive boundary semantics). Ties are
# COLLAPSED by a per-key pre-aggregate, so the running sum is defined on
# distinct keys only — deterministic in any engine and under any
# partitioning.
_OCC_SQL = f"""
    WITH b AS (
        SELECT epoch_us(ts) * 2 AS k, 1 AS delta FROM events
        UNION ALL
        SELECT (epoch_us(ts) + {OCCUPANCY_MIN} * 60000000) * 2 + 1 AS k,
               -1 AS delta
        FROM events
    ),
    g AS (SELECT k, sum(delta) AS d FROM b GROUP BY 1),
    run AS (
        SELECT k, sum(d) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS occ
        FROM g
    ),
    peak AS (SELECT max(occ) AS p FROM run)
    SELECT CAST((SELECT count(*) FROM events) AS BIGINT) AS n_intervals,
           CAST(peak.p AS BIGINT) AS peak_concurrency,
           make_timestamp(CAST(min(run.k) // 2 AS BIGINT)) AS peak_ts
    FROM run, peak
    WHERE run.occ = peak.p
    GROUP BY peak.p
"""


@register("s_peak_concurrency", _OCC_SQL)
def s_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-concurrency sweep-line: treat every event as holding a slot
    for {OCCUPANCY_MIN} minutes and find the maximum number of
    simultaneously-open intervals and the first instant it is reached —
    the capacity-planning / connection-pool-sizing query (and the
    occupancy-curve shape behind concurrent-session analytics).

    Algorithm: classic boundary sweep — +1 at each start, −1 at each
    end, running sum over the global boundary order, max. Scale shape:
    boundaries are generated in-scan (a 2-row explode per event carrying
    only an int64 key and a ±1), per-key pre-aggregation collapses ties
    map-side AND makes the sweep deterministic (the running sum is
    defined on distinct keys, so no intra-key order dependence), and the
    global cumulative sum is operators.relational.global_running_total —
    two-phase range-partitioned, NO single-partition window. The peak
    extraction is a 1-row aggregate joined back on the distinct-key
    frame."""
    from recommender_systems_spark.operators.relational import (
        global_running_total,
    )

    ev = _t(spark, sf_dir, "events")
    # batch parquet surfaces ts as TIMESTAMP_NTZ; unix_micros wants LTZ
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    starts = ev.select((us * 2).alias("k"), F.lit(1).alias("delta"))
    ends = ev.select(
        ((us + OCCUPANCY_MIN * 60_000_000) * 2 + 1).alias("k"),
        F.lit(-1).alias("delta"),
    )
    g = starts.unionAll(ends).groupBy("k").agg(F.sum("delta").alias("d"))
    from recommender_systems_spark.io import table_rows

    run = global_running_total(
        g, "k", "d", out_col="occ",
        approx_rows=2 * table_rows(sf_dir, "events"),
    )
    peak = run.agg(F.max("occ").alias("p"))
    n = ev.agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
    return (
        run.join(F.broadcast(peak), F.col("occ") == F.col("p"))
        .agg(F.min("k").alias("mk"), F.first("p").alias("p"))
        .crossJoin(F.broadcast(n))
        .select(
            "n_intervals",
            F.col("p").cast("long").alias("peak_concurrency"),
            F.timestamp_micros((F.col("mk") / 2).cast("long"))
            .cast("timestamp_ntz")
            .alias("peak_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Event-transition matrix (first-order Markov journey analytics)
# ---------------------------------------------------------------------------

_TRANS_SQL = """
    WITH ordered AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type AS src, event_type AS dst, count(*) AS n
        FROM ordered WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (SELECT src, sum(n) AS t FROM pairs GROUP BY 1)
    SELECT pairs.src, pairs.dst,
           CAST(pairs.n AS BIGINT) AS n,
           round(pairs.n / CAST(tot.t AS DOUBLE), 6) AS p
    FROM pairs JOIN tot USING (src)
"""


@register("s_transition_matrix", _TRANS_SQL)
def s_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — P(next event type | current), the user-journey /
    sequence-mining profile (what follows a view, where do purchases
    come from) and the input to journey-simulation and next-event
    baselines.

    Scale shape: ONE user-keyed exchange feeds the lag window (the
    s_sessionize exchange — at 100 TB this is the same partitioning
    every per-user operator reuses), then the pair counts collapse
    map-side to ≤ |event_types|² rows before a tiny final agg; the
    row-normalising totals join is over the same tiny frame. Exact
    integer counts; the probability is a single rounded division."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("src").agg(F.sum("n").alias("t"))
    return pairs.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.col("t").cast("double"), 6).alias("p"),
    )


_PATTERN_SQL = """
    WITH o AS (
        SELECT user_id, ts, event_type,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2,
               lead(ts, 2) OVER w AS ts2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    hits AS (
        SELECT user_id
        FROM o
        WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
          AND date_diff('microsecond', ts, ts2) <= 604800000000
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches
    FROM hits GROUP BY user_id
"""


@register("s_event_pattern", _PATTERN_SQL)
def s_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict consecutive-sequence detection (MATCH_RECOGNIZE-lite):
    count, per user, the view→click→purchase runs with NO intervening
    event and the whole pattern inside 7 days — the CEP shape
    behind conversion-path and fraud-sequence rules. Differs from
    s_funnel (ordered but gappy steps): here adjacency is part of the
    pattern, which a simple min-ts funnel cannot express.

    Scale shape: ONE user-partitioned window provides both lookahead
    types and the pattern-window timestamp; matches collapse to a
    per-user count in the same shuffle's aggregate. The pattern is
    pure JVM expressions — no state machine UDF needed for
    fixed-length patterns."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 2).over(w).alias("ts2"),
    )
    hits = o.filter(
        (F.col("event_type") == "view")
        & (F.col("t1") == "click")
        & (F.col("t2") == "purchase")
        & (
            F.unix_micros(F.col("ts2").cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
            <= 604_800_000_000
        )
    )
    return hits.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_matches"))


_LTV_SQL = """
    WITH cohort AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    spend AS (
        SELECT e.user_id, c.cohort_week,
               CAST(datediff('day', c.cohort_week,
                             date_trunc('week', e.ts)) // 7 AS BIGINT)
                   AS week_offset,
               sum(e.value) AS v
        FROM events e JOIN cohort c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2, 3
    ),
    sizes AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
        FROM cohort GROUP BY cohort_week
    ),
    wk AS (
        SELECT cohort_week, week_offset, sum(v) AS wv
        FROM spend GROUP BY cohort_week, week_offset
    ),
    cum AS (
        SELECT cohort_week, week_offset,
               sum(wv) OVER (PARTITION BY cohort_week ORDER BY week_offset
                             ROWS UNBOUNDED PRECEDING) AS cum_v
        FROM wk
    )
    SELECT c.cohort_week, c.week_offset, s.cohort_size,
           round(c.cum_v, 2) AS cum_value,
           round(c.cum_v / s.cohort_size, 4) AS ltv_per_user
    FROM cum c JOIN sizes s USING (cohort_week)
"""


@register("s_cohort_ltv", _LTV_SQL)
def s_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: cumulative purchase value per signup
    cohort by week-of-life, normalised per cohort member — the revenue
    twin of s_retention's activity matrix (the LTV curve that payback
    and acquisition-cost decisions read from).

    Scale shape: cohorts from one user-keyed min; spend collapses to
    (cohort, week-offset) cells — calendar-sized — BEFORE the
    cumulative window, so the running sum runs on tiny per-cohort
    series, not events. Sum order differs between engines → the two
    monetary outputs round (2dp absolute, 4dp per-user)."""
    ev = _t(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.sum("value").alias("wv"))
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = spend.withColumn("cum_v", F.sum("wv").over(w))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "cohort_size",
        F.round("cum_v", 2).alias("cum_value"),
        F.round(F.col("cum_v") / F.col("cohort_size"), 4).alias("ltv_per_user"),
    )


# ---------------------------------------------------------------------------
# Interval coalescing (gaps-and-islands): merge overlapping activity spans
# ---------------------------------------------------------------------------

_MI_HOLD_MIN = 30  # each event holds an activity interval open this long

_MERGE_IV_SQL = f"""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
               epoch_us(CAST(ts AS TIMESTAMP))
                   + {_MI_HOLD_MIN} * 60000000 AS e_us
        FROM events
    ),
    marked AS (
        SELECT user_id, s_us, e_us, event_id,
               CASE WHEN s_us > coalesce(max(e_us) OVER (
                        PARTITION BY user_id ORDER BY s_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), -1) THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    isl AS (
        SELECT user_id, s_us, e_us,
               sum(new_island) OVER (
                   PARTITION BY user_id ORDER BY s_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM marked
    ),
    islands AS (
        SELECT user_id, island,
               min(s_us) AS a, max(e_us) AS b, count(*) AS n_events
        FROM isl GROUP BY user_id, island
    )
    SELECT CAST(count(*) AS BIGINT) AS n_islands,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(b - a) AS BIGINT) AS coverage_us,
           CAST(max(b - a) AS BIGINT) AS max_island_us,
           CAST(max(n_events) AS BIGINT) AS max_island_events,
           round(CAST(sum(b - a) AS DOUBLE) / count(*) / 1000000.0, 6)
               AS avg_island_sec
    FROM islands
"""


@register("s_merge_intervals", _MERGE_IV_SQL)
def s_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval coalescing: each event opens a
    {_MI_HOLD_MIN}-minute activity span; overlapping/touching spans per
    user merge into islands (running max of interval-end strictly
    before the current row decides island breaks), then one summary
    row profiles the merged coverage. The island primitive under
    uptime/SLA accounting, ad-break detection, and GPU-utilisation
    rollups — sessionization's interval-typed sibling (s_sessionize
    breaks on event GAPS; this merges span OVERLAP).

    Scale shape: both windows partition by user_id — ONE shuffle, no
    single-partition stage; all island arithmetic is exact integer
    microseconds (the s_sessionize µs convention), and the final
    profile is a scalar aggregate with map-side partials. The average
    divides exact integer sums (never a streamed double mean — the
    cross-engine float rule)."""
    ev = _t(spark, sf_dir, "events")
    s_us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id",
        "event_id",
        s_us.alias("s_us"),
        (s_us + _MI_HOLD_MIN * 60_000_000).alias("e_us"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(
            F.col("s_us") > F.coalesce(F.max("e_us").over(w_prev), F.lit(-1)),
            1,
        ).otherwise(0),
    )
    isl = marked.withColumn("island", F.sum("new_island").over(w_run))
    islands = isl.groupBy("user_id", "island").agg(
        F.min("s_us").alias("a"),
        F.max("e_us").alias("b"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return islands.agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(F.col("b") - F.col("a")).cast("long").alias("coverage_us"),
        F.max(F.col("b") - F.col("a")).cast("long").alias("max_island_us"),
        F.max("n_events").cast("long").alias("max_island_events"),
        F.round(
            F.sum(F.col("b") - F.col("a")).cast("double")
            / F.count(F.lit(1))
            / 1_000_000.0,
            6,
        ).alias("avg_island_sec"),
    )


# ---------------------------------------------------------------------------
# Top session paths (ordered event-type journeys)
# ---------------------------------------------------------------------------

_PATH_LEN = 5    # first N events of each session define its path
_PATH_TOPK = 50

_TOP_PATHS_SQL = f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ),
    marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('microsecond', prev_ts, ts)
                            > {SESSION_GAP_MIN} * 60000000
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_no
        FROM marked
    ),
    numbered AS (
        SELECT user_id, session_no, event_type,
               row_number() OVER (
                   PARTITION BY user_id, session_no ORDER BY ts, event_id
               ) AS rn
        FROM sess
    ),
    paths AS (
        SELECT user_id, session_no,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM numbered WHERE rn <= {_PATH_LEN}
        GROUP BY user_id, session_no
    ),
    counted AS (SELECT path, count(*) AS n FROM paths GROUP BY path)
    SELECT path, CAST(n AS BIGINT) AS n,
           CAST(row_number() OVER (ORDER BY n DESC, path) AS INT) AS rnk
    FROM counted
    ORDER BY n DESC, path LIMIT {_PATH_TOPK}
"""


@register("s_top_paths", _TOP_PATHS_SQL)
def s_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: sessionize (s_sessionize's exact gap logic on
    the (ts, event_id) total order), take each session's first
    {_PATH_LEN} event types in order, join them into a 'view>click>…'
    path string, and rank paths by frequency — the path-mining rollup
    behind funnel discovery (s_funnel checks ONE fixed path; this
    surfaces which paths exist).

    Scale shape: every window partitions by user_id (one shuffle);
    the ordered per-session concatenation is
    array_join(transform(array_sort(collect_list(struct(rn, type)))))
    — Spark's collect_list is unordered, so the sort key RIDES the
    struct (never a sort-within-window collect); path strings are
    bounded at {_PATH_LEN} event types, the path-frequency aggregate
    is path-dimension-sized, and the final top-{_PATH_TOPK} is
    TakeOrderedAndProject."""
    ev = _t(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("prev_ts").cast("timestamp")
    )
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w_lag))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | (gap_us > SESSION_GAP_MIN * 60_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("session_no", F.sum("new_session").over(w_run))
    )
    w_rn = Window.partitionBy("user_id", "session_no").orderBy(
        "ts", "event_id"
    )
    numbered = sess.withColumn("rn", F.row_number().over(w_rn)).filter(
        F.col("rn") <= _PATH_LEN
    )
    paths = numbered.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.col("n").desc(), F.col("path"))
    top = counted.orderBy(F.col("n").desc(), F.col("path")).limit(_PATH_TOPK)
    return top.withColumn("rnk", F.row_number().over(wr)).select(
        "path", F.col("n").cast("long").alias("n"),
        F.col("rnk").cast("int").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# Weekly growth accounting: new / retained / resurrected / churned
# ---------------------------------------------------------------------------

_LIFECYCLE_SQL = """
    WITH wk AS (
        SELECT DISTINCT user_id AS u,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(CAST(ts AS TIMESTAMP) AS DATE)) // 7
                    AS BIGINT) AS w
        FROM events
    ),
    lagd AS (
        SELECT u, w, lag(w) OVER (PARTITION BY u ORDER BY w) AS pw
        FROM wk
    ),
    st AS (
        SELECT w,
               sum(CASE WHEN pw IS NULL THEN 1 ELSE 0 END) AS new_users,
               sum(CASE WHEN pw = w - 1 THEN 1 ELSE 0 END) AS retained,
               sum(CASE WHEN pw IS NOT NULL AND pw < w - 1
                        THEN 1 ELSE 0 END) AS resurrected,
               count(*) AS active
        FROM lagd GROUP BY w
    )
    SELECT CAST(w AS BIGINT) AS week,
           CAST(active AS BIGINT) AS active,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(retained AS BIGINT) AS retained,
           CAST(resurrected AS BIGINT) AS resurrected,
           CAST(coalesce(lag(active) OVER (ORDER BY w), 0) - retained
                AS BIGINT) AS churned,
           CASE WHEN coalesce(lag(active) OVER (ORDER BY w), 0) - retained > 0
                THEN round(CAST(new_users + resurrected AS DOUBLE)
                           / (coalesce(lag(active) OVER (ORDER BY w), 0)
                              - retained), 6)
           END AS quick_ratio
    FROM st
"""


@register("s_user_lifecycle", _LIFECYCLE_SQL)
def s_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting over the event stream: each active
    (user, week) is classified new (first-ever week), retained (also
    active the previous week), or resurrected (returning after a gap),
    and churn for week w is last week's actives minus this week's
    retained — the standard growth-accounting identity, with the quick
    ratio (new+resurrected)/churned as the headline. The
    lifecycle-state machine every consumer analytics stack runs weekly;
    complements s_retention (fixed cohort triangles) with per-week
    flow accounting.

    Scale shape: ONE shuffle on user_id for the per-user lag window
    (weeks-per-user frames are calendar-bounded), then a hash aggregate
    to the week grain; the trailing lag over the week-dimension frame
    is a single-partition window over a calendar-sized (~10^2 rows)
    table — bounded by construction. Week ids are integer epoch-day
    divisions (exact on both engines — no locale week-of-year
    functions, the cross-engine date rule)."""
    wk = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("u"),
            F.floor(
                F.datediff(
                    F.col("ts").cast("timestamp").cast("date"),
                    F.lit("1970-01-01").cast("date"),
                )
                / 7
            ).alias("w"),
        )
        .distinct()
    )
    lagd = wk.withColumn(
        "pw", F.lag("w").over(Window.partitionBy("u").orderBy("w"))
    )
    st = lagd.groupBy("w").agg(
        F.sum(F.when(F.col("pw").isNull(), 1).otherwise(0)).alias("new_users"),
        F.sum(F.when(F.col("pw") == F.col("w") - 1, 1).otherwise(0)).alias(
            "retained"
        ),
        F.sum(
            F.when(
                F.col("pw").isNotNull() & (F.col("pw") < F.col("w") - 1), 1
            ).otherwise(0)
        ).alias("resurrected"),
        F.count(F.lit(1)).alias("active"),
    )
    # Week-dimension trailing lag: calendar-sized frame, bounded.
    prev_active = F.coalesce(
        F.lag("active").over(Window.orderBy("w")), F.lit(0)
    )
    churned = (prev_active - F.col("retained")).alias("churned")
    return st.select(
        F.col("w").cast("long").alias("week"),
        F.col("active").cast("long").alias("active"),
        F.col("new_users").cast("long").alias("new_users"),
        F.col("retained").cast("long").alias("retained"),
        F.col("resurrected").cast("long").alias("resurrected"),
        (prev_active - F.col("retained")).cast("long").alias("churned"),
        F.when(
            prev_active - F.col("retained") > 0,
            F.round(
                (F.col("new_users") + F.col("resurrected")).cast("double")
                / (prev_active - F.col("retained")),
                6,
            ),
        ).alias("quick_ratio"),
    )


# ---------------------------------------------------------------------------
# Inter-event-time distribution (log2-bucketed burstiness profile)
# ---------------------------------------------------------------------------

_IET_SQL = """
    WITH d AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t
        FROM events
    ),
    lagd AS (
        SELECT t - lag(t) OVER (PARTITION BY user_id
                                ORDER BY t, event_id) AS delta
        FROM d
    ),
    b AS (
        SELECT CAST(length(bin(greatest(delta, 1))) AS INT) AS bucket,
               delta
        FROM lagd WHERE delta IS NOT NULL
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / (SELECT count(*) FROM b), 6) AS share,
           CAST(min(delta) AS BIGINT) AS min_us,
           CAST(max(delta) AS BIGINT) AS max_us
    FROM b
    GROUP BY bucket
"""


@register("s_inter_event_times", _IET_SQL)
def s_inter_event_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-time distribution: per-user consecutive event gaps,
    binned into exact log2 buckets (bucket = bit-length of the gap in
    µs) with counts, shares, and per-bucket extrema — the burstiness
    profile that sizes session-gap thresholds (s_sessionize), stream
    watermark bounds (s_watermark_sizing), and capacity head-room in
    one table.

    Scale shape: ONE user_id shuffle for the lag window, then a hash
    aggregate over the ~60-bucket dimension. The log2 bucket is the
    BIT-LENGTH of the integer gap (``bin()`` string length on both
    engines) — exact integer arithmetic, no cross-engine libm log (the
    memory-documented floor(log10) trap)."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    lagd = d.select((F.col("t") - F.lag("t").over(w)).alias("delta")).filter(
        F.col("delta").isNotNull()
    )
    b = lagd.select(
        F.length(F.bin(F.greatest(F.col("delta"), F.lit(1))))
        .cast("int")
        .alias("bucket"),
        "delta",
    )
    tot = F.broadcast(b.agg(F.count(F.lit(1)).alias("tot")))
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("delta").alias("min_us"),
            F.max("delta").alias("max_us"),
        )
        .crossJoin(tot)
        .select(
            "bucket",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / F.col("tot"), 6).alias(
                "share"
            ),
            F.col("min_us").cast("long").alias("min_us"),
            F.col("max_us").cast("long").alias("max_us"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest (value(t) := value(t-7), MAE/sMAPE)
# ---------------------------------------------------------------------------

_SNB_LAG = 7  # weekly seasonality

_SNB_SQL = f"""
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(CAST(ts AS TIMESTAMP) AS DATE))
                    AS BIGINT) AS day,
               round(sum(value), 6) AS v
        FROM events GROUP BY event_type, day
    ),
    pred AS (
        SELECT event_type, day, v,
               lag(v, {_SNB_LAG}) OVER (PARTITION BY event_type
                                        ORDER BY day) AS p
        FROM daily
    ),
    scored AS (
        SELECT event_type, abs(v - p) AS ae,
               CASE WHEN abs(v) + abs(p) > 0
                    THEN 2.0 * abs(v - p) / (abs(v) + abs(p)) END AS sm
        FROM pred WHERE p IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(sum(ae) / count(*), 4) AS mae,
           round(sum(sm) / count(sm), 4) AS smape
    FROM scored
    GROUP BY event_type
"""


@register("s_seasonal_naive_backtest", _SNB_SQL)
def s_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's metric with
    the value {_SNB_LAG} days earlier and score MAE and sMAPE per
    event type — the floor every real forecasting model must beat, and
    the cheapest drift alarm (a rising seasonal-naive error means the
    weekly shape itself changed; pairs with a_seasonality_index, which
    measures the shape, and s_changepoint, which localises breaks).

    Scale shape: one hash aggregate to the (event_type, day) grain,
    then a per-type lag window over calendar-bounded frames — the only
    shuffle is by event_type. Daily sums are rounded to the 6dp grid
    BEFORE the lag/difference (the order-dependent-double rule), so
    every error term is engine-identical; the gap-aware lag is row-
    based on the dense daily grain (the driver's synthetic stream has
    no missing days; a gapped deployment would join a calendar spine
    first, as s_gap_fill builds)."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("long")
            .alias("day"),
        )
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pred = daily.withColumn("p", F.lag("v", _SNB_LAG).over(w)).filter(
        F.col("p").isNotNull()
    )
    ae = F.abs(F.col("v") - F.col("p"))
    sm = F.when(
        F.abs(F.col("v")) + F.abs(F.col("p")) > 0,
        2.0 * ae / (F.abs(F.col("v")) + F.abs(F.col("p"))),
    )
    scored = pred.select("event_type", ae.alias("ae"), sm.alias("sm"))
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.sum("ae") / F.count(F.lit(1)), 4).alias("mae"),
        F.round(F.sum("sm") / F.count("sm"), 4).alias("smape"),
    )


# ---------------------------------------------------------------------------
# Mergeable-moments certification (parallel variance via Chan merge)
# ---------------------------------------------------------------------------

_VAR_BUCKETS = 32

_VAR_SQL = f"""
    WITH part AS (
        SELECT event_type, user_id % {_VAR_BUCKETS} AS b,
               CAST(count(*) AS BIGINT) AS nb,
               avg(value) AS mb,
               coalesce(var_samp(value) * (count(*) - 1), 0.0) AS m2b
        FROM events GROUP BY 1, 2
    ),
    merged AS (
        SELECT event_type,
               SUM(nb) AS n,
               SUM(nb * mb) / SUM(nb) AS mean,
               SUM(m2b) + SUM(nb * mb * mb)
                 - SUM(nb) * (SUM(nb * mb) / SUM(nb))
                          * (SUM(nb * mb) / SUM(nb)) AS m2
        FROM part GROUP BY event_type
    ),
    direct AS (
        SELECT event_type, var_samp(value) AS v FROM events GROUP BY 1
    )
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS n,
           round(m.m2 / (m.n - 1), 6) AS var_merged,
           round(d.v, 6) AS var_direct,
           CAST(abs(round(m.m2 / (m.n - 1), 6) - round(d.v, 6)) <= 1e-6
                AS INT) AS certified
    FROM merged m JOIN direct d USING (event_type)
"""


@register("s_incremental_variance", _VAR_SQL)
def s_incremental_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-moments certification: per-bucket (n, mean, M2)
    variance partials merged with Chan et al.'s parallel formula
    (M2 = ΣM2_b + Σn_b·mean_b² − N·mean²) must equal the direct
    single-pass var_samp — the invariant that lets a 100-TB pipeline
    maintain per-shard moment sketches (one tiny row per shard) and
    combine them at read time instead of rescanning history. The
    count/sum cousin is s_incremental_agg; second moments are where
    naive merging actually breaks (mean shifts between shards), so
    this is the certification worth running.

    Scale shape: one hash aggregation to {_VAR_BUCKETS} buckets per
    type (map-side partials), one bucket-dimension-sized merge, one
    direct aggregate for the check — no window, no driver math.
    Parity: both sides round to 6dp before the certified comparison
    (bucket-merge double sums are order-dependent across engines)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.pmod(F.col("user_id"), F.lit(_VAR_BUCKETS)).alias("b"),
        "value",
    )
    part = ev.groupBy("event_type", "b").agg(
        F.count(F.lit(1)).alias("nb"),
        F.avg("value").alias("mb"),
        F.coalesce(
            F.var_samp("value") * (F.count(F.lit(1)) - 1), F.lit(0.0)
        ).alias("m2b"),
    )
    sn = F.sum("nb")
    smean = F.sum(F.col("nb") * F.col("mb")) / sn
    merged = part.groupBy("event_type").agg(
        sn.alias("n"),
        (
            F.sum("m2b")
            + F.sum(F.col("nb") * F.col("mb") * F.col("mb"))
            - sn * smean * smean
        ).alias("m2"),
    )
    direct = ev.groupBy("event_type").agg(F.var_samp("value").alias("v"))
    vm = F.round(F.col("m2") / (F.col("n") - 1), 6)
    vd = F.round(F.col("v"), 6)
    return merged.join(direct, "event_type").select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        vm.alias("var_merged"),
        vd.alias("var_direct"),
        (F.abs(vm - vd) <= 1e-6).cast("int").alias("certified"),
    )


# ---------------------------------------------------------------------------
# Holt linear-trend forecast backtest (fixed-point double exp. smoothing)
# ---------------------------------------------------------------------------

_HOLT_H = 6  # holdout horizon (months); alpha = 1/2, beta = 1/4 (dyadic)

_HOLT_SQL = f"""
    WITH RECURSIVE monthly AS (
        SELECT r.r_name,
               CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) * 12
                   + CAST(strftime(o.o_orderdate, '%m') AS BIGINT) AS m,
               sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    ),
    tr AS (
        SELECT r_name, cents * 10000 AS yu,
               row_number() OVER (PARTITION BY r_name ORDER BY m) AS idx,
               count(*) OVER (PARTITION BY r_name) AS t_all
        FROM monthly
    ),
    lim AS (
        SELECT r_name, t_all - {_HOLT_H} AS t_train
        FROM (SELECT DISTINCT r_name, t_all FROM tr)
        WHERE t_all - {_HOLT_H} >= 2
    ),
    rec AS (
        SELECT l.r_name, 1 AS t, a.yu AS lv, b.yu - a.yu AS tb, l.t_train
        FROM lim l
        JOIN tr a ON a.r_name = l.r_name AND a.idx = 1
        JOIN tr b ON b.r_name = l.r_name AND b.idx = 2
        UNION ALL
        SELECT r.r_name, r.t + 1,
               (s.yu + r.lv + r.tb) // 2,
               (((s.yu + r.lv + r.tb) // 2) - r.lv) // 4
                   + (3 * r.tb) // 4,
               r.t_train
        FROM rec r JOIN tr s ON s.r_name = r.r_name AND s.idx = r.t + 1
        WHERE r.t < r.t_train
    ),
    fin AS (SELECT r_name, t_train, lv, tb FROM rec WHERE t = t_train),
    err AS (
        SELECT f.r_name, f.t_train, f.lv, f.tb,
               abs(a.yu - (f.lv + (a.idx - f.t_train) * f.tb)) AS ae_u,
               ((abs(a.yu - (f.lv + (a.idx - f.t_train) * f.tb)) // 10000)
                * 1000000) // (a.yu // 10000) AS ape_ppm
        FROM fin f
        JOIN tr a ON a.r_name = f.r_name
                 AND a.idx BETWEEN f.t_train + 1 AND f.t_train + {_HOLT_H}
    )
    SELECT r_name, CAST(max(t_train) AS BIGINT) AS n_train,
           round(max(lv) / 1000000.0, 6) AS level,
           round(max(tb) / 1000000.0, 6) AS trend,
           round(sum(ae_u) / {_HOLT_H * 1000000}.0, 4) AS mae,
           round(sum(ape_ppm) / {_HOLT_H * 1000000}.0, 4) AS mape
    FROM err GROUP BY r_name
"""


@register("s_holt_forecast", _HOLT_SQL)
def s_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend (double exponential smoothing) forecast
    backtest over per-region monthly revenue: train on all but the
    last {_HOLT_H} months, forecast h=1..{_HOLT_H} ahead with
    y-hat = level + h * trend, report MAE/MAPE — the trend-aware rung
    above s_seasonal_naive_backtest on the forecasting ladder.

    The recursion runs in FIXED POINT: the series is exact integer
    micro-dollars (cents x 10000 from order-independent integer
    sums), alpha=1/2 and beta=1/4 make every smoothing update two
    integer divs (level' = (y+level+trend) div 2; trend' =
    (level'-level) div 4 + 3*trend div 4, both engines truncating
    toward zero identically), and errors stay integer (micro-dollar
    AE, parts-per-million APE) until the final constant divisions —
    so level/trend/MAE/MAPE are hash-exact across engines with no
    FP-drift hazard (a float fold differed by one ulp-at-a-rounding-
    boundary between JVM and DuckDB codegen; measured before this
    design). Quantization error is <= 1 micro-dollar per step —
    9 orders below the 1e7-dollar monthly grain.

    Scale shape: ONE shuffle to the (region, month) grain (orders x
    customer equi-join, nation/region broadcast); each region's
    series is calendar-bounded (~84 months), so the per-region
    collect_list/fold is an O(months) in-row array computation — the
    recursion lives INSIDE a row, never as driver iteration. The
    month grain is dense for this data; a gapped deployment would
    join a calendar spine first (the s_gap_fill shape)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate").cast("long") * 12
         + F.month("o_orderdate").cast("long")).alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    monthly = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy("r_name", "m")
        .agg(F.sum("cents").alias("cents"))
        .select("r_name", "m", (F.col("cents") * 10000).alias("yu"))
    )
    ser = (
        monthly.groupBy("r_name")
        .agg(F.array_sort(F.collect_list(F.struct("m", "yu"))).alias("arr"))
        .select(
            "r_name",
            F.expr("transform(arr, x -> x.yu)").alias("yus"),
            (F.size("arr") - _HOLT_H).alias("t_train"),
        )
        .filter(F.col("t_train") >= 2)
    )
    lnew = "((y + acc.lv + acc.tb) div 2)"
    st = ser.withColumn(
        "st",
        F.expr(
            f"""aggregate(
                slice(yus, 2, t_train - 1),
                named_struct(
                    'lv', element_at(yus, 1),
                    'tb', element_at(yus, 2) - element_at(yus, 1)),
                (acc, y) -> named_struct(
                    'lv', {lnew},
                    'tb', ({lnew} - acc.lv) div 4 + (3 * acc.tb) div 4))"""
        ),
    )
    ae = ("abs(element_at(yus, t_train + h)"
          " - (st.lv + h * st.tb))")
    return st.select(
        "r_name",
        F.col("t_train").cast("long").alias("n_train"),
        F.round(F.expr("st.lv") / 1000000.0, 6).alias("level"),
        F.round(F.expr("st.tb") / 1000000.0, 6).alias("trend"),
        F.round(
            F.expr(
                f"""aggregate(
                    transform(sequence(1, {_HOLT_H}), h -> {ae}),
                    0L, (s, x) -> s + x)"""
            )
            / float(_HOLT_H * 1000000),
            4,
        ).alias("mae"),
        F.round(
            F.expr(
                f"""aggregate(
                    transform(sequence(1, {_HOLT_H}),
                        h -> (({ae} div 10000) * 1000000)
                             div (element_at(yus, t_train + h) div 10000)),
                    0L, (s, x) -> s + x)"""
            )
            / float(_HOLT_H * 1000000),
            4,
        ).alias("mape"),
    )


# ---------------------------------------------------------------------------
# Mergeable-histogram quantile certification (sketch mergeability)
# ---------------------------------------------------------------------------

_IQ_W = 5        # fixed bin width over events.value (range ~[0, 500])
_IQ_SHARDS = 8   # simulated parallel partials

_IQ_SQL = f"""
    WITH h AS (
        SELECT event_id % {_IQ_SHARDS} AS shard,
               CAST(floor(value / {_IQ_W}) AS BIGINT) AS bin,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    merged AS (SELECT bin, sum(n) AS n FROM h GROUP BY bin),
    direct AS (
        SELECT CAST(floor(value / {_IQ_W}) AS BIGINT) AS bin,
               count(*) AS n
        FROM events GROUP BY 1
    ),
    q AS (SELECT * FROM (VALUES (0.5), (0.9), (0.99)) t(q)),
    cm AS (SELECT bin, sum(n) OVER (ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  sum(n) OVER () AS nt
           FROM merged),
    cd AS (SELECT bin, sum(n) OVER (ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  sum(n) OVER () AS nt
           FROM direct),
    em AS (SELECT q.q, min(bin) AS bin_merged, max(nt) AS nt
           FROM cm, q WHERE cum >= ceil(q.q * nt) GROUP BY q.q),
    ed AS (SELECT q.q, min(bin) AS bin_direct
           FROM cd, q WHERE cum >= ceil(q.q * nt) GROUP BY q.q)
    SELECT em.q,
           CAST(em.nt AS BIGINT) AS n_total,
           em.bin_merged,
           round((em.bin_merged + 1) * {_IQ_W}.0, 2) AS upper_merged,
           ed.bin_direct,
           CAST(CASE WHEN em.bin_merged = ed.bin_direct
                     THEN 1 ELSE 0 END AS INT) AS certified
    FROM em JOIN ed ON ed.q = em.q
"""


@register("s_incremental_quantiles", _IQ_SQL)
def s_incremental_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantile certification — the quantile
    analogue of s_incremental_variance: build fixed-width value
    histograms independently per shard (simulating per-partition /
    per-micro-batch sketch partials), MERGE them by summing bin
    counts, and certify that quantile estimates (p50/p90/p99 = first
    bin whose cumulative count reaches ceil(q*N)) from the merged
    sketch equal the single-pass direct histogram. Mergeability is
    what lets a 1000-executor job (or a streaming accumulator)
    maintain quantiles with a bins-sized state instead of a global
    sort — the property this query proves end-to-end.

    Scale shape: two hash aggregates over one scan each (shard
    partials, direct), both map-side combined down to the BIN space
    (value-range-bounded, ~100 bins — never the row count); every
    window/cumsum runs on that bin frame. All counts integer; the
    only floats are ceil(q*N) on identical doubles and the reported
    bin upper edge."""
    ev = _t(spark, sf_dir, "events")
    binned = ev.select(
        (F.col("event_id") % _IQ_SHARDS).alias("shard"),
        F.floor(F.col("value") / _IQ_W).alias("bin"),
    )
    h = binned.groupBy("shard", "bin").agg(F.count(F.lit(1)).alias("n"))
    merged = h.groupBy("bin").agg(F.sum("n").alias("n"))
    direct = (
        ev.select(F.floor(F.col("value") / _IQ_W).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    qs = F.broadcast(
        ev.sparkSession.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    )
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # bin-space frame — value-range-bounded
    w_all = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    def est(hist: DataFrame, out: str) -> DataFrame:
        c = hist.select(
            "bin",
            F.sum("n").over(w_cum).alias("cum"),
            F.sum("n").over(w_all).alias("nt"),
        )
        return (
            c.crossJoin(qs)
            .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("nt")))
            .groupBy("q")
            .agg(F.min("bin").alias(out), F.max("nt").alias("nt_" + out))
        )

    em = est(merged, "bin_merged")
    ed = est(direct, "bin_direct").drop("nt_bin_direct")
    return (
        em.join(ed, "q")
        .select(
            "q",
            F.col("nt_bin_merged").cast("long").alias("n_total"),
            "bin_merged",
            F.round((F.col("bin_merged") + 1) * float(_IQ_W), 2).alias(
                "upper_merged"
            ),
            "bin_direct",
            F.when(F.col("bin_merged") == F.col("bin_direct"), 1)
            .otherwise(0)
            .cast("int")
            .alias("certified"),
        )
    )


# ---------------------------------------------------------------------------
# s_window_funnel — time-bounded funnel depth (windowFunnel semantics)
# ---------------------------------------------------------------------------

_WF_WINDOW_MIN = 240  # funnel must complete within this many minutes
_WF_STEPS = ("view", "click", "purchase")

_WF_SQL = f"""
    WITH ev AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    d1 AS (
        SELECT user_id, event_type, event_id, us,
               max(CASE WHEN event_type = 'view' THEN us END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS s1
        FROM ev
    ),
    d2 AS (
        SELECT user_id, event_type, us, s1,
               max(CASE WHEN event_type = 'click' THEN s1 END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS s2start
        FROM d1
    ),
    per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS r1,
               max(CASE WHEN event_type = 'click' AND s1 IS NOT NULL
                        AND us - s1 <= {_WF_WINDOW_MIN * 60000000}
                        THEN 1 ELSE 0 END) AS r2,
               max(CASE WHEN event_type = 'purchase' AND s2start IS NOT NULL
                        AND us - s2start <= {_WF_WINDOW_MIN * 60000000}
                        THEN 1 ELSE 0 END) AS r3
        FROM d2 GROUP BY user_id
    )
    SELECT CAST(level AS INT) AS level, step,
           CAST(n AS BIGINT) AS n_users
    FROM (
        SELECT 1 AS level, 'view' AS step, sum(r1) AS n FROM per_user
        UNION ALL
        SELECT 2, 'click', sum(r2) FROM per_user
        UNION ALL
        SELECT 3, 'purchase', sum(r3) FROM per_user
    )
    ORDER BY level
"""


@register("s_window_funnel", _WF_SQL)
def s_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-BOUNDED funnel depth (the windowFunnel primitive of event
    warehouses): how many users complete view → click → purchase IN
    ORDER with the whole chain inside a {_WF_WINDOW_MIN}-minute
    window. Distinct from s_funnel (ordered but unbounded — a
    conversion six months after the view still counts) and
    s_event_pattern (strictly consecutive); the time bound is what an
    attribution/alerting funnel actually uses.

    Algorithm: per-user dynamic programming over the time-sorted
    stream with RUNNING-MAX chain starts — d_k(e) = the LATEST
    possible chain start that reaches step k at event e (a later start
    is always at least as good for the deadline, so the greedy
    exchange argument makes one forward pass exact; the naive
    formulation is an all-triples join). Two stacked window functions
    carry the DP; timestamps compare as exact integer microseconds.

    Scale shape: one events scan filtered to the step types, two
    windows over the SAME (user_id, us) sort (one exchange), a
    user-keyed aggregate, and a 3-row summary. Linear with per-user
    parallelism — the ClickHouse windowFunnel plan, expressed in
    Spark windows."""
    # batch parquet surfaces ts as TIMESTAMP_NTZ; unix_micros wants LTZ
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_WF_STEPS)
    ).select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    # house (ts, event_id) tie-break: with tied (user_id, us) a bare
    # ORDER BY us leaves the ROWS frame nondeterministic in BOTH engines
    wrow = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d1 = ev.withColumn(
        "s1",
        F.max(
            F.when(F.col("event_type") == "view", F.col("us"))
        ).over(wrow),
    )
    d2 = d1.withColumn(
        "s2start",
        F.max(
            F.when(F.col("event_type") == "click", F.col("s1"))
        ).over(wrow),
    )
    lim = _WF_WINDOW_MIN * 60_000_000
    per_user = d2.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("r1"),
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & F.col("s1").isNotNull()
                & (F.col("us") - F.col("s1") <= lim),
                1,
            ).otherwise(0)
        ).alias("r2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("s2start").isNotNull()
                & (F.col("us") - F.col("s2start") <= lim),
                1,
            ).otherwise(0)
        ).alias("r3"),
    )
    levels = per_user.agg(
        F.sum("r1").alias("n1"), F.sum("r2").alias("n2"), F.sum("r3").alias("n3")
    )
    # One explode over the 1-row totals frame instead of a 3-way union:
    # union branches each re-derive the whole scan+window+agg pipeline
    # (AQE exchange reuse is best-effort, not a plan guarantee).
    rows = [(1, "view", "n1"), (2, "click", "n2"), (3, "purchase", "n3")]
    return (
        levels.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(level).cast("int").alias("level"),
                        F.lit(step).alias("step"),
                        F.col(col).cast("long").alias("n_users"),
                    )
                    for level, step, col in rows
                ])
            ).alias("s")
        )
        .select("s.level", "s.step", "s.n_users")
        .orderBy("level")
    )
