"""Property-based tests (hypothesis) for the scale-critical operators:
each two-phase/distributed implementation must agree with its naive
single-partition twin on arbitrary inputs, and sampling invariants must
hold for any seed. Example counts are kept small — every example is a
Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

_settings = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    ids=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=80
    )
)
@_settings
def test_dense_id_map_matches_global_window(spark, ids):
    """two_phase densification == rank-by-window on any id multiset."""
    from recommender_systems_spark.operators.densify import dense_id_map

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    two = {
        (r["id"], r["ord"])
        for r in dense_id_map(df, "id", "ord", strategy="two_phase").collect()
    }
    win = {
        (r["id"], r["ord"])
        for r in dense_id_map(df, "id", "ord", strategy="window").collect()
    }
    assert two == win


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # value (ties likely)
            st.integers(min_value=1, max_value=5),  # count
        ),
        min_size=1,
        max_size=40,
    )
)
@_settings
def test_two_phase_midrank_matches_window(spark, vals):
    """Distributed midranks == the naive unpartitioned-window form."""
    from recommender_systems_spark.operators.relational import two_phase_midrank

    # Collapse duplicate values (the operator contract: one row/value).
    agg: dict[int, int] = {}
    for v, c in vals:
        agg[v] = agg.get(v, 0) + c
    df = spark.createDataFrame(list(agg.items()), "value long, cnt long")
    two = {
        (r["value"], r["midrank"])
        for r in two_phase_midrank(df, "value", "cnt").collect()
    }
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        (r["value"], r["midrank"])
        for r in df.withColumn(
            "midrank",
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("double")
            + (F.col("cnt").cast("double") + 1) / 2,
        ).collect()
    }
    assert two == naive


@given(
    n=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@_settings
def test_weighted_sample_invariants(spark, n, seed):
    """M8: sample size = min(n, |rows|), all rows distinct, weights>0."""
    from recommender_systems_spark.operators.relational import weighted_sample

    df = spark.range(20).select(
        F.col("id"), (F.col("id") + 1).cast("double").alias("w")
    )
    out = weighted_sample(df, "w", n=n, seed=seed).collect()
    ids = [r["id"] for r in out]
    assert len(ids) == min(n, 20)
    assert len(set(ids)) == len(ids)


@given(s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
@_settings
def test_rolling_fingerprint_range_and_determinism(spark, s):
    """Fingerprint ∈ [0, 2³¹−1) and equal strings hash equally."""
    from recommender_systems_spark.functions.text import (
        FINGERPRINT_MOD,
        rolling_fingerprint,
    )

    df = spark.createDataFrame([(s,), (s,)], "t string")
    vals = [r["f"] for r in df.select(rolling_fingerprint("t").alias("f")).collect()]
    assert vals[0] == vals[1]
    assert 0 <= vals[0] < FINGERPRINT_MOD


@given(
    xs=st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30
    )
)
@_settings
def test_minhash_signature_identity_and_range(spark, xs):
    """Identical hash multisets ⇒ identical signatures; slots < p."""
    from recommender_systems_spark.dedup.constants import MINHASH_PRIME
    from recommender_systems_spark.dedup.minhash import minhash_signature

    df = spark.createDataFrame([(xs,), (list(xs),)], "hs array<long>")
    sigs = [
        r["sig"] for r in df.select(minhash_signature(F.col("hs")).alias("sig")).collect()
    ]
    assert sigs[0] == sigs[1]
    assert len(sigs[0]) == 16
    assert all(0 <= v < MINHASH_PRIME for v in sigs[0])


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=1, max_size=120
    )
)
@_settings
def test_countmin_never_undercounts(spark, keys):
    """CM property: the min-cell estimate upper-bounds the true count
    for EVERY key (collisions only inflate), and the grid total per
    depth row equals the input size."""
    from recommender_systems_spark.queries.sketch import (
        CM_DEPTH,
        _cell_col,
        countmin_sketch,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    sketch = {
        (r["d"], r["cell"]): r["n"]
        for r in countmin_sketch(df, "k").collect()
    }
    for d in range(CM_DEPTH):
        assert sum(n for (dd, _), n in sketch.items() if dd == d) == len(keys)
    cells = df.select(
        "k", *[_cell_col(F.col("k"), d).alias(f"c{d}") for d in range(CM_DEPTH)]
    ).collect()
    from collections import Counter

    true = Counter(keys)
    for row in cells:
        est = min(sketch[(d, row[f"c{d}"])] for d in range(CM_DEPTH))
        assert est >= true[row["k"]]


@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=499.5, allow_nan=False),
        min_size=0, max_size=60,
    )
)
@_settings
def test_range_join_partitions_exactly(spark, vals):
    """Band containment is a partition: every value lands in exactly
    one band, so per-band counts sum to the input size."""
    from recommender_systems_spark.queries.sessions import BAND_EDGES, _BANDS

    ev = spark.createDataFrame([(float(v),) for v in vals], "value double")
    bands = spark.createDataFrame(_BANDS, "lo double, hi double")
    joined = (
        F.broadcast(bands)
        .join(ev, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")), "left")
        .groupBy("lo", "hi")
        .agg(F.count("value").alias("n"))
        .collect()
    )
    assert len(joined) == len(BAND_EDGES) - 1  # empty bands survive
    assert sum(r["n"] for r in joined) == len(vals)


# ---------------------------------------------------------------------------
# Round-9 invariants for fixed-round iterative graph/ML ops.  Oracle
# parity proves cross-engine agreement but CANNOT catch semantic drift
# or non-convergence in a fixed-round iteration — these pin the math.
# ---------------------------------------------------------------------------

_SF = "/root/testdata/sf0.001"


def test_modularity_invariants(spark):
    """Newman modularity is bounded in [-1/2, 1], intra-community
    edges cannot exceed the edge count, and communities cannot exceed
    nodes."""
    from recommender_systems_spark.queries.graph import g_modularity

    row = g_modularity(spark, _SF).collect()[0]
    assert -0.5 <= row["modularity"] <= 1.0
    assert 0 <= row["intra_edges"] <= row["n_edges"]
    assert 1 <= row["n_communities"] <= row["n_nodes"]


def test_hits_monotone_integer_growth(spark):
    """Unnormalised HITS sweeps from auth0=1 grow monotonically:
    auth1(i) = sum of rater degrees >= n_raters(i) (each degree >= 1),
    and auth2(i) >= auth1(i) because hub2(u) = sum of auth1 >= deg(u).
    All scores are positive integers."""
    from recommender_systems_spark.queries.graph import g_hits_scores

    rows = g_hits_scores(spark, _SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_raters"] <= r["auth_1"] <= r["auth_2"]


def test_tree_depth2_child_errors_bounded_by_root(spark):
    """Level-wise tree growth can only improve the objective: each
    child's best split includes the no-split (leaf-majority) option,
    so left.errors + right.errors <= root.errors, and every node's
    errors <= n/2 (majority vote bound)."""
    from recommender_systems_spark.queries.ml import m_tree_depth2

    rows = {r["node"]: r for r in m_tree_depth2(spark, _SF).collect()}
    assert set(rows) == {"root", "left", "right"}
    for r in rows.values():
        assert 0 <= r["errors"] <= r["n"] // 2 + (r["n"] % 2)
    assert rows["left"]["errors"] + rows["right"]["errors"] <= rows["root"]["errors"]
    assert rows["left"]["n"] + rows["right"]["n"] == rows["root"]["n"]


def test_random_walks_nonbroadcast_path_matches(spark):
    """g_random_walks past the broadcast threshold: the shuffled-join
    path must produce byte-identical walks to the broadcast path (the
    hint changes the physical plan only)."""
    from recommender_systems_spark.queries.graph import _random_walks

    small = _random_walks(spark, _SF, walk_n=16)  # broadcast hints on
    big = _random_walks(
        spark, _SF, walk_n=16, walk_broadcast_threshold=1
    )  # hints off: shuffled equi-joins
    a = sorted(map(tuple, small.collect()))
    b = sorted(map(tuple, big.collect()))
    assert a == b and len(a) == 16 * 5  # 16 walks x (start + 4 steps)


def test_isotonic_calibration_invariants(spark):
    """The minimax isotonic fit must be non-decreasing in the score
    bucket, bounded by [0,1], and preserve the grand mean direction:
    fitted values majorize-average the raw rates (here: global
    weighted mean of iso equals the raw positive rate up to rounding —
    a property of isotonic regression as an L2 projection)."""
    from recommender_systems_spark.queries.ml import m_isotonic_calibration

    rows = sorted(
        m_isotonic_calibration(spark, _SF).collect(),
        key=lambda r: r["bucket"],
    )
    assert rows
    prev = -1.0
    for r in rows:
        assert 0.0 <= r["iso_rate"] <= 1.0
        assert r["iso_rate"] >= prev - 1e-9, "isotonic fit not monotone"
        prev = r["iso_rate"]
    n_tot = sum(r["n"] for r in rows)
    mean_raw = sum(r["raw_rate"] * r["n"] for r in rows) / n_tot
    mean_iso = sum(r["iso_rate"] * r["n"] for r in rows) / n_tot
    assert abs(mean_raw - mean_iso) < 1e-4  # L2-projection preserves mean


def test_bradley_terry_invariants(spark):
    """MM-updated strengths must be positive for any item with a win,
    and an item that won every match it played must rank (weakly)
    above one that lost every match."""
    from recommender_systems_spark.queries.ml import m_bradley_terry

    rows = m_bradley_terry(spark, _SF).collect()
    assert rows
    for r in rows:
        assert r["matches"] >= r["wins"] >= 0
        if r["wins"] > 0:
            assert r["gamma"] > 0


@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),   # timestamp
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=0,
        max_size=14,
    )
)
@_settings
def test_window_funnel_dp_matches_bruteforce(spark, evs):
    """s_window_funnel's running-max DP rests on a greedy exchange
    argument (the LATEST chain start is always optimal for the
    deadline). Verify it against brute-force ordered-subsequence
    search on arbitrary single-user event streams."""
    import itertools

    from pyspark.sql import functions as F

    LIM = 10  # window length in the same time units
    rows = [
        (1, i, ts * 1_000_000, et) for i, (ts, et) in enumerate(evs)
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, us long, event_type string"
    )
    # Re-implement the query's DP inline on the (already-epoch) frame.
    from pyspark.sql import Window as W

    wrow = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    d1 = df.withColumn(
        "s1", F.max(F.when(F.col("event_type") == "view", F.col("us"))).over(wrow)
    )
    d2 = d1.withColumn(
        "s2start",
        F.max(F.when(F.col("event_type") == "click", F.col("s1"))).over(wrow),
    )
    lim_us = LIM * 1_000_000
    got = d2.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("s2start").isNotNull()
                & (F.col("us") - F.col("s2start") <= lim_us),
                1,
            ).otherwise(0)
        ).alias("r3")
    ).collect()[0]["r3"]

    # Brute force: any ordered (view < click < purchase) index triple
    # with purchase_ts - view_ts <= LIM. Strict index order with
    # nondecreasing timestamps mirrors the window's (us, event_id)
    # total order.
    seq = sorted(rows, key=lambda r: (r[2], r[1]))
    want = 0
    for i, j, k in itertools.combinations(range(len(seq)), 3):
        if (
            seq[i][3] == "view"
            and seq[j][3] == "click"
            and seq[k][3] == "purchase"
            and seq[k][2] - seq[i][2] <= lim_us
        ):
            want = 1
            break
    assert got == want, (evs, got, want)


def test_markov_attribution_invariants(spark):
    """Removing a channel can only REDUCE conversion probability (the
    masked absorption iterate is pointwise dominated by the full one),
    so 0 <= p_without <= p_full and removal_effect in [0, 1]; effects
    are consistent with their probabilities."""
    from recommender_systems_spark.queries.analytics import (
        a_markov_attribution,
    )

    rows = a_markov_attribution(spark, _SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["p_without"] <= r["p_full"] <= 1.0, r
        assert 0.0 <= r["removal_effect"] <= 1.0, r
        expect = (r["p_full"] - r["p_without"]) / r["p_full"]
        assert abs(r["removal_effect"] - expect) < 1e-5, r


def test_aa_calibration_invariants(spark):
    """A/A replicates carry no treatment: the KS distance is a valid
    statistic in (0, 1], false positives at alpha=0.05 stay a small
    minority of replicates (a blown-up count means a broken variance
    estimate), and every p derives from a finite z."""
    from recommender_systems_spark.queries.abtest import (
        _AA_REPS,
        e_aa_calibration,
    )

    r = e_aa_calibration(spark, _SF).collect()[0]
    assert r["n_reps"] == _AA_REPS
    assert 0.0 < r["ks_stat"] <= 1.0
    assert 0 <= r["n_sig_at_05"] <= _AA_REPS // 4  # ~1 expected at 20
    assert r["max_abs_z"] >= 0.0


def test_conformal_coverage_invariants(spark):
    """Split-conformal guarantees E[coverage] >= 1 - alpha over
    calibration draws; on one fixed md5 split assert the sane band
    plus bookkeeping (positive interval width, disjoint split sizes)."""
    from recommender_systems_spark.queries.abtest import (
        e_conformal_coverage,
    )

    r = e_conformal_coverage(spark, _SF).collect()[0]
    assert r["n_train"] > 0 and r["n_cal"] > 0 and r["n_test"] > 0
    assert r["q_hat"] >= 0.0
    # 1 - alpha = 0.9; one fixed split can wobble, but falling under
    # 0.75 or hitting exactly 0 means the quantile or split broke.
    assert 0.75 <= r["coverage"] <= 1.0
