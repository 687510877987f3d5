"""Plan-shape regression tests: the 100-TB claims in docstrings and
PLANS.md (broadcast where claimed, bounded exchange counts, never a
cartesian product) asserted against the PHYSICAL plan, so a refactor
that silently degrades a plan fails CI rather than a future bench.

Only lazily-planned queries appear here (training loops execute work
inside the query function and are audited in PLANS.md instead).
"""

from __future__ import annotations

import re

import pytest

from recommender_systems_spark import registry
from tests.conftest import SF_SMALL

# Declarative queries whose plan must never contain a CartesianProduct.
# (BroadcastNestedLoopJoin with a 1-row build side is fine — that is
# how scalar-aggregate broadcasts plan.)
_NO_CARTESIAN = [
    "flagship_top_customers",
    "p_filter_project",
    "p_anti_join_threshold",
    "j_star_join",
    "a_group_agg",
    "a_cumsum",
    "w_densify_ids",
    "w_global_topk",
    "w_group_topk",
    "g_genre_invert",
    "m_rmse",
    "m_top_n",
    "v_cosine_topk",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_ingest_neardup",
    "dedup_embedding_cosine",
    "sim_ann_topk",
    "sim_ivf_topk",
    "t_token_stats",
    "t_surprisal",
    "t_feature_hashing",
    "t_bigram_surprisal",
    "s_funnel",
    "s_retention",
    "s_sessionize",
    "s_anomaly_zscore",
    "s_changepoint",
    "w_trailing_24h",
    "j_bloom_join",
    "j_snapshot_diff",
    "a_histogram",
    "a_pivot",
    "a_decay_agg",
    "a_psi_drift",
    "a_winsorize",
    "e_auc",
    "m_ips_eval",
    "t_pmi_collocations",
    "t_inverted_index",
]


def _plan(spark, name: str) -> str:
    df = registry.QUERIES[name](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def _count(plan: str, pat: str) -> int:
    return len(re.findall(pat, plan))


@pytest.mark.parametrize("name", _NO_CARTESIAN)
def test_no_cartesian_product(spark, name):
    assert _count(_plan(spark, name), r"CartesianProduct") == 0, name


def test_flagship_is_broadcast_star(spark):
    """Dims broadcast, ONE fact-sized exchange, top-k as
    TakeOrderedAndProject — the J1-J3 + W3 contract."""
    p = _plan(spark, "flagship_top_customers")
    assert _count(p, r"BroadcastHashJoin") >= 2
    assert _count(p, r"Exchange hashpartitioning") == 1
    assert _count(p, r"TakeOrderedAndProject") == 1
    assert _count(p, r"SortMergeJoin") == 0


def test_funnel_single_exchange(spark):
    """Three chained windows + per-user reduction on ONE hash
    exchange (the docstring's central claim)."""
    p = _plan(spark, "s_funnel")
    assert _count(p, r"Exchange hashpartitioning") == 1
    assert _count(p, r"Window") >= 3


def test_trailing_window_single_exchange(spark):
    p = _plan(spark, "w_trailing_24h")
    assert _count(p, r"Exchange hashpartitioning") == 1


def test_global_topk_no_shuffle(spark):
    """W3 must plan TakeOrderedAndProject with zero hash exchanges —
    a global sort here would be the 100-TB bottleneck."""
    p = _plan(spark, "w_global_topk")
    assert _count(p, r"TakeOrderedAndProject") == 1
    assert _count(p, r"Exchange hashpartitioning") == 0
    assert _count(p, r"\bSort\b.*global=true") == 0


def test_assoc_rules_topk_is_take_ordered(spark):
    """The final lift ranking must be TakeOrderedAndProject over the
    support-floored rule set (round-6 verdict #4) — a single-partition
    global-rank window here would collapse the unbounded candidate set
    onto one task. The rank window that remains runs over the k-row
    limit result only."""
    p = _plan(spark, "a_assoc_rules")
    assert _count(p, r"TakeOrderedAndProject") == 1


def test_surprisal_vocab_joins_broadcast(spark):
    """The scoring join against the vocab-sized surprisal table must
    be a broadcast hash join, never a shuffle join on tokens."""
    p = _plan(spark, "t_surprisal")
    assert _count(p, r"BroadcastHashJoin") >= 1
    assert _count(p, r"SortMergeJoin") == 0


def test_bloom_join_probe_never_shuffles(spark):
    """The probe side is filtered in-scan and the residual join is
    broadcast: no hash exchange anywhere before the scalar agg."""
    p = _plan(spark, "j_bloom_join")
    assert _count(p, r"Exchange hashpartitioning") == 0
    assert _count(p, r"BroadcastHashJoin") >= 1


def test_scoring_join_broadcasts_factors(spark):
    """m_rmse's factor lookups broadcast; the fact table is never
    hash-exchanged for the join (only the repartition for CPU spread,
    which is RoundRobin, not hash)."""
    p = _plan(spark, "m_rmse")
    assert _count(p, r"BroadcastHashJoin") >= 2
    assert _count(p, r"SortMergeJoin") == 0


def test_dedup_candidates_are_equi_joins(spark):
    """LSH candidate generation must plan hash/broadcast equi-joins —
    a nested-loop pair enumeration would be the quadratic blowup the
    design exists to avoid."""
    for name in ("dedup_minhash", "dedup_simhash", "dedup_embedding_cosine"):
        p = _plan(spark, name)
        assert _count(p, r"CartesianProduct") == 0, name
        assert _count(p, r"BroadcastNestedLoopJoin") == 0, name


_NO_CARTESIAN_R5B = [
    "e_chi2_test",
    "m_ols_regression",
    "e_confusion_matrix",
    "a_mode",
    "a_grouping_sets",
    "dedup_containment",
    "g_label_propagation",
]


@pytest.mark.parametrize("name", _NO_CARTESIAN_R5B)
def test_no_cartesian_product_r5b(spark, name):
    assert _count(_plan(spark, name), r"CartesianProduct") == 0, name


def test_grouping_sets_single_expand(spark):
    """a_grouping_sets must plan ONE Expand feeding one aggregation —
    the whole point is one scan for all three marginals."""
    p = _plan(spark, "a_grouping_sets")
    assert _count(p, r"\bExpand\b") == 1
    assert _count(p, r"Scan parquet") == 1


def test_ks_and_qte_no_global_window(spark):
    """The ECDF cumsums must ride the two-phase range-partition path:
    every window in the plan is partitioned (no 'Window [' with an
    empty partition spec collapsing to one task)."""
    for name in ("e_ks_test", "e_qte_deciles"):
        p = _plan(spark, name)
        # Spark prints unpartitioned windows without a 'partitionBy';
        # the two-phase path partitions by __pid, so every Window node
        # must mention a partition spec.
        for m in re.finditer(r"Window \[[^\n]*", p):
            assert "__pid" in m.group(0) or "partition" in m.group(0).lower(), (
                name,
                m.group(0)[:200],
            )


def test_ols_single_aggregation_pass(spark):
    """The regression aggregates must plan as ONE hash aggregation
    pair (partial + final) over one scan — no joins, no windows."""
    p = _plan(spark, "m_ols_regression")
    assert _count(p, r"Scan parquet") == 1
    assert _count(p, r"Join") == 0
    assert _count(p, r"Window") == 0


_NO_CARTESIAN_R6 = [
    "m_item_knn_recs",
    "e_mrr_map",
    "g_adamic_adar",
    "j_merge_upsert",
    "a_seasonality_index",
    "e_stratified_ate",
    "dedup_source_overlap",
    "v_ild_diversity",
    "a_column_profiler",
]


@pytest.mark.parametrize("name", _NO_CARTESIAN_R6)
def test_no_cartesian_product_r6(spark, name):
    assert _count(_plan(spark, name), r"CartesianProduct") == 0, name


def test_item_knn_broadcasts_neighbor_table(spark):
    """The item-dimension-sized neighbour table must broadcast into the
    history join (the docstring's central scale claim); the per-user
    aggregation is the only data-sized exchange family."""
    p = _plan(spark, "m_item_knn_recs")
    assert _count(p, r"BroadcastHashJoin") >= 1


def test_ivf_pq_lut_broadcasts(spark):
    """v_ivf_pq_search: the ADC lookup table and probe lists broadcast;
    no nested-loop pair enumeration anywhere (1-row/scalar builds
    excepted by the bounded count)."""
    p = _plan(spark, "v_ivf_pq_search")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"BroadcastHashJoin") >= 2


def test_merge_upsert_single_join(spark):
    """MERGE plans exactly one full-outer join on the merge key and no
    broadcast (both sides are table-sized — a broadcast would OOM at
    scale)."""
    p = _plan(spark, "j_merge_upsert")
    assert _count(p, r"SortMergeJoin .*FullOuter|ShuffledHashJoin .*FullOuter") == 1


def test_seasonality_single_scan_two_exchanges(spark):
    """168-cell profile: the events scan runs once (the cell aggregate
    is checkpointed, so the final plan reads the 168-row RDD twice —
    zero residual parquet scans), and nothing else moves."""
    p = _plan(spark, "a_seasonality_index")
    assert _count(p, r"Scan parquet") == 0
    assert _count(p, r"Scan ExistingRDD") == 2
    assert _count(p, r"Exchange hashpartitioning") == 0


def test_column_profiler_single_scan(spark):
    """The whole multi-column profile must come from ONE orders scan
    (the oracle unions one aggregate per column; the Spark plan must
    not)."""
    p = _plan(spark, "a_column_profiler")
    assert _count(p, r"Scan parquet") == 1


_NO_CARTESIAN_R6B = [
    "dedup_fuzzy_match",
    "a_assoc_rules",
    "e_mann_kendall",
    "a_entropy",
    "v_knn_classify",
    "g_jaccard_neighbors",
]


@pytest.mark.parametrize("name", _NO_CARTESIAN_R6B)
def test_no_cartesian_product_r6b(spark, name):
    assert _count(_plan(spark, name), r"CartesianProduct") == 0, name


def test_fuzzy_match_blocked_equi_join(spark):
    """dedup_fuzzy_match must plan the block join as an EQUI-join on
    the (lang, w1, band) key — Levenshtein must stay OUT of the join
    keys (a theta-join on edit distance would be the quadratic
    scale-killer the blocking exists to avoid)."""
    p = _plan(spark, "dedup_fuzzy_match")
    assert _count(p, r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin") >= 1
    assert _count(p, r"CartesianProduct|BroadcastNestedLoopJoin") == 0


def test_assoc_rules_broadcasts_marginals(spark):
    """a_assoc_rules: the |parts|-sized marginal-count and 1-row basket
    total joins must broadcast; the only data-sized exchanges are the
    item/pair aggregates over the materialised basket table."""
    p = _plan(spark, "a_assoc_rules")
    assert _count(p, r"BroadcastHashJoin") >= 2


def test_assoc_rules_basket_single_corpus_pass(spark):
    """Round-13 basket rewrite: pair mining rides per-order basket
    arrays materialised in ONE corpus pass — the final plan must hold
    zero parquet scans and no join between corpus-sized sides (the r12
    self-join shape planned 10 scans)."""
    p = _plan(spark, "a_assoc_rules")
    assert _count(p, r"Scan parquet") == 0
    assert _count(p, r"SortMergeJoin|ShuffledHashJoin") == 0


def test_bradley_terry_single_mining_pass(spark):
    """Round-13: the MM sweeps read items-sized checkpointed strength
    tables; lineitem pair mining must appear ZERO times in the final
    frame (it runs once behind the checkpoint — the r12 plan inlined
    it ~10×)."""
    p = _plan(spark, "m_bradley_terry")
    assert _count(p, r"Scan parquet") == 0


def test_perplexity_buckets_single_scoring_reference(spark):
    """Round-13: every downstream statistic rides the distinct
    (lang, avg_bits) table, so the bigram-LM scoring lineage appears
    ONCE — with the two model-table checkpoints the final plan holds
    ≤4 parquet scans (was 36 when the scored frame was referenced 3×)."""
    p = _plan(spark, "t_perplexity_buckets")
    assert _count(p, r"Scan parquet") <= 4


def test_item_item_cooc_no_shuffle_join(spark):
    """Round-13 _cf_frames basket rewrite: the CAP²/2 pair explode
    replaces the capped-rows self-join — no shuffle join anywhere in
    the CF funnel (dimension joins broadcast)."""
    p = _plan(spark, "m_item_item_cooc")
    assert _count(p, r"SortMergeJoin|ShuffledHashJoin") == 0


def test_entropy_single_scan_no_join(spark):
    """a_entropy is one scan + two aggregations — any join or window
    would mean the mix profile stopped being a pure rollup."""
    p = _plan(spark, "a_entropy")
    assert _count(p, r"Scan parquet") == 1
    assert _count(p, r"Join") == 0
    assert _count(p, r"Window") == 0


def test_jaccard_neighbors_broadcasts_degrees(spark):
    """g_jaccard_neighbors: both degree-table joins are
    item-dimension-sized and must broadcast."""
    p = _plan(spark, "g_jaccard_neighbors")
    assert _count(p, r"BroadcastHashJoin") >= 2


def test_gini_no_global_sort_window(spark):
    """e_gini_coefficient computes rank sums from the distinct-value
    running total: the only Window is the two-phase helper's
    partition-LOCAL cumsum — never a single-partition global sort."""
    p = _plan(spark, "e_gini_coefficient")
    assert _count(p, r"windowspecdefinition\(") == _count(
        p, r"windowspecdefinition\(__pid"
    )


def test_attribution_single_window_pass(spark):
    """Both attribution carries ride ONE window pass over one events
    scan (first/last share the frame); checkpointing leaves the final
    plan reading the conversion RDD, not parquet."""
    p = _plan(spark, "a_attribution")
    assert _count(p, r"Scan parquet") == 0
    assert _count(p, r"Scan ExistingRDD") == 2


def test_kcore_no_cartesian(spark):
    assert _count(_plan(spark, "g_kcore"), r"CartesianProduct") == 0


def test_cluster_purity_broadcast_codebook(spark):
    """v_cluster_purity's assignment must be the narrow
    broadcast-codebook map (corpus × tiny codebook) — broadcast
    nested-loop is the intended shape; a shuffled CartesianProduct is
    not."""
    p = _plan(spark, "v_cluster_purity")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"BroadcastNestedLoopJoin") >= 1


_NO_CARTESIAN_R6C = [
    "m_slope_one",
    "e_psm_att",
    "e_regression_discontinuity",
]


@pytest.mark.parametrize("name", _NO_CARTESIAN_R6C)
def test_no_cartesian_product_r6c(spark, name):
    assert _count(_plan(spark, name), r"CartesianProduct") == 0, name


def test_psm_caliper_is_equi_join(spark):
    """e_psm_att: nearest-within-caliper must plan as the unrolled
    integer band EQUI-join (treated × offsets vs control) — an
    inequality theta-join on |Δn_ev| would be the quadratic
    scale-killer the unroll exists to avoid."""
    p = _plan(spark, "e_psm_att")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin") >= 1


def test_rdd_single_scan_no_join(spark):
    """e_regression_discontinuity: one events scan, one rollup, one
    2-key sufficient-statistics aggregate — no join, no window."""
    p = _plan(spark, "e_regression_discontinuity")
    assert _count(p, r"Scan parquet") == 1
    assert _count(p, r"Join") == 0
    assert _count(p, r"Window") == 0


def test_theil_sen_no_cartesian(spark):
    assert _count(_plan(spark, "a_theil_sen"), r"CartesianProduct") == 0


def test_meta_analysis_single_fact_scan(spark):
    """e_meta_analysis: the events fact table is scanned ONCE (the Q
    pass reuses the checkpointed segment frame, not the fact table);
    the nation dim broadcasts."""
    p = _plan(spark, "e_meta_analysis")
    assert _count(p, r"Scan parquet .*events") <= 1
    assert _count(p, r"BroadcastHashJoin|BroadcastNestedLoopJoin") >= 1


def test_lorenz_pid_local_windows_only_small_global(spark):
    """a_lorenz_curve: the only non-__pid window is the ≤10-row decile
    running sum — the raw-value cumsum must stay two-phase."""
    p = _plan(spark, "a_lorenz_curve")
    assert _count(p, r"windowspecdefinition\(cents") == 0


def test_rolling_regression_one_window_node(spark):
    """All five OLS sufficient statistics share ONE window frame — one
    nation shuffle, one Window node."""
    p = _plan(spark, "w_rolling_regression")
    assert _count(p, r"\bWindow \[") == 1


def test_cvar_no_global_sort(spark):
    """a_cvar's rank pick rides the two-phase cumsum; the threshold
    broadcast-joins into the tail scan (no sort of raw rows)."""
    p = _plan(spark, "a_cvar")
    assert _count(p, r"windowspecdefinition\(cents") == 0
    assert _count(p, r"BroadcastNestedLoopJoin|BroadcastHashJoin") >= 1


def test_rrf_single_scoring_pass(spark):
    """v_rrf_fusion: both rankings read the checkpointed scoring pass
    (one broadcast-queries × catalog scan), and the fusion join is
    list-bounded — no cartesian anywhere."""
    p = _plan(spark, "v_rrf_fusion")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"Scan parquet") == 0  # reads the checkpointed RDD


def test_khop_no_cartesian(spark):
    assert _count(_plan(spark, "g_khop_reach"), r"CartesianProduct") == 0


_NO_CARTESIAN_R7 = [
    "e_threshold_sweep",
    "m_skipgram_pairs",
    "s_merge_intervals",
    "s_top_paths",
    "g_personalized_pagerank",
    "g_degree_assortativity",
    "g_local_clustering",
    "s_user_lifecycle",
    "t_readability",
    "e_lift_curve",
    "t_keyword_rake",
    "m_content_recs",
    "m_loo_eval",
    "a_rfm_segments",
    "s_inter_event_times",
]


@pytest.mark.parametrize("name", _NO_CARTESIAN_R7)
def test_no_cartesian_product_r7(spark, name):
    assert _count(_plan(spark, name), r"CartesianProduct") == 0, name


def test_skipgram_and_rake_topk_take_ordered(spark):
    """Both corpus-level top-k rankings must plan TakeOrderedAndProject
    — a single-partition global-rank window over the unbounded pair /
    phrase set would collapse onto one task."""
    for name in ("m_skipgram_pairs", "t_keyword_rake"):
        p = _plan(spark, name)
        assert _count(p, r"TakeOrderedAndProject") >= 1, name


def test_content_recs_blocked_equi_join(spark):
    """The attribute quadratic must plan as an equi-join on the
    (brand, type-word) blocking key — SortMergeJoin or broadcast hash
    join both fine, a nested-loop over the full catalog is not."""
    p = _plan(spark, "m_content_recs")
    assert (
        _count(p, r"SortMergeJoin") + _count(p, r"BroadcastHashJoin") >= 1
    )
    assert _count(p, r"BroadcastNestedLoopJoin") == 0


def test_lift_curve_no_global_window_over_data(spark):
    """Decile assignment rides two_phase_midrank: the only
    single-partition window allowed is the 10-row decile frame (one
    global Sort of bounded input), never a rank over the scored
    population."""
    p = _plan(spark, "e_lift_curve")
    # two_phase_midrank windows partition by __pid; the decile window is
    # the only partition-less one and its input is the 10-row group-by.
    assert _count(p, r"Window.*__pid"), "expected partitioned midrank windows"


def test_readability_single_scan_no_join(spark):
    """All counts come from ONE documents scan feeding one hash
    aggregate — no join, no second scan."""
    p = _plan(spark, "t_readability")
    assert _count(p, r"Scan parquet|FileScan|BatchScan") == 1
    assert _count(p, r"Join") == 0


def test_vocab_coverage_take_ordered_and_broadcast(spark):
    """The candidate vocab must plan TakeOrderedAndProject (bounded by
    the constant max grid size) and rejoin the counts table broadcast —
    never a global sort of the vocabulary."""
    p = _plan(spark, "t_vocab_coverage")
    assert _count(p, r"TakeOrderedAndProject") >= 1
    assert _count(p, r"BroadcastHashJoin") >= 1
    assert _count(p, r"CartesianProduct") == 0


def test_nprobe_curve_no_cartesian_single_exact_ranking(spark):
    """All grid points share one exact ranking: exactly one per-query
    rank window over the corpus-sized frame, probes/centroids stay
    broadcast."""
    p = _plan(spark, "v_ivf_nprobe_curve")
    assert _count(p, r"CartesianProduct") == 0


def test_hapax_single_scan_no_join(spark):
    """Token/type/hapax counts all come from ONE documents scan through
    two hash aggregates — no join, no second scan."""
    p = _plan(spark, "t_hapax_profile")
    assert _count(p, r"Scan parquet|FileScan|BatchScan") == 1
    assert _count(p, r"Join") == 0


def test_seasonal_naive_no_cartesian_one_type_shuffle(spark):
    """The backtest plans one event_type-partitioned window over the
    (type, day) grain — no cartesian, no global window."""
    p = _plan(spark, "s_seasonal_naive_backtest")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"Window") >= 1


# --- round 8: bound/plan tests for the sampled-quadratic queries -----------


def test_lsh_calibration_pair_join_input_is_capped(spark):
    """The all-pairs S-curve measurement must stay O(N²) for the FIXED
    cap N regardless of corpus size: the binned pair counts sum to
    exactly C(min(|docs|, _LSH_CAL_N), 2) — if a refactor silently
    widened the sample (e.g. back to a corpus fraction), the sum would
    blow past the cap bound."""
    from recommender_systems_spark.queries.dedup import (
        _LSH_CAL_N,
        dedup_lsh_calibration,
    )

    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    n = min(n_docs, _LSH_CAL_N)
    rows = dedup_lsh_calibration(spark, SF_SMALL).collect()
    total_pairs = sum(r["n_pairs"] for r in rows)
    assert total_pairs == n * (n - 1) // 2
    cap = _LSH_CAL_N * (_LSH_CAL_N - 1) // 2
    assert total_pairs <= cap


def test_lsh_calibration_single_kernel_no_rescan(spark):
    """Signatures are computed ONCE per sampled doc by the shared Arrow
    kernel before the checkpoint: the pair-join plan must contain no
    Python eval node and no parquet re-scan (both sides read the
    checkpointed signature frame)."""
    p = _plan(spark, "dedup_lsh_calibration")
    assert _count(p, r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas") == 0
    assert _count(p, r"Scan parquet") == 0


def test_khop_and_harmonic_source_sample_is_capped(spark):
    """Both sampled hop queries draw their sources from the md5-ordered
    fixed-COUNT top-N — one output row per source, so the result can
    never exceed KHOP_SAMPLE_N rows at any graph size."""
    from recommender_systems_spark.queries.graph import KHOP_SAMPLE_N

    for name in ("g_khop_reach", "g_harmonic_centrality"):
        n = registry.QUERIES[name](spark, SF_SMALL).count()
        assert 0 < n <= KHOP_SAMPLE_N, name


def test_harmonic_no_cartesian(spark):
    assert _count(_plan(spark, "g_harmonic_centrality"), r"CartesianProduct") == 0


def test_bh_fdr_windows_after_aggregation_single_scan(spark):
    """e_bh_fdr's rank/step-up windows must run on the segment-sized
    stats frame (post-aggregation), never on raw events: one events
    scan, no cartesian, and every Window node sits above the hash
    aggregate in the plan text (aggregate appears below/after the last
    window in executedPlan's top-down print)."""
    p = _plan(spark, "e_bh_fdr")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"Scan parquet .*events") <= 1
    assert _count(p, r"\bWindow \[") >= 1
    last_window = max(m.start() for m in re.finditer(r"\bWindow \[", p))
    first_agg = min(m.start() for m in re.finditer(r"HashAggregate", p))
    assert last_window < first_agg, (
        "a Window node plans below the aggregation (raw-data window)"
    )


# --- round 8: new-query plan shapes -----------------------------------------


_NO_CARTESIAN_R8 = [
    "w_ewma",
    "s_incremental_variance",
    "g_hits_scores",
    "e_ab_arm_sizes_hash",
    "e_ab_foldin_bias_hash",
]


@pytest.mark.parametrize("name", _NO_CARTESIAN_R8)
def test_no_cartesian_product_r8(spark, name):
    assert _count(_plan(spark, name), r"CartesianProduct") == 0, name


def test_hits_topk_take_ordered(spark):
    """The authority ranking must plan TakeOrderedAndProject, not a
    global-rank window over the item dimension."""
    p = _plan(spark, "g_hits_scores")
    assert _count(p, r"TakeOrderedAndProject") >= 1


def test_winnowing_pairs_from_equi_join(spark):
    """Winnowing candidate pairs must come from the fingerprint
    equi-join (hash or sort-merge), never a nested loop over docs; the
    kernel runs once pre-checkpoint so the final plan has no Python
    eval and no parquet re-scan."""
    p = _plan(spark, "t_winnowing")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas") == 0
    assert _count(p, r"Scan parquet") == 0


def test_ewma_single_window_node(spark):
    """One user-keyed window carries the 16-row frame; the weighted
    fold is in-row array arithmetic (no second exchange)."""
    p = _plan(spark, "w_ewma")
    assert _count(p, r"\bWindow \[") == 1


def test_decision_stump_windows_on_bin_space_single_scan(spark):
    """The stump's split search must scan orders ONCE (the 3-feature
    unpivot is a narrow stack, not 3 scans) and every Window node must
    plan ABOVE the (feature, bin) aggregation — windows run on the
    bin-space frame, never the row space."""
    p = _plan(spark, "m_decision_stump")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"Scan parquet .*orders") == 1
    last_window = max(m.start() for m in re.finditer(r"\bWindow \[", p))
    first_agg = min(m.start() for m in re.finditer(r"HashAggregate", p))
    assert last_window < first_agg, (
        "a Window node plans below the aggregation (raw-data window)"
    )


def test_random_walks_steps_are_broadcast_equi_joins(spark):
    """Each walk step is two BROADCAST equi-joins (fixed-count frontier
    against degree/adjacency) — never a shuffle join keyed on the
    frontier, never a nested loop; the frontier source sample plans as
    TakeOrderedAndProject (fixed COUNT, not a fraction filter)."""
    from recommender_systems_spark.queries.graph import WALK_LEN

    p = _plan(spark, "g_random_walks")
    assert _count(p, r"CartesianProduct|BroadcastNestedLoopJoin") == 0
    assert _count(p, r"BroadcastHashJoin") >= 2 * WALK_LEN
    assert _count(p, r"TakeOrderedAndProject") >= 1


def test_tree_depth2_one_scan_per_level_no_cartesian(spark):
    """Level-wise growth: exactly one orders scan per tree level (the
    GBDT data-pass shape); the 1-row root winner broadcasts into the
    side assignment (BroadcastNestedLoopJoin with a 1-row build side
    is the scalar-broadcast plan, not a data cartesian). The level-1
    scan runs inside the checkpointed root job, so the FINAL plan
    carries only the level-2 scan."""
    p = _plan(spark, "m_tree_depth2")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"Scan parquet .*orders") == 1


def test_qini_no_global_window_over_population(spark):
    """Decile assignment rides two_phase_midrank (partitioned __pid
    windows); the only partition-less window is the 10-row decile
    cumulative frame."""
    p = _plan(spark, "e_qini_uplift")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"Window.*__pid"), "expected partitioned midrank windows"


def test_holt_single_series_shuffle_broadcast_dims(spark):
    """One orders scan to the (region, month) grain; nation/region
    dims broadcast; the smoothing recursion is in-row array
    arithmetic — no Window node and no Python eval anywhere."""
    p = _plan(spark, "s_holt_forecast")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"Scan parquet .*orders") == 1
    assert _count(p, r"BroadcastHashJoin") >= 2
    assert _count(p, r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas") == 0


def test_k_anonymity_single_scan_bucket_rollup_on_class_frame(spark):
    """One customer scan feeds the checkpointed class aggregate; the
    bucket rollup and grand total both read the class frame, so the
    final plan has no parquet scan at all and no cartesian."""
    p = _plan(spark, "a_k_anonymity")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"Scan parquet") == 0  # reads the checkpoint


def test_modularity_joins_are_equi_no_cartesian(spark):
    """Intra-community counting must be two hash equi-joins of labels
    onto the checkpointed edge list; the three 1-row stat frames
    broadcast (BNLJ with 1-row build side is the scalar pattern)."""
    p = _plan(spark, "g_modularity")
    assert _count(p, r"CartesianProduct") == 0


# --- round-9 heavy queries: the stronger shuffle/window invariants
# their docstrings claim (VERDICT r9 item 6) -------------------------------


def test_window_funnel_two_windows_one_user_exchange(spark):
    """The DP is two stacked windows over the SAME (user_id, us,
    event_id) sort feeding a user-keyed aggregate: exactly one
    user_id hash exchange serves both windows AND the groupBy (the
    sort-order-reuse claim), exactly two Window nodes, windows built
    BEFORE the aggregate, and no cartesian."""
    p = _plan(spark, "s_window_funnel")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"\bWindow\b") == 2
    assert _count(p, r"hashpartitioning\(user_id") == 1
    assert _count(p, r"Scan parquet .*events") == 1


def test_markov_attribution_one_lag_pass_tiny_sweeps(spark):
    """The corpus-sized journey reduction (audited on the factored
    pre-checkpoint helper — the checkpoint hides lineage from the
    final plan): first-purchase ts via a per-user window over the
    SAME scan (no purchase-aggregate self-join → no SortMergeJoin),
    the two DP windows riding the same user_id partitioning, and the
    no-channel-converter branch as a partially-combined per-user agg.
    The union's two branches each carry a textual copy of the
    scan+pts-window (AQE reuses the exchange at runtime), hence 2
    scans / 2 user_id exchanges / 4 Windows — any growth means a
    branch re-derived the DP pipeline. The final plan must be
    checkpoint-fed only: iteration cost independent of data size."""
    from recommender_systems_spark.queries.analytics import (
        _mk_transition_counts,
    )
    h = _mk_transition_counts(spark, SF_SMALL)
    p = h._jdf.queryExecution().executedPlan().toString()
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"SortMergeJoin") == 0
    assert _count(p, r"Scan parquet .*events") == 2
    assert _count(p, r"hashpartitioning\(user_id") == 2
    assert _count(p, r"\bWindow\b") == 4
    assert _count(p, r"partial_min|partial_max") >= 1
    pf = _plan(spark, "a_markov_attribution")
    assert _count(pf, r"CartesianProduct") == 0
    # r13: sweeps run on the driver over the channel²-sized collect;
    # the final plan is a local-relation projection — no corpus scan.
    assert _count(pf, r"Scan parquet") == 0


def test_aa_calibration_single_scan_mapside_combine(spark):
    """One events scan, the replicate explode (Generate) feeding a
    map-side-combined (rep, arm) aggregate — partial HashAggregate
    below the exchange — and everything downstream replicate-sized
    (audited on the factored pre-checkpoint helper; the final plan
    must be checkpoint-fed only)."""
    from recommender_systems_spark.queries.abtest import (
        _aa_replicate_pvals,
    )
    h = _aa_replicate_pvals(spark, SF_SMALL)
    p = h._jdf.queryExecution().executedPlan().toString()
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"Scan parquet .*events") == 1
    assert _count(p, r"\bGenerate\b") == 1
    # partial_ aggregate functions mark the map-side combine
    assert _count(p, r"partial_count|partial_avg") >= 1
    pf = _plan(spark, "e_aa_calibration")
    assert _count(pf, r"CartesianProduct") == 0
    assert _count(pf, r"Scan parquet") == 0  # stats read the ckpt


def test_neighbor_sampling_bounded_fanout_broadcast_expansion(spark):
    """Fan-out bounds apply BEFORE the expansion joins and both hop
    joins broadcast their (seed-sized) build sides: two per-layer rank
    Windows over src partitions, at least two BroadcastHashJoins, no
    SortMergeJoin in the expansion, no cartesian."""
    p = _plan(spark, "g_neighbor_sampling")
    assert _count(p, r"CartesianProduct") == 0
    assert _count(p, r"\bWindow\b") == 2
    assert _count(p, r"BroadcastHashJoin") >= 2
    assert _count(p, r"SortMergeJoin") == 0


def test_lsh_ladder_no_eager_count_job(spark, monkeypatch):
    """The adaptive-capacity ladders (hyperplane-LSH bits, SimHash
    table count) must size themselves from parquet footer METADATA
    (io.table_rows), not an eager per-query ``df.count()`` Spark job —
    the r10 fixed-overhead regression. Building these plans with
    DataFrame.count poisoned proves no count job fires at plan time
    (localCheckpoint materialisation is allowed; count is not)."""
    from pyspark.sql import DataFrame

    def _boom(self):
        raise AssertionError("eager DataFrame.count() during plan build")

    monkeypatch.setattr(DataFrame, "count", _boom)
    for name in (
        "sim_ann_topk",
        "sim_ann_recall",
        "dedup_simhash",
        "dedup_embedding_cosine",
        "dedup_semantic",
        "dedup_threshold_sweep",
    ):
        registry.QUERIES[name](spark, SF_SMALL)


def test_table_rows_matches_spark_count(spark):
    """Footer-metadata row counts agree with a real Spark count."""
    from recommender_systems_spark.io import table_rows

    for tab in ("embeddings", "documents"):
        df = registry._t(spark, SF_SMALL, tab)
        assert table_rows(SF_SMALL, tab) == df.count()


def test_cc_reliable_rounds_match_inmemory(spark, monkeypatch):
    """The connected-components loop's two storage policies — in-memory
    localCheckpoint rounds (small corpora) and on-disk parquet rounds
    (the reliable-checkpoint analogue past CC_RELIABLE_ROWS; sf10's
    accumulated round blocks OOMed an 80 g heap) — must produce
    identical cluster assignments."""
    from recommender_systems_spark.queries import dedup as dd

    base = {
        tuple(r)
        for r in dd.dedup_clusters(spark, SF_SMALL)
        .select("doc_id", "cluster_id", "cluster_size")
        .collect()
    }
    monkeypatch.setattr(dd, "CC_RELIABLE_ROWS", 0)
    reliable = {
        tuple(r)
        for r in dd.dedup_clusters(spark, SF_SMALL)
        .select("doc_id", "cluster_id", "cluster_size")
        .collect()
    }
    assert base == reliable and len(base) > 0
    # Round-12 contract: THIS run's PID-suffixed round directories are
    # removed when the loop finishes (other PIDs' leaks — e.g. a killed
    # run whose finally never fired — are gc_data_cache's job, which
    # removes dead-owner round dirs on the next bench start).
    import os

    from recommender_systems_spark.io import _cache_root

    leftovers = [
        d
        for d in os.listdir(_cache_root())
        if d.startswith(("cc_round0_%d_" % os.getpid(), "cc_round1_%d_" % os.getpid()))
    ]
    assert leftovers == [], leftovers
