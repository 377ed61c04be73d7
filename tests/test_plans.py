"""Plan-shape assertions: the physical-plan properties that make the
queries scale. Row counts can't distinguish a pushed-down filter from
a full scan or a broadcast join from an all-to-all shuffle — these
tests read the executed plan and assert the shape directly.

Run at sf0.001 (plan shape is scale-invariant; AQE join choices are
pinned by explicit broadcast hints in the queries).
"""

import pytest
from pyspark.sql import functions as F

from filemapreduce_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def plan_of(spark, registry, name: str) -> str:
    df = registry[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark, registry):
    """q6's shipdate/discount/quantity predicates must reach the
    parquet scan (PushedFilters), not run as a post-scan Filter only."""
    plan = plan_of(spark, registry, "q6_revenue_delta")
    scan = plan[plan.index("FileScan") :]
    pushed = scan[scan.index("PushedFilters") :].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q6_scan_prunes_columns(spark, registry):
    """q6 touches 4 of lineitem's 11 columns; ReadSchema must not
    include the others (column pruning)."""
    plan = plan_of(spark, registry, "q6_revenue_delta")
    read_schema = plan[plan.index("ReadSchema") :].split("\n")[0]
    assert "l_extendedprice" in read_schema
    for col in ("l_orderkey", "l_returnflag", "l_tax", "l_partkey"):
        assert col not in read_schema, f"{col} not pruned: {read_schema}"


def test_q5_dimension_joins_broadcast(spark, registry):
    """q5's region/nation/supplier joins must be broadcast — the big
    fact tables must never shuffle for a dimension join."""
    plan = plan_of(spark, registry, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan


def test_topk_uses_take_ordered(spark, registry):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject
    (per-partition heaps), not a global sort."""
    plan = plan_of(spark, registry, "topk_orders_by_price")
    assert "TakeOrderedAndProject" in plan


def test_window_topk_partitions_by_brand(spark, registry):
    """Per-group top-k must partition the window by the group key —
    no 'move everything to one partition' WindowExec. The final
    one_part_sorted gather IS an intentional SinglePartition exchange,
    but it sits ABOVE the window (only brands×k ranked rows cross it);
    nothing at or below the window node may be single-partition."""
    plan = plan_of(spark, registry, "window_topk_per_brand")
    assert "Window" in plan
    below_window = plan[plan.index("Window"):]
    assert "SinglePartition" not in below_window
    assert "hashpartitioning(p_brand" in below_window


def test_minhash_no_cartesian(spark, registry):
    """LSH candidate generation must be an equi-join on band keys —
    never a cartesian/broadcast nested loop over doc pairs."""
    plan = plan_of(spark, registry, "neardup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_neardup_no_cartesian(spark, registry):
    """Embedding near-dup must block on the cell id (equi-join), not
    compare all pairs."""
    plan = plan_of(spark, registry, "neardup_embedding_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_in_agg_path(spark, registry):
    """q1's scan→filter→partial-agg pipeline must run inside
    whole-stage codegen (JVM, vectorized), not interpreted. AQE only
    materializes codegen spans in the final plan, so execute first."""
    df = registry["q1_pricing_summary"].fn(spark, SF_DIR)
    df.collect()  # a write would execute a copied plan, not df's own
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # '*(n)' node prefixes mark whole-stage-codegen spans
    import re

    assert re.search(r"\*\(\d+\) (HashAggregate|Filter|Project)", plan), plan


def test_registry_wide_plan_audit(spark, registry):
    """Every registered batch query must be free of the two plan
    shapes that cannot scale: a CartesianProduct over data tables and
    a Window over SinglePartition (whole table on one task).

    BroadcastNestedLoopJoin is allowed ONLY on the enumerated list
    below, where the broadcast side is a scalar aggregate, a tiny
    fixed query set, or a 1-row bound (a 1-row build side is a
    filter, not a join explosion). A BNLJ appearing anywhere else —
    i.e. a non-equi join that grew a fat side — fails this test.
    """
    allowed_bnlj = {
        "acf_daily_lags",  # 7-row lag-index broadcast over daily grain
        "benford_first_digit_audit",  # 1-row grand-total broadcast
        "bm25_search_topk",  # 1-row corpus-stats broadcast
        "calibration_curve_deciles",  # 1-row decile-threshold broadcast
        "ccnet_perplexity_buckets",
        "class_balance_downsample",  # 1-row minority-size broadcast
        "contingency_chi2_cells",
        "copurchase_lift_top50",
        "kcore_peeling_rounds",  # 1-row node/edge count crosses per round
        "kl_divergence_by_source",  # top-V vocab + 1-row totals crosses
        "jsd_pairwise_sources",  # top-V vocab cross + #sources² OOV theta
        "stupid_backoff_trigram_score",  # 1-row train-total broadcast
        "mmr_diversified_topk",  # 1-row query vec + N-candidate crosses
        "dsir_importance_weights",
        "empirical_bayes_rate_shrinkage",  # 1-row global-prior broadcast
        "fk_containment_discovery",  # 1-row per-edge stat broadcasts
        "funnel_conversion_window",
        "group_kfold_assignment",  # 1-row leak-audit broadcast
        "histogram_sketch_percentiles",  # 256-row bin-summary broadcast
        "hard_negative_mining",  # tiny query-slice broadcast, != join
        "ivf_recall_measure",
        "join_cardinality_estimate_audit",  # three 1-row stat broadcasts
        "kaplan_meier_signup_purchase",  # 1-row subject-total broadcast
        "nelson_aalen_cumhaz",  # 1-row subject-total broadcast (KM twin)
        "curriculum_interleave_order",  # 1-row #sources-count broadcast
        "matryoshka_truncation_recall",  # fixed 8-query-vector broadcast
        "psi_value_drift",  # #types×10 decile-grid cross, config-bounded
        "woe_iv_price_deciles",  # 9-edge row + 1-row totals broadcast
        "embedding_power_iteration",  # 1-row vmax/Rayleigh broadcasts
        "bootstrap_ci_daily_revenue",  # B-replicate cross on the DAY
        # grain (calendar-bounded) + 1-row CI broadcast
        "cramer_von_mises_vs_view",  # #types-row pair-list broadcast
        "skipgram_pmi_pairs",  # two 1-row totals (N_tok, N_pairs)
        "kmeans_lloyd_2iter",
        "minhash_lsh_recall",
        "parents_prefix_inheritance",
        "q11_value_concentration",
        "q22_idle_customers",
        "rfm_quintile_segments",  # 1-row percentile-threshold broadcast
        "revenue_share_by_nation",
        "rolling_7day_active_users",
        "semdedup_cluster_prune",
        "session_cooccurrence_pmi",
        "similarity_bruteforce_topk",
        "stratified_adjusted_difference",  # 1-row quartile broadcast
        "similarity_ivf_probe2",
        "temperature_mixture_weights",  # 1-row normalizer broadcast
        "tfidf_top_term_per_doc",
        "triangle_count_copurchase",
        "unigram_surprisal_filter",
        "welch_ttest_vs_view",  # 1-row baseline-stats broadcast
        "window_rank_supplier_balance",
        "cuped_adjusted_lift",  # 1-row pooled theta/mean_x broadcast
        "kruskal_wallis_daily",  # three 1-row stat broadcasts (N, tie
        # correction, rank-square sum) onto the #types summary
        "logrank_test_arms",  # 1-row group-total + O/E/V broadcasts
        "fightin_words_terms",  # 1-row corpus-total broadcast
        "keyness_loglik_terms",  # 1-row corpus-total broadcast
        "jackknife_nation_mean_se",  # 1-row total + 1-row moment
        # broadcasts onto the #nations summary
        "kneser_ney_bigram_probs",  # 1-row bigram-type total broadcast
        "bigram_mutual_information",  # 1-row total/moment broadcasts
        "cohens_kappa_langid",  # 1-row chance-mass broadcast
        "boilerplate_prefix_mass",  # 1-row prefix-total broadcast
        "rmst_signup_purchase",  # 1-row subject-total + tail-area
        # broadcasts onto the day-grain KM grid
        "term_burstiness_top20",  # 1-row doc-count broadcast
        "brier_ece_score",  # 1-row max-score broadcast
        "point_in_polygon_assignment",  # fixed 11-edge polygon table
        # broadcast (constant x11 fan-out) + 1-row total
    }
    # Windows whose INPUT is a date-grain aggregate (one row per
    # calendar day): cardinality is bounded by the time horizon
    # (36.5k rows per century), not by data volume, so a global
    # window over the tiny series is safe at any SF.
    # orderkey_gap_audit: its one global window consumes per-SUPER-band
    # summaries — input is keys/4096² rows (16.7M× reduction; ~60k
    # skinny rows even at 10^12 keys), with both finer levels fully
    # partition-parallel.
    # shard_stripe_balance: its global window consumes the per-shard
    # summary — exactly N_SHARDS (8) rows by construction, bounded by
    # config, never by data volume.
    # decision_stump_split: its global cumulative window runs over the
    # distinct-VALUE histogram grid (<= 49_002 cents cells — the
    # value domain), not the row stream; the GBM histogram-split
    # shape, data-volume-independent by construction.
    # histogram_sketch_percentiles: cumulative window over the <=256-
    # bin histogram summary — bin count is config, never data volume.
    allowed_global_window = {
        "rolling_correlation_series",
        "orderkey_gap_audit",
        "shard_stripe_balance",
        "decision_stump_split",
        "histogram_sketch_percentiles",
        # kaplan_meier_signup_purchase / daily_active_new_returning:
        # windows over the day-grain grid — bounded by the
        # observation horizon in days, never data volume.
        "kaplan_meier_signup_purchase",
        "daily_active_new_returning",
        # nelson_aalen_cumhaz: same day-grain grid as the KM row —
        # bounded by the observation horizon in days, never data.
        "nelson_aalen_cumhaz",
        # zipf_exponent_fit: row_number over the LIMIT-100 term list
        # (config-bounded K, never data volume).
        "zipf_exponent_fit",
        # banded_dense_row_ids: offset prefix-sum over the per-band
        # COUNT summary (#bands rows, value-domain-bounded).
        "banded_dense_row_ids",
        # heaps_law_curve: cumulative windows over the FIXED 20-row
        # checkpoint grid (config-bounded at any corpus size).
        "heaps_law_curve",
        # heavy_hitters_exact_mg: rank window over the LIMIT-10 row
        # set (config-bounded, never data volume).
        "heavy_hitters_exact_mg",
        # neyman_allocation_by_type: all windows run over the
        # #strata-row summary (catalog-bounded, never data volume).
        "neyman_allocation_by_type",
        # curriculum_interleave_order: row_number over the DISTINCT-
        # source frame (#sources rows — catalog-bounded, never data
        # volume); the per-document windows are source-partitioned.
        "curriculum_interleave_order",
        # abc_revenue_classes: cumulative window over the per-part
        # revenue summary (#parts rows — catalog-bounded; docstring
        # names the banded-rank fallback for huge catalogs).
        "abc_revenue_classes",
        # did_two_period_lift: window over the 2-row per-arm summary.
        "did_two_period_lift",
        # kruskal_wallis_daily: global rank over the (type × day)
        # summary — calendar-bounded (~#types·#days rows), never data.
        "kruskal_wallis_daily",
        # logrank_test_arms: at-risk windows over the day-grain grid —
        # bounded by the horizon in days (the KM/Nelson-Aalen shape).
        "logrank_test_arms",
        # rbo_rank_agreement: rank/cumulative windows over the two
        # TakeOrdered top-15 lists and the constant 15-row depth grid
        # — never over data.
        "rbo_rank_agreement",
        # rmst_signup_purchase: KM at-risk / survival / LEAD windows
        # over the day-grain grid — horizon-bounded (the KM shape).
        "rmst_signup_purchase",
        # cliffs_delta_arms: cumulative midrank window over the
        # VALUE-DOMAIN-bounded cents histogram (the Mann-Whitney tie
        # discipline), never over rows.
        "cliffs_delta_arms",
    }

    offenders = {}
    for name, spec in sorted(registry.items()):
        if name.startswith("streaming_"):
            continue  # writeStream queries execute on build
        if name in allowed_global_window:
            continue
        df = spec.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian")
        if "BroadcastNestedLoopJoin" in plan and name not in allowed_bnlj:
            flags.append("bnlj-not-allowlisted")
        # a Window is single-partition iff the exchange feeding it
        # (within the next few tree lines) is SinglePartition; a
        # SinglePartition exchange elsewhere (scalar aggregate) is fine
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Window" in line and "windowspecdefinition" in line:
                below = "\n".join(lines[i + 1 : i + 4])
                # a single-partition window IS scalable when a
                # partial WindowGroupLimit prunes below the exchange
                # (each task forwards only its local top-k+ties, so
                # the final window sees k·partitions rows, not the
                # table) — the TakeOrdered-equivalent shape for
                # rank()-based WITH TIES top-k
                pruned = "\n".join(lines[i + 1 : i + 8])
                if "Exchange SinglePartition" in below and (
                    "WindowGroupLimit" not in pruned
                    or ", Partial" not in pruned
                ):
                    flags.append("single-partition-window")
                    break
        if flags:
            offenders[name] = flags
    assert not offenders, offenders


def test_aqe_coalesces_shuffle_partitions(spark):
    """AQE must be on and actually coalescing: a small grouped agg
    configured with 32 shuffle partitions should execute with far
    fewer after AQE's runtime re-plan (at 100 TB the same mechanism
    right-sizes every exchange to the real data volume)."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = (
        spark.range(1000)
        .groupBy((F.col("id") % 5).alias("g"))
        .agg(F.count("*").alias("n"))
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:800]


def test_iterative_ops_constant_plan_depth(spark, registry):
    """The iterative operators (connected components, PageRank,
    k-means) localCheckpoint() their loop state each round, so the
    final plan must NOT contain the unrolled join chain of every
    iteration — lineage stays bounded however many rounds ran.
    Checkpointed state shows up as a scan, not as the joins that
    produced it."""
    for name, max_joins in [
        ("dedup_clusters_minhash", 6),
        ("pagerank_trade_2iter", 6),
        ("kmeans_lloyd_2iter", 8),
    ]:
        plan = plan_of(spark, registry, name)
        n_joins = plan.count("Join")
        assert n_joins <= max_joins, (
            f"{name}: {n_joins} joins in final plan — lineage not "
            f"truncated (expected <= {max_joins})"
        )
        assert "ExistingRDD" in plan or "Scan" in plan


def test_no_unreviewed_broadcast_hints_over_corpus(spark, registry):
    """A forced ``F.broadcast`` hint over an unbounded-cardinality
    side is the one plan shape AQE cannot undo: at 100 TB a per-
    document or per-vector table is billions of rows and the hint
    turns a shuffle join into a driver OOM (the round-3 defect in
    ``setsim_prefix_filter_top1``).

    This guard fails any query that BOTH reads a corpus table
    (documents/embeddings — detected by their signature columns in
    the analyzed plan) AND carries a broadcast ``ResolvedHint``,
    unless it is on the reviewed list below where every hinted side
    is provably bounded (fixed query sets, k centroids, 1-row
    totals, df-capped term stats — bounded by config or value
    domain, never by corpus size). Adding a new hint over a corpus
    table means reviewing its bound and adding it here.
    """
    reviewed_bounded_hint = {
        "banded_dense_row_ids",  # per-band COUNT summary (#bands rows)
        "containment_contamination_screen",  # benchmark-corpus side
        "heavy_hitters_exact_mg",  # <=K-per-partition candidates + 1-row N
        "bm25_search_topk",  # fixed query terms + 1-row corpus stats
        "ccnet_perplexity_buckets",  # hashed-bigram model w/ cap
        "class_balance_downsample",  # 1-row minority size
        "contamination_8gram_overlap",  # test-set grams (fixed suite)
        "contingency_chi2_cells",  # row/col marginal totals
        "dsir_importance_weights",  # hashed-bucket weight table (2^k)
        "hard_negative_mining",  # fixed query slice
        "heaps_law_curve",  # fixed 20-row checkpoint grid
        "ivf_recall_measure",  # k centroids + fixed queries
        "kl_divergence_by_source",  # top-V vocab + 1-row totals (config)
        "jsd_pairwise_sources",  # top-V vocab (config), no corpus hint
        "stupid_backoff_trigram_score",  # 1-row train-token total
        "kcenter_coreset_selection",  # <=k-row selected set per round
        "skipgram_pmi_pairs",  # 1-row N_tok/N_pairs totals only
        "embedding_power_iteration",  # d-row/1-row matvec broadcasts
        "ndcg_retrieval_audit",  # fixed query-term list broadcast
        "curriculum_interleave_order",  # #sources-row index table
        "matryoshka_truncation_recall",  # fixed 8-query set (2 variants)
        "kmeans_lloyd_2iter",  # k centroids per iteration
        "mmr_diversified_topk",  # 1 query vec + N-candidate set (config)
        "parents_prefix_inheritance",  # bounded dir-level table
        "quantile_normalize_scores",  # 1001-row quantile grid (config)
        "semdedup_cluster_prune",  # k centroids
        "similarity_bruteforce_topk",  # fixed query vectors
        "similarity_ivf_probe2",  # k centroids + fixed queries
        "similarity_ivf_topk",  # k centroids + fixed queries
        "temperature_mixture_weights",  # per-language summary
        "tfidf_cosine_pairs",  # df-capped term stats (stopword cap)
        "fightin_words_terms",  # 1-row pooled-total broadcast only
        "keyness_loglik_terms",  # 1-row corpus-total broadcast only
        "kneser_ney_bigram_probs",  # 1-row type-total broadcast only
        "bigram_mutual_information",  # 1-row total broadcasts only
        "cohens_kappa_langid",  # 1-row chance-mass broadcast only
        "boilerplate_prefix_mass",  # 1-row prefix-total broadcast only
        "map_retrieval_audit",  # fixed 9-term query set (config-bounded)
        "term_burstiness_top20",  # 1-row doc-count broadcast only
        "tfidf_top_term_per_doc",  # per-term df (vocab, df-capped)
        "trigram_index_search",  # fixed search-term trigram set
        "unigram_surprisal_filter",  # capped unigram model
        "vocab_coverage_oov",  # fixed top-K vocabulary
    }
    offenders = []
    for name, spec in sorted(registry.items()):
        if "streaming" in spec.tags or name.startswith("streaming_"):
            continue
        # engine/sink queries execute real work inside fn() (eng.run()
        # actions, parquet/CSV roundtrip writes, driver-materialized
        # results whose returned plan is a local relation) — running
        # them here would make a plan guard side-effectful, and their
        # inputs are capped test fixtures, not corpus tables. Skip,
        # as for streaming.
        if "engine" in spec.tags or "sink" in spec.tags:
            continue
        if name in reviewed_bounded_hint:
            continue
        df = spec.fn(spark, SF_DIR)
        ana = df._jdf.queryExecution().analyzed().toString()
        reads_corpus = ("text#" in ana) or ("embedding#" in ana)
        if reads_corpus and "ResolvedHint" in ana:
            offenders.append(name)
    assert not offenders, (
        f"broadcast hint over a corpus table in {offenders} — review "
        "the hinted side's cardinality bound and allowlist, or drop "
        "the hint and let Catalyst/AQE choose"
    )


def test_no_narrow_product_accumulators(spark, registry):
    """Accumulator-width guard: no registered query may SUM a product
    of two bare long columns — the multiply evaluates in int64 (ANSI
    off) and wraps silently at exactly the volumes a 100-TB run hits.
    The round-4 cross-SF sweeps caught this class LIVE twice
    (covariance, Gini); the fix is casting an OPERAND to
    DECIMAL(38,0) so the multiply itself is decimal. A cast wrapped
    around the product (``sum(cast((a*b) as decimal))``) still
    evaluates a*b in int64 first and is equally banned.

    Scope: longs only (the ``#nL`` attribute suffix is unambiguous in
    analyzed-plan text; int and double attrs both print bare, and
    double co-moments are a different, non-wrapping class). Queries
    whose product is provably value-domain-bounded are allowlisted
    with the bound.
    """
    import re

    bare = re.compile(r"sum\(\((\w+#\d+L) \* (\w+#\d+L)\)\)")
    wrapped = re.compile(r"sum\(cast\(\((\w+#\d+L) \* (\w+#\d+L)\) as decimal")
    bounded_product = {
        # qty² ≤ 50² = 2500 per row (TPC-H quantity domain); the long
        # SUM accumulator holds 3.7e15 such rows
        "stats_corr_regression",
        # daily-grain cents × power-of-two weight ≤ 512, summed over a
        # 10-term truncated horizon per (type, day) — calendar-bounded
        "ewma_daily_value",
    }
    offenders = []
    for name, spec in sorted(registry.items()):
        if "streaming" in spec.tags or name.startswith("streaming_"):
            continue
        if "engine" in spec.tags or "sink" in spec.tags:
            continue
        if name in bounded_product:
            continue
        df = spec.fn(spark, SF_DIR)
        ana = df._jdf.queryExecution().analyzed().toString()
        hits = bare.findall(ana) + wrapped.findall(ana)
        if hits:
            offenders.append((name, hits[:3]))
    assert not offenders, (
        f"narrow product accumulator in {offenders} — cast an operand "
        "to DECIMAL(38,0) (sum(col('a').cast('decimal(38,0)') * "
        "col('b'))) or document the value-domain bound and allowlist"
    )


def test_headline_plans_have_codegen_spans(spark, registry):
    """Every bench HEADLINE query's plan must carry at least one
    whole-stage-codegen span (scan→filter→partial-agg fuses by
    default). A zero-span plan means something broke fusion end to
    end — the classic regression is an accidental row-at-a-time
    Python UDF in the hot path (r8 verdict item 5).

    AQE is disabled for the probe only: an un-executed
    AdaptiveSparkPlan renders its initial plan WITHOUT the
    CollapseCodegenStages display pass, so `[codegen id : N]`
    markers never appear in it regardless of whether the plan
    codegens (the exact blind spot the old plan_audit wscg column
    had). The initial physical plan is otherwise identical.
    """
    import re
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import HEADLINE

    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        offenders = []
        for name in HEADLINE:
            if name.startswith("streaming_"):
                continue  # streaming machinery, no batch explain
            spark.catalog.clearCache()
            df = registry[name].fn(spark, SF_DIR)
            mode = (
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            plan = df._jdf.queryExecution().explainString(mode)
            spans = set(re.findall(r"\[codegen id : (\d+)\]", plan))
            if not spans:
                offenders.append(name)
        assert not offenders, (
            f"zero whole-stage-codegen spans in {offenders} — an "
            "interpreted expression or Python UDF broke fusion"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.catalog.clearCache()
