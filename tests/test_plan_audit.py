"""Registry-wide physical-plan audit: builds every batch query's plan
and asserts the global invariants that keep the engine viable at
100 TB -- no cartesian product anywhere, and nested-loop joins only
where a tiny broadcast side makes them the *intended* plan.

(Per-operator shape pins live in test_plan_shape.py; this is the
sweep that catches a regression in an operator nobody pinned.)
"""

import re

from java_mapreduce_framework_spark.plans import registry


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _nodes(plan: str, name: str) -> int:
    return len(re.findall(rf"^\(\d+\) {name}\b", plan, flags=re.MULTILINE))

# Deliberate BroadcastNestedLoopJoin uses -- both are broadcast-cross
# with a bounded side, the correct plan for the job:
#   tfidf_top_terms: joins the 1-row corpus-size scalar for IDF
#   similarity_topk: broadcasts the fixed query-vector set over the
#     corpus scan (the brute-force Q x N baseline by design)
#   quality_stratify: broadcasts the 1-row quartile-threshold tuple
#: Queries whose BroadcastNestedLoopJoin is a deliberate 1-row (or
#: tiny-side) broadcast scalar/cross join, not an accident.
ALLOWED_NESTED_LOOP = {
    "tfidf_top_terms",
    "similarity_topk",
    "quality_stratify",
    "lm_unigram_score",  # 1-row broadcast corpus-total scalar
    "bm25_score",  # 1-row broadcast (n_docs, avgdl) corpus-stats scalar
    "join_bloom_pruned",  # 1-row broadcast Bloom-bitmap literal
    "pair_pmi",  # 1-row broadcast corpus token total
    "lm_bigram_score",  # 1-row broadcast vocabulary-size scalar
    "chi2_feature_select",  # 1-row broadcast grand-total scalar
    "target_encoding",  # 1-row broadcast global-mean scalar
    "join_interval_overlap",  # 28-row broadcast quarter calendar
    "dedup_tfidf_cosine",  # 1-row broadcast corpus-size scalar for idf
    "ab_test_ztest",  # 1-row broadcast variant-size totals
    "time_resample_gapfill",  # tiny generated spine cross type alphabet
    "embedding_knn_graph",  # blocks^2 tile cross join (block-GEMM; ANN = scale path)
    "orders_dow_profile",  # 1-row broadcast weekly order total
    "lm_perplexity_bucket",  # 1-row broadcast corpus-total scalar
    "graph_rich_club",  # 8-row constant k-grid inequality join on histograms
    "embedding_pca_project",  # 1-row broadcast moment scalar (closed-form PCA)
    "events_user_lifespan_histogram",  # 1-row broadcast user total
    "stats_page_trend",  # users x type-alphabet dense grid (friedman's shape)
    "corpus_mix_temperature",  # 1-row broadcast (total, ptot) corpus scalars
    "embedding_standardize",  # 1-row broadcast per-dim stats array
    "equidepth_histogram",  # 1-row broadcast percentile-cut-points array
    "curriculum_order",  # 1-row broadcast decile-cut-points array
    "customer_rfm_segments",  # three 1-row broadcast quartile-cut arrays
    "ks_drift",  # 1-row broadcast cell-cut-points array + (n_a, n_b) totals
    "vocab_coverage",  # 1-row broadcast corpus token total
    "audience_overlap_kmv",  # |types|-row sketch table cross-paired
    "ml_knn_classify",  # inherits embedding_knn_graph's block-tile cross
    "ml_knn_link_prediction",  # inherits embedding_knn_graph's block-tile cross
    "ml_naive_bayes_train",  # 1-row broadcast vocab-size scalar
    "ml_naive_bayes_confusion",  # 1-row vocab scalar + |langs|-row class table
    "basket_lift_topk",  # 1-row broadcast total-orders scalar
    "corpus_token_budget",  # 1-row broadcast sqrt-share total
    "pair_llr",  # 1-row broadcast bigram total (pair_pmi's scalar)
    "stats_fdr_bh",  # inherits ab_test_ztest's 1-row variant totals
    "event_type_cooccurrence",  # 1-row broadcast session total
    "decontaminate_bloom",  # 1-row broadcast Bloom-bitmap literal
    "embedding_similarity_histogram",  # m<=128 hash-subsample self-pair (m^2/2 bounded by construction)
    "funnel_time_to_convert",  # 1-row broadcast shard cut bounds (quantile kernel)
    "embedding_norm_profile",  # 1-row broadcast (mu, sd) stats scalar
    "corpus_datasheet",  # three 1-row report frames cross-joined
    "lm_trigram_backoff",  # 1-row broadcast (N, V) train-marginal scalars
    "survival_kaplan_meier",  # two 1-row broadcasts: max-ts edge, user total
    "t_closeness_audit",  # |sources|-row marginal + 1-row corpus total
    "embedding_matryoshka_eval",  # similarity_topk's broadcast Q x N per prefix
    "stats_kruskal_wallis",  # 1-row broadcast tie-correction scalar
    "lm_kneser_ney_bigram",  # 1-row broadcast bigram-type total
    "orders_abc_classification",  # 1-row broadcast revenue total
    "graph_degree_histogram",  # 1-row broadcast node total
    "stats_benford",  # 1-row broadcast observation total
    # round 9: 1-row broadcast totals / day-count-bounded pair joins
    "stats_chisq_independence",  # 1-row broadcast grand total
    "stats_cramers_v",  # inherits chisq's 1-row total
    "stats_kendall_tau",  # day-bounded pair join + 1-row n_days
    "stats_theil_sen",  # day-bounded pair join + 1-row median slope
    "stats_grubbs",  # 1-row broadcast moment triple
    "stats_ljung_box",  # 1-row broadcast (n, s) moments
    "time_changepoint_binary",  # 1-row broadcast series totals
    "orders_repeat_interval",  # 1-row broadcast quantile-kernel pivot
    "orders_ship_delay_profile",  # 1-row broadcast histogram total
    # round 9 batch 3: 1-row broadcast scalars / alphabet-sized grids
    "stats_friedman",  # k-row type dimension cross + 1-row statistic
    "stats_durbin_watson",  # 1-row broadcasts: first-day anchor, moments
    "stats_mutual_information",  # 1-row broadcast grand total
    "stats_pacf",  # 1-row moment fold feeding closed-form expressions
    "events_growth_accounting",  # 1-row broadcast last-day edge
    "text_char_js_divergence",  # alphabet-bounded source x char grid + 1-row corpus total
    # round 9 batch 4
    "stats_cohens_kappa",  # 1-row chance-agreement scalar broadcast
    "stats_cronbach_alpha",  # friedman's k-row grid cross + two 1-row folds
    "events_active_days_histogram",  # 1-row broadcast user total
    "lm_source_cross_entropy",  # 1-row broadcast corpus token total
    # round 9 batch 5
    "stats_permutation_test",  # 64-row permutation-id broadcast + 1-row obs
    "stats_hodges_lehmann",  # day-bounded half-month cross pair join
    # round 9 batch 6
    "stats_g_test",  # 1-row grand total + 1-row level counts
    "graph_transitivity",  # 1-row wedge total x 1-row closed count
    "dp_exponential_median",  # 1-row (n, true median) + candidate count
    # round 9 batch 7
    "text_word_length_histogram",  # 1-row broadcast token total
    # round 10 batch 5 (late batch; guard missed in 50c6932, VERDICT r10 #1)
    "customer_recency_buckets",  # 1-row broadcast max-orderdate anchor
    # round 11: 1-row broadcast totals / calendar-bounded grids
    "stats_mann_kendall",  # day-bounded pair join + 1-row tie totals
    "stats_odds_ratio",  # 1-row broadcast variant-size totals
    "stats_hellinger_weekpart",  # 1-row broadcast weekpart totals
    "events_stickiness",  # calendar-bounded day-spine range join
    "ml_pr_curve",  # 10-row cut grid x 1-row corpus total
    "graph_eigenvector_centrality",  # per-round 1-row max broadcast
    "text_skipgram_pmi",  # 1-row broadcast corpus token total
    "stats_seasonality_strength",  # 1-row broadcast sum-of-squares total
    "stats_mood_median",  # 1-row broadcast pinned-median scalar
    "time_sax_words",  # 1-row broadcast (n, S, sxx) moment scalar
    "corpus_lang_rebalance",  # 1-row broadcast rarest-language count
    "stats_quade",  # friedman's k-row grid cross + 1-row (k+1) scalar
    # round 12
    "stats_jonckheere_terpstra",  # 600-cell (month x qty) grid self-join
    "events_peak_days",  # 1-row broadcast (n, S, sxx) moment scalar
    "stats_cusum_break",  # 1-row broadcast (n, S, sxx) moment scalar
    "stats_acf_table",  # 1-row broadcast (n, S) moment scalar
    "events_weekend_lift",  # 1-row broadcast calendar day counts
}


def test_no_unintended_nested_loops_or_cartesians(spark, sf_small):
    """One registry-wide sweep checking two global invariants per
    batch query: (a) no cartesian / unintended nested-loop join in
    the physical plan; (b) EVERY registered query's output schema is
    scalar-only — rows-only queries included, because the driver
    canonicalizes those too: ``embedding_standardize`` (oracle-bearing,
    CORRECTNESS_r07) and ``embedding_pq_quantize`` (rows-only,
    CORRECTNESS_r08) both shipped green locally and then ERR'd on
    first driver contact with ``TypeError: unhashable type:
    numpy.ndarray`` from pandas ``sort_values`` over an
    array-valued column."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    failures = []
    for name, spec in registry.registry().items():
        if name.startswith("stream_"):
            continue  # streaming plans are exercised in test_streaming
        df = spec.fn(spark, sf_small)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            failures.append(
                f"{name}: query emits non-scalar column(s) {bad} "
                f"(driver canonicalizer crashes on these regardless "
                f"of oracle; emit long form or concat_ws)"
            )
        plan = _formatted(df)
        if _nodes(plan, "CartesianProduct"):
            failures.append(f"{name}: CartesianProduct")
        if _nodes(plan, "BroadcastNestedLoopJoin") and name not in ALLOWED_NESTED_LOOP:
            failures.append(f"{name}: BroadcastNestedLoopJoin")
    assert not failures, failures
