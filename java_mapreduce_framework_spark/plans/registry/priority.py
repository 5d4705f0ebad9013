"""Registration-order priority for the declared query registry.

The driver's per-round correctness sweep samples the FIRST 50
registered entries, so registration order is a record-keeping lever
(query semantics are order-independent). The ordering policy, applied
as a stable sort over the import-order registry:

1. never-driver-sampled queries (no CORRECTNESS_rNN verdict on file)
   register first -- they need their first official verdict;
2. then ``STALE_ROTATION`` -- the stalest-verdict cohort explicitly
   rotated into this round's spare sample slots (VERDICT r10 #3);
3. then everything else, stalest official verdict first.

Within each tier, queries WITH a SQL oracle sort before rows-only
ones: a sample slot buys a full hash verdict for the former, while
the latter already carry quantitative engine-local verdicts in
RECALL.json -- the weaker rows>0 record can wait when slots are
tight.

Rounds 1-10 maintained this as a hand-grown cascade of per-round
frozensets; round 11 replaced it with ``_verdict_record.py``, a
GENERATED latest-verdict map distilled from the CORRECTNESS_r*.json
files themselves (single source of truth; regenerate with
``python tools/regen_priority.py`` after each driver sweep lands).
"""
from __future__ import annotations

from ._verdict_record import LATEST_VERDICT, STALE_ROTATION
from .core import _REGISTRY

#: New THIS round -- no driver verdict yet, deliberately tiered
#: BEHIND the stale rotation so they don't crowd out queries whose
#: first-or-stalest official verdict this round's 50 slots should
#: buy. Retired into the never-sampled tier at next round's start
#: (the round-11 set below drained exactly this way in round 12).
_FRESH_THIS_ROUND: frozenset[str] = frozenset(
    {
        "window_elder_ray",
        "window_cmf",
        "window_coppock",
        "stats_cliff_delta",
        "stats_cvm_two_sample",
        "stats_jonckheere_terpstra",
        "events_retention_halflife",
        "events_gini_trend",
        "orders_cohort_ltv_curve",
        "graph_edge_triangle_support",
        "dedup_prefix_exact",
        "multimodal_image_edge_density",
        "sql_supplier_share_trend",
        "sql_value_band_migration",
        "stats_lepage",
        "events_power_law_alpha",
        "orders_seasonality_index",
        "window_mass_index",
        "multimodal_audio_tempo",
        "sql_top_growth_parts",
        "stats_brunner_munzel",
        "window_choppiness",
        "window_ultimate_oscillator",
        "dedup_cluster_size_histogram",
        "events_seasonal_naive_error",
    }
)

#: Round-11 additions, retired in round 12: CORRECTNESS_r11 sampled
#: none of them, so they now lead the sweep through the ordinary
#: never-sampled tier (VERDICT r11 #1 -- 39 names + 11 spare slots).
_FRESH_ROUND11 = frozenset(
    {
        "window_williams_r",
        "window_aroon",
        "window_vortex",
        "window_chande_momentum",
        "window_force_index",
        "stats_mann_kendall",
        "stats_odds_ratio",
        "stats_hellinger_weekpart",
        "stats_dagostino_skew",
        "events_stickiness",
        "events_calendar_heatmap",
        "events_lorenz_curve",
        "ml_roc_auc",
        "ml_pr_curve",
        "ml_ridge_two_feature",
        "graph_eigenvector_centrality",
        "text_skipgram_pmi",
        "interval_allen_profile",
        "stream_hll_dau",
        "stats_seasonality_strength",
        "stats_mood_median",
        "orders_revenue_gini_by_nation",
        "time_sax_words",
        "corpus_lang_rebalance",
        "text_self_repetition",
        "embedding_quantize_error_audit",
        "window_trix",
        "stats_quade",
        "events_markov_transitions",
        "customer_interpurchase_cv",
        "window_hull_ma",
        "events_peak_days",
        "window_dpo",
        "stats_bartels_rank",
        "stats_cusum_break",
        "text_novelty_saturation",
        "stats_acf_table",
        "text_stopword_profile",
        "events_weekend_lift",
    }
)


def _record_staleness(name: str) -> int:
    """0 = never officially driver-sampled (front of the sweep),
    1 = this round's explicit stale rotation, 2 = new this round
    (behind the rotation -- see _FRESH_THIS_ROUND), else 2 + the
    round whose sweep last recorded the name (lower = staler)."""
    if name in _FRESH_THIS_ROUND:
        return 2
    if name not in LATEST_VERDICT:
        return 0
    if name in STALE_ROTATION:
        return 1
    return 2 + LATEST_VERDICT[name]


def _prioritize_unrecorded() -> None:
    """Stable-partition the registry by record staleness (module
    docstring policy). Original relative order kept within tiers."""
    ordered = sorted(
        _REGISTRY.items(),
        key=lambda kv: (
            _record_staleness(kv[0]),
            1 if kv[1].oracle is None else 0,
        ),
    )
    _REGISTRY.clear()
    _REGISTRY.update(ordered)


_prioritize_unrecorded()
