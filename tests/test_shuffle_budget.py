"""Shuffle-volume regression gate over the committed census.

``explain_report.py`` executes every batch query at sf0.001 (the
script default -- PLANS.json records its sf_dir) and records measured
shuffle-write bytes per query (completed-stage deltas from the Spark
UI REST API) into ``PLANS.json``.  Node-count pins in
test_plan_shape.py catch *structural* regressions (a new Exchange);
this gate catches *quantitative* ones -- the same plan shape suddenly
shuffling 10x the bytes (a dropped projection before an exchange, a
pre-aggregation that stopped combining, a salt fan-out that widened).

The ceilings below are ~1.5x the round-6 measured values for the
heaviest shufflers, so normal jitter passes while a real regression
(shuffle volume scales linearly with SF, so +50% at sf0.001 means
+50% at 100 TB) fails loudly.  Regenerate the census with
``python explain_report.py`` after intentional plan changes and
re-pin.
"""

import json
import pathlib

PLANS = pathlib.Path(__file__).resolve().parent.parent / "PLANS.json"

#: bytes ceiling per query: ~1.5x the round-6 FINAL census at sf0.001
#: (the MinHash signature kernel halved the sketch family's shuffles
#: mid-round; graph_common_neighbors' entry re-measured after the
#: decorator fix -- the earlier 142 KB figure was the BROKEN bare
#: edge list). quality_dup_ngram_frac's 1.35 MB is the instance
#: stream meeting the vocab-keyed df join -- linear in corpus, by
#: design the family's heaviest.
HEAVY_CEILINGS = {
    # round 9: the near-dup component triage report shares the pair
    # generation of dedup_cluster_components and adds two keyed
    # rollups (measured 952 KB at sf0.001)
    "graph_component_stats": 1_450_000,
    "quality_dup_ngram_frac": 2_050_000,
    "dedup_embedding_lsh": 1_700_000,
    "dedup_incremental_apply": 1_060_000,
    "ml_naive_bayes_confusion": 990_000,
    # round 7 doubled the op by design: batch2 now probes BOTH the
    # appended index and a from-scratch referee index so the append
    # invariant ships as oracle-checkable data (measured 1.37 MB)
    "dedup_index_append": 2_060_000,
    "dedup_ngram_jaccard_capped": 960_000,
    "graph_kcore": 890_000,
    "dedup_minhash_clusters": 840_000,
    "dedup_minhash": 830_000,
    "graph_common_neighbors": 780_000,
    "graph_pagerank": 790_000,
    # round 9 batch 3: shares common_neighbors' wedge skeleton plus
    # a distinct on the wedge pairs (measured 361 KB at sf0.001)
    "graph_preferential_attachment": 550_000,
    # round 9 batch 5: adamic_adar's skeleton with 1e6/deg credits
    # (measured 476 KB at sf0.001)
    "graph_resource_allocation": 720_000,
    "graph_label_propagation": 760_000,
    "graph_clustering_coeff": 550_000,
    # former heavy-listers, ceilings retained
    "basket_lift_topk": 3_700_000,
    "join_skew_salted": 3_500_000,
    "join_asof_ttl": 1_350_000,
    "join_asof": 1_270_000,
    "join_asof_nearest": 1_000_000,
}

#: whole-registry ceiling (round-6 final total 20.3 MB at sf0.001
#: over 274 batch plans; ~2x headroom for future rounds -- bump
#: deliberately, not by drift).
TOTAL_CEILING = 40_000_000


def _census():
    return json.loads(PLANS.read_text())


def test_census_has_measured_shuffle_volumes():
    p = _census()
    assert p["totals"].get("errors", 1) == 0
    with_bytes = [
        n for n, c in p["plans"].items() if "shuffle_write_bytes" in c
    ]
    # every successfully-planned batch query carries a measurement
    assert len(with_bytes) == p["totals"]["queries"]


def test_heaviest_shuffles_within_budget():
    plans = _census()["plans"]
    over = {
        name: (plans[name]["shuffle_write_bytes"], limit)
        for name, limit in HEAVY_CEILINGS.items()
        if name in plans and plans[name]["shuffle_write_bytes"] > limit
    }
    assert not over, f"shuffle budget exceeded (measured, ceiling): {over}"


def test_total_shuffle_within_budget():
    totals = _census()["totals"]
    assert totals["shuffle_write_bytes"] <= TOTAL_CEILING, (
        f"registry-wide shuffle write {totals['shuffle_write_bytes']} "
        f"exceeds {TOTAL_CEILING}; find the regressing query in "
        "PLANS.json heaviest_shuffles before bumping this ceiling"
    )
