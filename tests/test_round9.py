"""Engine-local semantics tests for the round-9 operators: each pins
the operator's math on a crafted input against a hand- or
numpy-computed reference (the DuckDB oracle sweep covers fixture
parity; these cover the SEMANTICS on inputs chosen to exercise the
edges -- ties, planted outliers, brightness shifts, clipping
boundaries)."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from java_mapreduce_framework_spark.operators import (
    analytics,
    multimodal,
    similarity,
    temporal,
    text,
)


def _events(spark, rows):
    """rows: (event_id, iso_ts, user_id, event_type, value)"""
    return spark.createDataFrame(
        [
            (
                i,
                datetime.datetime.fromisoformat(ts),
                u,
                t,
                float(v),
                "{}",
            )
            for (i, ts, u, t, v) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


# ------------------------------------------------------------- stats


def test_chisq_independence_uniform_table_is_zero(spark):
    # perfectly proportional table -> every cell's contribution 0
    rows = []
    i = 0
    for day, dow_type_counts in (("2024-01-01", 2), ("2024-01-02", 4)):
        for t, reps in (("a", dow_type_counts), ("b", 2 * dow_type_counts)):
            for _ in range(reps):
                rows.append((i, f"{day}T10:00:00", 1, t, 1.0))
                i += 1
    out = analytics.chisq_independence(_events(spark, rows)).collect()
    assert len(out) == 4
    assert all(r["chi2_micro"] == 0 for r in out)
    v = analytics.cramers_v(_events(spark, rows)).collect()[0]
    assert v["cramers_v"] == 0.0 and v["dof"] == 1


def test_kendall_tau_monotone_series(spark):
    # strictly increasing counts AND cent-sums day over day -> tau 1
    rows = []
    i = 0
    for d in range(5):
        for k in range(d + 1):  # day d has d+1 events
            rows.append((i, f"2024-01-0{d+1}T09:00:00", 1, "a", 10.0))
            i += 1
    out = analytics.kendall_tau_daily(_events(spark, rows)).collect()[0]
    assert out["n_days"] == 5
    assert out["n_discordant"] == 0
    assert out["tau_b"] == 1.0


def test_theil_sen_exact_line(spark):
    # y = 3 per day steps: counts 2,5,8,11 -> slope exactly 3
    rows = []
    i = 0
    for d, cnt in enumerate((2, 5, 8, 11)):
        for _ in range(cnt):
            rows.append((i, f"2024-01-0{d+1}T09:00:00", 1, "a", 1.0))
            i += 1
    out = analytics.theil_sen_daily(_events(spark, rows)).collect()[0]
    assert out["slope_per_day"] == 3.0
    assert out["n_pairs"] == 6


def test_grubbs_flags_planted_outlier(spark):
    rows = []
    i = 0
    counts = [10, 10, 10, 10, 50]  # day 5 is the spike
    for d, cnt in enumerate(counts):
        for _ in range(cnt):
            rows.append((i, f"2024-01-0{d+1}T09:00:00", 1, "a", 1.0))
            i += 1
    out = analytics.grubbs_daily(_events(spark, rows)).collect()[0]
    assert out["suspect_day"].day == 5
    n, s = 5, sum(counts)
    ssq = sum(c * c for c in counts)
    g = abs(n * 50 - s) / math.sqrt(n * (n * ssq - s * s) / (n - 1))
    assert abs(out["g_stat"] - round(g, 4)) < 1e-9


def test_wilcoxon_signed_rank_symmetric_is_zero_z(spark):
    # users 1/2 gain what users 3/4 lose, same magnitudes -> W+ == W-
    rows = [
        (0, "2024-01-05T09:00:00", 1, "a", 1.0),
        (1, "2024-01-20T09:00:00", 1, "a", 2.0),  # d = +100
        (2, "2024-01-05T09:00:00", 2, "a", 1.0),
        (3, "2024-01-20T09:00:00", 2, "a", 3.0),  # d = +200
        (4, "2024-01-05T09:00:00", 3, "a", 2.0),
        (5, "2024-01-20T09:00:00", 3, "a", 1.0),  # d = -100
        (6, "2024-01-05T09:00:00", 4, "a", 3.0),
        (7, "2024-01-20T09:00:00", 4, "a", 1.0),  # d = -200
    ]
    out = analytics.wilcoxon_signed_rank(_events(spark, rows)).collect()[0]
    assert out["n_pairs"] == 4
    assert out["w_plus2"] == out["w_minus2"]
    assert out["z_stat"] == 0.0
    # doubled midranks: |100| ties (rank2 = 2+2+... ) stay integral
    assert out["w_plus2"] + out["w_minus2"] == 4 * (4 + 1)


def test_ljung_box_alternating_series_negative_lag1(spark):
    # strict alternation -> lag-1 autocorrelation strongly negative
    rows = []
    i = 0
    for d in range(10):
        cnt = 20 if d % 2 == 0 else 5
        for _ in range(cnt):
            rows.append((i, f"2024-01-{d+1:02d}T09:00:00", 1, "a", 1.0))
            i += 1
    out = {r["lag"]: r for r in analytics.ljung_box_daily(_events(spark, rows)).collect()}
    assert len(out) == 7
    assert out[1]["autocorr"] < -0.5
    # Q is cumulative and non-decreasing in lag
    qs = [out[k]["q_cumulative"] for k in range(1, 8)]
    assert all(qs[i] <= qs[i + 1] + 1e-9 for i in range(6))


# ------------------------------------------------- product analytics


def test_session_bounce_counts_single_event_sessions(spark):
    rows = [
        # user 1: two events 5 min apart -> ONE session, not a bounce
        (0, "2024-01-01T09:00:00", 1, "a", 1.0),
        (1, "2024-01-01T09:05:00", 1, "a", 1.0),
        # user 1: isolated event 3 h later -> bounce
        (2, "2024-01-01T12:30:00", 1, "a", 1.0),
        # user 2: isolated -> bounce
        (3, "2024-01-01T10:00:00", 2, "a", 1.0),
    ]
    out = analytics.session_bounce(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_sessions"] == 3 and r["n_bounces"] == 2
    assert r["bounce_rate"] == round(2 / 3, 4)


def test_power_user_curve_cumulative(spark):
    rows = [
        (0, "2024-01-01T09:00:00", 1, "a", 1.0),  # user 1: 1 day
        (1, "2024-01-01T09:00:00", 2, "a", 1.0),  # user 2: 2 days
        (2, "2024-01-02T09:00:00", 2, "a", 1.0),
        (3, "2024-01-01T09:00:00", 3, "a", 1.0),  # user 3: 2 days
        (4, "2024-01-03T09:00:00", 3, "a", 1.0),
    ]
    out = {r["active_days"]: r for r in analytics.power_user_curve(_events(spark, rows)).collect()}
    assert out[2]["n_users"] == 2 and out[2]["n_users_at_least"] == 2
    assert out[1]["n_users"] == 1 and out[1]["n_users_at_least"] == 3


def test_churn_hazard_suffix_at_risk(spark):
    rows = [
        # user 1: span 0 days -> week 0
        (0, "2024-01-01T09:00:00", 1, "a", 1.0),
        # user 2: span 10 days -> week 1
        (1, "2024-01-01T09:00:00", 2, "a", 1.0),
        (2, "2024-01-11T09:00:00", 2, "a", 1.0),
        # user 3: span 15 days -> week 2
        (3, "2024-01-01T09:00:00", 3, "a", 1.0),
        (4, "2024-01-16T09:00:00", 3, "a", 1.0),
    ]
    out = {r["tenure_week"]: r for r in analytics.churn_hazard(_events(spark, rows)).collect()}
    assert out[0]["n_at_risk"] == 3 and out[0]["hazard"] == round(1 / 3, 4)
    assert out[1]["n_at_risk"] == 2
    assert out[2]["n_at_risk"] == 1 and out[2]["hazard"] == 1.0


def test_changepoint_finds_level_shift(spark):
    rows = []
    i = 0
    counts = [5, 5, 5, 5, 20, 20, 20, 20]
    for d, cnt in enumerate(counts):
        for _ in range(cnt):
            rows.append((i, f"2024-01-0{d+1}T09:00:00", 1, "a", 1.0))
            i += 1
    out = analytics.changepoint_binary(_events(spark, rows)).collect()[0]
    assert out["split_day"].day == 5  # first day of the right segment
    assert out["sse_split"] == 0.0 and out["rel_drop"] == 1.0


# --------------------------------------------- technical indicators


def _one_user_daily(spark, closes):
    rows = [
        (i, f"2024-01-{i+1:02d}T09:00:00", 1, "a", float(v))
        for i, v in enumerate(closes)
    ]
    return _events(spark, rows)


def test_macd_matches_local_ewma(spark):
    closes = [10.0, 12.0, 11.0, 15.0, 14.0, 13.0, 18.0]
    out = sorted(
        temporal.window_macd(_one_user_daily(spark, closes)).collect(),
        key=lambda r: r["day"],
    )
    cents = [int(c * 100) for c in closes]

    def ewma(vals, decay):
        num = sum(v * decay**e for e, v in zip(range(len(vals) - 1, -1, -1), vals))
        den = (1.0 - decay ** len(vals)) / (1.0 - decay)
        return num / den

    for t, r in enumerate(out):
        f = ewma(cents[max(0, t - 11) : t + 1], 0.75)
        s = ewma(cents[max(0, t - 17) : t + 1], 0.875)
        assert abs(r["macd"] - round((f - s) / 100.0, 6)) < 1e-9


def test_stochastic_bounds_and_flat_range_null(spark):
    closes = [10.0, 10.0, 10.0, 20.0, 5.0]
    out = sorted(
        temporal.window_stochastic(_one_user_daily(spark, closes)).collect(),
        key=lambda r: r["day"],
    )
    # flat opening range -> NULL %K
    assert out[0]["pct_k"] is None and out[1]["pct_k"] is None
    # day 4: close=high of window -> 100; day 5: close=low -> 0
    assert out[3]["pct_k"] == 100.0
    assert out[4]["pct_k"] == 0.0
    assert out[4]["pct_d"] is None  # a NULL lag poisons the 3-term mean


def test_atr_true_range_gaps(spark):
    # single event per day -> high=low=close; TR = |close - prev_close|
    closes = [10.0, 13.0, 7.0]
    out = sorted(
        temporal.window_atr(_one_user_daily(spark, closes)).collect(),
        key=lambda r: r["day"],
    )
    assert [r["true_range_c"] for r in out] == [0, 300, 600]
    assert out[2]["atr"] == round((0 + 300 + 600) / 3 / 100.0, 6)


# ------------------------------------------------------ text / LM


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_hapax_ratio_counts(spark):
    docs = _docs(spark, ["a b a c", "b d"])
    out = text.hapax_ratio(docs).collect()[0]
    # counts: a=2 b=2 c=1 d=1 -> vocab 4, hapax 2
    assert out["vocab_size"] == 4 and out["n_hapax"] == 2
    assert out["hapax_ratio"] == 0.5 and out["n_tokens"] == 6


def test_sentence_stats_segmentation(spark):
    docs = _docs(spark, ["One two. Three!! Four five six?", "nopunct here"])
    out = {r["doc_id"]: r for r in text.sentence_stats(docs).collect()}
    assert out[0]["n_sentences"] == 3
    assert out[0]["avg_sentence_tokens"] == 2.0  # 6 tokens / 3 sentences
    assert out[0]["max_sentence_chars"] == len("Four five six")
    assert out[1]["n_sentences"] == 1


def test_sentence_dedup_first_occurrence_wins(spark):
    docs = _docs(
        spark,
        [
            "Common boilerplate. Unique alpha.",
            "Common boilerplate. Unique beta.",
            "COMMON BOILERPLATE.",  # case-folded dup
        ],
    )
    out = {r["doc_id"]: r for r in text.sentence_dedup(docs).collect()}
    assert out[0]["n_duplicate"] == 0
    assert out[1]["n_duplicate"] == 1
    assert out[2]["n_duplicate"] == 1


def test_good_turing_adjusted_counts(spark):
    # counts: a=3; b,c=2; d,e,f,g=1  -> N1=4, N2=2, N3=1
    docs = _docs(spark, ["a a a b b c c d e f g"])
    out = {r["r"]: r for r in text.good_turing_counts(docs).collect()}
    assert out[1]["n_r"] == 4 and out[2]["n_r"] == 2 and out[3]["n_r"] == 1
    assert out[1]["r_star"] == round(2 * 2 / 4, 4)  # (r+1) N2/N1
    assert out[2]["r_star"] == round(3 * 1 / 2, 4)
    assert out[3]["r_star"] is None  # no N4 -> NULL, not a fabricated 0


# -------------------------------------------------------- embeddings


def test_embedding_dim_stats_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    X = rng.normal(size=(40, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]], 0) for i in range(40)],
        "vec_id long, embedding array<double>, label int",
    )
    out = {r["dim"]: r for r in similarity.embedding_dim_stats(df).collect()}
    for d in range(6):
        assert out[d]["n_vecs"] == 40
        assert abs(out[d]["mean_v"] - X[:, d].mean()) < 1e-6
        assert abs(out[d]["std_v"] - X[:, d].std()) < 1e-6
        assert out[d]["min_v"] == round(float(X[:, d].min()), 6)
        assert out[d]["max_v"] == round(float(X[:, d].max()), 6)


# -------------------------------------------------------- multimodal


def test_dhash_brightness_shift_invariance(spark):
    import numpy as np

    from java_mapreduce_framework_spark.operators.multimodal import encode_bmp

    rng = np.random.default_rng(3)
    px = rng.integers(20, 200, size=(12, 11, 3), dtype=np.uint8)
    shifted = np.clip(px.astype(np.int32) + 30, 0, 255).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px))), (2, bytearray(encode_bmp(shifted)))],
        "doc_id long, payload binary",
    )
    out = multimodal.image_dhash(df).collect()
    # a uniform brightness shift preserves every horizontal gradient
    # sign -> both images land in ONE perceptual class
    assert len(out) == 1 and out[0]["n_copies"] == 2


def test_audio_clipping_exact_counts(spark):
    import numpy as np

    from java_mapreduce_framework_spark.operators.multimodal import encode_wav

    s = np.array([0, 1000, -16384, 16383, 20000, -24000], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, 16000)))], "doc_id long, payload binary"
    )
    out = multimodal.audio_clipping(df).collect()[0]
    assert out["n_samples"] == 6
    assert out["n_clipped"] == 3  # -16384 (boundary, >=), 20000, -24000
    assert out["peak_abs"] == 24000
    assert out["clip_frac"] == round(3 * 1e6 / 6) / 1e6


# ------------------------------------------------------------ batch 2


def test_new_vs_returning_split(spark):
    rows = [
        (0, "2024-01-01T09:00:00", 1, "a", 1.0),
        (1, "2024-01-02T09:00:00", 1, "a", 1.0),  # returning
        (2, "2024-01-02T09:00:00", 2, "a", 1.0),  # new on day 2
    ]
    out = {r["day"].day: r for r in analytics.new_vs_returning(_events(spark, rows)).collect()}
    assert out[1]["n_new"] == 1 and out[1]["n_returning"] == 0
    assert out[2]["n_new"] == 1 and out[2]["n_returning"] == 1
    assert out[2]["new_share"] == 0.5


def test_value_pareto_shares_sum_to_one(spark):
    rows = [
        (i, "2024-01-01T09:00:00", u, "a", float(v))
        for i, (u, v) in enumerate(
            [(1, 80.0), (2, 10.0), (3, 5.0), (4, 3.0), (5, 2.0)]
        )
    ]
    out = sorted(
        analytics.value_pareto(_events(spark, rows), buckets=5).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["n_users"] for r in out] == [1, 1, 1, 1, 1]
    assert out[0]["share"] == 0.8  # top user carries 80%
    assert out[-1]["cum_share"] == 1.0
    # cum_share non-decreasing
    cs = [r["cum_share"] for r in out]
    assert cs == sorted(cs)


def test_type_share_trend_deltas(spark):
    rows = [
        (0, "2024-01-01T09:00:00", 1, "a", 1.0),
        (1, "2024-01-01T10:00:00", 1, "b", 1.0),
        (2, "2024-01-02T09:00:00", 1, "a", 1.0),
        (3, "2024-01-02T10:00:00", 1, "a", 1.0),
        (4, "2024-01-02T11:00:00", 1, "b", 1.0),
        (5, "2024-01-02T12:00:00", 1, "b", 1.0),
    ]
    out = {(r["day"].day, r["event_type"]): r
           for r in analytics.type_share_trend(_events(spark, rows)).collect()}
    assert out[(1, "a")]["share"] == 0.5
    assert out[(2, "a")]["share"] == 0.5
    assert out[(2, "a")]["share_delta"] == 0.0
    assert out[(1, "a")]["share_delta"] is None  # no prior day


def test_dp_randomized_response_debias_recovers_under_full_truth(spark):
    # p_truth = 1.0 -> reported == true, estimator reduces to the rate
    rows = [
        (i, "2024-01-01T09:00:00", 1, "a", 100.0 if i < 3 else 0.0)
        for i in range(10)
    ]
    out = analytics.dp_randomized_response(
        _events(spark, rows), p_truth=1.0
    ).collect()[0]
    assert out["n_reported"] == 3
    assert out["est_true_rate"] == out["reported_rate"] == 0.3


def test_repeat_interval_exact_gaps(spark):
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 10.0, datetime.datetime(1995, 1, 1), "1-URGENT"),
            (2, 1, "O", 10.0, datetime.datetime(1995, 1, 11), "1-URGENT"),
            (3, 1, "O", 10.0, datetime.datetime(1995, 1, 31), "1-URGENT"),
            (4, 2, "O", 10.0, datetime.datetime(1995, 2, 1), "1-URGENT"),
            (5, 2, "O", 10.0, datetime.datetime(1995, 2, 4), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = analytics.repeat_interval(orders).collect()[0]
    # gaps: 10, 20 (cust 1), 3 (cust 2)
    assert out["n_gaps"] == 3
    assert out["mean_gap_days"] == 11.0
    assert out["p50_gap_days"] == 10.0
    assert out["p90_gap_days"] == 18.0  # (n-1)*q = 1.8 -> 10 + 0.8*10


def test_bigram_entropy_deterministic_context_is_zero(spark):
    # "a b a b a b": context 'a' always -> 'b' (H=0); 'b' always -> 'a'
    docs = _docs(spark, ["a b a b a b"])
    out = {r["w1"]: r for r in text.bigram_entropy_rate(docs).collect()}
    assert out["a"]["h_micro"] == 0 and out["a"]["entropy_nats"] == 0.0
    assert out["a"]["n_successors"] == 1
    # two equally likely successors -> ln 2
    docs2 = _docs(spark, ["c x c y c x c y"])
    out2 = {r["w1"]: r for r in text.bigram_entropy_rate(docs2).collect()}
    assert abs(out2["c"]["entropy_nats"] - round(math.log(2), 6)) < 1e-5


def test_case_profile_counts(spark):
    docs = _docs(spark, ["Ab3 XY!"])
    out = text.case_profile(docs).collect()[0]
    assert out["n_upper"] == 3 and out["n_digit"] == 1 and out["n_alpha"] == 4
    assert out["upper_ratio"] == 0.75
    assert out["starts_capital"] == 1


def test_vocab_growth_curve_cumulative(spark):
    docs = _docs(spark, ["a b", "b c", "a d e"])
    out = {r["doc_id"]: r for r in text.vocab_growth_curve(docs).collect()}
    assert out[0]["n_new_words"] == 2 and out[0]["cum_vocab"] == 2
    assert out[1]["n_new_words"] == 1 and out[1]["cum_vocab"] == 3
    assert out[2]["n_new_words"] == 2 and out[2]["cum_vocab"] == 5


def test_dim_clip_bounds_match_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    X = rng.normal(size=(200, 4))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]], 0) for i in range(200)],
        "vec_id long, embedding array<double>, label int",
    )
    out = {}
    for r in similarity.embedding_dim_clip_bounds(df).collect():
        out[(r["dim"], r["q_idx"])] = r["bound"]
    for d in range(4):
        lo = np.quantile(X[:, d], 0.01)  # numpy 'linear' == quantile_cont
        hi = np.quantile(X[:, d], 0.99)
        assert abs(out[(d, 0)] - lo) < 1e-6
        assert abs(out[(d, 1)] - hi) < 1e-6


def test_audio_silence_endpoints(spark):
    import numpy as np

    from java_mapreduce_framework_spark.operators.multimodal import encode_wav

    s = np.array([0, 100, 20000, 0, -30000, 50, 60], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, 16000)))], "doc_id long, payload binary"
    )
    out = multimodal.audio_silence(df).collect()[0]
    assert out["lead_silence"] == 2  # samples 0,100 below 8192
    assert out["trail_silence"] == 2  # 50, 60
    assert out["n_silent"] == 5
