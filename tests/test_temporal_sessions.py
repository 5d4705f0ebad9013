import datetime

from pyspark.sql import functions as F

from java_mapreduce_framework_spark.operators.temporal import (
    session_stats,
    session_window_agg,
    sessionize,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2026, 1, 1, 0, m, s), u)
            for i, (u, m, s) in enumerate(rows)
        ],
        ["event_id", "ts", "user_id"],
    )


def test_session_window_matches_lag_construction(spark):
    # user A: events at 0:00, 0:10, 1:00 -> sessions {0:00,0:10}, {1:00}
    ev = _events(spark, [("A", 0, 0), ("A", 10, 0), ("A", 59, 59), ("B", 5, 0)])
    got = {
        (r["user_id"], r["n_events"]): (r["session_start"], r["session_end"])
        for r in session_window_agg(ev).collect()
    }
    assert (("A", 2) in got) and (("A", 1) in got) and (("B", 1) in got)


def test_session_window_boundary_exactly_gap_merges(spark):
    # events exactly 30 minutes apart: session_window merges them
    # (closed gap boundary) -- identical to lag-based sessionize's
    # strict-> new-session rule, so the two constructions agree
    ev = _events(spark, [("A", 0, 0), ("A", 30, 0)])
    assert session_window_agg(ev).count() == 1
    assert sessionize(ev).select("session_id").distinct().count() == 1
    # one second past the gap: both split
    ev2 = _events(spark, [("A", 0, 0), ("A", 30, 1)])
    assert session_window_agg(ev2).count() == 2
    assert sessionize(ev2).select("session_id").distinct().count() == 2


def test_session_stats_no_selfjoin_matches_sessionize(spark, sf_small):
    from java_mapreduce_framework_spark.sources.tables import load_table

    events = load_table(spark, sf_small, "events")
    stats = session_stats(events)
    s = sessionize(events)
    # every (user, session) in sessionize appears once in stats and
    # event counts agree in total
    assert stats.count() == s.select("user_id", "session_id").distinct().count()
    assert (
        stats.groupBy().sum("n_events").collect()[0][0] == events.count()
    )


def test_stream_dedup_state_equals_batch(spark, sf_small):
    from java_mapreduce_framework_spark.operators.dedup import dedup_exact
    from java_mapreduce_framework_spark.sources.tables import load_table
    from java_mapreduce_framework_spark.streaming.jobs import stream_dedup_state

    batch = {
        r["content_hash"]: (r["keep_doc_id"], r["n_copies"])
        for r in dedup_exact(load_table(spark, sf_small, "documents")).collect()
    }
    streamed = {
        r["content_hash"]: (r["keep_doc_id"], r["n_copies"])
        for r in stream_dedup_state(spark, sf_small).collect()
    }
    assert streamed == batch


def test_stream_sessionize_equals_batch(spark, sf_small):
    from java_mapreduce_framework_spark.sources.tables import load_table
    from java_mapreduce_framework_spark.streaming.jobs import stream_sessionize

    events = load_table(spark, sf_small, "events")
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_window_agg(events).collect()
    }
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in stream_sessionize(spark, sf_small).collect()
    }
    assert streamed == batch


def test_sliding_window_each_event_in_two_windows(spark):
    from java_mapreduce_framework_spark.operators.temporal import sliding_window_agg

    ev = _events(spark, [("A", 15, 0)])
    ev = ev.withColumn("event_type", ev.user_id).withColumn("value", ev.event_id * 1.0)
    out = sliding_window_agg(ev).collect()
    # one event, 1h windows hopping 30min -> exactly 2 covering windows
    assert len(out) == 2
    assert all(r["n_events"] == 1 for r in out)


def test_percentile_stats_interpolates(spark):
    import datetime

    from java_mapreduce_framework_spark.operators.temporal import percentile_stats

    rows = [(i, datetime.datetime(2026, 1, 1), "t", float(v)) for i, v in enumerate([0, 10, 20, 30])]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    r = percentile_stats(ev).collect()[0]
    assert r["p50"] == 15.0  # continuous interpolation between 10 and 20
    assert r["p100"] == 30.0


def test_join_asof_semantics(spark):
    import datetime

    from java_mapreduce_framework_spark.operators.temporal import join_asof

    d = datetime.datetime
    events = spark.createDataFrame(
        [
            (1, d(2026, 1, 1, 9), 7),   # before any order -> null
            (2, d(2026, 1, 1, 10), 7),  # exactly at order A -> A (>= semantics)
            (3, d(2026, 1, 1, 13), 7),  # after A and B -> B (latest)
            (4, d(2026, 1, 1, 13), 8),  # other user, no orders -> null
        ],
        ["event_id", "ts", "user_id"],
    )
    orders = spark.createDataFrame(
        [
            (100, 7, d(2026, 1, 1, 10), 10.0),  # A
            (101, 7, d(2026, 1, 1, 12), 20.0),  # B
        ],
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    out = {r["event_id"]: r["o_orderkey"] for r in join_asof(events, orders).collect()}
    assert out == {1: None, 2: 100, 3: 101, 4: None}


def test_join_asof_tie_on_order_time_is_deterministic(spark):
    import datetime

    from java_mapreduce_framework_spark.operators.temporal import join_asof

    d = datetime.datetime
    events = spark.createDataFrame([(1, d(2026, 1, 2), 7)], ["event_id", "ts", "user_id"])
    orders = spark.createDataFrame(
        [(100, 7, d(2026, 1, 1), 1.0), (200, 7, d(2026, 1, 1), 2.0)],
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    # two orders at the same instant: highest o_orderkey wins, always
    out = join_asof(events, orders).collect()[0]
    assert out["o_orderkey"] == 200 and out["o_totalprice"] == 2.0


def test_join_range_banded_catches_bucket_straddle(spark):
    import datetime

    from java_mapreduce_framework_spark.operators.temporal import join_range_banded

    d = datetime.datetime
    # 00:59 and 01:58 sit in adjacent 60s buckets, 59s apart -> pair;
    # 03:00 and 04:01 are 61s apart -> no pair
    ev = spark.createDataFrame(
        [
            (1, d(2026, 1, 1, 0, 0, 59), 7),
            (2, d(2026, 1, 1, 0, 1, 58), 7),
            (3, d(2026, 1, 1, 0, 3, 0), 7),
            (4, d(2026, 1, 1, 0, 4, 1), 7),
            (5, d(2026, 1, 1, 0, 1, 0), 8),  # other user, in range of 1-2 by time
        ],
        ["event_id", "ts", "user_id"],
    )
    pairs = {(r["eid_a"], r["eid_b"]): r["dt_s"] for r in join_range_banded(ev).collect()}
    assert pairs == {(1, 2): 59}


def test_pivot_event_counts_stable_schema(spark):
    import datetime

    from java_mapreduce_framework_spark.operators.relational import pivot_event_counts

    ev = spark.createDataFrame(
        [(1, datetime.datetime(2026, 1, 1), 7, "click", 1.0)],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = pivot_event_counts(ev)
    # absent types still present as zero-filled columns (stable schema)
    assert out.columns == ["user_id", "n_click", "n_error", "n_purchase", "n_signup", "n_view"]
    r = out.collect()[0]
    assert r["n_click"] == 1 and r["n_view"] == 0


def test_approx_percentile_within_error_of_exact(spark, sf_small):
    from java_mapreduce_framework_spark.operators.temporal import (
        approx_percentile_stats,
        percentile_stats,
    )
    from java_mapreduce_framework_spark.sources.tables import load_table

    events = load_table(spark, sf_small, "events")
    exact = {r["event_type"]: r for r in percentile_stats(events).collect()}
    approx = {r["event_type"]: r for r in approx_percentile_stats(events).collect()}
    assert set(exact) == set(approx)
    for t in exact:
        spread = exact[t]["p100"] or 1.0
        assert abs(exact[t]["p50"] - approx[t]["p50"]) <= 0.05 * abs(spread)
        assert abs(exact[t]["p95"] - approx[t]["p95"]) <= 0.05 * abs(spread)
        assert exact[t]["p100"] == approx[t]["p100"]


def test_funnel_counts_monotone_nonincreasing(spark, sf_small):
    from java_mapreduce_framework_spark.operators.analytics import funnel_conversion
    from java_mapreduce_framework_spark.sources.tables import load_table

    rows = funnel_conversion(load_table(spark, sf_small, "events")).collect()
    by_stage = {r["stage"]: r["n_users"] for r in rows}
    ordered = [by_stage[s] for s in sorted(by_stage)]
    assert ordered == sorted(ordered, reverse=True)
    assert ordered[0] > 0


def test_transition_matrix_rows_normalize_and_count_exactly(spark):
    """Hand-built sequences: transitions counted per (cur, next) in
    (ts, event_id) order; each cur row's probabilities sum to 1."""
    import datetime

    from java_mapreduce_framework_spark.operators.temporal import (
        event_transition_matrix,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, u, typ):
        return (i, u, typ, t0 + datetime.timedelta(minutes=i), 1.0)

    rows = [
        ev(1, 1, "view"), ev(2, 1, "click"), ev(3, 1, "view"),
        ev(4, 2, "view"), ev(5, 2, "view"), ev(6, 2, "buy"),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value"]
    )
    out = {(r["cur_type"], r["next_type"]): (r["n_transitions"], r["p_next"])
           for r in event_transition_matrix(events).collect()}
    assert out[("view", "click")] == (1, 0.3333)
    assert out[("view", "view")] == (1, 0.3333)
    assert out[("view", "buy")] == (1, 0.3333)
    assert out[("click", "view")] == (1, 1.0)
    from collections import defaultdict

    by_cur = defaultdict(float)
    for (cur, _), (_, p) in out.items():
        by_cur[cur] += p
    for cur, total in by_cur.items():
        assert abs(total - 1.0) < 0.001, (cur, total)


def test_activity_streaks_islands(spark):
    """Planted calendar: user 1 has a 3-day run, a gap, then a 2-day
    run; user 2 has one active day. Streaks must be maximal runs."""
    import datetime as dt

    from java_mapreduce_framework_spark.operators import temporal

    def ts(day, hour=9):
        return dt.datetime(2024, 3, day, hour)

    rows = [
        # user 1: days 1,2,3 (two events on day 2), gap, days 6,7
        (1, 1, ts(1)), (2, 1, ts(2)), (3, 1, ts(2, 15)), (4, 1, ts(3)),
        (5, 1, ts(6)), (6, 1, ts(7)),
        # user 2: day 10 only
        (7, 2, ts(10)),
    ]
    events = spark.createDataFrame(
        [(e, t, u, "click", 1.0, None) for e, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        (r["user_id"], r["streak_start"].day): (r["streak_days"], r["streak_end"].day)
        for r in temporal.activity_streaks(events).collect()
    }
    assert got == {(1, 1): (3, 3), (1, 6): (2, 7), (2, 10): (1, 10)}


def test_window_time_decay_halves_per_day(spark):
    import datetime as dt

    from java_mapreduce_framework_spark.operators import temporal

    base = dt.datetime(2024, 6, 10)
    # user 1: 8.0 now, 8.0 one day earlier, 8.0 two days earlier
    rows = [(1, base, 8.0), (2, base - dt.timedelta(days=1), 8.0),
            (3, base - dt.timedelta(days=2), 8.0)]
    events = spark.createDataFrame(
        [(e, t, 1, "x", v, None) for e, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    [r] = temporal.window_time_decay(events).collect()
    assert r["n_events"] == 3
    assert abs(r["decayed_score"] - (8.0 + 4.0 + 2.0)) < 1e-6
    assert r["last_ts"] == base


def test_cdc_scd2_intervals_chain(spark):
    import datetime as dt

    from java_mapreduce_framework_spark.operators import temporal

    t = lambda m: dt.datetime(2024, 6, 10, 12, m)  # noqa: E731
    events = spark.createDataFrame(
        [(1, t(0), 7, "x", 1.0, None), (2, t(5), 7, "x", 2.0, None),
         (3, t(9), 7, "x", 3.0, None), (4, t(1), 8, "x", 9.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    rows = sorted(
        temporal.cdc_scd2(events).collect(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    u7 = [r for r in rows if r["user_id"] == 7]
    # intervals chain: each valid_to == next valid_from, last open
    assert [r["valid_to"] for r in u7] == [t(5), t(9), None]
    assert [r["is_current"] for r in u7] == [False, False, True]
    [u8] = [r for r in rows if r["user_id"] == 8]
    assert u8["is_current"] and u8["valid_to"] is None


def test_attribution_last_touch_credits_latest_prior(spark):
    import datetime as dt

    from java_mapreduce_framework_spark.operators import temporal

    t = lambda m: dt.datetime(2024, 6, 10, 12, m)  # noqa: E731
    events = spark.createDataFrame(
        [
            (1, t(0), 7, "view", 0.0, None),
            (2, t(2), 7, "click", 0.0, None),
            (3, t(3), 7, "purchase", 9.0, None),   # -> click
            (4, t(4), 7, "purchase", 5.0, None),   # -> still click (purchases don't attribute)
            (5, t(1), 8, "purchase", 1.0, None),   # no prior touch -> NULL
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {r["event_id"]: (r["attributed_type"], r["attributed_ts"])
           for r in temporal.attribution_last_touch(events).collect()}
    assert got[3] == ("click", t(2))
    assert got[4] == ("click", t(2))
    assert got[5] == (None, None)


def test_snapshot_diff_added_changed_unchanged(spark):
    """User present only after t1 -> added; state replaced between
    cuts -> changed; untouched state -> absent from the diff."""
    from java_mapreduce_framework_spark.operators import temporal

    rows = [
        # user 1: state at t1 (eid 10), new latest before t2 (eid 11) -> changed
        (10, "2024-01-10 00:00:00", 1, "view", 1.0, "{}"),
        (11, "2024-01-20 00:00:00", 1, "buy", 2.0, "{}"),
        # user 2: only after t1 -> added
        (20, "2024-01-18 00:00:00", 2, "view", 3.0, "{}"),
        # user 3: unchanged since before t1 -> not emitted
        (30, "2024-01-05 00:00:00", 3, "click", 4.0, "{}"),
        # user 4: event after t2 must be invisible -> unchanged
        (40, "2024-01-12 00:00:00", 4, "view", 5.0, "{}"),
        (41, "2024-02-05 00:00:00", 4, "buy", 6.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["user_id"]: r for r in temporal.snapshot_diff(events).collect()}
    assert set(out) == {1, 2}
    assert out[1]["status"] == "changed" and out[1]["old_type"] == "view" and out[1]["new_type"] == "buy"
    assert out[2]["status"] == "added" and out[2]["old_type"] is None


def test_join_asof_nearest_picks_closer_side(spark):
    """Forward order wins when closer; backward wins otherwise; no
    orders -> NULLs survive."""
    from java_mapreduce_framework_spark.operators.temporal import join_asof_nearest

    events = spark.createDataFrame(
        [
            (1, "2024-01-10 00:00:00", 1, "view", 0.0, "{}"),  # nearer forward
            (2, "2024-01-02 00:00:00", 1, "view", 0.0, "{}"),  # nearer backward
            (3, "2024-01-05 00:00:00", 9, "view", 0.0, "{}"),  # no orders
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    orders = spark.createDataFrame(
        [
            (100, 1, "2024-01-01 00:00:00", 10.0),
            (200, 1, "2024-01-11 00:00:00", 20.0),
        ],
        "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    out = {r["event_id"]: r for r in join_asof_nearest(events, orders).collect()}
    assert out[1]["o_orderkey"] == 200 and out[1]["dist_us"] == 86400_000_000
    assert out[2]["o_orderkey"] == 100 and out[2]["dist_us"] == 86400_000_000
    assert out[3]["o_orderkey"] is None and out[3]["dist_us"] is None


def test_attribution_linear_credit_math(spark):
    """Hand-built stream: u1 has touches a,b then purchase P1 (1/2
    credit each), then touch c and purchase P2 (full credit to c),
    then trailing touch d (uncredited). u2 purchases with no prior
    touch (direct bucket -- no touch rows). Credits must sum to the
    number of touch-attributed purchases."""
    import datetime as dt

    from java_mapreduce_framework_spark.operators.temporal import attribution_linear

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        (1, 100, ts(0), "view"),
        (2, 100, ts(1), "click"),
        (3, 100, ts(2), "purchase"),
        (4, 100, ts(3), "click"),
        (5, 100, ts(4), "purchase"),
        (6, 100, ts(5), "view"),      # trailing, uncredited
        (7, 200, ts(0), "purchase"),  # direct, no touches
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    )
    got = {r["attributed_type"]: r for r in attribution_linear(events).collect()}
    assert set(got) == {"view", "click"}
    # view: 1 touch in P1's segment at 1/2 credit
    assert got["view"]["n_touches"] == 1
    assert abs(got["view"]["total_credit"] - 0.5) < 1e-9
    # click: 1/2 (P1) + 1.0 (P2)
    assert got["click"]["n_touches"] == 2
    assert abs(got["click"]["total_credit"] - 1.5) < 1e-9
    # total credit == purchases that had at least one touch (P1, P2)
    assert abs(sum(r["total_credit"] for r in got.values()) - 2.0) < 1e-9


def test_trend_regression_recovers_known_slope(spark):
    """A synthetic linear signal y = 2x + 5 must come back with slope
    ~2/hour, intercept ~5, r2 ~1; a constant signal has slope 0."""
    import datetime as dt

    from java_mapreduce_framework_spark.operators.temporal import (
        TREND_EPOCH,
        trend_regression,
    )

    base = dt.datetime.fromtimestamp(TREND_EPOCH, dt.timezone.utc).replace(
        tzinfo=None
    )
    rows = []
    for h in range(48):
        ts = base + dt.timedelta(hours=h)
        rows.append((h, 1, ts, "linear", 2.0 * h + 5.0))
        rows.append((1000 + h, 1, ts, "flat", 7.5))
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r["event_type"]: r for r in trend_regression(events).collect()}
    assert abs(got["linear"]["slope_per_hour"] - 2.0) < 1e-6
    assert abs(got["linear"]["intercept"] - 5.0) < 1e-3
    assert abs(got["linear"]["r2"] - 1.0) < 1e-6
    assert abs(got["flat"]["slope_per_hour"]) < 1e-9


def test_interval_merge_coalesces_overlaps(spark):
    import datetime as dt

    from java_mapreduce_framework_spark.operators.temporal import interval_merge

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    # user A: [0, 60], [30, 90] overlap -> one span [0, 90];
    #         [200, 260] separate. user B: touching [0,60],[60,120] fuse
    #         (start == running max end is NOT a gap: merge on touch).
    rows = [
        (1, base, "A", 60.0),
        (2, base + dt.timedelta(seconds=30), "A", 60.0),
        (3, base + dt.timedelta(seconds=200), "A", 60.0),
        (4, base, "B", 60.0),
        (5, base + dt.timedelta(seconds=60), "B", 60.0),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    got = {
        (r["user_id"], r["island"]): (r["n_events"], r["span_s"])
        for r in interval_merge(ev).collect()
    }
    assert got == {
        ("A", 1): (2, 90.0),
        ("A", 2): (1, 60.0),
        ("B", 1): (2, 120.0),
    }


def test_interval_merge_spans_cover_events(spark, sf_small):
    from java_mapreduce_framework_spark.operators.temporal import interval_merge
    from java_mapreduce_framework_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events")
    merged = interval_merge(ev)
    # island spans per user never overlap: end_i < start_{i+1}
    bad = (
        merged.alias("a")
        .join(merged.alias("b"), "user_id")
        .filter(F.expr("a.island + 1 = b.island AND a.span_end > b.span_start"))
        .count()
    )
    assert bad == 0
    assert merged.agg(F.sum("n_events")).collect()[0][0] == ev.count()


def test_interval_gaps_are_the_span_complement(spark):
    import datetime as dt

    from java_mapreduce_framework_spark.operators.temporal import interval_gaps

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    # user A spans: [0, 90] (two fused events) then [200, 260] then
    # [500, 560] -> gaps [90, 200] (110 s) and [260, 500] (240 s).
    # user B has one span -> no gaps.
    rows = [
        (1, base, "A", 60.0),
        (2, base + dt.timedelta(seconds=30), "A", 60.0),
        (3, base + dt.timedelta(seconds=200), "A", 60.0),
        (4, base + dt.timedelta(seconds=500), "A", 60.0),
        (5, base, "B", 60.0),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    got = sorted(
        (r["user_id"], r["gap_start"], r["gap_end"], r["gap_s"])
        for r in interval_gaps(ev).collect()
    )
    assert got == [
        ("A", base + dt.timedelta(seconds=90),
         base + dt.timedelta(seconds=200), 110.0),
        ("A", base + dt.timedelta(seconds=260),
         base + dt.timedelta(seconds=500), 240.0),
    ]


def test_interval_gaps_positive_and_count(spark, sf_small):
    from pyspark.sql import functions as F

    from java_mapreduce_framework_spark.operators.temporal import (
        interval_gaps,
        interval_merge,
    )
    from java_mapreduce_framework_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events")
    gaps = interval_gaps(ev)
    # strictly positive by island construction
    assert gaps.filter(F.col("gap_s") <= 0).count() == 0
    # exactly one gap between each consecutive span pair of a user
    n_gaps = gaps.count()
    per_user = interval_merge(ev).groupBy("user_id").count().collect()
    assert n_gaps == sum(r["count"] - 1 for r in per_user)


def test_window_ewma_matches_pandas_reference(spark):
    import datetime as dt

    import pandas as pd

    from java_mapreduce_framework_spark.operators.temporal import window_ewma

    base = dt.datetime(2026, 1, 1)
    vals = [2.0, 4.0, 8.0, 1.0, 3.0, 9.0, 27.0, 5.0]
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, v)
        for i, v in enumerate(vals)
    ] + [(100, base, 2, 7.0)]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    got = {
        r["event_id"]: r["ewma"] for r in window_ewma(ev).collect()
    }
    # groups shorter than the 24-lag truncation match pandas exactly
    ref = pd.Series(vals).ewm(alpha=0.25, adjust=True).mean()
    for i, want in enumerate(ref):
        assert abs(got[i] - want) < 1e-6, (i, got[i], want)
    assert got[100] == 7.0  # single-row frame: ewma == value


def test_scd2_pointintime_versions_and_unknown_member(spark):
    import datetime as dt

    from java_mapreduce_framework_spark.operators.temporal import (
        join_scd2_pointintime,
    )

    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        # user 1: versions v=1.0 at t10, v=2.0 at t20
        (1, t(10), 1, "signup", 1.0, "{}"),
        (2, t(20), 1, "signup", 2.0, "{}"),
        (3, t(5), 1, "purchase", 9.0, "{}"),   # before any version
        (4, t(15), 1, "purchase", 9.0, "{}"),  # inside v1
        (5, t(20), 1, "purchase", 9.0, "{}"),  # AT v2 start -> v2
        (6, t(99), 1, "purchase", 9.0, "{}"),  # open-ended v2
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        r["event_id"]: (r["dim_value"], r["version_from"])
        for r in join_scd2_pointintime(ev).collect()
    }
    assert got == {
        3: (None, None),
        4: (1.0, t(10)),
        5: (2.0, t(20)),
        6: (2.0, t(20)),
    }


def test_window_cusum_matches_sequential_recursion(spark, sf_small):
    """The prefix identity must equal the textbook sequential
    recursion S_i = max(0, S_{i-1} + d_i), replayed in exact integer
    micro-units per (user, type) stream."""
    from collections import defaultdict

    from java_mapreduce_framework_spark.operators.temporal import window_cusum
    from java_mapreduce_framework_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events")
    got = window_cusum(ev).collect()
    base = ev.select("event_id", "user_id", "event_type", "ts", "value").collect()
    import math

    # engine-identical floor(value*1e6) on the double product
    v_u = {r["event_id"]: math.floor(r["value"] * 1_000_000.0) for r in base}
    by_type = defaultdict(list)
    for r in base:
        by_type[r["event_type"]].append(v_u[r["event_id"]])
    mu = {ty: sum(vs) // len(vs) for ty, vs in by_type.items()}
    streams = defaultdict(list)
    for r in base:
        streams[(r["user_id"], r["event_type"])].append(r)
    want = {}
    for (u, ty), rs in streams.items():
        s = 0
        for r in sorted(rs, key=lambda x: (x["ts"], x["event_id"])):
            s = max(0, s + v_u[r["event_id"]] - mu[ty])
            want[r["event_id"]] = s
    for r in got:
        assert r["cusum"] == want[r["event_id"]] / 1_000_000.0, r


def test_window_twap_weights_by_hold_duration(spark):
    import datetime as dt

    from java_mapreduce_framework_spark.operators.temporal import window_twap

    base = dt.datetime(2026, 3, 1, 0, 0, 0)
    rows = [
        # user 1: 10.0 held 30s, 20.0 held 10s -> twap 12.5; last drops
        (1, base, 1, "view", 10.0, "{}"),
        (2, base + dt.timedelta(seconds=30), 1, "view", 20.0, "{}"),
        (3, base + dt.timedelta(seconds=40), 1, "view", 99.0, "{}"),
        # user 2: single event -> no holds, day absent
        (4, base, 2, "view", 5.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        (r["user_id"]): (r["n_holds"], r["twap"])
        for r in window_twap(ev).collect()
    }
    assert got == {1: (2, 12.5)}


def test_markov_stationary_sums_to_one_and_matches_numpy(spark, sf_small):
    """Power-iteration result is a probability vector and matches a
    numpy replay of the same pinned computation."""
    import numpy as np

    from java_mapreduce_framework_spark.operators import temporal
    from java_mapreduce_framework_spark.sources.tables import load_table

    events = load_table(spark, sf_small, "events")
    out = {r["state"]: r["pi"]
           for r in temporal.event_markov_stationary(events).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-4
    # numpy replay: matrix from the rounded transition counts
    m = temporal.event_transition_matrix(events).collect()
    states = sorted({r["cur_type"] for r in m})
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    cnt = np.zeros((len(states), len(states)))
    for r in m:
        if r["next_type"] in idx:
            cnt[idx[r["cur_type"]], idx[r["next_type"]]] = r["n_transitions"]
    P = cnt / cnt.sum(axis=1, keepdims=True)
    v = np.full(len(states), 1.0 / len(states))
    for _ in range(12):
        v = v @ P
    for s, i in idx.items():
        assert abs(out[s] - v[i]) < 1e-5


def test_dau_wau_mau_hand_case(spark):
    """Hand-counted rolling distincts: user 1 active days 1+2, user 2
    day 1 only, user 3 day 9 only — WAU is a DISTINCT (user 1 twice
    in one window counts once) and day 9's trailing week excludes
    days 1-2."""
    from pyspark.sql import functions as F

    from java_mapreduce_framework_spark.operators.temporal import dau_wau_mau

    rows = [
        (1, "2024-01-01 05:00:00", 1), (2, "2024-01-01 06:00:00", 1),
        (3, "2024-01-02 05:00:00", 1), (4, "2024-01-01 07:00:00", 2),
        (5, "2024-01-09 05:00:00", 3),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day"])[:10]: (r["dau"], r["wau"], r["mau"], r["stickiness"])
           for r in dau_wau_mau(ev).collect()}
    assert out["2024-01-01"] == (2, 2, 2, 1.0)
    assert out["2024-01-02"] == (1, 2, 2, 0.5)     # users {1,2} in window
    assert out["2024-01-09"] == (1, 1, 3, round(1 / 3, 4))


def test_window_ohlc_hand_case_with_timestamp_ties(spark):
    """Hand-checked candle including a same-timestamp tie: event_id
    breaks it, so the open is the LOWER id's reading."""
    from pyspark.sql import functions as F

    from java_mapreduce_framework_spark.operators.temporal import window_ohlc

    rows = [
        (2, "2024-01-01 09:00:00", 1, 5.0),   # tie on ts: id 1 < 2
        (1, "2024-01-01 09:00:00", 1, 3.0),
        (3, "2024-01-01 15:00:00", 1, 9.0),
        (4, "2024-01-02 08:00:00", 1, 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day"])[:10]: (r["open"], r["high"], r["low"], r["close"],
                                r["n_readings"])
           for r in window_ohlc(ev).collect()}
    assert out["2024-01-01"] == (3.0, 9.0, 3.0, 9.0, 3)
    assert out["2024-01-02"] == (7.0, 7.0, 7.0, 7.0, 1)


def test_window_bollinger_constant_and_warmup(spark):
    """A constant 24-reading stream has sigma 0 (all bands equal the
    value); the first 23 rows are warm-up NULLs; a 25th outlier
    reading moves the mean by (outlier - dropped)/24 exactly."""
    from java_mapreduce_framework_spark.operators import temporal

    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "r", 10.0, "{}")
        for i in range(24)
    ]
    rows.append((24, "2024-01-01 00:24:00", 1, "r", 34.0, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_id"]: r for r in
           temporal.window_bollinger(events).collect()}
    assert out[0]["mid"] is None and out[22]["upper"] is None
    assert out[22]["n_window"] == 23
    r23 = out[23]
    assert r23["mid"] == 10.0 and r23["upper"] == 10.0 and r23["lower"] == 10.0
    r24 = out[24]  # window now 23x10 + 1x34 -> mean 11.0
    assert r24["mid"] == 11.0
    assert r24["upper"] > 11.0 and r24["lower"] < 11.0
    # symmetric bands around the mid at 1e-4 resolution
    assert abs((r24["upper"] + r24["lower"]) / 2 - r24["mid"]) <= 1e-4


def test_seasonal_dow_decompose_planted_weekly_pattern(spark):
    """Two Mondays with different counts: dow_mean is their average
    and residuals are symmetric; dow is 0-based Sunday."""
    from java_mapreduce_framework_spark.operators import temporal

    rows, eid = [], 0
    # 2024-01-01 and 2024-01-08 are Mondays (dow 1); 4 and 8 events
    for n, day in ((4, "2024-01-01"), (8, "2024-01-08")):
        for _ in range(n):
            rows.append((eid, f"{day} 12:00:00", 1, "x", 1.0, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day"])[:10]: r for r in
           temporal.seasonal_dow_decompose(events).collect()}
    a, b = out["2024-01-01"], out["2024-01-08"]
    assert a["dow"] == 1 and b["dow"] == 1
    assert a["dow_mean"] == 6.0 and b["dow_mean"] == 6.0
    assert a["residual"] == -2.0 and b["residual"] == 2.0


def test_attribution_position_based_u_shape(spark):
    """4 touches then a purchase: edges earn 0.4 each, the two
    middles 0.1 each; a single-touch segment earns the full 1.0;
    trailing touches after the last purchase earn nothing."""
    from java_mapreduce_framework_spark.operators import temporal

    rows = [
        # user 1: view, click, view, click, purchase
        (0, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (1, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 00:02:00", 1, "view", 1.0, "{}"),
        (3, "2024-01-01 00:03:00", 1, "click", 1.0, "{}"),
        (4, "2024-01-01 00:04:00", 1, "purchase", 1.0, "{}"),
        # user 2: single touch -> full credit; then an uncredited tail
        (5, "2024-01-02 00:00:00", 2, "view", 1.0, "{}"),
        (6, "2024-01-02 00:01:00", 2, "purchase", 1.0, "{}"),
        (7, "2024-01-02 00:02:00", 2, "click", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["attributed_type"]: r for r in
           temporal.attribution_position_based(events).collect()}
    # user 1: view first (0.4) + view middle (0.1); click middle (0.1)
    # + click last (0.4); user 2: view single (1.0)
    assert out["view"]["total_credit"] == 1.5
    assert out["click"]["total_credit"] == 0.5
    assert out["view"]["n_touches"] == 3  # trailing click uncredited
    assert out["click"]["n_touches"] == 2


def test_jarque_bera_normal_vs_skewed(spark):
    """A symmetric near-normal sample keeps JB small; a heavily
    one-sided sample blows past the chi2(2) cut."""
    import math

    from java_mapreduce_framework_spark.operators import temporal

    rows, eid = [], 0
    # near-normal: symmetric triangular-ish values
    for v in [8, 9, 9, 10, 10, 10, 10, 11, 11, 12] * 5:
        rows.append((eid, "2024-01-01 00:00:00", eid, "sym", float(v), "{}"))
        eid += 1
    # skewed: lognormal-ish one-sided tail
    for v in [1, 1, 1, 1, 1, 1, 1, 2, 30, 100] * 5:
        rows.append((eid, "2024-01-01 00:00:00", eid, "skw", float(v), "{}"))
        eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_type"]: r for r in
           temporal.stats_jarque_bera(events).collect()}
    assert out["sym"]["normal"] is True
    assert out["skw"]["normal"] is False
    assert out["skw"]["jb_stat"] > out["sym"]["jb_stat"]
    assert math.isclose(out["sym"]["chi2_crit"], 5.9915)


def test_window_drawdown_hand_series(spark):
    """Series 10, 12, 8, 11, 7: peak tracks the max, drawdown the dip
    from it, max_drawdown the worst dip so far."""
    from java_mapreduce_framework_spark.operators import temporal

    vals = [10.0, 12.0, 8.0, 11.0, 7.0]
    rows = [
        (i, f"2024-01-01 00:0{i}:00", 1, "r", v, "{}")
        for i, v in enumerate(vals)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_id"]: r for r in
           temporal.window_drawdown(events).collect()}
    assert [out[i]["peak"] for i in range(5)] == [10.0, 12.0, 12.0, 12.0, 12.0]
    assert [out[i]["drawdown"] for i in range(5)] == [0.0, 0.0, 4.0, 1.0, 5.0]
    assert [out[i]["max_drawdown"] for i in range(5)] == [0.0, 0.0, 4.0, 4.0, 5.0]


def test_window_rsi_extremes_and_warmup(spark):
    """Monotone-up window -> RSI 100; monotone-down -> 0; first 14
    rows (13 deltas) are warm-up NULLs."""
    from java_mapreduce_framework_spark.operators import temporal

    rows = []
    for i in range(15):  # strictly increasing for user 1
        rows.append((i, f"2024-01-01 00:{i:02d}:00", 1, "r",
                     10.0 + i, "{}"))
    for i in range(15):  # strictly decreasing for user 2
        rows.append((100 + i, f"2024-01-01 00:{i:02d}:00", 2, "r",
                     50.0 - i, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_id"]: r for r in temporal.window_rsi(events).collect()}
    assert out[13]["rsi"] is None and out[13]["n_deltas"] == 13
    assert out[14]["rsi"] == 100.0 and out[14]["n_deltas"] == 14
    assert out[114]["rsi"] == 0.0


def test_attribution_first_touch_credits_journey_start(spark):
    """view, click, purchase -> credit to the FIRST touch (view);
    a second journey after the purchase credits its own first touch;
    a touchless purchase stays in the NULL direct bucket."""
    from java_mapreduce_framework_spark.operators import temporal

    rows = [
        (0, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (1, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 00:02:00", 1, "purchase", 1.0, "{}"),
        (3, "2024-01-01 00:03:00", 1, "click", 1.0, "{}"),
        (4, "2024-01-01 00:04:00", 1, "purchase", 1.0, "{}"),
        (5, "2024-01-02 00:00:00", 2, "purchase", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_id"]: r for r in
           temporal.attribution_first_touch(events).collect()}
    assert out[2]["attributed_type"] == "view"   # not the closer click
    assert out[4]["attributed_type"] == "click"  # second journey
    assert out[5]["attributed_type"] is None     # direct bucket
