"""temporal section of the declared query registry -- bodies verbatim
from the monolithic plans/registry.py (round-8 maintainability split;
identical registry() output, zero plan changes)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ...operators import (  # noqa: F401
    analytics,
    dedup,
    ml,
    multimodal,
    relational,
    similarity,
    temporal,
    text,
)
from ...sources.tables import load_table  # noqa: F401
from .core import (  # noqa: F401
    _EVTS,
    _register,
    _t,
)


# ------------------------------------------------------- temporal (M4)

_SESSIONIZE_SQL = """
  SELECT user_id, event_id,
         CAST(sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM {_EVTS})
""".replace("{_EVTS}", _EVTS)


@_register("sessionize", _SESSIONIZE_SQL)
def _sessionize(spark, sf):
    return temporal.sessionize(_t(spark, sf, "events"))


@_register(
    "session_stats",
    f"""
    WITH s AS ({_SESSIONIZE_SQL})
    SELECT s.user_id, s.session_id, count(*) AS n_events,
           min(e.ts) AS session_start, max(e.ts) AS session_end
    FROM s JOIN (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events) e
      ON s.user_id = e.user_id AND s.event_id = e.event_id
    GROUP BY s.user_id, s.session_id
    """,
)
def _session_stats(spark, sf):
    return temporal.session_stats(_t(spark, sf, "events"))


@_register(
    "event_type_cooccurrence",
    f"""
    WITH s AS ({_SESSIONIZE_SQL}),
    st AS (
      SELECT DISTINCT s.user_id, s.session_id, e.event_type
      FROM s JOIN (SELECT event_id, user_id, event_type FROM events) e
        ON s.user_id = e.user_id AND s.event_id = e.event_id),
    tot AS (SELECT count(*) AS n_total
            FROM (SELECT DISTINCT user_id, session_id FROM st)),
    per AS (SELECT event_type, count(*) AS n_sess
            FROM st GROUP BY event_type),
    pr AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM st a JOIN st b
        ON a.user_id = b.user_id AND a.session_id = b.session_id
           AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(pa.n_sess AS BIGINT) AS n_a,
           CAST(pb.n_sess AS BIGINT) AS n_b,
           round((n_both * 1.0 * t.n_total)
                 / (pa.n_sess * 1.0 * pb.n_sess), 4) AS lift
    FROM pr
    JOIN per pa ON pa.event_type = pr.type_a
    JOIN per pb ON pb.event_type = pr.type_b
    CROSS JOIN tot t
    """,
    note="session-level market basket over event types (the "
    "product-analytics reading of basket_lift_topk): sessionize "
    "carries type through, DISTINCT collapses to sessions x "
    "alphabet, pair self-join keyed on (user, session) with "
    "alphabet^2-bounded fan-out; lift row-local",
)
def _event_type_cooccurrence(spark, sf):
    return analytics.event_type_cooccurrence(_t(spark, sf, "events"))


@_register(
    "user_behavior_entropy",
    f"""
    WITH cnt AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type),
    per AS (
      SELECT user_id,
             CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_types,
             list(c ORDER BY event_type) AS cells
      FROM cnt GROUP BY user_id)
    SELECT user_id, n_events, n_types,
           round(log2(n_events)
                 - list_reduce(list_transform(cells, c -> c * log2(c)),
                               (a, b) -> a + b) / n_events, 4) AS entropy
    FROM per
    """,
    note="per-user behavioral entropy over the type mix (bot triage "
    "/ diversity score; sequence_likelihood scores ORDER, this "
    "scores MIX): two user-keyed aggregations, entropy folded in "
    "SORTED type order (markov-stationary determinism discipline)",
)
def _user_behavior_entropy(spark, sf):
    return analytics.user_behavior_entropy(_t(spark, sf, "events"))


@_register(
    "hourly_autocorrelation",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM {_EVTS} GROUP BY 1, 2),
    bounds AS (SELECT event_type, min(h) AS h0, max(h) AS h1
               FROM hourly GROUP BY 1),
    spine AS (
      SELECT event_type,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds),
    dense AS (
      SELECT s.event_type, s.h, coalesce(n, 0) AS n
      FROM spine s LEFT JOIN hourly USING (event_type, h)),
    lagd AS (
      SELECT event_type, n,
             lag(n, 1) OVER w AS y1, lag(n, 6) OVER w AS y6,
             lag(n, 12) OVER w AS y12, lag(n, 24) OVER w AS y24
      FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY h)),
    pairs AS (
      SELECT event_type, 1 AS lag_h, n AS x, y1 AS y FROM lagd
      WHERE y1 IS NOT NULL
      UNION ALL SELECT event_type, 6, n, y6 FROM lagd WHERE y6 IS NOT NULL
      UNION ALL SELECT event_type, 12, n, y12 FROM lagd WHERE y12 IS NOT NULL
      UNION ALL SELECT event_type, 24, n, y24 FROM lagd WHERE y24 IS NOT NULL),
    m AS (
      SELECT event_type, lag_h, count(*) AS np,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pairs GROUP BY event_type, lag_h)
    SELECT event_type, CAST(lag_h AS INT) AS lag_h,
           CAST(np AS BIGINT) AS n_pairs,
           round((np * sxy - sx * sy)
                 / sqrt((np * sxx - sx * sx) * 1.0
                        * (np * syy - sy * sy)), 4) AS autocorr
    FROM m
    WHERE np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
    """,
    note="lag-{{1,6,12,24}} autocorrelation of the hourly count "
    "series per type (seasonality detector): one corpus aggregate, "
    "then a dense generated hour spine (gaps are REAL zeros in a "
    "count series), lag windows + explicit-moment Pearson r over "
    "(type x hours)-bounded rows",
)
def _hourly_autocorrelation(spark, sf):
    return analytics.hourly_autocorrelation(_t(spark, sf, "events"))


_SESSION_WINDOW_SQL = """
  WITH d AS (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM {_EVTS}),
  s AS (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM d)
  SELECT user_id, count(*) AS n_events,
         min(ts) AS session_start, max(ts) AS session_end
  FROM s GROUP BY user_id, sid
""".replace("{_EVTS}", _EVTS)


@_register(
    "session_window_agg",
    _SESSION_WINDOW_SQL,
    note="native session_window generator; same strict-> gap boundary as sessionize",
)
def _session_window_agg(spark, sf):
    return temporal.session_window_agg(_t(spark, sf, "events"))


@_register(
    "tumbling_window_agg",
    f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM {_EVTS} GROUP BY date_trunc('hour', ts), event_type
    """,
)
def _tumbling_window_agg(spark, sf):
    return temporal.tumbling_window_agg(_t(spark, sf, "events"))


@_register(
    "join_asof",
    f"""
    WITH r AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1)
    SELECT e.event_id, e.user_id, e.ts, r.o_orderkey, r.o_totalprice
    FROM {_EVTS.replace('evts', 'e')} ASOF LEFT JOIN r
      ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
    note="as-of join via union + ordered last_value; oracle uses native ASOF JOIN",
)
def _join_asof(spark, sf):
    return temporal.join_asof(_t(spark, sf, "events"), _t(spark, sf, "orders"))


@_register(
    "join_asof_ttl",
    f"""
    WITH r AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1),
    m AS (
      SELECT e.event_id, e.user_id, e.ts, r.o_orderkey, r.o_totalprice,
             (epoch_us(e.ts) - epoch_us(CAST(r.o_orderdate AS TIMESTAMP)))
               AS stale_us
      FROM {_EVTS.replace('evts', 'e')} ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate)
    SELECT event_id, user_id, ts,
           CASE WHEN stale_us <= 777600000000000 THEN o_orderkey END
             AS o_orderkey,
           CASE WHEN stale_us <= 777600000000000 THEN o_totalprice END
             AS o_totalprice,
           CASE WHEN stale_us <= 777600000000000
                THEN round(stale_us / 86400000000.0, 4) END
             AS staleness_days
    FROM m
    """,
    note="as-of join with a staleness TTL (feature-store "
    "point-in-time contract): same single union-timeline pass as "
    "join_asof, carrying the matched order's own timestamp so the "
    "TTL test and fractional-day staleness are row-local afterwards",
)
def _join_asof_ttl(spark, sf):
    return temporal.join_asof_ttl(
        _t(spark, sf, "events"), _t(spark, sf, "orders")
    )


@_register(
    "join_range_banded",
    f"""
    WITH e AS (
      SELECT event_id, user_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM {_EVTS})
    SELECT a.user_id, a.event_id AS eid_a, b.event_id AS eid_b,
           CAST(b.s - a.s AS INTEGER) AS dt_s
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
     AND b.s - a.s <= 60
    """,
    note="time-proximity pairs via band-bucket equi-join; oracle is the theta self-join",
)
def _join_range_banded(spark, sf):
    return temporal.join_range_banded(_t(spark, sf, "events"))


@_register(
    "pivot_event_counts",
    f"""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS n_click,
           count(*) FILTER (WHERE event_type = 'error') AS n_error,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           count(*) FILTER (WHERE event_type = 'view') AS n_view
    FROM {_EVTS} GROUP BY user_id
    """,
    note="explicit-values pivot == conditional aggregation",
)
def _pivot_event_counts(spark, sf):
    return relational.pivot_event_counts(_t(spark, sf, "events"))


@_register(
    "sliding_window_agg",
    f"""
    SELECT CAST(to_timestamp(s) AS TIMESTAMP) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM (SELECT event_type, value,
           unnest([CAST(floor(epoch(ts)/1800)*1800 AS BIGINT),
                   CAST(floor(epoch(ts)/1800)*1800 - 1800 AS BIGINT)]) AS s
          FROM {_EVTS})
    GROUP BY s, event_type
    """,
    note="1h windows hopping every 30min: each event lands in exactly 2 windows",
)
def _sliding_window_agg(spark, sf):
    return temporal.sliding_window_agg(_t(spark, sf, "events"))


@_register(
    "percentile_stats",
    f"""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(max(value), 4) AS p100
    FROM {_EVTS} GROUP BY event_type
    """,
    note="exact continuous-interpolation percentiles; approx_percentile is the 100TB swap",
)
def _percentile_stats(spark, sf):
    return temporal.percentile_stats(_t(spark, sf, "events"))


@_register(
    "approx_percentile_stats",
    None,
    note="mergeable quantile sketch (map-side partials); estimates are engine-specific -> rows-only",
)
def _approx_percentile_stats(spark, sf):
    return temporal.approx_percentile_stats(_t(spark, sf, "events"))


@_register(
    "percentile_stats_distributed",
    f"""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(max(value), 4) AS p100
    FROM {_EVTS} GROUP BY event_type
    """,
    note="same exact result through the grouped distributed-quantile "
    "kernel: (key, value)-range-partitioned order statistics, no "
    "per-group value buffer -- the unbounded-group-size form",
)
def _percentile_stats_distributed(spark, sf):
    return temporal.percentile_stats_distributed(_t(spark, sf, "events"))


