"""Event-analytics operators (SURVEY.md §2B, M4 temporal family
extensions): the classic product-analytics shapes -- activity heatmap,
count-anomaly detection, retention cohorts, conversion funnel -- each a
pure declarative plan over the events table.

Reference licence: all four are multi-round grouped aggregations, the
workload class the reference's map→shuffle→sort→reduce core exists to
express (SURVEY.md §2A); on Spark each round is a hash aggregation or
a co-partitioned join, with partial aggregation and AQE for free.

100 TB posture per operator in its docstring; none collects, none
crosses rows outside keyed shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_heatmap(events: DataFrame) -> DataFrame:
    """Day-of-week x hour activity heatmap: event count and distinct
    users per calendar cell. One partial+final aggregation over a
    single scan; the 7x24-cell output makes the shuffle trivially
    bounded whatever the input size. (Spark's dayofweek is 1=Sunday;
    the oracle shifts DuckDB's 0-based convention to match.)"""
    return (
        events.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour_of_day")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def hourly_anomaly_zscore(events: DataFrame, z_threshold: float = 2.5) -> DataFrame:
    """Count-anomaly detection: hourly event counts per type, scored
    against the type's own mean/std as a z-score, anomalous hours
    flagged at ``|z| >= z_threshold``.

    Two aggregations (hourly counts keyed on (type, hour); per-type
    moments keyed on type) + a broadcastable join back -- the per-type
    stats table has one row per event type regardless of scale. Std
    from explicit moments (sample variance, n-1) so the identical
    closed form runs on the oracle; integer count sums keep the
    moments exact in float64."""
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_hour")
    ).agg(F.count("*").alias("n_events"))
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("n_events").alias("sx"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sxx"),
    )
    # degenerate groups (single bucket, or zero variance) have no
    # defined z-score; drop them explicitly -- the engines disagree on
    # 0/0 (Spark NULL vs IEEE NaN, and NaN compares TRUE vs the
    # threshold in some engines), so the guard lives on BOTH sides of
    # the oracle contract
    stats = stats.filter(
        (F.col("n") > 1)
        & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    )
    scored = hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "bucket_hour",
        "n_events",
        F.round((F.col("n_events") - mean) / std, 4).alias("zscore"),
    )
    return scored.filter(F.abs(F.col("zscore")) >= z_threshold)


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week,
    counted per subsequent active week offset. Three keyed
    aggregations -- first-seen week per user, distinct (user, week)
    activity, cohort x offset rollup -- all shuffling on user_id or
    the small (cohort, offset) key. The cohort matrix output is
    weeks^2-bounded, never data-sized."""
    first_seen = events.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    active = events.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def funnel_conversion(
    events: DataFrame,
    stages: tuple[str, ...] = ("signup", "view", "click", "purchase"),
) -> DataFrame:
    """Ordered conversion funnel: per user, each stage counts only if
    it happens at-or-after the user's entry into the previous stage
    (min-ts chaining, the standard strict-order funnel). One keyed
    aggregation per stage plus a user_id-co-partitioned join per step
    -- stage count is a constant, so the plan depth is fixed and every
    shuffle keys on user_id (AQE coalesces the later, shrinking
    stages). Output: one row per stage with the surviving user count,
    monotone non-increasing."""
    reached = None
    counts = []
    for i, stage in enumerate(stages):
        ev = events.filter(F.col("event_type") == stage)
        if reached is None:
            reached = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            reached = (
                ev.join(reached, "user_id")
                .filter(F.col("ts") >= F.col("t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        counts.append(
            reached.agg(F.count("*").alias("n_users")).select(
                F.lit(f"L{i + 1}_{stage}").alias("stage"), "n_users"
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
