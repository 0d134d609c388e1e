"""Event-sequence analytics: ordered funnels, retention cohorts, robust
outlier gating — the product-analytics trio over an append-only event
stream, as chained DataFrame aggregations.

Reference analogue: the reference's event-style tables are the
junction/sample activity logs it summarizes per-entity
(clinpy/assays/junction.py:37-61); these operators generalize that
"per-entity ordered activity" shape to arbitrary step sequences.

Scale design: every pass is a filter + groupBy(user) aggregation —
after the first shuffle on the user key the chained step joins are
co-partitioned (AQE reuses the exchange), so an S-step funnel costs S
small aggregations over progressively SHRINKING user sets, never a
per-user collect or a cross join. Retention is one groupBy on (cohort,
offset). Outlier gating computes per-group medians with exact
percentiles (a single shuffle on the small group key) and broadcasts
them back over the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel completion times: one row per user with
    ``step_1_ts .. step_N_ts`` (NULL once the user drops out), where
    step i's time is the EARLIEST step-i event strictly after the
    user's step i-1 time — the classic "min ts after previous min"
    recurrence, one filtered aggregation per step.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    out = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(out.select(user_col, F.col(f"step_{i-1}_ts").alias("__prev")), user_col)
            .filter(F.col(ts_col) > F.col("__prev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"step_{i}_ts"))
        )
        out = out.join(nxt, user_col, "left")
    return out


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, step_name, n_users): how many users reached each ordered
    step. Monotone non-increasing by construction."""
    per_user = funnel(events, steps, ts_col, user_col, type_col)
    counts = per_user.agg(
        *[F.count(f"step_{i}_ts").alias(f"__c{i}") for i in range(1, len(steps) + 1)]
    )
    pairs = F.array(*[
        F.struct(
            F.lit(i).alias("step"),
            F.lit(name).alias("step_name"),
            F.col(f"__c{i}").alias("n_users"),
        )
        for i, name in enumerate(steps, start=1)
    ])
    return counts.select(F.explode(pairs).alias("__s")).select("__s.*")


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    period_days: int = 7,
) -> DataFrame:
    """Cohorted retention grid: users bucketed by the period of their
    FIRST event (cohort), counted distinct in each later period offset:
    (cohort_period, period_offset, n_active). Two shuffles total — one
    groupBy(user) for the first-seen time, one groupBy(cohort, offset).
    Periods are fixed ``period_days`` windows from the epoch day, so
    the bucketing is a pure column expression (no calendar-week
    dependence to disagree across engines)."""
    day = F.floor(F.unix_timestamp(ts_col) / F.lit(86400 * period_days))
    first = events.groupBy(user_col).agg(F.min(day).alias("__cohort"))
    return (
        events.select(user_col, day.alias("__p"))
        .join(first, user_col)
        .groupBy(
            F.col("__cohort").alias("cohort_period"),
            (F.col("__p") - F.col("__cohort")).alias("period_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_active"))
    )


def robust_outliers(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    n_mads: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier gate via median absolute deviation:
    flag rows where |v - median| > n_mads * 1.4826 * MAD (the normal-
    consistent MAD scale). Returns per-group (group, n_rows, n_outliers,
    med, mad). Medians are exact interpolated percentiles — one shuffle
    on the (small) group key; the stats re-join the stream broadcast.
    Degenerate groups (MAD = 0) flag any deviation from the median."""
    med = events.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med"))
    dev = events.join(F.broadcast(med), group_col).withColumn(
        "__ad", F.abs(F.col(value_col) - F.col("__med")))
    mad = dev.groupBy(group_col).agg(
        F.expr("percentile(__ad, 0.5)").alias("__mad"))
    thresh = F.lit(n_mads) * F.lit(1.4826) * F.col("__mad")
    return (
        dev.join(F.broadcast(mad), group_col)
        .withColumn("__out", F.when(F.col("__mad") > 0, F.col("__ad") > thresh)
                    .otherwise(F.col("__ad") > 0))
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("__out").cast("long")).alias("n_outliers"),
            F.first("__med").alias("med"),
            F.first("__mad").alias("mad"),
        )
    )
