"""Ordered-sequence funnel analysis over event streams.

The classic product-analytics query ("view → click → purchase: how far
did each user get, and how fast?") — ClickHouse ships it as
``windowFunnel``, Snowplow/Amplitude as funnel reports.  Semantics here
are the well-defined GREEDY-EARLIEST chain:

    t_1 = min ts of step-1 events
    t_i = min ts of step-i events with ts > t_{i-1}
    stage reached = largest i with t_i defined
    (optional) every counted stage must fall within ``within_seconds``
    of t_1 — a too-slow completion truncates at the last stage inside
    the window

Greedy-earliest is deterministic and composable; note it is a CHAIN
rule, not global matching — a user whose only step-2 event precedes
their first step-1 event has stage 1.

Plan shape: one narrow filter per step + k-1 per-user equi-joins, each
a hash shuffle on the user key carrying the (tiny) per-user stage
frame — at any corpus size the state per user is k timestamps, never
the event history, and k (funnel length) is a small constant.  No
UDFs, no window-over-everything sort.  ``funnel_counts``' report
windows run over exactly k rows (the stage spine), so their
single-partition frames are constant-sized by construction.

No reference analog (zuston/fluss-datafusion has no event operators);
part of the streaming/events surface beyond the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: Sequence[str],
    within_seconds: Optional[float] = None,
) -> DataFrame:
    """Per-user funnel completion: returns
    (user, stage int, t_1 .. t_k timestamps — NULL past the reached
    stage).  ``within_seconds`` bounds t_i - t_1 for every counted
    stage (the ClickHouse windowFunnel window)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct: {steps}")

    cur = (
        df.filter(F.col(event_col) == steps[0])
        .groupBy(F.col(user_col).alias("__u__"))
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = df.filter(F.col(event_col) == step).select(
            F.col(user_col).alias("__u__"), F.col(ts_col).alias("__ts__")
        )
        cond = F.col("__ts__") > F.col(f"t_{i - 1}")
        if within_seconds is not None:
            cond = cond & (
                F.col("__ts__")
                <= F.col("t_1")
                + F.expr(f"INTERVAL {float(within_seconds)} SECOND")
            )
        cur = (
            cur.join(nxt, "__u__", "left")
            .withColumn("__ok__", F.when(cond, F.col("__ts__")))
            .groupBy("__u__", *[f"t_{j}" for j in range(1, i)])
            .agg(F.min("__ok__").alias(f"t_{i}"))
        )
    # when() chains evaluate top-down: wrap outward so the DEEPEST
    # completed stage is tested first and wins
    stage = F.lit(1)
    for i in range(2, len(steps) + 1):
        stage = F.when(F.col(f"t_{i}").isNotNull(), F.lit(i)).otherwise(stage)
    return cur.select(
        F.col("__u__").alias(user_col),
        stage.cast("int").alias("stage"),
        *[f"t_{i}" for i in range(1, len(steps) + 1)],
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: Sequence[str],
    within_seconds: Optional[float] = None,
) -> DataFrame:
    """The aggregate funnel report: one row per stage with the number
    of users who reached AT LEAST that stage and the conversion rate
    from stage 1 (rounded to 4)."""
    per_user = funnel(
        df, user_col, ts_col, event_col, steps,
        within_seconds=within_seconds,
    )
    by_stage = per_user.groupBy("stage").agg(
        F.count(F.lit(1)).alias("__n__")
    )
    stages = per_user.sparkSession.range(1, len(steps) + 1).select(
        F.col("id").cast("int").alias("stage")
    )
    # k-row spine: these unpartitioned windows run over len(steps) rows
    cum = Window.orderBy(F.col("stage").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    everything = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    joined = (
        stages.join(by_stage, "stage", "left")
        .withColumn(
            "users",
            F.coalesce(F.sum("__n__").over(cum), F.lit(0)).cast("long"),
        )
        .withColumn(
            "__total__",
            F.max(F.when(F.col("stage") == 1, F.col("users"))).over(
                everything
            ),
        )
    )
    return (
        joined.withColumn(
            "conversion",
            F.when(
                F.col("__total__") > 0,
                F.round(F.col("users") / F.col("__total__"), 4),
            ).otherwise(F.lit(0.0)),
        )
        .select("stage", "users", "conversion")
        .orderBy("stage")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention: users grouped by their FIRST-activity period
    (the cohort), counted in each later period they were active — the
    other standard product-analytics report next to funnels.

    Returns (cohort_start timestamp, period_offset int, users long,
    retention double) where retention = users / cohort size (offset 0)
    rounded to 4.  ``granularity`` is any ``date_trunc`` unit.

    Plan: one per-user min (first activity), one distinct
    (user, period), one join + count — three keyed shuffles, no
    per-user history state."""
    first = df.groupBy(F.col(user_col).alias("__u__")).agg(
        F.date_trunc(granularity, F.min(ts_col)).alias("cohort_start")
    )
    active = (
        df.select(
            F.col(user_col).alias("__u__"),
            F.date_trunc(granularity, F.col(ts_col)).alias("__p__"),
        )
        .distinct()
    )
    # period offset in whole granules: months/weeks are variable-width,
    # so count boundaries via the unit difference, not seconds
    unit_diff = {
        "week": (F.datediff(F.col("__p__"), F.col("cohort_start")) / 7),
        "day": F.datediff(F.col("__p__"), F.col("cohort_start")),
        "month": F.months_between(F.col("__p__"), F.col("cohort_start")),
        "year": F.months_between(F.col("__p__"), F.col("cohort_start")) / 12,
        "hour": (
            F.unix_timestamp("__p__") - F.unix_timestamp("cohort_start")
        ) / 3600,
    }
    if granularity not in unit_diff:
        raise ValueError(
            f"granularity must be one of {sorted(unit_diff)}, "
            f"got {granularity!r}"
        )
    counts = (
        active.join(first, "__u__")
        .withColumn(
            "period_offset",
            F.round(unit_diff[granularity]).cast("int"),
        )
        .groupBy("cohort_start", "period_offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )
    base = counts.filter(F.col("period_offset") == 0).select(
        "cohort_start", F.col("users").alias("__size__")
    )
    return (
        counts.join(base, "cohort_start")
        .withColumn(
            "retention", F.round(F.col("users") / F.col("__size__"), 4)
        )
        .select("cohort_start", "period_offset", "users", "retention")
    )


def ab_test_ztest(
    df: DataFrame,
    group_cols: Sequence[str],
    variant_col: str,
    success_col,
    control_value,
    treatment_value,
    z_crit: float = 1.959963984540054,  # two-sided 95%
) -> DataFrame:
    """Two-proportion z-test per group — the experiment-readout
    companion to the funnel/cohort analytics: conversion rate of a
    treatment variant vs control, pooled-variance z statistic, and a
    significance boolean at ``z_crit`` (default two-sided 95%).

        z = (p_t - p_c) / sqrt( p*(1-p) * (1/n_c + 1/n_t) ),
        p = pooled rate

    Closed-form over two aggregates: one map-side-combined groupBy —
    corpus-sized input, group-count-sized output; no UDFs, so an
    external engine replays every statistic exactly.  Returns null z
    (and false significance) when either arm is empty or the pooled
    variance is 0 (all-success/all-failure both arms)."""
    groups = list(group_cols)
    succ = F.col("__succ__")
    agg = (
        df.select(
            *groups,
            F.col(variant_col).alias("__v__"),
            success_col.cast("int").alias("__succ__") if hasattr(success_col, "cast")
            else F.col(success_col).cast("int").alias("__succ__"),
        )
        .filter(F.col("__v__").isin([control_value, treatment_value]))
        .groupBy(*groups)
        .agg(
            F.sum(F.when(F.col("__v__") == control_value, 1).otherwise(0)).alias("n_c"),
            F.sum(F.when(F.col("__v__") == control_value, succ).otherwise(0)).alias("s_c"),
            F.sum(F.when(F.col("__v__") == treatment_value, 1).otherwise(0)).alias("n_t"),
            F.sum(F.when(F.col("__v__") == treatment_value, succ).otherwise(0)).alias("s_t"),
        )
    )
    # try_divide: an empty arm yields null rates/z, not an ANSI fault
    p_c = F.try_divide(F.col("s_c"), F.col("n_c"))
    p_t = F.try_divide(F.col("s_t"), F.col("n_t"))
    pooled = F.try_divide(F.col("s_c") + F.col("s_t"), F.col("n_c") + F.col("n_t"))
    var = pooled * (1 - pooled) * (
        F.try_divide(F.lit(1.0), F.col("n_c"))
        + F.try_divide(F.lit(1.0), F.col("n_t"))
    )
    z = F.when(
        (F.col("n_c") > 0) & (F.col("n_t") > 0) & (var > 0), (p_t - p_c) / F.sqrt(var)
    )
    return agg.select(
        *groups,
        F.col("n_c").cast("bigint").alias("n_control"),
        F.col("n_t").cast("bigint").alias("n_treatment"),
        F.round(p_c, 6).alias("rate_control"),
        F.round(p_t, 6).alias("rate_treatment"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > z_crit, F.lit(False)).alias("significant"),
    )
