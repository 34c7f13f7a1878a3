"""Gap-based sessionization as a batch operator.

Streaming engines express this as session windows (we expose that too in
``streaming/``); in batch it is one window pass: a session starts where
the gap from the previous event exceeds the timeout.  Single shuffle on
the user key; per-key state is a running sum — the classic scalable
sessionization (no iteration, no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    order_tiebreak: str = None,
) -> DataFrame:
    """Append ``session_id`` (1-based per user, in time order)."""
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(is_new).over(wrun))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    order_tiebreak: str = None,
) -> DataFrame:
    """Per-user session summary: session count, event count, and the
    longest session (by event count)."""
    s = sessionize(df, user_col, ts_col, gap, order_tiebreak)
    per_session = s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )
