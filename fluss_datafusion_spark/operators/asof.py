"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the sort-merge "union trick": tag right rows 0 and left
rows 1, union on (keys, ts, tag), then one window pass per key carries
the latest right row forward (``last(..., ignorenulls=True)``).  Cost is
a single shuffle+sort on (keys, ts) — no pair explosion, unlike the
naive join+filter+argmax which is quadratic per key.  This is the shape
that survives 100 TB: it's exactly one sort-merge pass.

r8: full pandas ``merge_asof`` parity — ``direction`` ∈ {backward,
forward, nearest} and ``tolerance_seconds``.  Forward is the mirrored
window (first following right row); nearest computes both candidates in
the SAME union pass (two window functions over one sort, still one
shuffle) and picks the closer, ties to backward (the pandas
convention); tolerance nulls a match whose time distance exceeds the
bound.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Optional[List[str]] = None,
    allow_exact_matches: bool = True,
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
) -> DataFrame:
    """For each left row, attach one right row per ``on`` keys:

    * ``backward`` (default): the most recent right row with
      right_ts <= left_ts (< when ``allow_exact_matches=False``);
    * ``forward``: the earliest right row with right_ts >= left_ts
      (> when exact matches are disallowed);
    * ``nearest``: whichever of the two is closer in time (ties go
      backward — the pandas convention).

    ``tolerance_seconds`` nulls any match farther than the bound.
    Left columns are preserved; right value columns are appended (null
    when no qualifying right row exists).

    Both inputs travel through ONE union and one shuffle+sort per key —
    nearest adds a second window FUNCTION over the same sorted
    partition, not a second exchange.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    on = list(on)
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in on and c != right_ts]
    left_cols = list(left.columns)

    # the match struct carries the right row's ts so tolerance and
    # nearest can measure time distance after the window pass
    rstruct_t = F.struct(
        F.col(right_ts).cast("timestamp").alias("__rts__"),
        *[F.col(c) for c in right_value_cols],
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__tag__"),
        rstruct_t.alias("__rval__"),
    )
    lstruct_t = F.struct(*[F.col(c) for c in left_cols])
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__tag__"),
        F.lit(None).cast(r.schema["__rval__"].dataType).alias("__rval__"),
        lstruct_t.alias("__lval__"),
    )
    r = r.withColumn("__lval__", F.lit(None).cast(l.schema["__lval__"].dataType))
    both = r.unionByName(l)

    # tag order at equal ts decides >= vs > semantics.  Backward scans
    # PRECEDING rows: an exact-ts right row is visible iff it sorts
    # BEFORE the left row (tag asc).  Forward scans FOLLOWING rows: an
    # exact-ts right row is visible iff it sorts AFTER (tag desc).
    tag_back = F.col("__tag__").asc() if allow_exact_matches else F.col("__tag__").desc()
    tag_fwd = F.col("__tag__").desc() if allow_exact_matches else F.col("__tag__").asc()

    need_back = direction in ("backward", "nearest")
    need_fwd = direction in ("forward", "nearest")
    # each direction gets its own sort order so equal-ts semantics stay
    # exact in BOTH (nearest + exclude-exact needs the forward window to
    # skip equal-ts rights while backward skips them too — one shared
    # order cannot express both).  Same partitionBy: Catalyst plans ONE
    # exchange with an extra per-partition Sort, not a second shuffle.
    out = both
    if need_back:
        wb = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts__").asc(), tag_back)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            "__mb__", F.last("__rval__", ignorenulls=True).over(wb)
        )
    if need_fwd:
        wf = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts__").asc(), tag_fwd)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        out = out.withColumn(
            "__mf__", F.first("__rval__", ignorenulls=True).over(wf)
        )
    out = out.filter(F.col("__tag__") == 1)

    def dist(match):
        return F.abs(
            F.unix_micros(match.getField("__rts__"))
            - F.unix_micros(F.col("__ts__").cast("timestamp"))
        )

    if direction == "backward":
        match = F.col("__mb__")
    elif direction == "forward":
        match = F.col("__mf__")
    else:
        mb, mf = F.col("__mb__"), F.col("__mf__")
        match = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(dist(mb) <= dist(mf), mb)  # tie -> backward (pandas)
            .otherwise(mf)
        )
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds * 1_000_000)
        match = F.when(dist(match) <= tol_us, match)
    out = out.withColumn("__match__", match)
    return out.select(
        *[F.col("__lval__").getField(c).alias(c) for c in left_cols],
        *[F.col("__match__").getField(c).alias(c) for c in right_value_cols],
    )


def point_in_time_join(
    facts: DataFrame,
    feature_tables: Sequence[dict],
    fact_ts: str = "ts",
    tolerance_seconds: Optional[float] = None,
) -> DataFrame:
    """Feature-store point-in-time join (the training-set assembly step
    every feature platform ships — Feast/Tecton's `get_historical_
    features`): for each fact (label) row, attach from EVERY feature
    table the latest feature row at or before the fact's own event
    time, never a later one — the construction that makes training
    data leakage-free by time.

    ``feature_tables``: a list of {"df": DataFrame, "on": [join keys],
    "ts": feature timestamp col[, "values": [feature cols]][,
    "tolerance_seconds": ...]} — per-table tolerance nulls features
    staler than the bound (a feature pipeline that stopped updating
    should surface as NULL, not as a year-old value).

    Composition of the as-of kernel: one backward as-of join per
    feature table, each a single shuffle+sort on that table's keys —
    k tables = k exchanges of the (growing) fact frame and never a
    fact-row explosion; feature tables are never joined to each other.
    The fact row count is invariant (pinned by construction: as-of
    attaches at most one row per table)."""
    out = facts
    for spec in feature_tables:
        out = asof_join(
            out,
            spec["df"],
            on=spec["on"],
            left_ts=fact_ts,
            right_ts=spec["ts"],
            right_value_cols=spec.get("values"),
            direction="backward",
            tolerance_seconds=spec.get(
                "tolerance_seconds", tolerance_seconds
            ),
        )
    return out
