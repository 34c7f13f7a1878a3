"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the sort-merge "union trick": tag right rows 0 and left
rows 1, union on (keys, ts, tag), then one window pass per key carries
the latest right row forward (``last(..., ignorenulls=True)``).  Cost is
a single shuffle+sort on (keys, ts) — no pair explosion, unlike the
naive join+filter+argmax which is quadratic per key.  This is the shape
that survives 100 TB: it's exactly one sort-merge pass.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Optional[List[str]] = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (or < when allow_exact_matches=False), per `on`
    keys.  Left columns are preserved; right value columns are appended
    (null when no earlier right row exists).

    Both inputs travel through one union: left rows carry their full row
    as a struct, right rows carry their value struct.  Everything is a
    single deterministic window pass — no row-ids, no second join.
    """
    on = list(on)
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in on and c != right_ts]
    left_cols = list(left.columns)

    rstruct_t = F.struct(*[F.col(c) for c in right_value_cols])
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

    # tag order at equal ts decides >= vs > semantics: right-before-left
    # means an exact-ts right row is visible to the left row.
    tag_order = F.col("__tag__").asc() if allow_exact_matches else F.col("__tag__").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts__").asc(), tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__match__", F.last("__rval__", ignorenulls=True).over(w))
        .filter(F.col("__tag__") == 1)
    )
    return matched.select(
        *[F.col("__lval__").getField(c).alias(c) for c in left_cols],
        *[F.col("__match__").getField(c).alias(c) for c in right_value_cols],
    )
