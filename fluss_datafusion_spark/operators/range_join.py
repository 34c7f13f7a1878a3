"""Range (point-in-interval) join without a nested-loop plan.

Spark plans a bare ``p.ts >= i.start AND p.ts < i.end`` join as a
BroadcastNestedLoopJoin (fine only while one side broadcasts) or a
cartesian product — O(|points| x |intervals|) at 100 TB.  The scale
path is the classic bucketization trick: map every interval onto the
fixed-width buckets it overlaps (explode), map every point onto its
single bucket, hash-join on bucket id (+ any extra equi keys), then
re-check the exact predicate.  Each (interval, point) pair meets in
exactly one bucket — the point's — so no post-join dedup is needed.

Cost: one shuffle of |points| + sum(interval_len / bucket_width) rows
instead of a quadratic loop.  Pick ``bucket_width`` near the median
interval length so intervals explode into O(1) buckets; very long
intervals fan out linearly (cap them upstream or split the join).

The reference has no range join at all (SURVEY.md §2 — everything
relational is delegated); DataFusion would nested-loop it.  This is a
north-star extension operator.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``start <= point < end`` (end-exclusive), on integral columns
    (epoch seconds, epoch millis, ...).

    ``extra_on`` adds equi-join keys (e.g. user_id) that tighten both
    the shuffle and the match.  Returns all columns from both inputs
    except the internal bucket id.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(int(bucket_width))
    bkt = "__rj_bucket__"

    # floor-div is safe for TimestampType already cast to long by caller
    exploded = intervals.withColumn(
        bkt,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w),
                # end-exclusive: an interval [s, e) touches bucket(e-1) last
                F.floor((F.col(end_col) - F.lit(1)) / w),
            )
        ),
    )
    bucketed_points = points.withColumn(bkt, F.floor(F.col(point_col) / w))

    cond: Column = bucketed_points[bkt] == exploded[bkt]
    for k in extra_on:
        cond = cond & (bucketed_points[k] == exploded[k])
    cond = (
        cond
        & (bucketed_points[point_col] >= exploded[start_col])
        & (bucketed_points[point_col] < exploded[end_col])
    )

    joined = bucketed_points.join(exploded, cond, "inner")
    drop = [bucketed_points[bkt], exploded[bkt]]
    drop += [exploded[k] for k in extra_on]
    return joined.drop(*drop)
