"""Time-series gap filling / resampling (TimescaleDB ``time_bucket_gapfill``,
InfluxDB ``fill()``, Pandas ``resample().ffill()`` analog).

Downsample an event stream into fixed-width buckets per group and
materialize the EMPTY buckets too, so downstream models see a regular
grid: monitoring rollups, feature windows for forecasting, training
curricula keyed on wall-clock.  The reference (zuston/fluss-datafusion)
has no time-series surface at all; this extends the hypertable rollup
(corpus st_hypertable_rollup) with the missing-bucket semantics.

Fill strategies per value column: ``null`` (leave the hole), ``zero``,
``locf`` (last observation carried forward), ``linear`` (interpolate
between the previous and next observed bucket; edges fall back to the
nearest observed value).

Scale shape (100 TB): one map-side-combined groupBy to the bucket
grain, one tiny per-group min/max agg, a ``sequence()`` explode to
build each group's spine (never a driver loop, never a global range),
a co-partitioned left join spine←buckets on (group, bucket), and one
window per group for locf/linear.  Everything is keyed by the group
columns — no single-partition stage, no collect.  The spine explode is
guarded: a group whose span/step exceeds ``max_buckets`` raises rather
than silently materializing an unbounded grid (the classic gapfill
footgun when one group has a 10-year outlier timestamp).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_FILLS = ("null", "zero", "locf", "linear")


def time_bucket(ts_col: Column, every_seconds: int) -> Column:
    """Floor a timestamp to its ``every_seconds`` grid line (epoch-
    aligned, the TimescaleDB time_bucket convention)."""
    secs = F.unix_timestamp(ts_col)
    return F.timestamp_seconds(
        (secs - (secs % F.lit(int(every_seconds)))).cast("long")
    )


def gapfill(
    df: DataFrame,
    ts_col: str,
    every_seconds: int,
    group_cols: Sequence[str],
    value_aggs: Dict[str, Column],
    fills: Optional[Dict[str, str]] = None,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Bucketed aggregate with gap materialization.

    ``value_aggs``: {output_name: aggregate Column} evaluated per
    (group, bucket) — e.g. ``{"avg_v": F.avg("value")}``.
    ``fills``: {output_name: "null"|"zero"|"locf"|"linear"} (default
    null).  Adds ``n_rows`` (0 on gaps) and ``is_gap``.

    Returns one row per group per grid bucket between that group's
    first and last observed bucket (inclusive) — the per-group-span
    convention, so a group's grid never extends beyond its own data.
    """
    fills = dict(fills or {})
    bad = {k: v for k, v in fills.items() if v not in _FILLS}
    if bad:
        raise ValueError(f"unknown fill strategies {bad}; use {_FILLS}")
    unknown = set(fills) - set(value_aggs)
    if unknown:
        raise ValueError(f"fills for unknown value columns {sorted(unknown)}")
    group_cols = list(group_cols)
    step = int(every_seconds)

    observed = (
        df.withColumn("__bucket__", time_bucket(F.col(ts_col), step))
        .groupBy(*group_cols, "__bucket__")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[c.alias(name) for name, c in value_aggs.items()],
        )
    )  # Catalyst prunes to the referenced columns at the scan

    span = observed.groupBy(*group_cols).agg(
        F.min("__bucket__").alias("__lo__"),
        F.max("__bucket__").alias("__hi__"),
    )
    n_buckets = (
        F.unix_timestamp("__hi__") - F.unix_timestamp("__lo__")
    ) / F.lit(step) + 1
    # the guard lives on __hi__ itself so column pruning can't drop it
    hi_guarded = F.when(
        n_buckets <= F.lit(int(max_buckets)), F.col("__hi__")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "gapfill: a group spans %s buckets (> max_buckets=%s); "
                "widen every_seconds or filter outlier timestamps",
                n_buckets.cast("long").cast("string"),
                F.lit(int(max_buckets)).cast("string"),
            )
        ).cast("timestamp")
    )
    spine = span.select(
        *group_cols,
        F.explode(
            F.sequence(
                F.col("__lo__"), hi_guarded,
                F.expr(f"INTERVAL {step} SECONDS"),
            )
        ).alias("__bucket__"),
    )

    out = spine.join(observed, group_cols + ["__bucket__"], "left")
    out = _apply_fills(out, group_cols, fills, x_axis=F.unix_timestamp("__bucket__"))
    return out.withColumnRenamed("__bucket__", "bucket_ts")


def _apply_fills(
    out: DataFrame,
    group_cols: Sequence[str],
    fills: Dict[str, str],
    x_axis: Column,
) -> DataFrame:
    """Shared fill machinery over a (group, __bucket__)-joined spine.
    ``x_axis`` is the numeric position of a bucket on its grid (epoch
    seconds for fixed-width grids, month index for calendar grids) so
    linear interpolation weights by grid distance, not wall seconds."""
    out = out.withColumn("n_rows", F.coalesce(F.col("n_rows"), F.lit(0)))
    out = out.withColumn("is_gap", F.col("n_rows") == 0)

    w = Window.partitionBy(*group_cols).orderBy("__bucket__")
    for name, how in fills.items():
        if how == "zero":
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(0.0)))
        elif how == "locf":
            out = out.withColumn(
                name,
                F.coalesce(
                    F.col(name), F.last(name, ignorenulls=True).over(w)
                ),
            )
        elif how == "linear":
            wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            b = x_axis
            pv = F.last(name, ignorenulls=True).over(w)
            pb = F.last(
                F.when(F.col(name).isNotNull(), b), ignorenulls=True
            ).over(w)
            nv = F.first(name, ignorenulls=True).over(wf)
            nb = F.first(
                F.when(F.col(name).isNotNull(), b), ignorenulls=True
            ).over(wf)
            interp = pv + (nv - pv) * (b - pb) / (nb - pb)
            out = out.withColumn(
                name,
                F.coalesce(
                    F.col(name),
                    F.when(pb.isNotNull() & nb.isNotNull(), interp),
                    pv,  # trailing edge: carry forward
                    nv,  # leading edge: carry backward
                ),
            )
    return out


def month_bucket(ts_col: Column, every_months: int = 1) -> Column:
    """Floor a timestamp/date to its ``every_months`` calendar grid line
    (grid anchored at month 0 = January year 0, so 'every 3 months'
    means calendar quarters).  Calendar months are variable-width —
    no fixed ``every_seconds`` can express them."""
    m = F.year(ts_col) * 12 + F.month(ts_col) - 1
    mb = m - (m % F.lit(int(every_months)))
    return F.make_date(
        (mb / 12).cast("int"), (mb % 12 + 1).cast("int"), F.lit(1)
    ).cast("timestamp")


def gapfill_months(
    df: DataFrame,
    ts_col: str,
    every_months: int,
    group_cols: Sequence[str],
    value_aggs: Dict[str, Column],
    fills: Optional[Dict[str, str]] = None,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Calendar-interval twin of :func:`gapfill`: buckets are
    ``every_months`` calendar months (quarters = 3, years = 12) — the
    grid TimescaleDB spells ``time_bucket_gapfill('1 month', ...)``.

    Same contract as gapfill: one row per group per grid bucket between
    the group's first and last observed bucket, ``n_rows``/``is_gap``
    flags, per-column null/zero/locf/linear fills.  Linear
    interpolation weights by grid distance (month index), not wall
    seconds — a Feb→Apr hole interpolates March at exactly 1/2 even
    though the months differ in length.

    Scale shape identical to gapfill: bucket agg, tiny per-group span
    agg, a guarded ``sequence(lo, hi, INTERVAL n MONTH)`` explode, a
    co-partitioned left join, one window per group for fills.
    """
    fills = dict(fills or {})
    bad = {k: v for k, v in fills.items() if v not in _FILLS}
    if bad:
        raise ValueError(f"unknown fill strategies {bad}; use {_FILLS}")
    unknown = set(fills) - set(value_aggs)
    if unknown:
        raise ValueError(f"fills for unknown value columns {sorted(unknown)}")
    group_cols = list(group_cols)
    step = int(every_months)

    observed = (
        df.withColumn("__bucket__", month_bucket(F.col(ts_col), step))
        .groupBy(*group_cols, "__bucket__")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[c.alias(name) for name, c in value_aggs.items()],
        )
    )
    span = observed.groupBy(*group_cols).agg(
        F.min("__bucket__").alias("__lo__"),
        F.max("__bucket__").alias("__hi__"),
    )
    midx = lambda c: F.year(c) * 12 + F.month(c) - 1  # noqa: E731
    n_buckets = (midx(F.col("__hi__")) - midx(F.col("__lo__"))) / F.lit(step) + 1
    hi_guarded = F.when(
        n_buckets <= F.lit(int(max_buckets)), F.col("__hi__")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "gapfill_months: a group spans %s buckets (> max_buckets=%s); "
                "widen every_months or filter outlier timestamps",
                n_buckets.cast("long").cast("string"),
                F.lit(int(max_buckets)).cast("string"),
            )
        ).cast("timestamp")
    )
    spine = span.select(
        *group_cols,
        F.explode(
            F.sequence(
                F.col("__lo__"), hi_guarded,
                F.expr(f"INTERVAL {step} MONTHS"),
            )
        ).alias("__bucket__"),
    )
    out = spine.join(observed, group_cols + ["__bucket__"], "left")
    out = _apply_fills(out, group_cols, fills, x_axis=midx(F.col("__bucket__")))
    return out.withColumnRenamed("__bucket__", "bucket_ts")


# ---------------------------------------------------------------------------
# Rolling statistics / anomaly detection / bounded-lookback EWMA
# ---------------------------------------------------------------------------


def rolling_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    n: int,
    tiebreak_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-group trailing-``n``-row statistics (current row included):
    adds roll_mean / roll_std (sample) / roll_min / roll_max / roll_n.

    One window pass — Spark keeps only the n-row frame in state, so
    per-key series length is unbounded.  ``tiebreak_cols`` make the
    frame deterministic when ``order_col`` has duplicates (always pass
    one for oracle-checked pipelines)."""
    order = [F.col(order_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order).rowsBetween(-(n - 1), 0)
    x = F.col(value_col)
    return (
        df.withColumn("roll_mean", F.avg(x).over(w))
        .withColumn("roll_std", F.stddev_samp(x).over(w))
        .withColumn("roll_min", F.min(x).over(w))
        .withColumn("roll_max", F.max(x).over(w))
        .withColumn("roll_n", F.count(x).over(w).cast("int"))
    )


def zscore_anomalies(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    n: int = 20,
    threshold: float = 3.0,
    min_history: int = 5,
    tiebreak_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Trailing-window z-score anomaly flags: each value is scored
    against the mean/std of the PREVIOUS ``n`` rows in its group
    (frame excludes the current row, so an outlier cannot dilute its
    own baseline — the standard online-monitoring formulation).

    Adds zscore (null until ``min_history`` prior rows exist or when
    the baseline std is 0) and is_anomaly (|z| > threshold; null
    zscore -> false).  One window pass, bounded state, no shuffle
    beyond the group-key exchange."""
    order = [F.col(order_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order).rowsBetween(-n, -1)
    x = F.col(value_col)
    mean_p = F.avg(x).over(w)
    std_p = F.stddev_samp(x).over(w)
    hist = F.count(x).over(w)
    z = F.when(
        (hist >= min_history) & std_p.isNotNull() & (std_p > 0.0),
        (x - mean_p) / std_p,
    )
    return df.withColumn("zscore", z).withColumn(
        "is_anomaly", F.coalesce(F.abs(z) > threshold, F.lit(False))
    )


def rolling_ewma(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float,
    lookback: int = 64,
    out_col: str = "ewma",
    tiebreak_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Bounded-lookback exponentially-weighted moving average (the
    feature-store decay window): per row,

        ewma_t = sum_{i=0..L-1} (1-a)^i * x_{t-i} / sum_{i present} (1-a)^i

    i.e. pandas ``ewm(alpha=a, adjust=True)`` truncated to the last
    ``lookback`` rows.  Truncation is what makes it distributed-exact:
    the window frame carries L values, never the whole series, and with
    (1-a)^L below double roundoff the truncated value equals the
    unbounded one anyway (a=0.3, L=64 -> (0.7)^64 ~ 1e-10 tail mass).

    Implemented as collect_list over the row frame + a JVM fold
    (``aggregate``) — sequential fold order, so external engines replay
    the float sum exactly."""
    order = [F.col(order_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(-(lookback - 1), 0)
    )
    decay = 1.0 - alpha
    frame = F.collect_list(F.col(value_col).cast("double")).over(w)
    # weight of element j in a frame of size s is (1-a)^(s-1-j): the
    # frame is oldest-first, the current row is last with weight 1.
    num = F.aggregate(
        F.zip_with(
            frame,
            F.sequence(F.lit(0), F.size(frame) - 1),
            lambda x, j: x * F.pow(F.lit(decay), (F.size(frame) - 1 - j).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    den = F.aggregate(
        F.sequence(F.lit(0), F.size(frame) - 1),
        F.lit(0.0),
        lambda acc, j: acc + F.pow(F.lit(decay), j.cast("double")),
    )
    return df.withColumn(out_col, num / den)


def histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Equi-width histogram (optionally per group): (group...,
    bin (0-based), lo, hi, n) with edges derived from the per-group
    min/max — the distribution-profiling primitive next to ANALYZE's
    scalar stats.  The max value lands in the LAST bin (right edge
    closed there, half-open elsewhere — numpy.histogram semantics);
    empty bins are emitted with n = 0 so the shape is always complete.

    Scale shape: one map-side-combined min/max agg (group-count-sized,
    broadcast back), one bin-id projection + count agg, one
    ``sequence()`` explode for the empty-bin spine — no UDFs, no
    collect, no second scan of the data beyond the stats pass."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    groups = list(group_cols or [])
    x = F.col(value_col).cast("double")
    stats = df.filter(x.isNotNull()).groupBy(*groups).agg(
        F.min(x).alias("__lo__"), F.max(x).alias("__hi__")
    )
    joined = (
        df.filter(x.isNotNull()).join(F.broadcast(stats), groups)
        if groups
        else df.filter(x.isNotNull()).crossJoin(F.broadcast(stats))
    )
    width = (F.col("__hi__") - F.col("__lo__")) / bins
    bin_id = F.when(F.col("__hi__") == F.col("__lo__"), F.lit(0)).otherwise(
        F.least(
            F.floor((x - F.col("__lo__")) / width).cast("int"), F.lit(bins - 1)
        )
    )
    counts = (
        joined.withColumn("__bin__", bin_id)
        .groupBy(*groups, "__bin__")
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    spine = stats.select(
        *groups,
        "__lo__",
        "__hi__",
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("__bin__"),
    )
    w = (F.col("__hi__") - F.col("__lo__")) / bins
    return (
        spine.join(counts, groups + ["__bin__"], "left")
        .select(
            *groups,
            F.col("__bin__").alias("bin"),
            F.round(F.col("__lo__") + F.col("__bin__") * w, 6).alias("lo"),
            F.round(F.col("__lo__") + (F.col("__bin__") + 1) * w, 6).alias("hi"),
            F.coalesce(F.col("__n__"), F.lit(0)).cast("bigint").alias("n"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    every_seconds: int,
    group_cols: Optional[Sequence[str]] = None,
    max_buckets_per_segment: int = 100_000,
) -> DataFrame:
    """Time-weighted average per time bucket over IRREGULAR samples —
    the TimescaleDB ``time_weight('LOCF')`` primitive Spark lacks.  A
    plain AVG over irregular samples is wrong whenever sampling density
    correlates with value (a sensor reporting 100x more often during
    spikes drags the naive mean toward the spikes); the time-weighted
    mean integrates the last-observation-carried-forward step function
    and divides by covered time.

    Semantics: each sample's value holds until the group's NEXT sample
    (LOCF).  A segment spanning bucket boundaries contributes to every
    bucket it crosses, clipped to each bucket — so a bucket with no
    samples of its own still averages the carried value (continuity
    across gaps, exactly like TimescaleDB).  Each group's LAST sample
    closes at its own timestamp (nothing extrapolates past the data);
    a group with one sample yields nothing.  Returns (group_cols...,
    bucket_ts, twa, covered_seconds) for buckets with coverage > 0.

    All clipping runs on integer epoch-MICROSECOND longs, so bucket
    membership and overlap widths are exact (no float boundary
    wobble) and any SQL engine replays them bit-for-bit.

    Scale shape: one window pass per group for lead(ts) (the shuffle
    any per-key ordering pays), an inline ``sequence`` explode whose
    fan-out is segment-duration / bucket-width — bounded by time span,
    never corpus size, and guarded by ``max_buckets_per_segment``
    (a single outlier gap must raise, not materialize an unbounded
    grid) — then ONE map-side-combined aggregation on (group, bucket).
    No UDFs, no driver rows.
    """
    group_cols = list(group_cols or [])
    step_us = int(every_seconds) * 1_000_000
    w = Window.partitionBy(
        *([F.col(c) for c in group_cols] or [F.lit(1)])
    ).orderBy("__t0__")
    seg = (
        df.select(
            *group_cols,
            F.unix_micros(F.col(ts_col)).alias("__t0__"),
            F.col(value_col).cast("double").alias("__v__"),
        )
        .withColumn("__t1__", F.lead("__t0__").over(w))
        .filter(F.col("__t1__") > F.col("__t0__"))
    )
    k0 = F.floor(F.col("__t0__") / step_us)
    k1 = F.floor((F.col("__t1__") - 1) / step_us)
    n_k = k1 - k0 + 1
    k1_guarded = F.when(
        n_k <= F.lit(int(max_buckets_per_segment)), k1
    ).otherwise(
        F.raise_error(
            F.format_string(
                "time_weighted_avg: one sample gap spans %s buckets "
                "(> max_buckets_per_segment=%s); widen every_seconds "
                "or filter outlier timestamps",
                n_k.cast("string"),
                F.lit(int(max_buckets_per_segment)).cast("string"),
            )
        ).cast("long")
    )
    per_bucket = seg.select(
        *group_cols,
        "__t0__",
        "__t1__",
        "__v__",
        F.explode(F.sequence(k0, k1_guarded)).alias("__k__"),
    ).withColumn(
        "__ov__",
        F.least(F.col("__t1__"), (F.col("__k__") + 1) * step_us)
        - F.greatest(F.col("__t0__"), F.col("__k__") * step_us),
    )
    return (
        per_bucket.groupBy(*group_cols, "__k__")
        .agg(
            (
                F.sum(F.col("__v__") * F.col("__ov__")) / F.sum("__ov__")
            ).alias("twa"),
            (F.sum("__ov__") / 1_000_000.0).alias("covered_seconds"),
        )
        .select(
            *group_cols,
            F.timestamp_micros(F.col("__k__") * step_us).alias("bucket_ts"),
            "twa",
            "covered_seconds",
        )
    )


def lttb_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    n_out: int,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013 —
    the shape-preserving decimation TimescaleDB ships as ``lttb()``),
    in the bucket-average-anchor PARALLEL form: per series keep the
    first and last points, split the interior into ``n_out − 2``
    equal-count buckets, and from each bucket keep the point whose
    triangle with the NEIGHBOR BUCKETS' average points has the largest
    area.  The sequential original anchors on the previously SELECTED
    point (an inherently serial scan); averaging the neighbor buckets
    instead is the standard parallel approximation — every bucket
    decides independently, so the whole series family downsample is
    two keyed shuffles (row numbering + bucket averages) and a rank,
    no iteration, no driver loop.

    Series shorter than ``n_out`` pass through whole.  Determinism:
    rows order by (ts, value); area ties keep the earlier point.
    Returns (key, ts, value, bucket) with bucket −1/B marking the
    endpoints.  Numerics: triangle areas are affine-invariant, so x is
    REBASED to epoch-µs minus the series minimum before any float math
    — raw epoch-µs (~1.7e15) summed over a bucket exceeds 2⁵³ and the
    bucket average would depend on partial-sum order; rebased offsets
    (series span, ≲1e12 µs) sum exactly, making the whole algebra
    bit-replayable in any engine."""
    if n_out < 3:
        raise ValueError("n_out must be at least 3 (endpoints + 1)")
    b_total = n_out - 2
    wkey = Window.partitionBy("__key__")
    base = (
        df.select(
            F.col(key_col).alias("__key__"),
            F.col(ts_col).alias("__ts__"),
            F.col(val_col).cast("double").alias("__val__"),
        )
        .withColumn("__us__", F.unix_micros(F.col("__ts__")))
        .withColumn(
            "__x__",
            (F.col("__us__") - F.min("__us__").over(wkey)).cast("double"),
        )
        .withColumn(
            "__rn__",
            F.row_number().over(wkey.orderBy("__ts__", "__val__")),
        )
        .withColumn("__cnt__", F.count(F.lit(1)).over(wkey))
    )
    small = base.filter(F.col("__cnt__") <= n_out).select(
        F.col("__key__").alias(key_col),
        F.col("__ts__").alias(ts_col),
        F.col("__val__").alias(val_col),
        F.lit(None).cast("int").alias("bucket"),
    )
    big = base.filter(F.col("__cnt__") > n_out)
    first = big.filter(F.col("__rn__") == 1)
    last = big.filter(F.col("__rn__") == F.col("__cnt__"))
    interior = big.filter(
        (F.col("__rn__") > 1) & (F.col("__rn__") < F.col("__cnt__"))
    ).withColumn(
        "__b__",
        F.floor(
            (F.col("__rn__") - 2)
            * F.lit(b_total)
            / (F.col("__cnt__") - 2)
        ).cast("int"),
    )
    avgs = interior.groupBy("__key__", "__b__").agg(
        F.avg("__x__").alias("__ax__"), F.avg("__val__").alias("__ay__")
    )
    ends = first.select(
        "__key__",
        F.col("__x__").alias("__fx__"),
        F.col("__val__").alias("__fy__"),
    ).join(
        last.select(
            "__key__",
            F.col("__x__").alias("__lx__"),
            F.col("__val__").alias("__ly__"),
        ),
        "__key__",
    )
    left = avgs.select(
        "__key__",
        (F.col("__b__") + 1).alias("__b__"),
        F.col("__ax__").alias("__lxa__"),
        F.col("__ay__").alias("__lya__"),
    )
    right = avgs.select(
        "__key__",
        (F.col("__b__") - 1).alias("__b__"),
        F.col("__ax__").alias("__rxa__"),
        F.col("__ay__").alias("__rya__"),
    )
    anch = (
        interior.join(left, ["__key__", "__b__"], "left")
        .join(right, ["__key__", "__b__"], "left")
        .join(ends, "__key__")
        .withColumn("__xl__", F.coalesce("__lxa__", "__fx__"))
        .withColumn("__yl__", F.coalesce("__lya__", "__fy__"))
        .withColumn("__xr__", F.coalesce("__rxa__", "__lx__"))
        .withColumn("__yr__", F.coalesce("__rya__", "__ly__"))
    )
    area = F.abs(
        (F.col("__xl__") - F.col("__xr__"))
        * (F.col("__val__") - F.col("__yl__"))
        - (F.col("__xl__") - F.col("__x__"))
        * (F.col("__yr__") - F.col("__yl__"))
    )
    ranked = anch.withColumn("__area__", area).withColumn(
        "__rk__",
        F.row_number().over(
            Window.partitionBy("__key__", "__b__").orderBy(
                F.col("__area__").desc(), F.col("__rn__").asc()
            )
        ),
    )
    picked = ranked.filter(F.col("__rk__") == 1).select(
        F.col("__key__").alias(key_col),
        F.col("__ts__").alias(ts_col),
        F.col("__val__").alias(val_col),
        F.col("__b__").alias("bucket"),
    )
    endpoints = first.select(
        F.col("__key__").alias(key_col),
        F.col("__ts__").alias(ts_col),
        F.col("__val__").alias(val_col),
        F.lit(-1).alias("bucket"),
    ).unionByName(
        last.select(
            F.col("__key__").alias(key_col),
            F.col("__ts__").alias(ts_col),
            F.col("__val__").alias(val_col),
            F.lit(b_total).alias("bucket"),
        )
    )
    return small.unionByName(endpoints).unionByName(picked)


def counter_agg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    every_seconds: int,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Reset-aware counter aggregation per time bucket — the TimescaleDB
    ``counter_agg`` + ``delta()``/``num_resets()`` accessor family
    Spark lacks.  Monotone counters (bytes served, requests handled)
    reset to ~0 on process restart; a naive ``max - min`` per bucket
    under-counts every bucket containing a restart, and ``sum`` of raw
    values is meaningless.  Semantics, per group and bucket over the
    in-bucket samples ordered by time:

    - consecutive pair (prev, v): increase = ``v - prev`` when
      ``v >= prev`` (normal growth), else ``v`` (the counter restarted
      from ~0 and climbed back to v — TimescaleDB's reset correction);
    - ``delta``      = sum of pair increases (the corrected growth);
    - ``num_resets`` = number of decreasing pairs;
    - ``first_value`` / ``last_value`` / ``n_samples`` for idelta-style
      downstream math.

    Scope matches ``GROUP BY time_bucket(...)``: pairs straddling a
    bucket boundary belong to neither bucket (each bucket aggregates
    only its own samples — rollups that need cross-bucket continuity
    sum the deltas of finer buckets).  Samples within a (group, bucket)
    must have distinct timestamps for the pair order — and therefore
    the reset attribution — to be well-defined.

    Scale shape: ONE window pass partitioned by (group, bucket) for the
    lag, then an aggregation on the SAME keys — Catalyst reuses the
    window's hash partitioning, so the whole operator is one exchange
    regardless of corpus size.  No UDFs, no driver-side rows.
    """
    groups = list(group_cols or [])
    bucket = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(int(every_seconds) * 1_000_000)
        )
        .cast("long")
        .alias("__bucket__")
    )
    keyed = df.select(
        *groups, F.col(ts_col).alias("__ts__"),
        F.col(value_col).alias("__v__"), bucket,
    )
    w = Window.partitionBy(*groups, "__bucket__").orderBy("__ts__")
    prev = F.lag("__v__").over(w)
    paired = keyed.select(
        *groups,
        "__bucket__",
        "__ts__",
        "__v__",
        F.when(prev.isNull(), F.lit(0))
        .when(F.col("__v__") >= prev, F.col("__v__") - prev)
        .otherwise(F.col("__v__"))
        .alias("__inc__"),
        F.when(prev.isNotNull() & (F.col("__v__") < prev), F.lit(1))
        .otherwise(F.lit(0))
        .alias("__reset__"),
    )
    return paired.groupBy(*groups, "__bucket__").agg(
        F.sum("__inc__").alias("delta"),
        F.sum("__reset__").cast("long").alias("num_resets"),
        F.count(F.lit(1)).alias("n_samples"),
        F.expr("min_by(__v__, __ts__)").alias("first_value"),
        F.expr("max_by(__v__, __ts__)").alias("last_value"),
    ).withColumnRenamed("__bucket__", "bucket_id")


def state_agg(
    df: DataFrame,
    ts_col: str,
    state_col: str,
    every_seconds: int,
    group_cols: Optional[Sequence[str]] = None,
    max_buckets_per_segment: int = 100_000,
) -> DataFrame:
    """Time-in-state per bucket — the TimescaleDB ``state_agg`` /
    ``duration_in()`` primitive: given irregular state-change samples
    (service status, machine mode, user tier), how long did each group
    spend in each state within each bucket?  A COUNT of samples per
    state answers a different (and usually wrong) question whenever
    sampling is event-driven: one 'down' sample before a quiet night is
    eleven hours of downtime, not 1/n of the bucket.

    Semantics (shared with ``time_weighted_avg``, whose LOCF clipping
    machinery this reuses): each sample's state holds until the group's
    NEXT sample; a segment contributes its overlap to every bucket it
    crosses, on exact integer epoch-microsecond arithmetic.  The last
    sample closes at its own timestamp (nothing extrapolates), single-
    sample groups yield nothing.  Returns (group_cols..., bucket_ts,
    state, duration_seconds) for overlaps > 0.

    Scale shape: one window pass per group for lead(ts), a sequence
    explode bounded by time span (guarded), then ONE map-side-combined
    aggregation on (group, bucket, state).  No UDFs, no driver rows.
    """
    group_cols = list(group_cols or [])
    step_us = int(every_seconds) * 1_000_000
    w = Window.partitionBy(
        *([F.col(c) for c in group_cols] or [F.lit(1)])
    ).orderBy("__t0__")
    seg = (
        df.select(
            *group_cols,
            F.unix_micros(F.col(ts_col)).alias("__t0__"),
            F.col(state_col).alias("__s__"),
        )
        .withColumn("__t1__", F.lead("__t0__").over(w))
        .filter(F.col("__t1__") > F.col("__t0__"))
    )
    k0 = F.floor(F.col("__t0__") / step_us)
    k1 = F.floor((F.col("__t1__") - 1) / step_us)
    n_k = k1 - k0 + 1
    k1_guarded = F.when(
        n_k <= F.lit(int(max_buckets_per_segment)), k1
    ).otherwise(
        F.raise_error(
            F.format_string(
                "state_agg: one sample gap spans %s buckets "
                "(> max_buckets_per_segment=%s); widen every_seconds "
                "or filter outlier timestamps",
                n_k.cast("string"),
                F.lit(int(max_buckets_per_segment)).cast("string"),
            )
        ).cast("long")
    )
    per_bucket = seg.select(
        *group_cols,
        "__t0__",
        "__t1__",
        "__s__",
        F.explode(F.sequence(k0, k1_guarded)).alias("__k__"),
    ).withColumn(
        "__ov__",
        F.least(F.col("__t1__"), (F.col("__k__") + 1) * step_us)
        - F.greatest(F.col("__t0__"), F.col("__k__") * step_us),
    )
    return (
        per_bucket.groupBy(*group_cols, "__k__", "__s__")
        .agg((F.sum("__ov__") / 1_000_000.0).alias("duration_seconds"))
        .select(
            *group_cols,
            F.timestamp_micros(F.col("__k__") * step_us).alias("bucket_ts"),
            F.col("__s__").alias("state"),
            "duration_seconds",
        )
    )
