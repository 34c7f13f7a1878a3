"""Gap filling / resampling (operators/timeseries.py).

Hard signals: exact bucket grid per group (span-bounded, epoch-aligned),
locf/linear/zero fill values against hand-computed expectations, group
isolation (locf never crosses groups), observed-but-null aggregates,
and the spine-size guard."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from fluss_datafusion_spark.operators.timeseries import gapfill, time_bucket


def _df(spark):
    d = datetime.datetime
    rows = [
        ("a", d(2026, 1, 1, 0, 0, 30), 10.0),
        ("a", d(2026, 1, 1, 0, 0, 45), 20.0),
        ("a", d(2026, 1, 1, 0, 3, 10), 40.0),  # minutes 1, 2 are gaps
        ("b", d(2026, 1, 1, 0, 5, 0), 5.0),
    ]
    return spark.createDataFrame(rows, "g string, ts timestamp, v double")


def test_gapfill_grid_and_fills(spark):
    out = gapfill(
        _df(spark), "ts", 60, ["g"],
        {
            "avg_v": F.avg("v"), "locf_v": F.avg("v"),
            "lin_v": F.avg("v"), "zero_v": F.sum("v"),
        },
        fills={"locf_v": "locf", "lin_v": "linear", "zero_v": "zero"},
    ).orderBy("g", "bucket_ts")
    rows = [
        (r.g, r.bucket_ts.minute, r.n_rows, r.is_gap, r.avg_v,
         r.locf_v, round(r.lin_v, 4), r.zero_v)
        for r in out.collect()
    ]
    assert rows == [
        ("a", 0, 2, False, 15.0, 15.0, 15.0, 30.0),
        ("a", 1, 0, True, None, 15.0, round(15 + 25 / 3, 4), 0.0),
        ("a", 2, 0, True, None, 15.0, round(15 + 50 / 3, 4), 0.0),
        ("a", 3, 1, False, 40.0, 40.0, 40.0, 40.0),
        ("b", 5, 1, False, 5.0, 5.0, 5.0, 5.0),  # locf isolated per group
    ]


def test_gapfill_null_observed_bucket_edges(spark):
    # an OBSERVED bucket whose aggregate is null (all values null):
    # linear must interpolate through it; the leading edge (no previous
    # observation) carries the NEXT value backward
    d = datetime.datetime
    rows = [
        ("g", d(2026, 1, 1, 0, 0, 0), None),
        ("g", d(2026, 1, 1, 0, 1, 0), 10.0),
        ("g", d(2026, 1, 1, 0, 2, 0), None),
        ("g", d(2026, 1, 1, 0, 3, 0), 30.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = gapfill(
        df, "ts", 60, ["g"], {"v": F.avg("v")}, fills={"v": "linear"}
    ).orderBy("bucket_ts")
    got = [(r.n_rows, r.is_gap, r.v) for r in out.collect()]
    assert got == [
        (1, False, 10.0),   # leading edge: next value carried back
        (1, False, 10.0),
        (1, False, 20.0),   # interpolated through the null bucket
        (1, False, 30.0),
    ]


def test_gapfill_epoch_alignment_and_buckets(spark):
    b = _df(spark).select(time_bucket(F.col("ts"), 3600).alias("b")).collect()
    assert all(r.b.minute == 0 and r.b.second == 0 for r in b)


def test_gapfill_guard_and_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="unknown fill"):
        gapfill(df, "ts", 60, ["g"], {"v": F.avg("v")}, fills={"v": "ffill"})
    with pytest.raises(ValueError, match="unknown value columns"):
        gapfill(df, "ts", 60, ["g"], {"v": F.avg("v")}, fills={"w": "locf"})
    guarded = gapfill(df, "ts", 1, ["g"], {"v": F.avg("v")}, max_buckets=10)
    with pytest.raises(Exception, match="max_buckets"):
        guarded.collect()  # group 'a' spans 161 one-second buckets


def test_gapfill_single_shuffle_shape(spark):
    """The observed agg must be partial (map-side combined) and the
    whole job must stay keyed on the group columns — no single-
    partition exchange anywhere."""
    plan = gapfill(
        _df(spark), "ts", 60, ["g"], {"v": F.avg("v")}, fills={"v": "locf"}
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_gapfill_months_grid_and_linear_by_month_index(spark):
    from fluss_datafusion_spark.operators.timeseries import gapfill_months

    d = datetime.datetime
    rows = [
        ("a", d(2026, 1, 15), 10.0),
        ("a", d(2026, 4, 2), 40.0),   # Feb, Mar are gaps
        ("b", d(2026, 2, 1), 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = gapfill_months(
        df, "ts", 1, ["g"],
        {"avg_v": F.avg("v"), "lin_v": F.avg("v"), "locf_v": F.avg("v")},
        fills={"lin_v": "linear", "locf_v": "locf"},
    ).orderBy("g", "bucket_ts")
    rows = [
        (r.g, r.bucket_ts.month, r.bucket_ts.day, r.n_rows, r.is_gap,
         r.avg_v, r.lin_v, r.locf_v)
        for r in out.collect()
    ]
    # linear weights by MONTH INDEX: Feb = 10 + 30*(1/3), Mar = 10 + 30*(2/3)
    # despite Feb (28d) and Mar (31d) having different lengths
    assert rows == [
        ("a", 1, 1, 1, False, 10.0, 10.0, 10.0),
        ("a", 2, 1, 0, True, None, 20.0, 10.0),
        ("a", 3, 1, 0, True, None, 30.0, 10.0),
        ("a", 4, 1, 1, False, 40.0, 40.0, 40.0),
        ("b", 2, 1, 1, False, 5.0, 5.0, 5.0),
    ]


def test_gapfill_months_quarters_and_year_boundary(spark):
    from fluss_datafusion_spark.operators.timeseries import gapfill_months

    d = datetime.datetime
    rows = [
        ("x", d(2025, 11, 20), 1.0),  # Q4 2025 (Oct-Dec)
        ("x", d(2026, 7, 4), 7.0),    # Q3 2026; Q1, Q2 2026 are gaps
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = gapfill_months(
        df, "ts", 3, ["g"], {"s": F.sum("v")}, fills={"s": "zero"}
    ).orderBy("bucket_ts")
    got = [(r.bucket_ts.year, r.bucket_ts.month, r.s, r.is_gap)
           for r in out.collect()]
    assert got == [
        (2025, 10, 1.0, False),
        (2026, 1, 0.0, True),
        (2026, 4, 0.0, True),
        (2026, 7, 7.0, False),
    ]


def test_gapfill_months_guard(spark):
    from fluss_datafusion_spark.operators.timeseries import gapfill_months

    d = datetime.datetime
    df = spark.createDataFrame(
        [("g", d(1990, 1, 1), 1.0), ("g", d(2026, 1, 1), 2.0)],
        "g string, ts timestamp, v double",
    )
    out = gapfill_months(df, "ts", 1, ["g"], {"s": F.sum("v")}, max_buckets=100)
    with pytest.raises(Exception, match="max_buckets"):
        out.collect()


def test_time_weighted_avg_locf_clipping(spark):
    """Hand-computed: segments split and clip across bucket boundaries;
    the last sample closes the series; naive AVG would differ."""
    from fluss_datafusion_spark.operators.timeseries import (
        time_weighted_avg,
    )

    df = spark.createDataFrame(
        [
            ("s", "2024-01-01 00:00:00", 10.0),
            ("s", "2024-01-01 00:01:30", 20.0),
            ("s", "2024-01-01 00:02:00", 99.0),  # closes; no segment out
            ("t", "2024-01-01 00:00:30", 4.0),
            ("t", "2024-01-01 00:03:30", 8.0),   # 3-min gap spans b0..b3
        ],
        "k string, ts string, v double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    got = {
        (r.k, str(r.bucket_ts)): (r.twa, r.covered_seconds)
        for r in time_weighted_avg(df, "ts", "v", 60, ["k"]).collect()
    }
    assert got[("s", "2024-01-01 00:00:00")] == (10.0, 60.0)
    assert got[("s", "2024-01-01 00:01:00")] == (15.0, 60.0)
    # t: value 4 held from 00:00:30 to 00:03:30 (LOCF across empty buckets)
    assert got[("t", "2024-01-01 00:00:00")] == (4.0, 30.0)
    assert got[("t", "2024-01-01 00:01:00")] == (4.0, 60.0)
    assert got[("t", "2024-01-01 00:02:00")] == (4.0, 60.0)
    assert got[("t", "2024-01-01 00:03:00")] == (4.0, 30.0)
    # single-sample groups / post-last time never appear
    assert ("s", "2024-01-01 00:02:00") not in got


def test_time_weighted_avg_density_independent(spark):
    """100 samples of value 1 in the first second + one sample of 0 for
    the rest of the bucket: naive AVG ~ 0.99, TWA ~ 1/60."""
    from fluss_datafusion_spark.operators.timeseries import (
        time_weighted_avg,
    )

    rows = [
        ("k", f"2024-01-01 00:00:00.{i:02d}", 1.0) for i in range(100)
    ] + [("k", "2024-01-01 00:00:01", 0.0), ("k", "2024-01-01 00:01:00", 5.0)]
    df = spark.createDataFrame(
        rows, "k string, ts string, v double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    row = time_weighted_avg(df, "ts", "v", 60, ["k"]).collect()[0]
    assert abs(row.twa - 1.0 / 60.0) < 1e-9
    assert row.covered_seconds == 60.0


def test_time_weighted_avg_segment_guard(spark):
    import pytest

    from fluss_datafusion_spark.operators.timeseries import (
        time_weighted_avg,
    )

    df = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", 1.0), ("k", "2024-03-01 00:00:00", 2.0)],
        "k string, ts string, v double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    with pytest.raises(Exception, match="max_buckets_per_segment"):
        time_weighted_avg(
            df, "ts", "v", 60, ["k"], max_buckets_per_segment=100
        ).collect()


def test_lttb_downsample_matches_pure_python(spark):
    """The parallel LTTB (bucket-average anchors) replays exactly in
    pure Python: endpoints kept, per-bucket largest-triangle picks,
    spike preservation, short-series passthrough, n_out guard."""
    import datetime

    import pytest as _pytest

    from fluss_datafusion_spark.operators.timeseries import lttb_downsample

    rows = []
    vals = {}
    for k in (1, 2):
        n = 37 if k == 1 else 5
        series = []
        for i in range(n):
            v = 500.0 if (k == 1 and i == 13) else float((7 * i) % 23)
            series.append(v)
            rows.append(
                (
                    k,
                    datetime.datetime(2024, 1, 1)
                    + datetime.timedelta(minutes=3 * i),
                    v,
                )
            )
        vals[k] = series
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    n_out = 8
    got = {
        k: sorted(
            (r.ts, r.v, r.bucket)
            for r in lttb_downsample(df, "k", "ts", "v", n_out)
            .filter(f"k = {k}")
            .collect()
        )
        for k in (1, 2)
    }
    # short series passes through whole
    assert len(got[2]) == 5 and all(b is None for _, _, b in got[2])

    # pure-python parallel LTTB on series 1
    series = vals[1]
    n, B = len(series), n_out - 2
    xs = [3 * 60 * 1e6 * i for i in range(n)]  # µs offsets (rebased)
    xs = [x - xs[0] for x in xs]
    buckets = {}
    for rn in range(2, n):  # 1-based interior rn in [2, n-1]
        b = (rn - 2) * B // (n - 2)
        buckets.setdefault(b, []).append(rn - 1)  # 0-based idx
    avg = {
        b: (
            sum(xs[i] for i in idxs) / len(idxs),
            sum(series[i] for i in idxs) / len(idxs),
        )
        for b, idxs in buckets.items()
    }
    expected = {0, n - 1}
    for b, idxs in buckets.items():
        xl, yl = avg[b - 1] if b - 1 in avg else (xs[0], series[0])
        xr, yr = avg[b + 1] if b + 1 in avg else (xs[-1], series[-1])
        best = max(
            idxs,
            key=lambda i: (
                abs((xl - xr) * (series[i] - yl) - (xl - xs[i]) * (yr - yl)),
                -i,
            ),
        )
        expected.add(best)
    exp_rows = sorted(
        (
            datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=3 * i),
            series[i],
        )
        for i in expected
    )
    assert [(t, v) for t, v, _ in got[1]] == exp_rows
    assert any(v == 500.0 for _, v, _ in got[1])  # the spike survives
    with _pytest.raises(ValueError):
        lttb_downsample(df, "k", "ts", "v", 2)


def test_counter_agg_reset_semantics(spark):
    """Hand-computed reset arithmetic: growth, one restart mid-bucket,
    bucket-boundary pairs excluded, singleton bucket yields delta 0."""
    from fluss_datafusion_spark.operators.timeseries import counter_agg

    rows = [
        # series a, bucket 0 (ts < 3600): 10 -> 25 -> 5 -> 12
        # pairs: +15, reset(+5), +7  => delta 27, resets 1
        ("a", 100, 10), ("a", 200, 25), ("a", 300, 5), ("a", 400, 12),
        # series a, bucket 1: single sample => delta 0, resets 0
        ("a", 3700, 2),
        # series b, bucket 0: monotone 1 -> 4 -> 9 => delta 8
        ("b", 150, 1), ("b", 250, 4), ("b", 350, 9),
    ]
    df = spark.createDataFrame(
        [(s, float(ts), v) for s, ts, v in rows],
        "series string, epoch double, v bigint",
    ).select(
        "series", F.col("epoch").cast("timestamp").alias("ts"), "v"
    )
    out = {
        (r.series, r.bucket_id): (
            r.delta, r.num_resets, r.n_samples, r.first_value, r.last_value
        )
        for r in counter_agg(df, "ts", "v", 3600, ["series"]).collect()
    }
    assert out == {
        ("a", 0): (27, 1, 4, 10, 12),
        ("a", 1): (0, 0, 1, 2, 2),
        ("b", 0): (8, 0, 3, 1, 9),
    }


def test_state_agg_locf_clipping(spark):
    """Hand-computed duration-in-state: LOCF across a quiet stretch,
    clipping across bucket boundaries, last sample closes the series."""
    from fluss_datafusion_spark.operators.timeseries import state_agg

    rows = [
        # up at t=0 .. down at t=3000 .. up at t=7500 .. (end, t=9000)
        ("svc", 0, "up"), ("svc", 3000, "down"),
        ("svc", 7500, "up"), ("svc", 9000, "up"),
    ]
    df = spark.createDataFrame(
        [(g, float(ts), s) for g, ts, s in rows],
        "g string, epoch double, s string",
    ).select("g", F.col("epoch").cast("timestamp").alias("ts"), "s")
    out = {
        (r.g, r.bucket_ts.timestamp(), r.state): r.duration_seconds
        for r in state_agg(df, "ts", "s", 3600, ["g"]).collect()
    }
    assert out == {
        # bucket 0: up 0-3000 (3000s), down 3000-3600 (600s)
        ("svc", 0.0, "up"): 3000.0,
        ("svc", 0.0, "down"): 600.0,
        # bucket 1: down 3600-7200 (3600s) — LOCF through the quiet hour
        ("svc", 3600.0, "down"): 3600.0,
        # bucket 2: down 7200-7500 (300s), up 7500-9000 (1500s); the
        # final sample closes the series at t=9000
        ("svc", 7200.0, "down"): 300.0,
        ("svc", 7200.0, "up"): 1500.0,
    }
