"""Rolling stats / z-score anomalies / bounded-lookback EWMA
(operators/timeseries.py)."""

import math

import pandas as pd
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.timeseries import (
    rolling_ewma,
    rolling_stats,
    zscore_anomalies,
)


def _series(spark, vals, key="k"):
    return spark.createDataFrame(
        [(key, i, float(v)) for i, v in enumerate(vals)], "k string, t int, x double"
    )


def test_rolling_stats_match_pandas(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = rolling_stats(_series(spark, vals), ["k"], "t", "x", n=3)
    got = {r.t: (r.roll_mean, r.roll_std, r.roll_min, r.roll_max, r.roll_n) for r in df.collect()}
    s = pd.Series(vals)
    roll = s.rolling(3, min_periods=1)
    for t in range(len(vals)):
        mean, std = roll.mean()[t], roll.std()[t]
        assert math.isclose(got[t][0], mean, rel_tol=1e-12)
        if t == 0:
            assert got[t][1] is None  # stddev_samp of 1 row
        else:
            assert math.isclose(got[t][1], std, rel_tol=1e-12)
        assert got[t][2] == roll.min()[t] and got[t][3] == roll.max()[t]
        assert got[t][4] == min(t + 1, 3)


def test_zscore_flags_spike_not_baseline(spark):
    vals = [10.0, 11.0, 9.0, 10.0, 10.5, 9.5, 10.0, 50.0, 10.0]
    df = zscore_anomalies(
        _series(spark, vals), ["k"], "t", "x", n=6, threshold=3.0, min_history=5
    )
    rows = {r.t: r for r in df.collect()}
    assert rows[7].is_anomaly  # the 50.0 spike
    assert not any(rows[t].is_anomaly for t in range(7))
    # early rows (insufficient history) -> null zscore, false flag
    assert rows[2].zscore is None and not rows[2].is_anomaly
    # the spike is in row 8's baseline window, inflating std -> no flag
    assert not rows[8].is_anomaly


def test_zscore_excludes_current_row_from_baseline(spark):
    # all-constant history: std of prior rows is 0 -> null z, never NaN
    vals = [5.0] * 8 + [100.0]
    df = zscore_anomalies(_series(spark, vals), ["k"], "t", "x", n=5, min_history=3)
    r = {r.t: r for r in df.collect()}[8]
    assert r.zscore is None and not r.is_anomaly


def test_ewma_matches_pandas_adjusted(spark):
    # lookback >= series length -> equals pandas ewm(adjust=True) exactly
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    alpha = 0.3
    df = rolling_ewma(_series(spark, vals), ["k"], "t", "x", alpha=alpha, lookback=64)
    got = {r.t: r.ewma for r in df.collect()}
    want = pd.Series(vals).ewm(alpha=alpha, adjust=True).mean()
    for t in range(len(vals)):
        assert math.isclose(got[t], want[t], rel_tol=1e-9), (t, got[t], want[t])


def test_ewma_truncation_negligible_when_tail_underflows(spark):
    vals = [float((i * 37) % 11) for i in range(200)]
    alpha = 0.5
    full = rolling_ewma(_series(spark, vals), ["k"], "t", "x", alpha=alpha, lookback=256)
    trunc = rolling_ewma(_series(spark, vals), ["k"], "t", "x", alpha=alpha, lookback=64)
    f = {r.t: r.ewma for r in full.collect()}
    g = {r.t: r.ewma for r in trunc.collect()}
    for t in range(200):
        assert math.isclose(f[t], g[t], rel_tol=1e-12, abs_tol=1e-12)


def test_rolling_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 2.0), ("b", 0, 100.0), ("b", 1, 200.0)],
        "k string, t int, x double",
    )
    got = {(r.k, r.t): r.roll_mean for r in rolling_stats(df, ["k"], "t", "x", n=2).collect()}
    assert got == {("a", 0): 1.0, ("a", 1): 1.5, ("b", 0): 100.0, ("b", 1): 150.0}


def test_histogram_matches_numpy(spark):
    import numpy as np

    from fluss_datafusion_spark.operators.timeseries import histogram

    vals = [float(v) for v in [1, 2, 2, 3, 5, 8, 13, 21, 34, 55]]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = sorted(histogram(df, "x", bins=5).collect(), key=lambda r: r.bin)
    counts, edges = np.histogram(vals, bins=5)
    assert [r.n for r in rows] == list(counts)
    for r in rows:
        assert r.lo == round(float(edges[r.bin]), 6)
        assert r.hi == round(float(edges[r.bin + 1]), 6)


def test_histogram_constant_and_null_and_groups(spark):
    from fluss_datafusion_spark.operators.timeseries import histogram

    df = spark.createDataFrame(
        [("a", 7.0), ("a", 7.0), ("a", None), ("b", 1.0), ("b", 3.0)],
        "g string, x double",
    )
    rows = histogram(df, "x", bins=4, group_cols=["g"]).collect()
    a = [r for r in rows if r.g == "a"]
    # constant column: everything in bin 0, nulls excluded
    assert sum(r.n for r in a) == 2 and [r.n for r in a if r.bin == 0] == [2]
    b = {r.bin: r.n for r in rows if r.g == "b"}
    assert b == {0: 1, 1: 0, 2: 0, 3: 1}  # max lands in the LAST bin
    assert len(rows) == 8  # complete 4-bin spine per group
