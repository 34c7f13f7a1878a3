"""Funnel analysis (operators/funnel.py): greedy-earliest chain
semantics vs hand-computed cases + a pure-Python reference."""

import datetime as dt

import pytest

from fluss_datafusion_spark.operators.funnel import funnel, funnel_counts

T0 = dt.datetime(2024, 1, 1)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_stages_and_chain_order(spark):
    rows = [
        # u1 completes all three in order
        (1, _t(0), "view"), (1, _t(5), "click"), (1, _t(9), "purchase"),
        # u2: click BEFORE first view -> chain stops at stage 1
        (2, _t(10), "click"), (2, _t(20), "view"),
        # u3: view then purchase but never clicks -> stage 1
        (3, _t(0), "view"), (3, _t(1), "purchase"),
        # u4: no view at all -> absent from the funnel
        (4, _t(0), "click"), (4, _t(1), "purchase"),
        # u5: ties are NOT progress (strictly greater ts required)
        (5, _t(0), "view"), (5, _t(0), "click"),
    ]
    got = {
        r.user_id: (r.stage, r.t_1, r.t_2, r.t_3)
        for r in funnel(
            _df(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        ).collect()
    }
    assert got[1] == (3, _t(0), _t(5), _t(9))
    assert got[2] == (1, _t(20), None, None)
    assert got[3] == (1, _t(0), None, None)
    assert 4 not in got
    assert got[5] == (1, _t(0), None, None)


def test_funnel_greedy_earliest_anchoring(spark):
    """Greedy takes the EARLIEST step-1 event even when a later one
    would chain further — the documented chain rule."""
    rows = [
        (1, _t(0), "view"),       # anchor
        (1, _t(100), "view"),     # a later view would reach the click...
        (1, _t(50), "click"),     # ...but greedy t_1=0 still catches this
        (1, _t(40), "purchase"),  # before t_2 -> not counted
    ]
    got = funnel(
        _df(spark, rows), "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    ).collect()[0]
    assert (got.stage, got.t_1, got.t_2, got.t_3) == (2, _t(0), _t(50), None)


def test_funnel_within_window(spark):
    rows = [
        (1, _t(0), "view"), (1, _t(5), "click"), (1, _t(90), "purchase"),
        (2, _t(0), "view"), (2, _t(5), "click"), (2, _t(30), "purchase"),
    ]
    got = {
        r.user_id: r.stage
        for r in funnel(
            _df(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
            within_seconds=3600,  # 60 min
        ).collect()
    }
    assert got == {1: 2, 2: 3}  # u1's purchase falls outside the hour


def test_funnel_counts_report(spark):
    rows = [
        (1, _t(0), "view"), (1, _t(1), "click"), (1, _t(2), "purchase"),
        (2, _t(0), "view"), (2, _t(1), "click"),
        (3, _t(0), "view"),
        (4, _t(0), "view"),
    ]
    got = [
        (r.stage, r.users, r.conversion)
        for r in funnel_counts(
            _df(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        ).collect()
    ]
    assert got == [(1, 4, 1.0), (2, 2, 0.5), (3, 1, 0.25)]


def test_funnel_refusals(spark):
    df = _df(spark, [(1, _t(0), "view")])
    with pytest.raises(ValueError, match="at least 2"):
        funnel(df, "user_id", "ts", "event_type", ["view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel(df, "user_id", "ts", "event_type", ["view", "view"])


def test_cohort_retention(spark):
    from fluss_datafusion_spark.operators.funnel import cohort_retention

    rows = [
        # cohort A (week of 2024-01-01): u1 active wk0+wk1, u2 wk0 only
        (1, _t(0), "view"), (1, _t(60 * 24 * 7), "view"),
        (2, _t(10), "click"),
        # cohort B (week of 2024-01-08): u3 active wk0 and wk2
        (3, _t(60 * 24 * 7 + 5), "view"),
        (3, _t(60 * 24 * 21 + 5), "view"),
        # duplicate activity in one period counts once
        (1, _t(20), "view"),
    ]
    got = {
        (r.cohort_start, r.period_offset): (r.users, r.retention)
        for r in cohort_retention(
            _df(spark, rows), "user_id", "ts", granularity="week"
        ).collect()
    }
    a = dt.datetime(2024, 1, 1)
    b = dt.datetime(2024, 1, 8)
    assert got[(a, 0)] == (2, 1.0)
    assert got[(a, 1)] == (1, 0.5)
    assert got[(b, 0)] == (1, 1.0)
    assert got[(b, 2)] == (1, 1.0)
    assert len(got) == 4

    with pytest.raises(ValueError, match="granularity"):
        cohort_retention(_df(spark, rows), "user_id", "ts", "fortnight")


def test_ab_test_ztest_matches_scipy_free_reference(spark):
    import math

    from pyspark.sql import functions as F

    from fluss_datafusion_spark.operators.funnel import ab_test_ztest

    # control: 40/100 convert; treatment: 55/100
    rows = (
        [("g", 0, True)] * 40 + [("g", 0, False)] * 60
        + [("g", 1, True)] * 55 + [("g", 1, False)] * 45
    )
    df = spark.createDataFrame(rows, "g string, variant int, conv boolean")
    r = ab_test_ztest(df, ["g"], "variant", F.col("conv"), 0, 1).collect()[0]
    assert (r.n_control, r.n_treatment) == (100, 100)
    assert (r.rate_control, r.rate_treatment) == (0.4, 0.55)
    p = 95 / 200
    z = (0.55 - 0.4) / math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
    assert r.z_stat == round(z, 6)
    assert r.significant  # z ~ 2.13 > 1.96


def test_ab_test_ztest_degenerate_arms(spark):
    from pyspark.sql import functions as F

    from fluss_datafusion_spark.operators.funnel import ab_test_ztest

    # zero-variance (all convert) and empty-treatment groups -> null z, false
    rows = [("all", 0, True)] * 5 + [("all", 1, True)] * 5 + [("onearm", 0, True)] * 3
    df = spark.createDataFrame(rows, "g string, variant int, conv boolean")
    got = {r.g: r for r in ab_test_ztest(df, ["g"], "variant", F.col("conv"), 0, 1).collect()}
    assert got["all"].z_stat is None and not got["all"].significant
    assert got["onearm"].z_stat is None and not got["onearm"].significant
