"""Feature-store point-in-time join (operators/asof.point_in_time_join)."""

def test_point_in_time_join_no_leakage_and_tolerance(spark):
    """PIT join: features strictly from the past-or-present per fact;
    per-table tolerance nulls stale features; fact count invariant."""
    import datetime

    from fluss_datafusion_spark.operators.asof import point_in_time_join

    def ts(d, h=0):
        return datetime.datetime(2024, 1, d, h)

    facts = spark.createDataFrame(
        [(1, ts(10)), (1, ts(20)), (2, ts(15))], "user_id long, ts timestamp"
    )
    f1 = spark.createDataFrame(
        [(1, ts(9), 1.0), (1, ts(11), 2.0), (2, ts(1), 5.0)],
        "user_id long, fts timestamp, score double",
    )
    f2 = spark.createDataFrame(
        [(1, ts(19, 12), 7.0)], "user_id long, fts timestamp, other double"
    )
    out = point_in_time_join(
        facts,
        [
            {"df": f1, "on": ["user_id"], "ts": "fts", "values": ["score"]},
            {
                "df": f2,
                "on": ["user_id"],
                "ts": "fts",
                "values": ["other"],
                "tolerance_seconds": 86400,
            },
        ],
        fact_ts="ts",
    )
    rows = {(r.user_id, r.ts): r for r in out.collect()}
    assert len(rows) == 3  # fact count invariant
    # fact at day 10 must NOT see the day-11 feature (leakage)
    assert rows[(1, ts(10))].score == 1.0
    assert rows[(1, ts(20))].score == 2.0
    assert rows[(2, ts(15))].score == 5.0  # old but no tolerance on f1
    # f2: within 1 day of the day-20 fact only
    assert rows[(1, ts(20))].other == 7.0
    assert rows[(1, ts(10))].other is None
    assert rows[(2, ts(15))].other is None  # no f2 rows for user 2
