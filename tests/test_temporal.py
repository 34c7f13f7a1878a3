"""Event-time temporal table join (operators/temporal.py): facts join
the dimension version current at their own event time, derived from
the PK table's log + commit clocks."""

import time

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.operators.temporal import (
    table_history,
    temporal_enrich,
    temporal_join,
)


@pytest.fixture()
def dim_session(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_temporal"))
    e.sql("CREATE TABLE dim (k BIGINT NOT NULL, attr STRING, PRIMARY KEY (k))")
    return e


def test_table_history_versions_and_tombstones(dim_session):
    e = dim_session
    e.sql("INSERT INTO dim VALUES (1, 'v1'), (2, 'x')")          # seq 1
    e.sql("INSERT INTO dim VALUES (1, 'v2')")                    # seq 2
    e.sql("DELETE FROM dim WHERE k = 2")                         # seq 3
    hist = table_history(e.catalog, "dim").collect()
    rows = {(r.k, r["__valid_from_seq__"]): (r.attr, r["__tombstone__"]) for r in hist}
    assert rows[(1, 1)] == ("v1", False)
    assert rows[(1, 2)] == ("v2", False)
    assert rows[(2, 1)] == ("x", False)
    assert rows[(2, 3)][1] is True
    # commit clocks are monotone over seq
    ts = {r["__valid_from_seq__"]: r["__valid_from_ts__"] for r in hist}
    assert ts[1] <= ts[2] <= ts[3]


def test_temporal_join_by_seq(dim_session, spark):
    e = dim_session
    e.sql("INSERT INTO dim VALUES (1, 'v1'), (2, 'x')")          # seq 1
    e.sql("INSERT INTO dim VALUES (1, 'v2')")                    # seq 2
    e.sql("DELETE FROM dim WHERE k = 2")                         # seq 3
    e.sql("INSERT INTO dim VALUES (2, 'xx')")                    # seq 4
    facts = spark.createDataFrame(
        [(10, 1, 1), (11, 1, 2), (12, 2, 2), (13, 2, 3), (14, 2, 4), (15, 3, 4),
         (16, 1, 0)],
        "fact_id bigint, k bigint, at_seq bigint",
    )
    hist = table_history(e.catalog, "dim")
    got = {
        r.fact_id: r.attr
        for r in temporal_join(
            facts, None, hist, ["k"], use_seq=True, fact_seq_col="at_seq"
        ).collect()
    }
    assert got == {
        10: "v1",   # at seq 1, key 1 -> v1
        11: "v2",   # at seq 2 -> upgraded
        12: "x",    # key 2 alive at seq 2
        13: None,   # deleted at seq 3
        14: "xx",   # re-inserted at seq 4
        15: None,   # key 3 never existed
        16: None,   # before the first version
    }


def test_temporal_enrich_wall_clock(dim_session, spark):
    e = dim_session
    e.sql("INSERT INTO dim VALUES (1, 'old')")
    time.sleep(0.05)
    import datetime

    mid = datetime.datetime.utcnow()
    time.sleep(0.05)
    e.sql("INSERT INTO dim VALUES (1, 'new')")
    late = datetime.datetime.utcnow() + datetime.timedelta(seconds=1)
    facts = spark.createDataFrame(
        [(100, 1, mid), (101, 1, late)], "fact_id bigint, k bigint, ts timestamp"
    )
    got = {
        r.fact_id: r.attr
        for r in temporal_enrich(e.catalog, facts, "ts", "dim", ["k"]).collect()
    }
    assert got == {100: "old", 101: "new"}


def test_temporal_join_refuses_appendonly(dim_session, spark):
    e = dim_session
    e.sql("CREATE TABLE applog (k BIGINT, v STRING)")
    with pytest.raises(ValueError, match="primary-key"):
        table_history(e.catalog, "applog")


# -- asof directions + tolerance (r8: pandas merge_asof parity) ---------------


def _asof(spark, left, right, **kw):
    from fluss_datafusion_spark.operators.asof import asof_join

    l = spark.createDataFrame(left, "k string, lts timestamp, lv long")
    r = spark.createDataFrame(right, "k string, rts timestamp, rv long")
    out = asof_join(l, r, ["k"], "lts", "rts", ["rv"], **kw)
    return {(row.k, str(row.lts)): row.rv for row in out.collect()}


import datetime as _dt


def _t(s):
    return _dt.datetime.fromisoformat(s)


_LEFT = [("a", _t("2024-01-01 00:10:00"), 1)]
_RIGHT = [
    ("a", _t("2024-01-01 00:07:00"), 70),
    ("a", _t("2024-01-01 00:12:00"), 120),
]


def test_asof_forward_and_nearest(spark):
    key = ("a", "2024-01-01 00:10:00")
    assert _asof(spark, _LEFT, _RIGHT, direction="backward")[key] == 70
    assert _asof(spark, _LEFT, _RIGHT, direction="forward")[key] == 120
    # 3 min back vs 2 min forward -> forward wins
    assert _asof(spark, _LEFT, _RIGHT, direction="nearest")[key] == 120


def test_asof_nearest_tie_goes_backward(spark):
    right = [
        ("a", _t("2024-01-01 00:08:00"), 80),
        ("a", _t("2024-01-01 00:12:00"), 120),
    ]
    key = ("a", "2024-01-01 00:10:00")
    assert _asof(spark, _LEFT, right, direction="nearest")[key] == 80


def test_asof_exact_match_semantics_per_direction(spark):
    right = [("a", _t("2024-01-01 00:10:00"), 100),
             ("a", _t("2024-01-01 00:20:00"), 200)]
    key = ("a", "2024-01-01 00:10:00")
    assert _asof(spark, _LEFT, right, direction="forward")[key] == 100
    assert (
        _asof(spark, _LEFT, right, direction="forward",
              allow_exact_matches=False)[key]
        == 200
    )
    # nearest + exclude-exact must skip the equal-ts row in BOTH
    # directions (the bug a shared sort order would reintroduce)
    assert (
        _asof(spark, _LEFT, right, direction="nearest",
              allow_exact_matches=False)[key]
        == 200
    )


def test_asof_tolerance(spark):
    key = ("a", "2024-01-01 00:10:00")
    assert (
        _asof(spark, _LEFT, _RIGHT, direction="backward",
              tolerance_seconds=60)[key]
        is None
    )
    assert (
        _asof(spark, _LEFT, _RIGHT, direction="backward",
              tolerance_seconds=200)[key]
        == 70
    )
    assert (
        _asof(spark, _LEFT, _RIGHT, direction="nearest",
              tolerance_seconds=130)[key]
        == 120
    )
