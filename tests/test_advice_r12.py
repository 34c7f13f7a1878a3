"""ADVICE r11 regression tests: _local_pagerank's empty-personalize and
null-endpoint seams, the bounded seed collect, the check-constraint
in-window schema re-validation, and _parallel_writes chaining the WHOLE
tail of secondary failures."""

import pytest

from fluss_datafusion_spark import EngineSession
from fluss_datafusion_spark.operators import graph


def test_pagerank_empty_personalize_all_zero_both_regimes(
    spark, monkeypatch
):
    """An empty seed frame used to ZeroDivisionError in the local
    regime (1.0/len(seed_vals)) while the distributed regime degraded
    to all-zero ranks.  Both regimes now agree: all-zero."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([], "id long")
    local = {
        r.id: r.rank_norm
        for r in graph.pagerank(
            edges, "src", "dst", n_iters=3, personalize=seeds
        ).collect()
    }
    monkeypatch.setattr(graph, "_LOCAL_PR_EDGE_CAP", 0)
    dist = {
        r.id: r.rank_norm
        for r in graph.pagerank(
            edges, "src", "dst", n_iters=3, personalize=seeds
        ).collect()
    }
    assert local == dist == {1: 0.0, 2: 0.0, 3: 0.0}


def test_pagerank_null_endpoints_fall_through_to_distributed(spark):
    """Null ids in an int edge column become NaN floats through
    toPandas (and mixed-type ids make np.unique raise) — the local
    regime now detects nulls and returns None, so the distributed
    path's null-dropping join semantics apply in BOTH regimes."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (None, 3), (3, None)], "src long, dst long"
    )
    got = {
        r.id: r.rank_norm
        for r in graph.pagerank(edges, "src", "dst", n_iters=3).collect()
    }
    # nodes include the null endpoints' partners; ranks are finite
    assert set(got) >= {1, 2, 3}
    assert all(x == x and x >= 0 for x in got.values())  # no NaN
    # the well-connected cycle pair outranks the null-fed node 3
    assert got[1] > got[3] and got[2] > got[3]


def test_pagerank_oversized_seed_set_falls_through(spark, monkeypatch):
    """The seed collect is bounded by limit(cap+1) BEFORE the set is
    materialized; past the cap the local regime declines and the
    distributed rounds run."""
    monkeypatch.setattr(graph, "_LOCAL_PR_EDGE_CAP", 4)
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame(
        [(i,) for i in range(1, 9)], "id long"
    )  # 8 distinct seeds > cap=4; edges (2) stay under it
    got = {
        r.id: r.rank_norm
        for r in graph.pagerank(
            edges, "src", "dst", n_iters=3, personalize=seeds
        ).collect()
    }
    assert set(got) == {1, 2, 3}
    # seeds 1..8 dilute the teleport: in-graph mass is only 3/8 of the
    # distribution, so total rank_norm < N
    assert 0 < sum(got.values()) < 3


def test_check_constraint_revalidated_against_reloaded_spec(
    spark, tmp_path
):
    """ADVICE r11: the validation scan runs pre-lock, so a concurrent
    DROP COLUMN landing between the scan and the spec window must be
    caught INSIDE the window — the reloaded spec no longer resolves the
    expr, and the constraint must be refused, not committed stale."""
    wh = str(tmp_path / "wh_ck_race")
    a = EngineSession(spark=spark, warehouse=wh)
    a.sql(
        "CREATE TABLE rt (id BIGINT NOT NULL, v BIGINT, PRIMARY KEY (id))"
    )
    a.sql("INSERT INTO rt VALUES (1, 5)")
    b = EngineSession(spark=spark, warehouse=wh)

    real_read = a.catalog.read

    def racing_read(name, *args, **kwargs):
        df = real_read(name, *args, **kwargs)
        # session B wins the race: the referenced column vanishes after
        # A's validation scan plan is built but before A takes the lock
        b.sql("ALTER TABLE rt DROP COLUMN v")
        return df

    a.catalog.read = racing_read
    try:
        with pytest.raises(ValueError, match="no longer resolves"):
            a.catalog.add_check_constraint("rt", "v_pos", "v > 0")
    finally:
        a.catalog.read = real_read
    # nothing stale committed — a fresh session sees zero constraints
    c = EngineSession(spark=spark, warehouse=wh)
    assert c.catalog.get_table("rt").check_constraints == {}


def test_parallel_writes_chains_entire_error_tail():
    """Three concurrent failures: every exception must survive in the
    __cause__ chain (r11 chained only errs[1])."""
    from fluss_datafusion_spark.operators.incremental import (
        _parallel_writes,
    )

    def boom(msg):
        def _t():
            raise RuntimeError(msg)

        return _t

    with pytest.raises(RuntimeError) as ei:
        _parallel_writes(boom("one"), boom("two"), boom("three"))
    msgs = set()
    exc = ei.value
    while exc is not None:
        msgs.add(str(exc))
        exc = exc.__cause__
    assert msgs == {"one", "two", "three"}
