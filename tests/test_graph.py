"""PageRank: exact math vs a pure-Python power iteration, mass
conservation, dangling redistribution, and degree stats."""

import pytest

from fluss_datafusion_spark.operators import graph

# a small graph with a hub (1 -> everyone), a dangling node (4), a
# self-loop (5 -> 5) and a 2-cycle (2 <-> 3)
EDGES = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (3, 2), (5, 5)]


def _py_pagerank(edges, d=0.85, iters=3):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dm = sum(r[v] for v in nodes if v not in outdeg)
        c = {v: 0.0 for v in nodes}
        for s, t in edges:
            c[t] += r[s] / outdeg[s]
        r = {v: (1 - d) / n + d * (c[v] + dm / n) for v in nodes}
    return {v: round(r[v] * n, 5) for v in nodes}


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_pagerank_matches_reference(spark, edges_df):
    got = {r.id: r.rank_norm for r in
           graph.pagerank(edges_df, "src", "dst").collect()}
    assert got == _py_pagerank(EDGES)


def test_pagerank_mass_conserved(spark, edges_df):
    # sum of raw ranks stays 1 => sum of rank_norm stays N
    out = graph.pagerank(edges_df, "src", "dst", n_iters=4).collect()
    assert abs(sum(r.rank_norm for r in out) - len(out)) < 1e-3


def test_pagerank_hub_target_beats_dangling_source(spark, edges_df):
    got = {r.id: r.rank_norm for r in
           graph.pagerank(edges_df, "src", "dst").collect()}
    # 2 and 3 feed each other and get hub mass; 4 only receives 1/4 of
    # the hub's rank and forwards nothing
    assert got[2] > got[4] and got[3] > got[4]


def test_pagerank_uniform_cycle_stays_uniform(spark):
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    got = {r.id: r.rank_norm for r in graph.pagerank(cyc, "src", "dst").collect()}
    assert got == {1: 1.0, 2: 1.0, 3: 1.0}


def test_degrees(spark, edges_df):
    got = {r.id: (r.out_deg, r.in_deg) for r in
           graph.degrees(edges_df, "src", "dst").collect()}
    assert got[1] == (4, 0)
    assert got[4] == (0, 1)   # dangling
    assert got[5] == (1, 2)   # self-loop counts both ways
    assert got[2] == (1, 2)


def _py_ppr(edges, seeds, d=0.85, iters=20):
    nodes = sorted({u for e in edges for u in e})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    v = {x: (1.0 / len(seeds) if x in seeds else 0.0) for x in nodes}
    r = dict(v)
    for _ in range(iters):
        dm = sum(r[x] for x in nodes if x not in outdeg)
        c = {x: 0.0 for x in nodes}
        for s, t in edges:
            c[t] += r[s] / outdeg[s]
        r = {x: (1 - d) * v[x] + d * (c[x] + dm * v[x]) for x in nodes}
    return {x: round(r[x] * len(nodes), 5) for x in nodes}


def test_personalized_pagerank_matches_reference(spark, edges_df):
    seeds = spark.createDataFrame([(1,)], ["id"])
    got = {r.id: r.rank_norm for r in graph.pagerank(
        edges_df, "src", "dst", n_iters=4, personalize=seeds).collect()}
    want = _py_ppr(EDGES, {1}, iters=4)
    assert got == want
    # teleport mass concentrates near the seed: recirculating
    # successors (2<->3 cycle, 5's self-loop) beat the dangling 4,
    # which forwards nothing and receives no teleport
    assert got[2] > got[4] and got[5] > got[4]


def test_personalized_pagerank_unreachable_component_is_zero(spark):
    # component {1->2} and island {8->9}; seed = 1 -> island gets 0
    g = spark.createDataFrame([(1, 2), (8, 9)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], ["id"])
    got = {r.id: r.rank_norm for r in graph.pagerank(
        g, "src", "dst", n_iters=5, personalize=seeds).collect()}
    assert got[8] == 0.0 and got[9] == 0.0
    assert got[1] > 0 and got[2] > 0


def test_pagerank_convergence_mode(spark, edges_df):
    """tol-based termination lands on the fixed point: the result
    matches a long fixed-iteration run within rounding."""
    conv = {r.id: r.rank_norm for r in graph.pagerank(
        edges_df, "src", "dst", tol=1e-9, max_iters=100).collect()}
    long = {r.id: r.rank_norm for r in graph.pagerank(
        edges_df, "src", "dst", n_iters=60).collect()}
    assert set(conv) == set(long)
    assert all(abs(conv[k] - long[k]) <= 2e-5 for k in conv)


def test_connected_components_star_vs_label_prop(spark):
    from fluss_datafusion_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (12, 13), (3, 10)],
        "src bigint, dst bigint",
    )
    want = {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 12: 1, 13: 1, 5: 5, 6: 5}
    for algo in ("star", "label_prop"):
        got = {
            r.node_id: r.component_id
            for r in connected_components(edges, algorithm=algo).collect()
        }
        assert got == want, algo


def test_connected_components_isolated_nodes(spark):
    from fluss_datafusion_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    nodes = spark.createDataFrame([(1,), (2,), (7,), (9,)], "src bigint")
    got = {
        r.node_id: r.component_id
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_connected_components_string_ids_local_regime(spark):
    """ADVICE r10: the <=200k-edge driver-local union-find must handle
    non-integer node ids (entity resolution / account linking graphs) —
    the old `node + 1` comp-min sentinel raised TypeError on strings."""
    from fluss_datafusion_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [("acct:b", "acct:a"), ("acct:c", "acct:b"), ("x", "y")],
        "src string, dst string",
    )
    for algo in ("star", "label_prop"):
        got = {
            r.node_id: r.component_id
            for r in connected_components(edges, algorithm=algo).collect()
        }
        assert got == {
            "acct:a": "acct:a",
            "acct:b": "acct:a",
            "acct:c": "acct:a",
            "x": "x",
            "y": "x",
        }, algo


def test_pagerank_forced_cap_equivalence(spark, monkeypatch):
    """r11: the driver-local numpy power iteration and the distributed
    rounds are the same arithmetic — forced past the cap, the
    distributed path must reproduce the local ranks within the
    operator's round-to-5 output contract (compared at 1e-4 to absorb
    cross-path float-sum order).  Covers uniform, personalized, and
    tol-mode, dangling nodes included."""
    import random

    import fluss_datafusion_spark.operators.graph as g

    rng = random.Random(11)
    edges = spark.createDataFrame(
        list({(rng.randrange(60), rng.randrange(80)) for _ in range(150)}),
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,), (2,), (3,)], "id long")

    def ranks(**kw):
        return {
            r.id: r.rank_norm
            for r in g.pagerank(edges, "src", "dst", **kw).collect()
        }

    for kw in (
        {"n_iters": 3},
        {"n_iters": 4, "personalize": seeds},
        {"tol": 1e-6, "max_iters": 30},
    ):
        local = ranks(**kw)
        monkeypatch.setattr(g, "_LOCAL_PR_EDGE_CAP", 0)
        dist = ranks(**kw)
        monkeypatch.undo()
        assert set(local) == set(dist) and local
        for k in local:
            assert abs(local[k] - dist[k]) < 1e-4, (kw, k)
