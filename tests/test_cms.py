"""Count-min sketch (operators/sketches.py — Cormode & Muthukrishnan
2005): never-underestimate guarantee, epsilon error bound, exact
cell-wise shard merging, weighted counts, and bit-for-bit replay
against a pure-Python reference of the same md5 hash chain."""

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import sketches as K

E = 2.718281828459045


def _bucket(seed, i, v, width):
    return int(hashlib.md5(f"{seed}|{i}|{v}".encode()).hexdigest()[:15], 16) % width


def _py_cms_estimate(values, query, width, depth, seed="cms-0"):
    cells = defaultdict(int)
    for v in values:
        for i in range(depth):
            cells[(i, _bucket(seed, i, v, width))] += 1
    return min(cells.get((i, _bucket(seed, i, query, width)), 0) for i in range(depth))


def _zipf_values(n):
    # value v{j} appears ~ n/(j+1) times: a few heavy hitters + long tail
    out = []
    j = 0
    while len(out) < n:
        out.extend([f"v{j}"] * max(1, n // (5 * (j + 1))))
        j += 1
    return out[:n]


def test_cms_never_underestimates_and_bounds(spark):
    vals = _zipf_values(4000)
    exact = Counter(vals)
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    width, depth = 128, 3
    sk = K.cms_sketch(df, ["g"], "v", width=width, depth=depth)
    cand = spark.createDataFrame(
        [("g", v) for v in exact], "g string, v string"
    )
    est = {
        r.v: r.freq_est
        for r in K.cms_estimate(sk, cand, ["g"], "v", width, depth).collect()
    }
    slack = E / width * len(vals)
    for v, true in exact.items():
        assert est[v] >= true, (v, est[v], true)
        assert est[v] <= true + slack, (v, est[v], true, slack)


def test_cms_matches_python_reference_bit_for_bit(spark):
    vals = [f"w{i % 50}" for i in range(1000)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    width, depth = 64, 4
    sk = K.cms_sketch(df, ["g"], "v", width=width, depth=depth)
    cand = spark.createDataFrame([("g", f"w{j}") for j in range(60)], "g string, v string")
    got = {
        r.v: r.freq_est
        for r in K.cms_estimate(sk, cand, ["g"], "v", width, depth).collect()
    }
    for j in range(60):  # incl. 10 never-seen values
        assert got[f"w{j}"] == _py_cms_estimate(vals, f"w{j}", width, depth)


def test_cms_shard_merge_equals_full_sketch(spark):
    vals = _zipf_values(2000)
    df1 = spark.createDataFrame([("g", v) for v in vals[:1100]], "g string, v string")
    df2 = spark.createDataFrame([("g", v) for v in vals[1100:]], "g string, v string")
    full = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    kw = dict(width=64, depth=3)
    merged = K.cms_merge(
        K.cms_sketch(df1, ["g"], "v", **kw), K.cms_sketch(df2, ["g"], "v", **kw), ["g"]
    )
    want = {
        (r["__cms_i__"], r["__cms_b__"]): r.cnt
        for r in K.cms_sketch(full, ["g"], "v", **kw).collect()
    }
    got = {(r["__cms_i__"], r["__cms_b__"]): r.cnt for r in merged.collect()}
    assert got == want


def test_cms_weighted(spark):
    df = spark.createDataFrame(
        [("g", "a", 5), ("g", "a", 7), ("g", "b", 1)], "g string, v string, w int"
    )
    width, depth = 1024, 3
    sk = K.cms_sketch(df, ["g"], "v", width=width, depth=depth, weight_col="w")
    cand = spark.createDataFrame([("g", "a"), ("g", "b")], "g string, v string")
    est = {
        r.v: r.freq_est
        for r in K.cms_estimate(sk, cand, ["g"], "v", width, depth).collect()
    }
    # wide sketch on 2 values: no collisions, estimates are exact
    assert est == {"a": 12, "b": 1}


def test_cms_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("g1", "x")] * 9 + [("g2", "x")] * 2, "g string, v string"
    )
    width, depth = 512, 3
    sk = K.cms_sketch(df, ["g"], "v", width=width, depth=depth)
    cand = df.select("g", "v").distinct()
    est = {
        (r.g, r.v): r.freq_est
        for r in K.cms_estimate(sk, cand, ["g"], "v", width, depth).collect()
    }
    assert est == {("g1", "x"): 9, ("g2", "x"): 2}
