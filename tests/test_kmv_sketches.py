"""KMV bottom-k distinct sketches (operators/sketches.py): exactness
below k, error bounds above, deterministic replay vs a pure-Python
reference, and the union/intersection algebra HLL cannot express."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import sketches as K


def _h(seed, v):
    return int(hashlib.md5(f"{seed}|{v}".encode()).hexdigest()[:15], 16)


def _py_kmv_estimate(values, k, seed="kmv-0"):
    hs = sorted({_h(seed, v) for v in values})
    if len(hs) < k:
        return float(len(hs))
    uk = hs[k - 1] / float(1 << 60)
    return round((k - 1) / uk, 4)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("g", f"v{i % 37}") for i in range(500)], "g string, v string"
    )
    got = K.kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert got.distinct_est == 37.0


def test_kmv_matches_python_reference_exactly(spark):
    vals = [f"item-{i}" for i in range(5000)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    got = K.kmv_distinct(df, ["g"], "v", k=128).collect()[0].distinct_est
    assert got == _py_kmv_estimate(vals, 128)


def test_kmv_error_bound(spark):
    n = 20000
    df = spark.createDataFrame(
        [(i % 4, f"u{i}") for i in range(n)], "g int, v string"
    )
    k = 256
    rows = K.kmv_distinct(df, ["g"], "v", k=k).collect()
    for r in rows:
        true = n / 4
        # ~1/sqrt(k-2) stderr; allow 5 sigma
        assert abs(r.distinct_est - true) / true < 5 / math.sqrt(k - 2)


def test_kmv_nulls_ignored_and_k_guard(spark):
    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "b")], "g string, v string"
    )
    assert K.kmv_distinct(df, ["g"], "v", k=8).collect()[0].distinct_est == 2.0
    with pytest.raises(ValueError, match="k must be"):
        K.kmv_sketch(df, ["g"], "v", k=1)


def test_kmv_union_equals_sketch_of_union(spark):
    """Merge-then-truncate must equal sketching the concatenated input
    — the mergeability property that makes sketches shardable."""
    a = spark.createDataFrame(
        [("g", f"a{i}") for i in range(3000)], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"a{i}") for i in range(1500, 4500)], "g string, v string"
    )
    k = 128
    su = K.kmv_union(
        K.kmv_sketch(a, ["g"], "v", k=k),
        K.kmv_sketch(b, ["g"], "v", k=k),
        ["g"],
        k,
    )
    direct = K.kmv_sketch(a.unionByName(b), ["g"], "v", k=k)
    assert sorted(r["__kmv_h__"] for r in su.collect()) == sorted(
        r["__kmv_h__"] for r in direct.collect()
    )


def test_kmv_intersection_and_jaccard(spark):
    """|A|=3000, |B|=3000, |A∩B|=1500 (true J = 1/3): the estimates
    land within sketch error, and HLL has no analog of this at all."""
    a = spark.createDataFrame(
        [("g", f"a{i}") for i in range(3000)], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"a{i}") for i in range(1500, 4500)], "g string, v string"
    )
    k = 256
    row = K.kmv_set_estimates(
        K.kmv_sketch(a, ["g"], "v", k=k),
        K.kmv_sketch(b, ["g"], "v", k=k),
        ["g"],
        k,
    ).collect()[0]
    assert abs(row.union_est - 4500) / 4500 < 0.2
    assert abs(row.intersect_est - 1500) / 1500 < 0.35
    assert abs(row.jaccard_est - 1 / 3) < 0.1
    # disjoint sets: intersection exactly 0
    c = spark.createDataFrame(
        [("g", f"z{i}") for i in range(1000)], "g string, v string"
    )
    row = K.kmv_set_estimates(
        K.kmv_sketch(a, ["g"], "v", k=k),
        K.kmv_sketch(c, ["g"], "v", k=k),
        ["g"],
        k,
    ).collect()[0]
    assert row.intersect_est == 0.0 and row.jaccard_est == 0.0


def test_kmv_per_group_isolation(spark):
    df = spark.createDataFrame(
        [("g1", f"v{i}") for i in range(10)]
        + [("g2", f"v{i}") for i in range(200)],
        "g string, v string",
    )
    got = {
        r.g: r.distinct_est
        for r in K.kmv_distinct(df, ["g"], "v", k=64).collect()
    }
    assert got["g1"] == 10.0
    assert abs(got["g2"] - 200) / 200 < 0.35
