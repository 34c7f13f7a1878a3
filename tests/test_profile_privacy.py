"""k-anonymity/l-diversity audit and mutual-information profiling
(operators/curation.k_anonymity_audit / mutual_information)."""

import math

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.curation import (
    k_anonymity_audit,
    mutual_information,
)


def test_k_anonymity_flags_small_classes(spark):
    rows = [("US", "a", i) for i in range(10)] + [("FR", "b", 99)]
    df = spark.createDataFrame(rows, ["country", "seg", "salary"])
    out = {
        (r.country, r.seg): r
        for r in k_anonymity_audit(
            df, ["country", "seg"], k=5, sensitive_col="salary"
        ).collect()
    }
    us = out[("US", "a")]
    assert us.n == 10 and not us.violates_k
    assert us.l == 10 and not us.violates_l
    fr = out[("FR", "b")]
    assert fr.n == 1 and fr.violates_k
    assert fr.l == 1 and fr.violates_l  # membership discloses salary


def test_k_anonymity_without_sensitive(spark):
    df = spark.createDataFrame([("US", 1)] * 3, ["country", "x"])
    row = k_anonymity_audit(df, ["country"], k=3).collect()[0]
    assert row.n == 3 and not row.violates_k
    assert "l" not in row.asDict()


def test_mutual_information_extremes(spark):
    # y == x  -> MI = H(X), NMI = 1;  z independent of x -> MI ~ 0
    rows = [(i % 4, i % 4, i % 3) for i in range(1200)]
    df = spark.createDataFrame(rows, ["x", "y", "z"])
    out = {
        (r.col_x, r.col_y): r
        for r in mutual_information(df, [("x", "y"), ("x", "z")]).collect()
    }
    dep = out[("x", "y")]
    assert dep.nmi == pytest.approx(1.0, abs=1e-9)
    assert dep.mi == pytest.approx(math.log(4), abs=1e-6)
    assert dep.n_joint == 4
    indep = out[("x", "z")]
    assert abs(indep.mi) < 1e-9 and indep.n_joint == 12


def test_mutual_information_nulls_are_categories(spark):
    # NULL in y perfectly predicts x = 1: MI must see it
    rows = [(0, "a"), (0, "a"), (1, None), (1, None)]
    df = spark.createDataFrame(rows, "x int, y string")
    r = mutual_information(df, [("x", "y")]).collect()[0]
    assert r.nmi == pytest.approx(1.0, abs=1e-9)


def test_mutual_information_constant_column(spark):
    df = spark.createDataFrame([(1, "c")] * 5, "x int, y string")
    r = mutual_information(df, [("x", "y")]).collect()[0]
    assert r.mi == 0.0 and r.nmi == 0.0


def test_discretize_quantiles_balanced_and_nulls(spark):
    from fluss_datafusion_spark.operators.curation import (
        discretize_quantiles,
    )

    rows = [(i, float(i)) for i in range(100)] + [(100, None)]
    df = spark.createDataFrame(rows, "id int, x double")
    out = discretize_quantiles(df, ["x"], n_bins=4, exact=True)
    bins = {r.id: r.x_bin for r in out.collect()}
    assert bins[100] is None
    counts = {}
    for i in range(100):
        counts[bins[i]] = counts.get(bins[i], 0) + 1
    assert set(counts) == {0, 1, 2, 3}
    assert all(20 <= c <= 30 for c in counts.values())  # ~equal frequency
    assert bins[0] == 0 and bins[99] == 3
    # monotone: higher values never land in lower bins
    assert all(bins[i] <= bins[i + 1] for i in range(99))


def test_discretize_validation_and_approx_close(spark):
    import pytest as _pytest

    from fluss_datafusion_spark.operators.curation import (
        discretize_quantiles,
    )

    df = spark.createDataFrame([(i, float(i)) for i in range(1000)], "id int, x double")
    with _pytest.raises(ValueError, match="n_bins"):
        discretize_quantiles(df, ["x"], n_bins=1)
    exact = {r.id: r.x_bin for r in discretize_quantiles(df, ["x"], 4, exact=True).collect()}
    approx = {r.id: r.x_bin for r in discretize_quantiles(df, ["x"], 4).collect()}
    # the sketch path may shift a few boundary rows, never whole bins
    diffs = sum(1 for i in exact if exact[i] != approx[i])
    assert diffs < 20
