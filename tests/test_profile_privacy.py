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
