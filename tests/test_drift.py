"""Distribution-drift detection (operators/drift.py)."""

from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.drift import distribution_drift


def _mk(spark, rows, cols=("x",)):
    return spark.createDataFrame(
        [tuple(r) if isinstance(r, (list, tuple)) else (r,) for r in rows],
        ", ".join(f"{c} double" for c in cols),
    )


def test_identical_snapshots_have_zero_drift(spark):
    df = _mk(spark, [float(i) for i in range(100)])
    out = distribution_drift(df, df, ["x"]).collect()[0]
    assert out["psi"] == 0.0 and out["kl"] == 0.0 and out["tv"] == 0.0
    assert out["drifted"] is False


def test_shifted_distribution_flags_drift(spark):
    ref = _mk(spark, [float(i % 100) for i in range(1000)])
    cur = _mk(spark, [float(i % 20) for i in range(1000)])  # mass -> low bins
    out = distribution_drift(ref, cur, ["x"]).collect()[0]
    assert out["drifted"] is True
    assert out["psi"] > 1.0  # 8 of 10 bins emptied: massive PSI
    assert 0.0 < out["tv"] <= 1.0


def test_null_fraction_shift_is_visible(spark):
    ref = _mk(spark, [float(i) for i in range(90)] + [None] * 10)
    cur = _mk(spark, [float(i) for i in range(50)] + [None] * 50)
    out = distribution_drift(ref, cur, ["x"]).collect()[0]
    # NULLs form their own bin: 10% -> 50% null mass must register
    assert out["drifted"] is True


def test_out_of_range_values_clamp_into_edge_bins(spark):
    ref = _mk(spark, [float(i) for i in range(100)])
    cur = _mk(spark, [1e9] * 100)  # all beyond the reference max
    out = distribution_drift(ref, cur, ["x"]).collect()[0]
    assert out["drifted"] is True  # everything lands in the top bin


def test_degenerate_constant_reference_column(spark):
    ref = _mk(spark, [5.0] * 50)
    cur = _mk(spark, [5.0] * 40 + [None] * 10)
    out = distribution_drift(ref, cur, ["x"]).collect()[0]
    # constant ref: one value bin; drift shows only via the null bin
    assert out["psi"] > 0.0


def test_multi_column_one_pass(spark):
    ref = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
    )
    cur = ref.filter(F.col("a") < 50)  # a shifts, b stays ~uniform
    rows = {r["column"]: r for r in distribution_drift(ref, cur, ["a", "b"]).collect()}
    assert rows["a"]["drifted"] is True
    assert rows["b"]["drifted"] is False
    assert rows["b"]["psi"] < 0.05


# -- cross-document shared spans (dedup.shared_span_pairs) -------------------


def _spans(spark, rows, **kw):
    from fluss_datafusion_spark.operators.dedup import shared_span_pairs

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(
        tuple(r)
        for r in shared_span_pairs(df, "doc_id", "text", **kw).collect()
    )


def test_shared_spans_basic_and_maximal(spark):
    got = _spans(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "xx alpha beta gamma delta epsilon yy"),
            (3, "no overlap at all in this one text"),
        ],
        k=4,
    )
    # ONE maximal 5-token run (positions 1 in doc1, 2 in doc2), not two
    # overlapping 4-token windows
    assert got == [(1, 2, 1, 2, 5)]


def test_shared_spans_multiple_alignments(spark):
    # doc2 contains doc1's span TWICE -> two distinct diagonals
    got = _spans(
        spark,
        [
            (1, "a b c d e"),
            (2, "a b c d x x a b c d y"),
        ],
        k=4,
    )
    assert (1, 2, 1, 1, 4) in got and (1, 2, 1, 7, 4) in got


def test_shared_spans_boilerplate_guard(spark):
    # the same header in 5 docs with max_df=3: no pairs from it
    rows = [(i, "common header text here four five " + f"tail{i} x y z")
            for i in range(5)]
    got = _spans(spark, rows, k=4, max_df=3)
    assert got == []
    got2 = _spans(spark, rows, k=4, max_df=10)
    assert len(got2) == 10  # C(5,2) pairs once the cap admits the window


def test_shared_spans_min_span_floor(spark):
    rows = [
        (1, "p q r s t u v w"),
        (2, "p q r s t zz ww vv"),
    ]
    assert _spans(spark, rows, k=4, min_span_tokens=6) == []
    assert _spans(spark, rows, k=4, min_span_tokens=5) == [(1, 2, 1, 1, 5)]


def test_schema_drift(spark):
    from fluss_datafusion_spark.operators.drift import schema_drift

    ref = spark.range(1).selectExpr("id AS a", "CAST(id AS INT) AS b", "id AS gone")
    cur = spark.range(1).selectExpr("id AS a", "CAST(id AS DOUBLE) AS b", "id AS fresh")
    got = {(r.column, r.change) for r in schema_drift(ref, cur).collect()}
    assert got == {("b", "type_changed"), ("gone", "removed"), ("fresh", "added")}
    assert schema_drift(ref, ref).count() == 0
