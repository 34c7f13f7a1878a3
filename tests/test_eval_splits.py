"""Offline retrieval metrics (retrieval.retrieval_metrics) and
leakage-guarded dataset splits (training.assign_splits)."""

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.retrieval import retrieval_metrics
from fluss_datafusion_spark.operators.training import assign_splits


def _metrics(spark, results, qrels, k=3):
    r = spark.createDataFrame(results, "qid long, doc_id long, rank long")
    q = spark.createDataFrame(qrels, "qid long, doc_id long")
    return {
        row.qid: (
            round(row.rr, 6),
            round(row.recall_at_k, 6),
            round(row.ndcg_at_k, 6),
        )
        for row in retrieval_metrics(r, q, k=k).collect()
    }


def test_perfect_retrieval_scores_one(spark):
    res = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    rels = [(1, 10), (1, 11), (1, 12)]
    assert _metrics(spark, res, rels) == {1: (1.0, 1.0, 1.0)}


def test_no_hits_and_missing_query_score_zero(spark):
    res = [(1, 99, 1)]  # q1 retrieved junk; q2 absent from results
    rels = [(1, 10), (2, 20)]
    got = _metrics(spark, res, rels)
    assert got[1] == (0.0, 0.0, 0.0)
    assert got[2] == (0.0, 0.0, 0.0), "a query missing from results must appear"


def test_rr_uses_any_rank_recall_only_top_k(spark):
    # the only relevant hit is at rank 5 with k=3: RR = 1/5, recall@3 = 0
    res = [(1, 10, 5)]
    rels = [(1, 10)]
    assert _metrics(spark, res, rels, k=3) == {1: (0.2, 0.0, 0.0)}


def test_ndcg_hand_computed(spark):
    # relevant docs at ranks 1 and 3 of 2 relevant total, k=3:
    # dcg = 1/log2(2) + 1/log2(4) = 1.5; idcg = 1/log2(2) + 1/log2(3)
    import math

    res = [(1, 10, 1), (1, 99, 2), (1, 11, 3)]
    rels = [(1, 10), (1, 11)]
    got = _metrics(spark, res, rels)[1]
    expect = 1.5 / (1.0 + 1.0 / math.log2(3))
    assert got == (1.0, 1.0, round(expect, 6))


def test_assign_splits_deterministic_and_grouped(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 300).alias("grp")
    )
    a = assign_splits(df, "doc_id", group_col="grp")
    b = assign_splits(df, "doc_id", group_col="grp")
    assert a.exceptAll(b).count() == 0, "pure function of (seed, key)"
    # leakage guard: every group entirely inside one split
    leaked = (
        a.groupBy("grp").agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert leaked == 0
    # proportions approximate the fractions (300 groups, 90/5/5)
    n = {r.split: r.n for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert n["train"] > 1500 and 0 < n.get("val", 0) < 400


def test_assign_splits_seed_changes_assignment(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a = assign_splits(df, "doc_id", seed="s1")
    b = assign_splits(df, "doc_id", seed="s2")
    diff = a.join(b.withColumnRenamed("split", "s2"), "doc_id").filter(
        F.col("split") != F.col("s2")
    )
    assert diff.count() > 0


def test_assign_splits_fraction_validation(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, "doc_id", fractions={"train": 0.5, "test": 0.1})


# -- property test: shared spans vs a brute-force reference ------------------


def _brute_spans(docs, k):
    """O(n² · m²) reference: maximal runs of >= k shared tokens."""
    toks = {i: t.lower().split() for i, t in docs}
    out = set()
    ids = sorted(toks)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ta, tb = toks[a], toks[b]
            # window match grid on each diagonal, islands by scanning
            for diag in range(-(len(tb)), len(ta) + 1):
                run = 0
                start = None
                # positions pa (1-based) with pb = pa - diag
                for pa in range(1, len(ta) - k + 3):
                    pb = pa - diag
                    ok = (
                        pa + k - 1 <= len(ta)
                        and 1 <= pb
                        and pb + k - 1 <= len(tb)
                        and ta[pa - 1 : pa + k - 1] == tb[pb - 1 : pb + k - 1]
                    )
                    if ok:
                        if run == 0:
                            start = pa
                        run += 1
                    else:
                        if run:
                            out.add((a, b, start, start - diag, run + k - 1))
                        run = 0
                if run:
                    out.add((a, b, start, start - diag, run + k - 1))
    return out


def test_shared_spans_match_bruteforce_reference(spark):
    """Randomized docs over a tiny vocabulary (maximizing accidental
    shared runs, multiple alignments, and within-doc repeats) must
    agree exactly with the quadratic reference."""
    import random

    from fluss_datafusion_spark.operators.dedup import shared_span_pairs

    rng = random.Random(42)
    vocab = ["a", "b", "c", "d"]
    for trial in range(5):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 18))))
            for i in range(6)
        ]
        k = rng.choice([3, 4])
        expect = _brute_spans(docs, k)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            tuple(r)
            for r in shared_span_pairs(
                df, "doc_id", "text", k=k, max_df=100
            ).collect()
        }
        assert got == expect, f"trial {trial} k={k}: {got ^ expect}"
