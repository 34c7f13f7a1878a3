"""Naive Bayes quality classifier (operators/quality_model.py).

Hard-signal checks: exact hand-computed counts/score on a tiny fixture,
class separation on a synthetic corpus, and the train-once/score-many
contract.  The cross-engine oracle lives in the corpus
(ns_quality_nb_classifier).
"""

import math

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import quality_model


@pytest.fixture(scope="module")
def tiny(spark):
    # Two "good" docs share the token "clean"; two "bad" share "spam".
    rows = [
        (1, "clean text here", True),
        (2, "clean words too", True),
        (3, "spam spam junk", False),
        (4, "junk spam now", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, good boolean")


def test_train_counts_exact(tiny):
    counts, totals = quality_model.train_nb_classifier(
        tiny, "doc_id", "text", "good"
    )
    by_tok = {r["__tok__"]: (r["__c1__"], r["__c0__"]) for r in counts.collect()}
    assert by_tok["clean"] == (2, 0)
    assert by_tok["spam"] == (0, 3)
    assert by_tok["junk"] == (0, 2)
    tot = totals.collect()[0]
    assert (tot["__T1__"], tot["__T0__"]) == (6, 6)
    assert tot["__V__"] == len(by_tok)
    assert (tot["__N1__"], tot["__N0__"]) == (2, 2)


def test_score_matches_hand_computation(tiny):
    counts, totals = quality_model.train_nb_classifier(
        tiny, "doc_id", "text", "good"
    )
    tot = totals.collect()[0]
    T1, T0, V = tot["__T1__"], tot["__T0__"], tot["__V__"]
    by_tok = {r["__tok__"]: (r["__c1__"], r["__c0__"]) for r in counts.collect()}

    def odds(tok):
        c1, c0 = by_tok.get(tok, (0, 0))
        return math.log((c1 + 1) / (T1 + V)) - math.log((c0 + 1) / (T0 + V))

    scored = quality_model.score_nb_classifier(
        tiny, "doc_id", "text", counts, totals
    )
    row = {r["doc_id"]: r for r in scored.collect()}[1]
    expected = sum(odds(w) for w in "clean text here".split()) / 3
    assert row["n_tokens"] == 3
    assert row["avg_log_odds"] == pytest.approx(round(expected, 4), abs=1e-9)
    assert row["log_prior"] == 0.0  # balanced classes
    assert row["pred_good"]


def test_class_separation(tiny):
    scored = quality_model.nb_quality_scores(tiny, "doc_id", "text", "good")
    rows = {r["doc_id"]: r for r in scored.collect()}
    assert rows[1]["pred_good"] and rows[2]["pred_good"]
    assert not rows[3]["pred_good"] and not rows[4]["pred_good"]
    assert min(rows[1]["avg_log_odds"], rows[2]["avg_log_odds"]) > max(
        rows[3]["avg_log_odds"], rows[4]["avg_log_odds"]
    )


def test_unseen_tokens_degrade_to_floor(spark, tiny):
    counts, totals = quality_model.train_nb_classifier(
        tiny, "doc_id", "text", "good"
    )
    fresh = spark.createDataFrame(
        [(9, "totally unseen vocabulary")], "doc_id long, text string"
    )
    row = quality_model.score_nb_classifier(
        fresh, "doc_id", "text", counts, totals
    ).collect()[0]
    # All-unseen doc: every token scores log((0+1)/(T1+V)) - log((0+1)/(T0+V))
    # = 0 when T1 == T0 (balanced fixture).
    assert row["avg_log_odds"] == 0.0
    assert row["n_tokens"] == 3


def test_generalizes_past_weak_label(spark):
    # Weak label = length >= 30 tokens; a SHORT doc written in good-class
    # vocabulary should still score above a LONG doc of bad-class tokens
    # (the point of bootstrap-training a model from a heuristic).
    good_text = "insightful prose about science history art culture"
    bad_text = "buy now click here free offer"
    rows = [
        (i, (good_text + " ") * 6, True) for i in range(10)
    ] + [
        (100 + i, (bad_text + " ") * 6, True) for i in range(0)
    ] + [
        (200 + i, bad_text, False) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, good boolean")
    counts, totals = quality_model.train_nb_classifier(
        docs, "doc_id", "text", "good"
    )
    probe = spark.createDataFrame(
        [(1, "science art culture"), (2, bad_text + " " + bad_text)],
        "doc_id long, text string",
    )
    scored = {
        r["doc_id"]: r["avg_log_odds"]
        for r in quality_model.score_nb_classifier(
            probe, "doc_id", "text", counts, totals
        ).collect()
    }
    assert scored[1] > 0 > scored[2]
