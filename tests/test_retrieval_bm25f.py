"""BM25F field-weighted retrieval + WAND-style query-term pruning
(operators/retrieval.py).

BM25F scores vs an independent pure-Python reference of the simple-
BM25F formula (Robertson, Zaragoza & Taylor 2004); pruning vs an exact
replay of the upper-bound mass rule."""

import math

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import retrieval

# (doc_id, title, body) — title terms should dominate under weighting
FDOCS = [
    (1, "quick fox", "the lazy dog sleeps all day in the sun"),
    (2, "lazy dog", "a quick brown fox jumps over fences quick quick"),
    (3, "brown fences", "dogs and foxes avoid the quick lazy cat"),
    (4, "sphinx quartz", "judge my vow said the sphinx of black quartz"),
    (5, "", "quick quick quick quick quick"),  # empty title field
]


def _py_bm25f(docs, query_terms, weights, k1=1.2, b=0.75):
    """Independent simple-BM25F reference: weighted per-field normalized
    tfs combine into one pseudo-frequency, saturated once per term."""
    fields = list(weights)
    toks = {
        i: {f: txt.lower().split() for f, txt in zip(fields, rest)}
        for i, *rest in docs
    }
    toks = {
        i: fs for i, fs in toks.items() if any(ts for ts in fs.values())
    }
    n = len(toks)
    avgdl = {
        f: sum(len(fs[f]) for fs in toks.values()) / n for f in fields
    }
    df = {}
    for fs in toks.values():
        for term in set(t for ts in fs.values() for t in ts):
            df[term] = df.get(term, 0) + 1
    scores = {}
    for i, fs in toks.items():
        s = 0.0
        for term in set(query_terms):
            wtf = 0.0
            for f in fields:
                tf = fs[f].count(term)
                if tf == 0 or avgdl[f] == 0:
                    continue
                bf = weights[f][1] if isinstance(weights[f], tuple) else b
                w = weights[f][0] if isinstance(weights[f], tuple) else weights[f]
                norm = 1 - bf + bf * len(fs[f]) / avgdl[f]
                wtf += w * tf / norm
            if wtf == 0:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * wtf * (k1 + 1) / (wtf + k1)
        if s > 0:
            scores[i] = round(s, 4)
    return scores


@pytest.fixture(scope="module")
def fdocs_df(spark):
    return spark.createDataFrame(FDOCS, ["doc_id", "title", "body"])


def _run_f(spark, fdocs_df, weights, qtext="quick fox", k=10):
    queries = spark.createDataFrame([(1, qtext)], ["qid", "qtext"])
    got = retrieval.bm25f_search(
        fdocs_df, "doc_id", weights, queries, "qid", "qtext", k=k
    ).collect()
    return {r.doc_id: r.score for r in got}, {
        r.doc_id: r.rank for r in got
    }


def test_bm25f_matches_reference(spark, fdocs_df):
    weights = {"title": 2.5, "body": 1.0}
    got, _ = _run_f(spark, fdocs_df, weights)
    want = _py_bm25f(FDOCS, ["quick", "fox"], weights)
    assert got == want


def test_bm25f_per_field_b(spark, fdocs_df):
    weights = {"title": (2.5, 0.2), "body": (1.0, 0.8)}
    got, _ = _run_f(spark, fdocs_df, weights)
    want = _py_bm25f(FDOCS, ["quick", "fox"], weights)
    assert got == want


def test_bm25f_title_weight_changes_winner(spark, fdocs_df):
    """The point of BM25F: a title hit outranks body-tf spam when the
    title weight is high, and the reverse with flat weights."""
    _, flat = _run_f(spark, fdocs_df, {"title": 1.0, "body": 1.0},
                     qtext="quick")
    _, titled = _run_f(spark, fdocs_df, {"title": 10.0, "body": 0.5},
                       qtext="quick")
    assert flat[5] == 1  # tf-spam body doc wins flat weighting
    assert titled[1] == 1  # title hit wins under field weighting
    # doc 5's empty title field neither scores nor breaks indexing
    assert 5 in flat and 5 in titled


def test_bm25f_saturates_across_fields_once(spark):
    """A term in BOTH fields must saturate as one pseudo-frequency —
    scoring fields independently and summing would give doc A (term in
    both fields) ~2x doc B (same total tf in one field); simple BM25F
    keeps them comparable."""
    docs = [
        (1, "fox", "fox"),      # split across fields
        (2, "fox fox", ""),     # same total tf, one field
        (3, "dog", "cat"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "title", "body"])
    weights = {"title": 1.0, "body": 1.0}
    queries = spark.createDataFrame([(1, "fox")], ["qid", "qtext"])
    got = {
        r.doc_id: r.score
        for r in retrieval.bm25f_search(
            df, "doc_id", weights, queries, "qid", "qtext"
        ).collect()
    }
    want = _py_bm25f(docs, ["fox"], weights)
    assert got == want
    # both docs score, and within 35% of each other (not ~2x apart)
    assert abs(got[1] - got[2]) / max(got[1], got[2]) < 0.35


# -- WAND-style term pruning --------------------------------------------------

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox"),
    (3, "lorem ipsum dolor sit amet"),
    (4, "quick quick quick fox"),
    (5, "sphinx of black quartz judge my vow"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _topk(docs_df, queries, **kw):
    return {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in retrieval.bm25_search(
            docs_df, "doc_id", "text", queries, "qid", "qtext", **kw
        ).collect()
    }


def test_term_pruning_full_mass_is_exact(spark, docs_df):
    queries = spark.createDataFrame(
        [(1, "the quick brown fox lorem sphinx"), (2, "lazy dog")],
        ["qid", "qtext"],
    )
    assert _topk(docs_df, queries, term_keep_mass=1.0) == _topk(
        docs_df, queries
    )


def test_term_pruning_drops_low_idf_tail(spark, docs_df):
    """'the' (df=2, lowest idf) is the pruned term at keep_mass=0.8
    (the three df=1 terms hold ~83% of the UB mass); high-idf terms
    survive, and the top-ranked doc is unchanged on this query."""
    queries = spark.createDataFrame(
        [(1, "sphinx quartz vow the")], ["qid", "qtext"]
    )
    postings, doc_stats, corpus_stats = retrieval.build_bm25_index(
        docs_df, "doc_id", "text"
    )
    q_terms = (
        retrieval._term_rows(queries, "qid", "qtext")
        .select(F.col("__doc__").alias("__qid__"), "__term__")
        .distinct()
    )
    kept = {
        r["__term__"]
        for r in retrieval.prune_query_terms(
            q_terms, postings, corpus_stats, keep_mass=0.8
        ).collect()
    }
    assert "the" not in kept
    assert {"sphinx", "quartz", "vow"} <= kept
    full = _topk(docs_df, queries)
    pruned = _topk(docs_df, queries, term_keep_mass=0.8)
    top_full = min(pruned, key=lambda k: pruned[k][1])
    assert pruned[top_full][1] == 1 and full[(1, 5)][1] == 1
    assert top_full == (1, 5)


def test_term_pruning_unindexed_terms_never_survive(spark, docs_df):
    queries = spark.createDataFrame(
        [(1, "zzz unknown sphinx")], ["qid", "qtext"]
    )
    postings, _, corpus_stats = retrieval.build_bm25_index(
        docs_df, "doc_id", "text"
    )
    q_terms = (
        retrieval._term_rows(queries, "qid", "qtext")
        .select(F.col("__doc__").alias("__qid__"), "__term__")
        .distinct()
    )
    kept = {
        r["__term__"]
        for r in retrieval.prune_query_terms(
            q_terms, postings, corpus_stats, keep_mass=1.0
        ).collect()
    }
    assert kept == {"sphinx"}


def test_term_pruning_rejects_bad_mass(spark, docs_df):
    queries = spark.createDataFrame([(1, "fox")], ["qid", "qtext"])
    with pytest.raises(ValueError, match="keep_mass"):
        _topk(docs_df, queries, term_keep_mass=0.0)
