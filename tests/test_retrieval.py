"""BM25 retrieval: scores vs an independent pure-Python reference,
deterministic ranking, stop-term pruning, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import retrieval

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox"),
    (3, "lorem ipsum dolor sit amet"),
    (4, "quick quick quick fox"),
    (5, "sphinx of black quartz judge my vow"),
    (6, "   "),  # all-whitespace: must not be indexed or skew avgdl
]


def _py_bm25(docs, query_terms, k1=1.2, b=0.75):
    """Independent reference implementation (dict-based, no Spark)."""
    toks = {i: t.lower().split() for i, t in docs if t.split()}
    dl = {i: len(ts) for i, ts in toks.items()}
    n = len(toks)
    avgdl = sum(dl.values()) / n
    df = {}
    for ts in toks.values():
        for term in set(ts):
            df[term] = df.get(term, 0) + 1
    scores = {}
    for i, ts in toks.items():
        s = 0.0
        for term in set(query_terms):
            tf = ts.count(term)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[i] / avgdl))
        if s > 0:
            scores[i] = round(s, 4)
    return scores


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_bm25_matches_reference(spark, docs_df):
    queries = spark.createDataFrame([(100, "quick fox")], ["qid", "qtext"])
    out = retrieval.bm25_search(
        docs_df, "doc_id", "text", queries, "qid", "qtext", k=10
    )
    got = {r.doc_id: r.score for r in out.collect()}
    assert got == _py_bm25(DOCS, ["quick", "fox"])


def test_bm25_rank_deterministic_and_k_cutoff(spark, docs_df):
    queries = spark.createDataFrame([(1, "the quick brown fox")], ["qid", "qtext"])
    out = retrieval.bm25_search(
        docs_df, "doc_id", "text", queries, "qid", "qtext", k=2
    ).collect()
    assert len(out) == 2
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2]
    ref = _py_bm25(DOCS, ["the", "quick", "brown", "fox"])
    # rank 1 = max score; doc_id breaks exact ties
    best = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    got = sorted(out, key=lambda r: r.rank)
    assert [(r.doc_id, r.score) for r in got] == [(d, s) for d, s in best]


def test_bm25_query_tf_is_ignored(spark, docs_df):
    """Lucene semantics: repeated query terms score once (distinct)."""
    q1 = spark.createDataFrame([(1, "fox")], ["qid", "qtext"])
    q2 = spark.createDataFrame([(1, "fox fox fox")], ["qid", "qtext"])
    r1 = sorted((r.doc_id, r.score) for r in retrieval.bm25_search(
        docs_df, "doc_id", "text", q1, "qid", "qtext").collect())
    r2 = sorted((r.doc_id, r.score) for r in retrieval.bm25_search(
        docs_df, "doc_id", "text", q2, "qid", "qtext").collect())
    assert r1 == r2


def test_bm25_max_df_prunes_stop_terms(spark, docs_df):
    """'quick' has df=3; max_df=2 removes it from postings, so a
    quick-only query matches nothing, while idf of surviving terms is
    unchanged (df computed before pruning)."""
    postings, dstats, cstats = retrieval.build_bm25_index(
        docs_df, "doc_id", "text", max_df=2
    )
    queries = spark.createDataFrame(
        [(1, "quick"), (2, "lazy")], ["qid", "qtext"]
    )
    out = retrieval.bm25_topk(
        postings, dstats, cstats, queries, "qid", "qtext"
    ).collect()
    assert {r.query_id for r in out} == {2}
    full = _py_bm25(DOCS, ["lazy"])
    assert {r.doc_id: r.score for r in out} == full


def test_bm25_empty_doc_not_indexed(spark, docs_df):
    postings, dstats, cstats = retrieval.build_bm25_index(
        docs_df, "doc_id", "text"
    )
    assert dstats.filter(F.col("__doc__") == 6).count() == 0
    n = cstats.collect()[0]["__N__"]
    assert n == 5


def test_bm25_plan_no_nested_loop(spark, docs_df):
    """The term join must be a hash join (broadcast query side), never a
    BroadcastNestedLoopJoin / cartesian over the corpus."""
    queries = spark.createDataFrame([(1, "quick fox")], ["qid", "qtext"])
    out = retrieval.bm25_search(
        docs_df, "doc_id", "text", queries, "qid", "qtext"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only nested-loop join allowed is the single-row N/avgdl
    # broadcast; the term and doc joins must be hash joins
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_phrase_filter_consecutive_only(spark, docs_df):
    from fluss_datafusion_spark.operators.retrieval import phrase_filter

    got = {r.doc_id for r in phrase_filter(docs_df, "doc_id", "text", "quick brown fox").collect()}
    assert got == {1, 2}  # doc 4 has "quick ... fox" but not consecutively
    got = {r.doc_id for r in phrase_filter(docs_df, "doc_id", "text", "fox quick").collect()}
    assert got == set()   # order matters
    got = {r.doc_id for r in phrase_filter(docs_df, "doc_id", "text", "QUICK").collect()}
    assert got == {1, 2, 4}  # single word, case-folded


def test_bm25_phrase_search_restricts_and_rescores(spark, docs_df):
    from fluss_datafusion_spark.operators.retrieval import bm25_phrase_search

    queries = spark.createDataFrame([(1, "lazy dog fox")], ["qid", "qtext"])
    out = bm25_phrase_search(
        docs_df, "doc_id", "text", queries, "qid", "qtext",
        phrase="quick brown fox",
    ).collect()
    assert {r.doc_id for r in out} <= {1, 2}
    # scores are computed against the MATCHING subcorpus (n=2), per the
    # restricted-collection semantics
    sub = [(i, t) for i, t in DOCS if i in (1, 2)]
    assert {r.doc_id: r.score for r in out} == _py_bm25(sub, ["lazy", "dog", "fox"])


def test_rm3_expansion_finds_term_overlap_docs(spark):
    """RM3's point: a doc sharing NO query terms but sharing terms with
    the feedback docs becomes retrievable."""
    from pyspark.sql import functions as F

    from fluss_datafusion_spark.operators.retrieval import (
        bm25_rm3_search,
        bm25_search,
    )

    docs = spark.createDataFrame(
        [
            (0, "solar panel installation guide"),
            (1, "solar panel efficiency photovoltaic module"),
            (2, "photovoltaic module maintenance handbook"),  # no query terms
            (3, "cooking pasta with tomato sauce"),
            (4, "gardening tips for spring flowers"),
        ],
        "doc_id bigint, text string",
    )
    queries = spark.createDataFrame(
        [(100, "solar panel")], "qid bigint, qtext string"
    )
    plain = {
        r.doc_id
        for r in bm25_search(docs, "doc_id", "text", queries, "qid", "qtext", k=5).collect()
    }
    assert 2 not in plain  # zero term overlap with the raw query
    rm3 = bm25_rm3_search(
        docs, "doc_id", "text", queries, "qid", "qtext",
        k=5, fb_docs=2, fb_terms=6, alpha=0.5,
    )
    rows = rm3.collect()
    got = {r.doc_id: r.rank for r in rows}
    assert 2 in got            # pulled in via photovoltaic/module expansion
    assert 3 not in got        # zero overlap with query AND feedback docs
    top = [d for d, r in got.items() if r == 1]
    assert top[0] in (0, 1)    # an original-term doc stays on top
    assert all(r.score is not None for r in rows)


def test_mmr_diversify_matches_reference_and_diversifies(spark):
    import math

    from fluss_datafusion_spark.operators.retrieval import mmr_diversify

    # two near-duplicate highly-relevant docs + one distinct mid-relevance
    rows = [
        (1, 10, 0.9, [1.0, 0.0]),
        (1, 11, 0.89, [0.999, 0.01]),   # near-dup of 10
        (1, 12, 0.5, [0.0, 1.0]),       # orthogonal
        (1, 13, 0.4, [0.0, 0.99]),
    ]
    df = spark.createDataFrame(rows, "qid bigint, doc bigint, rel double, vec array<double>")
    got = sorted(
        mmr_diversify(df, "qid", "doc", "rel", "vec", k=3, lam=0.5).collect(),
        key=lambda r: r.rank,
    )
    # pure-python reference with the same spec
    def ref():
        cands = {d: (r, v) for _, d, r, v in rows}
        def cos(a, b):
            na = math.sqrt(sum(x * x for x in a)); nb = math.sqrt(sum(x * x for x in b))
            return sum(x * y for x, y in zip(a, b)) / (na * nb)
        sel, out = [], []
        while len(out) < 3 and len(out) < len(cands):
            best = None
            for d, (r, v) in cands.items():
                if d in sel:
                    continue
                pen = max((cos(v, cands[s][1]) for s in sel), default=0.0)
                s = 0.5 * r - 0.5 * (pen if sel else 0.0)
                if best is None or s > best[1] or (s == best[1] and d < best[0]):
                    best = (d, s)
            sel.append(best[0]); out.append(best)
        return out

    want = ref()
    assert [(r.doc, r.mmr_score) for r in got] == [
        (d, round(s, 6)) for d, s in want
    ]
    # diversification: the near-dup 11 loses its #2 slot to orthogonal
    # 12 (at rank 3 its raw relevance still beats doc 13's)
    assert [r.doc for r in got] == [10, 12, 11]


def test_mmr_first_pick_is_relevance_argmax(spark):
    from fluss_datafusion_spark.operators.retrieval import mmr_diversify

    df = spark.createDataFrame(
        [(7, d, 0.1 * d, [float(d), 1.0]) for d in range(1, 6)],
        "qid bigint, doc bigint, rel double, vec array<double>",
    )
    got = mmr_diversify(df, "qid", "doc", "rel", "vec", k=2, lam=0.9).collect()
    assert min(got, key=lambda r: r.rank).doc == 5  # max relevance first
