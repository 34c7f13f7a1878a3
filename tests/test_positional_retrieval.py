"""Positional postings + ordered proximity matching (VERDICT r5 #6).

operators/retrieval.py: build_positional_postings stores term positions
(the Lucene positional-index design); proximity_filter answers
``"exact phrase"~N`` — ordered terms with at most N interleaved tokens
— via JVM array lambdas (greedy minimal chain), no UDF."""

import itertools

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import retrieval


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_positional_postings_positions(spark):
    docs = _docs(spark, [(1, "a b a  c"), (2, ""), (3, "  b  ")])
    got = {
        (r["__term__"], r["__doc__"]): r["__positions__"]
        for r in retrieval.build_positional_postings(
            docs, "doc_id", "text"
        ).collect()
    }
    assert got == {
        ("a", 1): [1, 3],
        ("b", 1): [2],
        ("c", 1): [4],
        ("b", 3): [1],
    }, "1-based, sorted, multi-occurrence kept, empty docs absent"


def test_proximity_slop_semantics(spark):
    docs = _docs(
        spark,
        [
            (1, "new york pizza"),         # exact
            (2, "new big york"),            # 1 interleaved
            (3, "new big bad york"),        # 2 interleaved
            (4, "york new"),                # wrong order
            (5, "new city"),                # missing term
        ],
    )

    def ids(slop):
        return sorted(
            r.doc_id
            for r in retrieval.proximity_filter(
                docs, "doc_id", "text", "new york", slop=slop
            ).collect()
        )

    assert ids(0) == [1]
    assert ids(1) == [1, 2]
    assert ids(2) == [1, 2, 3]
    assert ids(9) == [1, 2, 3], "order still required at any slop"


def test_proximity_three_terms_and_repeats(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c"),
            (2, "a x b c"),
            (3, "c b a"),
            (4, "a b x x c"),
            (5, "a b a"),   # repeated phrase term
            (6, "a a"),
        ],
    )
    got = sorted(
        r.doc_id
        for r in retrieval.proximity_filter(
            docs, "doc_id", "text", "a b c", slop=1
        ).collect()
    )
    assert got == [1, 2]
    got = sorted(
        r.doc_id
        for r in retrieval.proximity_filter(
            docs, "doc_id", "text", "a b a", slop=0
        ).collect()
    )
    assert got == [5], "repeated terms need distinct ascending positions"
    # single-word phrase degrades to a membership test
    got = sorted(
        r.doc_id
        for r in retrieval.proximity_filter(
            docs, "doc_id", "text", "c", slop=0
        ).collect()
    )
    assert got == [1, 2, 3, 4]


def test_proximity_slop0_equals_shingle_phrase_filter(spark, testdata):
    docs = (
        spark.read.parquet(f"{testdata}/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    a = sorted(
        r.doc_id
        for r in retrieval.proximity_filter(
            docs, "doc_id", "text", "hash join", slop=0
        ).collect()
    )
    b = sorted(
        r.doc_id
        for r in retrieval.phrase_filter(
            docs, "doc_id", "text", "hash join"
        ).collect()
    )
    assert a == b and a, "positional slop=0 == shingle exact-phrase"


def _brute_match(tokens, terms, slop):
    """Reference: ANY ordered position tuple within slop."""
    pos = {t: [i + 1 for i, x in enumerate(tokens) if x == t] for t in terms}
    if any(not pos[t] for t in terms):
        return False
    for combo in itertools.product(*[pos[t] for t in terms]):
        if all(b > a for a, b in zip(combo, combo[1:])) and (
            combo[-1] - combo[0] - (len(terms) - 1) <= slop
        ):
            return True
    return False


def test_proximity_matches_bruteforce_reference(spark):
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(200)
    ]
    docs = _docs(spark, rows)
    for phrase, slop in [("a b", 0), ("a b", 2), ("a b c", 1), ("b b", 0)]:
        got = sorted(
            r.doc_id
            for r in retrieval.proximity_filter(
                docs, "doc_id", "text", phrase, slop=slop
            ).collect()
        )
        want = sorted(
            i
            for i, text in rows
            if _brute_match(text.split(), phrase.split(), slop)
        )
        assert got == want, (phrase, slop)


def test_bm25_proximity_search_end_to_end(spark, testdata):
    docs = spark.read.parquet(f"{testdata}/documents.parquet").select(
        "doc_id", "text"
    )
    queries = spark.createDataFrame([(0, "hash join fast")], ["qid", "qtext"])
    out = retrieval.bm25_proximity_search(
        docs, "doc_id", "text", queries, "qid", "qtext",
        phrase="hash join", slop=2, k=10,
    ).collect()
    assert 0 < len(out) <= 10
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(
        range(1, len(out) + 1)
    )
    # every ranked doc really is a proximity match
    matched = {
        r.doc_id
        for r in retrieval.proximity_filter(
            docs, "doc_id", "text", "hash join", slop=2
        ).collect()
    }
    assert {r.doc_id for r in out} <= matched
    # and slop widens the candidate pool monotonically
    exact = {
        r.doc_id
        for r in retrieval.proximity_filter(
            docs, "doc_id", "text", "hash join", slop=0
        ).collect()
    }
    assert exact < matched


def test_proximity_rejects_bad_input(spark):
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="empty phrase"):
        retrieval.proximity_filter(docs, "doc_id", "text", "  ")
    with pytest.raises(ValueError, match="slop"):
        retrieval.proximity_filter(docs, "doc_id", "text", "a b", slop=-1)
