"""RRF fusion + hybrid lexical/dense retrieval
(operators/retrieval.py — Cormack, Clarke & Buettcher, SIGIR 2009)."""

from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.retrieval import hybrid_search, rrf_fuse


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id string, rank int")


def test_rrf_math_matches_hand_computation(spark):
    lex = _ranked(spark, [("q", "a", 1), ("q", "b", 2), ("q", "c", 3)])
    dense = _ranked(spark, [("q", "b", 1), ("q", "d", 2), ("q", "a", 3)])
    got = {
        r.doc_id: (r.rrf_score, r.n_lists, r.rank)
        for r in rrf_fuse([lex, dense], k=10).collect()
    }
    # hand-computed: b: 1/62+1/61, a: 1/61+1/63, d: 1/62, c: 1/63
    assert got["b"] == (round(1 / 62 + 1 / 61, 6), 2, 1)
    assert got["a"] == (round(1 / 61 + 1 / 63, 6), 2, 2)
    assert got["d"] == (round(1 / 62, 6), 1, 3)
    assert got["c"] == (round(1 / 63, 6), 1, 4)


def test_rrf_ties_break_by_doc_id(spark):
    l1 = _ranked(spark, [("q", "z", 1), ("q", "a", 2)])
    l2 = _ranked(spark, [("q", "a", 1), ("q", "z", 2)])
    rows = rrf_fuse([l1, l2], k=2).orderBy("rank").collect()
    assert [r.doc_id for r in rows] == ["a", "z"]  # equal scores -> id order


def test_rrf_k_cutoff_per_query(spark):
    l1 = _ranked(
        spark,
        [("q1", d, i + 1) for i, d in enumerate("abcde")]
        + [("q2", d, i + 1) for i, d in enumerate("vwxyz")],
    )
    out = rrf_fuse([l1], k=3).collect()
    assert len(out) == 6
    assert all(r.rank <= 3 for r in out)


def test_hybrid_search_end_to_end(spark):
    # docs where lexical and dense disagree; fusion rewards agreement
    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry"),      # query doc
            (1, "apple banana cherry date"), # lexical twin
            (2, "unrelated words entirely"), # dense twin (vector only)
            (3, "apple orchard"),            # weak lexical
        ],
        "doc_id bigint, text string",
    )
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 0.9, 0.1]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    queries = (
        docs.filter(F.col("doc_id") == 0)
        .select(F.col("doc_id").alias("qid"), F.col("text").alias("qtext"))
        .join(
            vecs.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
            "qid",
        )
    )
    rows = hybrid_search(
        docs, "doc_id", "text", vecs, "vec_id", "embedding",
        queries, "qid", "qtext", "qvec", k=4, depth=3,
    ).orderBy("rank").collect()
    assert all(r.doc_id != 0 for r in rows)  # self excluded
    # doc 1 is lexical-1st + dense-3rd(ish); doc 2 is dense-1st only —
    # the doc appearing in BOTH lists must outrank any single-list doc
    by_doc = {r.doc_id: r for r in rows}
    assert by_doc[1].n_lists == 2
    assert by_doc[1].rank == 1
