"""C4-style blocklist filtering (operators/curation.blocklist_filter):
word-boundary semantics, phrase matching, term normalization, and the
zero-hit row contract."""

from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.curation import blocklist_filter


def _run(spark, docs, terms):
    docs_df = spark.createDataFrame(docs, ["doc_id", "text"])
    bl = spark.createDataFrame([(t,) for t in terms], ["term"])
    out = blocklist_filter(docs_df, bl, "doc_id", "text")
    return {r.doc_id: r for r in out.collect()}


def test_word_and_phrase_hits(spark):
    rows = _run(
        spark,
        [
            (1, "the quick brown fox"),
            (2, "a very bad word here"),
            (3, "contains bad word order reversed word bad"),
            (4, "clean text only"),
        ],
        ["fox", "bad word"],
    )
    assert rows[1].hit_terms == ["fox"] and rows[1].blocked
    assert rows[2].hit_terms == ["bad word"]
    # doc 3 has the phrase "bad word" once ("contains bad word order")
    assert rows[3].hit_terms == ["bad word"]
    assert rows[4].n_hits == 0 and rows[4].hit_terms == [] \
        and not rows[4].blocked


def test_word_boundaries_not_substrings(spark):
    rows = _run(
        spark,
        [(1, "the scanner is running"), (2, "full table scan here")],
        ["scan"],
    )
    assert not rows[1].blocked  # "scanner" must NOT match "scan"
    assert rows[2].blocked


def test_term_normalization_case_and_whitespace(spark):
    rows = _run(
        spark,
        [(1, "a HASH Value appears"), (2, "hash but no phrase")],
        ["  Hash    VALUE  "],
    )
    assert rows[1].blocked and rows[1].hit_terms == ["hash value"]
    assert not rows[2].blocked


def test_distinct_terms_and_counts(spark):
    rows = _run(
        spark,
        [(1, "slow slow vector slow")],
        ["slow", "slow", "vector"],  # duplicate list entries collapse
    )
    assert rows[1].n_hits == 2
    assert rows[1].hit_terms == ["slow", "vector"]
