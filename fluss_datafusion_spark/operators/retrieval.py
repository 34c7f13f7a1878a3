"""BM25 full-text retrieval as DataFrame jobs.

Okapi BM25 (Robertson et al., TREC-3 1994) is the default ranking
function of Lucene/Elasticsearch and the standard first-stage retriever
in RAG / hard-negative-mining pipelines.  This module expresses it as
pure DataFrame algebra over an inverted index — no search server, no
UDFs, no driver-side state:

    build  = two map-side-combined aggregations (postings + doc lengths)
    search = one broadcast of the query-term table into a shuffle join
             on the term key, one (query, doc) sum, one top-k window

The "index" IS a pair of DataFrames, so it can be persisted as tables
(e.g. through the catalog) and reused across query batches, and it
scales to any corpus Spark can shuffle: postings are keyed by term
(near-Zipfian but bounded by ``max_df`` pruning of stop-terms), document
stats by doc id, and only the query batch — typically orders of
magnitude smaller than the corpus — is broadcast.

Scoring (the Lucene variant: non-negative idf, no query-side tf):

    score(q, d) = sum_{t in distinct(q)} idf(t) * tf * (k1 + 1)
                  / (tf + k1 * (1 - b + b * dl / avgdl))
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))

No reference analog (zuston/fluss-datafusion has no text operators);
part of the north-star LLM-pipeline surface.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fluss_datafusion_spark.functions.text import tokens
from fluss_datafusion_spark.session import spread_small_scan


def _term_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(__doc__, __term__) — one row per token occurrence, lowercased,
    empty terms dropped (split of a blank text yields [''])."""
    return (
        spread_small_scan(df)
        .select(
            F.col(id_col).alias("__doc__"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__term__"),
        )
        .filter(F.col("__term__") != "")
    )


def build_bm25_index(
    docs: DataFrame, id_col: str, text_col: str, max_df: Optional[int] = None
) -> Tuple[DataFrame, DataFrame, DataFrame]:
    """Build the inverted index: returns ``(postings, doc_stats,
    corpus_stats)`` DataFrames —

    - postings:     (__term__, __doc__, __tf__, __df__)
    - doc_stats:    (__doc__, __dl__)
    - corpus_stats: single row (__N__, __avgdl__)

    N / avgdl count only indexed documents (>= 1 non-empty token), so an
    all-whitespace document neither scores nor skews the normalizer.

    ``max_df`` prunes stop-terms that appear in more than that many
    documents — at web scale the head of the Zipf curve ("the") would
    otherwise route a large fraction of all postings through a handful
    of term keys; those terms carry near-zero idf anyway.  Pruning
    happens AFTER df is computed, so remaining idfs are unchanged.

    Persist (or write as tables) to amortize across query batches.
    """
    occ = _term_rows(docs, id_col, text_col)
    postings = occ.groupBy("__term__", "__doc__").agg(
        F.count(F.lit(1)).alias("__tf__")
    )
    df_t = postings.groupBy("__term__").agg(F.count(F.lit(1)).alias("__df__"))
    postings = postings.join(df_t, "__term__")
    if max_df is not None:
        postings = postings.filter(F.col("__df__") <= max_df)
    doc_stats = occ.groupBy("__doc__").agg(F.count(F.lit(1)).alias("__dl__"))
    corpus_stats = doc_stats.agg(
        F.count(F.lit(1)).alias("__N__"), F.avg("__dl__").alias("__avgdl__")
    )
    return postings, doc_stats, corpus_stats


def bm25_topk(
    postings: DataFrame,
    doc_stats: DataFrame,
    corpus_stats: DataFrame,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-k BM25 retrieval for a batch of queries against a built index.

    Returns (query_id, doc_id, score, rank) — score rounded to 4
    (cross-engine float-sum tolerance), rank dense over (score desc,
    doc_id asc) so ties and the k-cutoff are deterministic.

    Scale shape: the distinct query-term table is broadcast (a query
    batch is tiny next to the corpus — pass ``broadcast_queries=False``
    for query-log-scale joins, which then shuffle on the term key);
    postings/doc_stats stay partitioned and are never collected; N and
    avgdl ride in as a single-row broadcast.  The top-k window shuffles
    on query_id — one partition per query, each holding only that
    query's candidate set (documents sharing >= 1 term).
    """
    q_terms = (
        _term_rows(queries, query_id_col, query_text_col)
        .select(F.col("__doc__").alias("__qid__"), "__term__")
        .distinct()
    )
    if broadcast_queries:
        q_terms = F.broadcast(q_terms)
    idf = F.log(
        F.lit(1.0)
        + (F.col("__N__") - F.col("__df__") + 0.5) / (F.col("__df__") + 0.5)
    )
    norm = F.col("__tf__") + k1 * (
        1.0 - b + b * F.col("__dl__") / F.col("__avgdl__")
    )
    contrib = idf * F.col("__tf__") * (k1 + 1.0) / norm
    scored = (
        postings.join(q_terms, "__term__")
        .join(doc_stats, "__doc__")
        .crossJoin(F.broadcast(corpus_stats))
        .groupBy("__qid__", "__doc__")
        .agg(F.round(F.sum(contrib), 4).alias("score"))
    )
    w = Window.partitionBy("__qid__").orderBy(
        F.col("score").desc(), F.col("__doc__").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid__").alias("query_id"),
            F.col("__doc__").alias("doc_id"),
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def bm25_search(
    docs: DataFrame,
    doc_id_col: str,
    doc_text_col: str,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: Optional[int] = None,
) -> DataFrame:
    """One-shot convenience: build the index and run top-k retrieval."""
    postings, doc_stats, corpus_stats = build_bm25_index(
        docs, doc_id_col, doc_text_col, max_df=max_df
    )
    return bm25_topk(
        postings, doc_stats, corpus_stats,
        queries, query_id_col, query_text_col,
        k=k, k1=k1, b=b,
    )


def phrase_filter(
    docs: DataFrame, id_col: str, text_col: str, phrase: str
) -> DataFrame:
    """Documents containing ``phrase`` as CONSECUTIVE tokens
    (lowercased, whitespace tokenization — the same normalization the
    BM25 index uses).  Bag-of-words retrieval cannot distinguish
    "new york" from "york new"; this is the positional/phrase-query
    leg, expressed as a word-k-shingle membership test (one JVM
    zip_with pass over the token array, zero shuffles, no positional
    postings to store).

    Returns the input rows that match.  Single-word phrases degrade to
    a token membership test.
    """
    from fluss_datafusion_spark.functions.text import word_shingles

    terms = phrase.lower().split()
    if not terms:
        raise ValueError("empty phrase")
    needle = " ".join(terms)
    return docs.filter(
        F.array_contains(
            word_shingles(F.col(text_col), k=len(terms)), needle
        )
    )


def bm25_phrase_search(
    docs: DataFrame,
    doc_id_col: str,
    doc_text_col: str,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    phrase: str,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """BM25 top-k restricted to documents containing ``phrase`` —
    the "ranked results WITHIN an exact-phrase match" query shape
    search engines spell ``"new york" pizza``.  The phrase filter
    prunes the corpus BEFORE the index build (cheaper than filtering
    results: df/avgdl then describe the matching subcorpus, which is
    also the statistically right collection for the ranking)."""
    matched = phrase_filter(docs, doc_id_col, doc_text_col, phrase)
    return bm25_search(
        matched, doc_id_col, doc_text_col,
        queries, query_id_col, query_text_col, k=k, **kwargs,
    )
