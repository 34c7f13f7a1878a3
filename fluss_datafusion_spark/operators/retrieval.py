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

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fluss_datafusion_spark.functions.text import tokens
from fluss_datafusion_spark.session import spread_small_scan


def _term_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(__doc__, __term__) — one row per token occurrence, lowercased,
    empty terms dropped (split of a blank text yields ['']).

    No ``spread_small_scan`` here (r13): whitespace split + explode is
    LIGHT per-row work — codegen'd string ops, no python boundary — so
    round-robin widening a small corpus buys no compute overlap while
    adding a shuffle and a 32-wide tiny stage per derivation.  A/B at
    sf0.1 (quiet host, warm, interleaved): index lifecycle
    write/append/load+topk 4.1-4.7 s with the spread vs 2.7-2.9 s
    without.  Heavy per-row operators (shingles, sketches, Arrow
    kernels) keep their spread."""
    return (
        df.select(
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
    # ONE tokenize pass feeds everything (r11): tf per (term, doc) is
    # the only corpus-sized aggregation; dl = sum(tf) per doc (identical
    # to counting occurrences directly — saves the second full
    # tokenize+explode scan), and df rides as a count window over the
    # term partition (one exchange on __term__ instead of a groupBy PLUS
    # a postings-side join exchange).  Values are unchanged — every
    # oracle row pins them.
    occ = _term_rows(docs, id_col, text_col)
    tf = occ.groupBy("__term__", "__doc__").agg(
        F.count(F.lit(1)).alias("__tf__")
    )
    postings = tf.withColumn(
        "__df__", F.count(F.lit(1)).over(Window.partitionBy("__term__"))
    )
    if max_df is not None:
        postings = postings.filter(F.col("__df__") <= max_df)
    doc_stats = tf.groupBy("__doc__").agg(F.sum("__tf__").alias("__dl__"))
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
    term_keep_mass: Optional[float] = None,
) -> DataFrame:
    """Top-k BM25 retrieval for a batch of queries against a built index.

    ``term_keep_mass`` (0 < m <= 1) enables WAND-style upper-bound
    pruning of each query's low-impact term tail before the postings
    join — see :func:`prune_query_terms`.  None = exact BM25.

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
    if term_keep_mass is not None:
        q_terms = prune_query_terms(
            q_terms, postings, corpus_stats, term_keep_mass, k1=k1
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
    term_keep_mass: Optional[float] = None,
) -> DataFrame:
    """One-shot convenience: build the index and run top-k retrieval."""
    postings, doc_stats, corpus_stats = build_bm25_index(
        docs, doc_id_col, doc_text_col, max_df=max_df
    )
    return bm25_topk(
        postings, doc_stats, corpus_stats,
        queries, query_id_col, query_text_col,
        k=k, k1=k1, b=b, term_keep_mass=term_keep_mass,
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


# -- positional postings: true phrase / proximity matching --------------------
#
# The shingle-membership phrase filter above answers exact adjacency
# only; Lucene users expect ``"exact phrase"~N`` — ordered proximity
# with N tokens of slack.  That needs TERM POSITIONS in the postings
# (the Lucene positional-index design).  We store them as one
# array<int> per (term, doc) and evaluate the proximity predicate with
# JVM array lambdas: for phrase terms t1..tn a document matches iff
# positions p1 < p2 < ... < pn exist with span p_n - p_1 - (n-1) <= slop.
# Existence is decided by the greedy minimal chain (for a fixed p1,
# taking the SMALLEST valid next position minimizes the final endpoint,
# so greedy finds a window within slop iff any exists) — one exists()
# over t1's positions with nested array_min(filter(...)) hops, no UDF,
# no shuffle beyond the n-way postings join on the doc key.

def build_positional_postings(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Positional postings ``(__term__, __doc__, __positions__)`` with
    1-based token positions (sorted ascending).  Same normalization as
    the BM25 index (lowercase, whitespace tokens, empties dropped).

    Scale shape: one explode + one groupBy on (term, doc) — positions
    of one term in one document stay together; nothing is collected.
    Persist alongside the BM25 index to serve phrase queries without
    re-tokenizing the corpus."""
    occ = (
        # no spread: light tokenize work, same rationale as _term_rows
        docs
        .select(
            F.col(id_col).alias("__doc__"),
            F.posexplode(tokens(F.lower(F.col(text_col)))).alias(
                "__pos0__", "__term__"
            ),
        )
        .filter(F.col("__term__") != "")
        .select("__doc__", "__term__", (F.col("__pos0__") + 1).alias("__p__"))
    )
    return occ.groupBy("__term__", "__doc__").agg(
        F.sort_array(F.collect_list("__p__")).alias("__positions__")
    )


def _proximity_hit(pos_cols: List[str], slop: int):
    """Boolean Column: ordered positions p1 < ... < pn exist across the
    given array columns with p_n - p_1 - (n-1) <= slop (Lucene-style
    ordered proximity; slop=0 = exact adjacency)."""
    n = len(pos_cols)

    def chain(i, prev):
        # smallest position of term i strictly after ``prev``
        nxt = F.array_min(F.filter(F.col(pos_cols[i]), lambda x: x > prev))
        if i == n - 1:
            return nxt
        return chain(i + 1, nxt)

    if n == 1:
        return F.size(F.col(pos_cols[0])) > 0
    return F.exists(
        F.col(pos_cols[0]),
        lambda p1: F.coalesce(
            chain(1, p1) - p1 - F.lit(n - 1) <= F.lit(slop), F.lit(False)
        ),
    )


def proximity_filter(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
    slop: int = 0,
    positional: Optional[DataFrame] = None,
) -> DataFrame:
    """Documents matching ``phrase`` as an ORDERED token sequence with
    at most ``slop`` extra tokens interleaved (``"new york"~1`` matches
    "new big york").  ``slop=0`` is exact adjacency, equivalent to
    :func:`phrase_filter`.

    ``positional``: a prebuilt :func:`build_positional_postings` frame
    to reuse across queries; derived from ``docs`` otherwise.

    Scale shape: n = len(phrase) semi-join hops on the doc key (each
    term's positions arrive as one array row per doc), then a JVM
    array-lambda predicate — no UDF, no per-position explosion."""
    terms = phrase.lower().split()
    if not terms:
        raise ValueError("empty phrase")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    postings = (
        positional
        if positional is not None
        else build_positional_postings(docs, id_col, text_col)
    )
    matched = None
    pos_cols = []
    for i, t in enumerate(terms):
        col = f"__pos{i}__"
        pos_cols.append(col)
        side = postings.filter(F.col("__term__") == t).select(
            F.col("__doc__"), F.col("__positions__").alias(col)
        )
        matched = side if matched is None else matched.join(side, "__doc__")
    hits = matched.filter(_proximity_hit(pos_cols, slop)).select("__doc__")
    return docs.join(
        hits, docs[id_col] == hits["__doc__"], "left_semi"
    )


def bm25_proximity_search(
    docs: DataFrame,
    doc_id_col: str,
    doc_text_col: str,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    phrase: str,
    slop: int = 0,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """BM25 top-k restricted to documents matching ``phrase`` within
    ``slop`` — the positional upgrade of :func:`bm25_phrase_search`
    (``"exact phrase"~2`` in Lucene syntax).  The corpus is pruned to
    proximity matches BEFORE the index build, so df/avgdl describe the
    matching subcorpus."""
    matched = proximity_filter(
        docs, doc_id_col, doc_text_col, phrase, slop=slop
    )
    return bm25_search(
        matched, doc_id_col, doc_text_col,
        queries, query_id_col, query_text_col, k=k, **kwargs,
    )


# -- persisted inverted index: build once, append forever, query many ---------
#
# The ANN/dedup indexes already have a persisted lifecycle
# (write/append/stream-ingest/query); this gives BM25 the same one.
# Layout under ``path/``:
#
#   postings/   (__term__, __doc__, __tf__)      — RAW term frequencies
#   doc_stats/  (__doc__, __dl__)
#   positions/  (__term__, __doc__, __positions__)   [opt-in]
#
# df / N / avgdl are intentionally NOT stored: they are global
# statistics that every append would invalidate.  ``load_bm25_index``
# derives them with one aggregation over the persisted postings, which
# makes ``append_to_bm25_index`` a pure parquet append — no
# read-modify-write, no stats to patch, arbitrarily many appenders.


def write_bm25_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    positional: bool = False,
) -> None:
    """Tokenize ``docs`` and persist the inverted index (overwrite).
    ``positional=True`` additionally stores term positions so phrase /
    proximity queries serve from the same index."""
    import os

    from fluss_datafusion_spark.operators.incremental import (
        _parallel_writes,
    )

    occ = _term_rows(docs, id_col, text_col)
    # independent stores of one derivation: concurrent jobs (r10) — the
    # tokenization recomputes per store either way (caching term rows
    # would spill at corpus scale), so overlapping trades no CPU
    writes = [
        lambda: occ.groupBy("__term__", "__doc__")
        .agg(F.count(F.lit(1)).alias("__tf__"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "postings")),
        lambda: occ.groupBy("__doc__")
        .agg(F.count(F.lit(1)).alias("__dl__"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "doc_stats")),
    ]
    if positional:
        writes.append(
            lambda: build_positional_postings(docs, id_col, text_col)
            .write.mode("overwrite")
            .parquet(os.path.join(path, "positions"))
        )
    _parallel_writes(*writes)


def append_to_bm25_index(
    docs: DataFrame, id_col: str, text_col: str, path: str
) -> None:
    """Add NEW documents to a persisted index — a pure parquet append
    (the global df/N/avgdl are derived at load time, so nothing is
    rewritten).  The caller guarantees doc ids not already indexed
    (route corpus mutations through a PK table upstream); re-appending
    an id would double-count its terms."""
    import os

    from fluss_datafusion_spark.operators.incremental import (
        _parallel_writes,
    )

    occ = _term_rows(docs, id_col, text_col)
    writes = [
        lambda: occ.groupBy("__term__", "__doc__")
        .agg(F.count(F.lit(1)).alias("__tf__"))
        .write.mode("append")
        .parquet(os.path.join(path, "postings")),
        lambda: occ.groupBy("__doc__")
        .agg(F.count(F.lit(1)).alias("__dl__"))
        .write.mode("append")
        .parquet(os.path.join(path, "doc_stats")),
    ]
    if os.path.isdir(os.path.join(path, "positions")):
        writes.append(
            lambda: build_positional_postings(docs, id_col, text_col)
            .write.mode("append")
            .parquet(os.path.join(path, "positions"))
        )
    _parallel_writes(*writes)


def load_bm25_index(
    spark, path: str, max_df: Optional[int] = None
) -> Tuple[DataFrame, DataFrame, DataFrame]:
    """(postings, doc_stats, corpus_stats) ready for :func:`bm25_topk`,
    identical to a fresh :func:`build_bm25_index` over the same corpus:
    df per term and N/avgdl are derived here with one aggregation each
    (max_df stop-term pruning applies after df, unchanged idfs).
    Persist the returned frames to amortize across query batches."""
    import os

    raw = spark.read.parquet(os.path.join(path, "postings"))
    df_t = raw.groupBy("__term__").agg(F.count(F.lit(1)).alias("__df__"))
    postings = raw.join(df_t, "__term__")
    if max_df is not None:
        postings = postings.filter(F.col("__df__") <= max_df)
    doc_stats = spark.read.parquet(os.path.join(path, "doc_stats"))
    corpus_stats = doc_stats.agg(
        F.count(F.lit(1)).alias("__N__"), F.avg("__dl__").alias("__avgdl__")
    )
    return postings, doc_stats, corpus_stats


def load_positional_postings(spark, path: str) -> DataFrame:
    """The persisted positional postings (pass as ``positional=`` to
    :func:`proximity_filter`)."""
    import os

    return spark.read.parquet(os.path.join(path, "positions"))


def bm25_ingest_sink(
    stream_docs: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    metrics=None,
):
    """Continuous full-text-index ingest: per micro-batch, tokenize the
    new documents and append their postings/doc-lengths (+ positions if
    the index stores them) — queries issued after the batch commits
    retrieve the new documents with exact full-rebuild statistics (df /
    N / avgdl derive at load).  The retrieval twin of
    ``ann_ingest_sink``: state lives in the index, restart-clean from
    the checkpoint; the id-uniqueness contract is the caller's (route
    corpus mutations through a PK table upstream).  ``metrics``
    (optional list) records {batch_id, n_docs} per batch.  Runs with
    availableNow; swap the trigger for a continuous deployment."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            n = batch_df.count()
            if n == 0:
                return
            append_to_bm25_index(batch_df, id_col, text_col, index_path)
            if metrics is not None:
                metrics.append({"batch_id": batch_id, "n_docs": n})
        finally:
            batch_df.unpersist()

    return (
        stream_docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# -- WAND-style query-term pruning --------------------------------------------


def prune_query_terms(
    q_terms: DataFrame,
    postings: DataFrame,
    corpus_stats: DataFrame,
    keep_mass: float,
    k1: float = 1.2,
) -> DataFrame:
    """Drop each query's low-impact term tail — the batch analog of
    WAND / MaxScore upper-bound pruning (Broder et al., CIKM 2003).

    A term's score contribution is bounded by UB(t) = idf(t) * (k1+1)
    (tf * (k1+1) / (tf + k1*B) < k1+1 for any tf, B > 0).  Per query,
    terms are ordered by UB descending and the smallest prefix whose
    cumulative UB reaches ``keep_mass`` of the query's total UB is
    kept: a 50-term query whose tail is stop-ish words stops routing
    the postings join through those huge term keys, which is where the
    cost lives at corpus scale (Zipf: the cheapest-idf terms have the
    largest postings lists).  Deterministic (ties by term), so an
    external oracle can replay the rule exactly.  Terms absent from the
    index carry UB 0 and are always dropped (they cannot score).

    Approximate by design — a dropped term can demote a document that
    only matched the tail — bounded by 1 - keep_mass of the achievable
    score mass; keep_mass=1.0 keeps every indexed term.
    """
    if not 0.0 < keep_mass <= 1.0:
        raise ValueError(f"keep_mass must be in (0, 1], got {keep_mass}")
    df_t = postings.select("__term__", "__df__").distinct()
    idf = F.log(
        F.lit(1.0)
        + (F.col("__N__") - F.col("__df__") + 0.5) / (F.col("__df__") + 0.5)
    )
    ub = (idf * (k1 + 1.0)).alias("__ub__")
    ranked = (
        q_terms.join(df_t, "__term__")  # unindexed terms: UB 0, dropped
        .crossJoin(F.broadcast(corpus_stats))
        .select("__qid__", "__term__", ub)
    )
    w = Window.partitionBy("__qid__").orderBy(
        F.col("__ub__").desc(), F.col("__term__").asc()
    )
    total = Window.partitionBy("__qid__")
    return (
        ranked.withColumn(
            "__cum__", F.sum("__ub__").over(w.rowsBetween(Window.unboundedPreceding, -1))
        )
        .withColumn("__tot__", F.sum("__ub__").over(total))
        # keep while the PRECEDING prefix is still short of the mass
        # target (so the term crossing the threshold is included)
        .filter(
            F.coalesce(F.col("__cum__"), F.lit(0.0))
            < keep_mass * F.col("__tot__") - 1e-12
        )
        .select("__qid__", "__term__")
    )


# -- BM25F: field-weighted retrieval ------------------------------------------


def build_bm25f_index(
    docs: DataFrame,
    id_col: str,
    fields,  # {text_col: weight} or {text_col: (weight, b)}
    b: float = 0.75,
    max_df: Optional[int] = None,
):
    """Fielded inverted index for BM25F (Robertson, Zaragoza & Taylor,
    CIKM 2004 — the "simple BM25F" variant Lucene/Elasticsearch expose
    as ``combined_fields``): term frequencies are kept PER FIELD with
    per-field length normalization and weights, then combined into one
    pseudo-frequency before saturation, which is provably better than
    scoring fields independently and summing (a term spread across
    fields should saturate once, not n_fields times).

    ``fields`` maps text columns to a weight, or to ``(weight, b_f)``
    for per-field length normalization (title-ish fields usually want a
    smaller b).  Returns ``(postings, field_stats, corpus_stats)``:

    - postings:     (__term__, __doc__, __field__, __tf__, __df__) —
                    df counts documents containing the term in ANY field
    - field_stats:  (__field__, __avgdl__, __w__, __b__) — n_fields rows
    - corpus_stats: single row (__N__)

    N counts documents with >= 1 token in >= 1 field; avgdl_f averages
    the field's length over ALL N docs (empty fields count 0 — the
    BM25F convention).
    """
    spark = docs.sparkSession
    specs = []
    for col, cfg in fields.items():
        w, b_f = cfg if isinstance(cfg, (tuple, list)) else (cfg, b)
        specs.append((col, float(w), float(b_f)))
    occ = None
    for col, _, _ in specs:
        rows = _term_rows(docs, id_col, col).withColumn(
            "__field__", F.lit(col)
        )
        occ = rows if occ is None else occ.unionByName(rows)
    postings = occ.groupBy("__term__", "__doc__", "__field__").agg(
        F.count(F.lit(1)).alias("__tf__")
    )
    df_t = (
        postings.select("__term__", "__doc__")
        .distinct()
        .groupBy("__term__")
        .agg(F.count(F.lit(1)).alias("__df__"))
    )
    postings = postings.join(df_t, "__term__")
    if max_df is not None:
        postings = postings.filter(F.col("__df__") <= max_df)
    field_lens = occ.groupBy("__doc__", "__field__").agg(
        F.count(F.lit(1)).alias("__dl__")
    )
    postings = postings.join(field_lens, ["__doc__", "__field__"])
    n_docs = occ.select("__doc__").distinct().count()
    sums = {
        r["__field__"]: r["s"]
        for r in field_lens.groupBy("__field__")
        .agg(F.sum("__dl__").alias("s"))
        .collect()
    }  # n_fields scalars — never corpus-sized
    field_stats = spark.createDataFrame(
        [
            (col, float(sums.get(col, 0)) / max(n_docs, 1), w, b_f)
            for col, w, b_f in specs
        ],
        "__field__ string, __avgdl__ double, __w__ double, __b__ double",
    )
    corpus_stats = spark.createDataFrame(
        [(n_docs,)], "__N__ long"
    )
    return postings, field_stats, corpus_stats


def bm25f_topk(
    postings: DataFrame,
    field_stats: DataFrame,
    corpus_stats: DataFrame,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    k: int = 10,
    k1: float = 1.2,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-k BM25F retrieval: per (query, doc, term) the field
    frequencies combine into one weighted pseudo-frequency

        wtf = sum_f  w_f * tf_f / (1 - b_f + b_f * dl_f / avgdl_f)

    saturated once per term:  idf(t) * wtf * (k1+1) / (wtf + k1).

    Same scale shape as :func:`bm25_topk` — the only additions are the
    n_fields-row broadcast of field_stats and a second (tiny) agg level
    collapsing fields into the pseudo-frequency."""
    q_terms = (
        _term_rows(queries, query_id_col, query_text_col)
        .select(F.col("__doc__").alias("__qid__"), "__term__")
        .distinct()
    )
    if broadcast_queries:
        q_terms = F.broadcast(q_terms)
    b_norm = (
        F.lit(1.0)
        - F.col("__b__")
        + F.col("__b__") * F.col("__dl__") / F.col("__avgdl__")
    )
    wtf_part = F.col("__w__") * F.col("__tf__") / b_norm
    per_term = (
        postings.join(q_terms, "__term__")
        .join(F.broadcast(field_stats), "__field__")
        .groupBy("__qid__", "__doc__", "__term__")
        .agg(
            F.sum(wtf_part).alias("__wtf__"),
            F.first("__df__").alias("__df__"),
        )
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__N__") - F.col("__df__") + 0.5) / (F.col("__df__") + 0.5)
    )
    contrib = idf * F.col("__wtf__") * (k1 + 1.0) / (F.col("__wtf__") + k1)
    scored = (
        per_term.crossJoin(F.broadcast(corpus_stats))
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


def bm25f_search(
    docs: DataFrame,
    doc_id_col: str,
    fields,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: Optional[int] = None,
) -> DataFrame:
    """One-shot convenience: build the fielded index and retrieve."""
    postings, field_stats, corpus_stats = build_bm25f_index(
        docs, doc_id_col, fields, b=b, max_df=max_df
    )
    return bm25f_topk(
        postings, field_stats, corpus_stats,
        queries, query_id_col, query_text_col, k=k, k1=k1,
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of lexical + dense rankings
# ---------------------------------------------------------------------------


def rrf_fuse(
    ranked: Sequence[DataFrame],
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    fuse N ranked lists of (query_col, doc_col, rank) into one ranking
    by score = sum over lists of 1 / (c + rank).

    RRF is the standard lexical+dense hybrid combiner because it needs
    no score calibration — BM25 scores and cosines live on different
    scales, but ranks are ranks.  Returns (query_col, doc_col,
    rrf_score, n_lists, rank) with rank 1..k per query, ties broken by
    doc id.

    Scale shape: inputs are already top-k-per-query (k*|queries| rows,
    corpus-independent); the union + one aggregation + one per-query
    window touch only those.  Deterministic: the score is a sum of
    reciprocals of integer ranks, rounded to 6 — engines replay it
    exactly."""
    if not ranked:
        raise ValueError("need at least one ranked list")
    parts = [
        r.select(
            F.col(query_col),
            F.col(doc_col),
            (1.0 / (c + F.col("rank").cast("double"))).alias("__rrf__"),
        )
        for r in ranked
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    scored = unioned.groupBy(query_col, doc_col).agg(
        F.round(F.sum("__rrf__"), 6).alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(doc_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def hybrid_search(
    docs: DataFrame,
    doc_id_col: str,
    text_col: str,
    doc_vecs: DataFrame,
    vec_id_col: str,
    vec_col: str,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    query_vec_col: str,
    k: int = 10,
    depth: int = 20,
    c: int = 60,
    exclude_self: bool = True,
) -> DataFrame:
    """Lexical (BM25) + dense (exact cosine) retrieval fused with RRF —
    the retrieval shape RAG / training-data pipelines run at scale:
    each branch retrieves its top-``depth`` independently (inverted
    index vs broadcast-query vector scan), then ranks fuse without any
    score calibration.  ``exclude_self`` drops a result whose doc id
    equals the query id (queries drawn from the corpus)."""
    from fluss_datafusion_spark.operators.similarity import cosine_topk

    lex = bm25_search(
        docs, doc_id_col, text_col, queries, query_id_col, query_text_col, k=depth + 1
    )
    dense = cosine_topk(
        doc_vecs, queries, vec_id_col, vec_col, query_id_col, query_vec_col,
        k=depth + 1,
    ).select(
        F.col(query_id_col).alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "cos",
        "rank",
    )
    if exclude_self:
        lex = lex.filter(F.col("doc_id") != F.col("query_id"))
        dense = dense.filter(F.col("doc_id") != F.col("query_id"))
    # re-rank each branch after the self-exclusion so ranks are 1..depth
    def _rerank(df, order):
        w = Window.partitionBy("query_id").orderBy(*order)
        return (
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= depth)
        )

    lex = _rerank(lex.drop("rank"), [F.col("score").desc(), F.col("doc_id").asc()])
    dense = _rerank(dense.drop("rank"), [F.col("cos").desc(), F.col("doc_id").asc()])
    return rrf_fuse([lex, dense], k=k, c=c)


def bm25_rm3_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 10,
    alpha: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM3 — Lavrenko &
    Croft 2001 relevance models, the Abdul-Jaleel 2004 interpolated
    form, simplified to stay engine-replayable): run BM25, take each
    query's top ``fb_docs`` documents, weight their terms by

        w(t) = sum over feedback docs of  (tf(t,d) / dl(d)) * score(d)

    (per-doc language model mass weighted by retrieval score), keep the
    top ``fb_terms`` per query (rounded weight DESC, term ASC — float
    rounding BEFORE selection keeps term choice deterministic across
    engines), normalize to sum 1, then re-run BM25 where each document
    scores  alpha * original-query BM25 + (1-alpha) * sum over
    expansion terms of w(t) * bm25_contrib(t, d).

    Returns (query_id, doc_id, score, rank).  Scale shape: everything
    is the inverted index's term-keyed joins — feedback docs are
    k*|queries| rows, expansion terms fb_terms*|queries| rows, both
    broadcast; no new corpus-shaped work beyond a second postings join.
    """
    postings, doc_stats, corpus_stats = build_bm25_index(docs, id_col, text_col)
    for df_ in (postings, doc_stats):
        df_.persist()
    first = bm25_topk(
        postings, doc_stats, corpus_stats, queries, query_id_col, query_text_col,
        k=fb_docs, k1=k1, b=b,
    )
    # expansion-term weights from the feedback docs
    fb = first.select("query_id", F.col("doc_id").alias("__doc__"), "score")
    weights = (
        postings.join(F.broadcast(fb), "__doc__")
        .join(doc_stats, "__doc__")
        .groupBy("query_id", "__term__")
        .agg(
            F.round(
                F.sum(F.col("__tf__") / F.col("__dl__") * F.col("score")), 6
            ).alias("__w__")
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("__w__").desc(), F.col("__term__").asc()
    )
    topw = (
        weights.withColumn("__r__", F.row_number().over(w_rank))
        .filter(F.col("__r__") <= fb_terms)
        .drop("__r__")
    )
    wsum = topw.groupBy("query_id").agg(F.sum("__w__").alias("__wsum__"))
    exp_terms = topw.join(wsum, "query_id").select(
        "query_id", "__term__", (F.col("__w__") / F.col("__wsum__")).alias("__wn__")
    )
    # expansion-side score: w(t)-weighted BM25 contributions
    idf = F.log(
        F.lit(1.0)
        + (F.col("__N__") - F.col("__df__") + 0.5) / (F.col("__df__") + 0.5)
    )
    norm = F.col("__tf__") + k1 * (
        1.0 - b + b * F.col("__dl__") / F.col("__avgdl__")
    )
    contrib = idf * F.col("__tf__") * (k1 + 1.0) / norm
    exp_scored = (
        postings.join(F.broadcast(exp_terms), "__term__")
        .join(doc_stats, "__doc__")
        .crossJoin(F.broadcast(corpus_stats))
        .groupBy("query_id", "__doc__")
        .agg(F.round(F.sum(F.col("__wn__") * contrib), 4).alias("__es__"))
    )
    # original-query side: full BM25 over every candidate (large k cap)
    orig = bm25_topk(
        postings, doc_stats, corpus_stats, queries, query_id_col, query_text_col,
        k=1 << 30, k1=k1, b=b,
    ).select("query_id", F.col("doc_id").alias("__doc__"), F.col("score").alias("__os__"))
    combined = (
        orig.join(exp_scored, ["query_id", "__doc__"], "full_outer")
        .select(
            "query_id",
            "__doc__",
            # round at 6, not 4: the components are exact 4-decimal
            # values, so the interpolation sits exactly ON the 4-decimal
            # half-way boundary (x.xxxx5) where engines' rounding modes
            # disagree; at 6 decimals there is no boundary to disagree on
            F.round(
                alpha * F.coalesce(F.col("__os__"), F.lit(0.0))
                + (1 - alpha) * F.coalesce(F.col("__es__"), F.lit(0.0)),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("__doc__").asc()
    )
    out = (
        combined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("__doc__").alias("doc_id"),
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )
    return out


def mmr_diversify(
    candidates: DataFrame,
    query_col: str,
    doc_col: str,
    rel_col: str,
    vec_col: str,
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): greedily select k results per query maximizing

        lam * relevance(d) - (1 - lam) * max cosine(d, already-selected)

    — the diversification pass between retrieval and the consumer
    (dedup'd RAG contexts, varied training negatives).  Ties break by
    (marginal score DESC, doc id ASC); the first pick is the pure
    relevance argmax.

    Scale shape: the input is already a per-query candidate list
    (top-N, corpus-independent); the greedy loop runs per query in one
    Arrow-batched applyInPandas over numpy (k*N cosine ops on an
    N-row group — model-sized, never corpus-sized).  Output:
    (query_col, doc_col, rel, mmr_score, rank)."""
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{query_col} bigint, {doc_col} bigint, rel double, "
        "mmr_score double, rank int"
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([rel_col, doc_col], ascending=[False, True])
        vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        docs = pdf[doc_col].to_numpy()
        n = len(pdf)
        selected: list = []
        scores: list = []
        remaining = list(range(n))
        # true max over selected — negative similarities legitimately
        # RAISE the marginal score (anti-correlated docs are maximally
        # diverse), so no clamping at 0
        max_sim = np.full(n, -np.inf)
        while remaining and len(selected) < k:
            best_i, best_score = None, None
            for i in remaining:
                s = lam * rel[i] - (1 - lam) * (max_sim[i] if selected else 0.0)
                if (
                    best_score is None
                    or s > best_score
                    or (s == best_score and docs[i] < docs[best_i])
                ):
                    best_i, best_score = i, s
            selected.append(best_i)
            scores.append(best_score)
            remaining.remove(best_i)
            sims = unit[remaining] @ unit[best_i]
            for j, idx in enumerate(remaining):
                if sims[j] > max_sim[idx]:
                    max_sim[idx] = sims[j]
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[0],
                doc_col: docs[selected],
                "rel": np.round(rel[selected], 6),
                "mmr_score": np.round(np.array(scores), 6),
                "rank": np.arange(1, len(selected) + 1, dtype=np.int32),
            }
        )

    return candidates.groupBy(query_col).applyInPandas(pick, out_schema)


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    query_col: str = "qid",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Offline retrieval evaluation: per-query reciprocal rank,
    recall@k, and nDCG@k (binary relevance) — the metrics pass every
    search/RAG pipeline runs against a labeled qrels set before
    shipping an index or reranker change.

    ``results``: (query, doc, rank) with rank 1-based and unique per
    query; ``qrels``: (query, doc) relevant pairs.  Returns one row per
    query in qrels: (query, rr, recall_at_k, ndcg_at_k) — queries whose
    top-k retrieved nothing relevant score 0, and queries absent from
    ``results`` entirely still appear (a broken router must show up as
    zeros, not vanish from the macro average).

    Definitions (binary gain): RR = 1/rank of the first relevant hit at
    ANY rank (the standard MRR convention); recall@k = |relevant ∩
    top-k| / |relevant|; nDCG@k = Σ_{hits ≤ k} 1/log2(rank+1) divided
    by the ideal Σ_{i=1..min(|relevant|, k)} 1/log2(i+1).

    Scale shape: one inner join of results with qrels on (query, doc)
    — both sides shuffle on the same key — then two map-side-combined
    aggregations on the query key; the ideal-DCG term is a closed-form
    expression over the per-query relevant count (an ``aggregate`` over
    ``sequence``, no second data pass).  No UDFs, no driver rows.
    """
    q, d, r = query_col, doc_col, rank_col
    hits = results.join(qrels, [q, d], "inner")
    per_q = hits.groupBy(q).agg(
        F.min(F.col(r)).alias("__first__"),
        F.sum((F.col(r) <= k).cast("int")).alias("__nret__"),
        F.sum(
            F.when(F.col(r) <= k, 1.0 / F.log2(F.col(r) + 1)).otherwise(0.0)
        ).alias("__dcg__"),
    )
    n_rel = qrels.groupBy(q).agg(F.count(F.lit(1)).alias("__nrel__"))
    idcg = F.expr(
        f"aggregate(sequence(1, least(__nrel__, {k})),"
        " CAST(0.0 AS DOUBLE), (s, i) -> s + 1.0 / log2(i + 1))"
    )
    return (
        n_rel.join(per_q, q, "left")
        .select(
            q,
            F.coalesce(1.0 / F.col("__first__"), F.lit(0.0)).alias("rr"),
            F.coalesce(
                F.col("__nret__") / F.col("__nrel__"), F.lit(0.0)
            ).alias("recall_at_k"),
            F.coalesce(F.col("__dcg__") / idcg, F.lit(0.0)).alias(
                "ndcg_at_k"
            ),
        )
    )
