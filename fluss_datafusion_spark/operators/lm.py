"""N-gram language-model quality scoring (CCNet-style).

CCNet (Wenzek et al. 2020) ranks CommonCrawl documents by the perplexity
of a KenLM n-gram model trained on Wikipedia; documents whose LM score is
an outlier are boilerplate/gibberish.  This module is that signal as pure
DataFrame jobs: train = two map-side-combined count aggregations (bigram
and prefix counts), score = two shuffle joins on the n-gram key plus one
per-document average.  No model file, no UDF, no driver-side state — the
"model" IS a pair of DataFrames, so it scales to any corpus Spark can
shuffle and can be persisted/reused like any other table.

Model: add-alpha-smoothed bigram LM over lowercase whitespace tokens,

    P(w2 | w1) = (c(w1 w2) + alpha) / (cp(w1) + alpha * V)

with c = bigram count, cp = prefix count (occurrences of w1 as a bigram
prefix — sums to the bigram total, so each conditional distribution is
properly normalized), V = train vocabulary size.  Unseen bigrams /
prefixes degrade smoothly to the alpha floor.

No reference analog (zuston/fluss-datafusion has no text operators);
part of the north-star LLM-pipeline surface.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluss_datafusion_spark.functions.text import token_count, tokens
from fluss_datafusion_spark.session import spread_small_scan


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(__id__, __w1__, __w2__) — one row per consecutive token pair.

    zip_with over the token array and its shifted slice (each array
    evaluated once per row — an element_at-in-transform lambda would
    re-split the text per element, O(tokens^2); see
    functions/text.py:word_shingles).  spread_small_scan fans the
    interpreted lambda across cores on small-file test inputs.
    """
    # no spread (r13): tokenize + slice/zip_with bigrams measured
    # CHEAPER serialized than the round-robin widening on small inputs
    # (A/B ns_quality_lm_score 1.9-2.5 -> 1.3-1.8 s warm); at 100 TB
    # the guard was a no-op
    with_toks = (
        docs.filter(token_count(F.col(text_col)) >= 2)
        .select(
            F.col(id_col).alias("__id__"),
            tokens(F.lower(F.col(text_col))).alias("__t__"),
        )
    )
    n = F.size("__t__")
    pairs = F.zip_with(
        F.slice("__t__", F.lit(1), n - 1),
        F.slice("__t__", F.lit(2), n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return with_toks.select(
        "__id__", F.explode(pairs).alias("__bg__")
    ).select(
        "__id__",
        F.col("__bg__.w1").alias("__w1__"),
        F.col("__bg__.w2").alias("__w2__"),
    )


def train_bigram_lm(
    docs: DataFrame, id_col: str, text_col: str
) -> Tuple[DataFrame, DataFrame, DataFrame]:
    """Train on a corpus: returns (bigram_counts, prefix_counts, vocab)
    DataFrames — ``(__w1__, __w2__, __c2__)``, ``(__w1__, __cp__)`` and a
    single-row ``(__V__)``.  Each is one explode + one map-side-combined
    count; persist them (or write to a table) to score many batches
    against one trained model."""
    bg = _doc_bigrams(docs, id_col, text_col)
    c2 = bg.groupBy("__w1__", "__w2__").agg(F.count(F.lit(1)).alias("__c2__"))
    cp = bg.groupBy("__w1__").agg(F.count(F.lit(1)).alias("__cp__"))
    vocab = (
        docs.filter(token_count(F.col(text_col)) >= 2)  # no spread (r13)
        .select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok__")
        )
        .agg(F.countDistinct("__tok__").alias("__V__"))
    )
    return c2, cp, vocab


def score_with_lm(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bigram_counts: DataFrame,
    prefix_counts: DataFrame,
    vocab: DataFrame,
    alpha: float = 0.1,
) -> DataFrame:
    """Score documents against a trained bigram LM: per document the mean
    log-probability of its bigrams (higher = more model-like; rank or
    threshold downstream).  Returns (id_col, n_bigrams, avg_logprob)
    with avg_logprob rounded to 4 (cross-engine float-sum tolerance).

    Scale shape: the document bigrams join the count tables with plain
    shuffle joins on the n-gram key (near-unique strings — uniform hash,
    no skew; the count tables are corpus-sized state and are never
    broadcast); V rides in as a single-row broadcast.  The final average
    is one map-side-combined aggregation on the doc id."""
    bg = _doc_bigrams(docs, id_col, text_col)
    logp = F.log(
        (F.coalesce(F.col("__c2__"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("__cp__"), F.lit(0)) + F.lit(alpha) * F.col("__V__"))
    )
    return (
        bg.join(bigram_counts, ["__w1__", "__w2__"], "left")
        .join(prefix_counts, "__w1__", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("__id__")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 4).alias("avg_logprob"),
        )
        .select(F.col("__id__").alias(id_col), "n_bigrams", "avg_logprob")
    )


def bigram_lm_scores(
    docs: DataFrame, id_col: str, text_col: str, alpha: float = 0.1
) -> DataFrame:
    """Self-scoring convenience: train on ``docs`` and score ``docs``
    (the in-domain-ness signal; the CCNet pattern trains on a clean
    reference corpus and scores the raw one — pass the pieces through
    ``train_bigram_lm`` / ``score_with_lm`` for that)."""
    c2, cp, vocab = train_bigram_lm(docs, id_col, text_col)
    return score_with_lm(docs, id_col, text_col, c2, cp, vocab, alpha)


def quality_buckets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 3,
    alpha: float = 0.1,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): rank
    every document by its LM score and cut the corpus into
    ``n_buckets`` equal-frequency buckets — bucket 1 ("head") is the
    most model-like third, "tail" the least; downstream mixtures train
    preferentially on head+middle.  Returns (id_col, avg_logprob,
    bucket_id, bucket_label) for every scored document.

    Determinism: ranking orders by the ROUNDED score (the value both
    engines agree on bit-for-bit) descending with the id as tiebreak,
    and bucket boundaries are pure integer arithmetic on (rank, N) —
    no percentile estimation anywhere.

    Scale shape: scoring is the bigram-LM plan; the global rank is
    ``training.range_ranked`` (range-partitioned parallel rank +
    broadcast offsets — no single-partition sort); N rides in as a
    one-row broadcast."""
    from fluss_datafusion_spark.operators.training import range_ranked

    scores = bigram_lm_scores(docs, id_col, text_col, alpha=alpha)
    ranked, rank_col = range_ranked(
        scores, [F.col("avg_logprob").desc(), F.col(id_col).asc()]
    )
    n_total = scores.agg(F.count(F.lit(1)).alias("__N__"))
    labels = F.when(F.col("bucket_id") == 1, "head").when(
        F.col("bucket_id") == n_buckets, "tail"
    ).otherwise("middle")
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .withColumn(
            "bucket_id",
            (
                F.floor(
                    (F.col(rank_col) - 1) * n_buckets / F.col("__N__")
                ) + 1
            ).cast("int"),
        )
        .select(
            id_col,
            "avg_logprob",
            "bucket_id",
            labels.alias("bucket_label"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Collocation extraction by pointwise mutual information (Church &
    Hanks 1990): for adjacent token pairs,

        pmi(a, b) = ln( p(a,b) / (p(a) * p(b)) )

    with p over the corpus bigram/unigram mass — the classic detector
    of multiword units ("new york", "et al") that tokenizer and
    stop-phrase pipelines consume.  ``min_count`` drops the unstable
    low-frequency tail (PMI's known bias toward hapax pairs); returns
    the ``top_k`` pairs by (pmi DESC, pair ASC) — deterministic.

    Scale shape: one bigram explode + two map-side-combined counts +
    two joins keyed on the token (the unigram side is vocabulary-sized,
    not corpus-sized); top-k is TakeOrderedAndProject.  No UDFs — every
    statistic replays exactly in an external engine."""
    bg = _doc_bigrams(docs, id_col, text_col)
    # materialized once: three plan branches (unigram derivation + the
    # two scored joins) would otherwise each re-run the corpus explode
    pair_counts = (
        bg.groupBy("__w1__", "__w2__")
        .agg(F.count(F.lit(1)).alias("__n_ab__"))
        .localCheckpoint(eager=True)
    )
    # unigram mass from the ALREADY-AGGREGATED pairs (vocabulary-
    # bounded), not a second corpus-sized scan of the bigram stream
    uni = (
        pair_counts.select(F.col("__w1__").alias("__w__"), "__n_ab__")
        .unionAll(pair_counts.select(F.col("__w2__").alias("__w__"), "__n_ab__"))
        .groupBy("__w__")
        .agg(F.sum("__n_ab__").alias("__n__"))
    )
    totals = pair_counts.agg(
        F.sum("__n_ab__").alias("__N__")
    )  # 1-row broadcast; unigram mass = 2N by construction
    scored = (
        pair_counts.filter(F.col("__n_ab__") >= min_count)
        .join(uni.withColumnRenamed("__w__", "__w1__").withColumnRenamed("__n__", "__n_a__"), "__w1__")
        .join(uni.withColumnRenamed("__w__", "__w2__").withColumnRenamed("__n__", "__n_b__"), "__w2__")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("__w1__").alias("w1"),
            F.col("__w2__").alias("w2"),
            F.col("__n_ab__").cast("bigint").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("__n_ab__") / F.col("__N__"))
                    / (
                        (F.col("__n_a__") / (2.0 * F.col("__N__")))
                        * (F.col("__n_b__") / (2.0 * F.col("__N__")))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(top_k)


def train_kn_lm(
    docs: DataFrame, id_col: str, text_col: str
) -> Tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Train an interpolated Kneser–Ney bigram LM (Kneser & Ney 1995;
    Chen & Goodman 1998 — THE smoothing KenLM implements and CCNet
    filters with; the add-alpha model above is the cheap stand-in):

        P(w2 | w1) = max(c(w1 w2) − D, 0) / cp(w1)
                     + D · N1+(w1 ·) / cp(w1) · P_cont(w2)
        P_cont(w2) = (N1+(· w2) + a) / (N_types + a · (V + 1))

    with D the absolute discount, N1+(w1 ·) the distinct continuations
    of w1, N1+(· w2) the distinct left-contexts of w2 (the
    "novel-context" count that makes KN rank 'Francisco' low despite
    high frequency), N_types the distinct bigram count, and the
    continuation distribution additively floored (a, +1 OOV bucket) so
    every score is finite.

    Returns (bigrams, prefixes, continuations, scalars) DataFrames:
    ``(__w1__, __w2__, __c2__)``, ``(__w1__, __cp__, __n1l__)``,
    ``(__w2__, __n1r__)``, ``(__V__, __T__)`` — three map-side-combined
    counts over ONE bigram derivation plus the vocab scalar; the model
    is corpus-shuffle-sized state, never a broadcast."""
    bg = _doc_bigrams(docs, id_col, text_col)
    c2 = bg.groupBy("__w1__", "__w2__").agg(
        F.count(F.lit(1)).alias("__c2__")
    )
    prefixes = c2.groupBy("__w1__").agg(
        F.sum("__c2__").alias("__cp__"),
        F.count(F.lit(1)).alias("__n1l__"),
    )
    continuations = c2.groupBy("__w2__").agg(
        F.count(F.lit(1)).alias("__n1r__")
    )
    scalars = (
        docs.filter(token_count(F.col(text_col)) >= 2)  # no spread (r13)
        .select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok__")
        )
        .agg(F.countDistinct("__tok__").alias("__V__"))
        .crossJoin(c2.agg(F.count(F.lit(1)).alias("__T__")))
    )
    return c2, prefixes, continuations, scalars


def score_with_kn(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bigrams: DataFrame,
    prefixes: DataFrame,
    continuations: DataFrame,
    scalars: DataFrame,
    discount: float = 0.75,
    alpha: float = 0.5,
) -> DataFrame:
    """Score documents under the trained KN model (train_kn_lm): per
    document the mean log-probability of its bigrams.  Unseen prefixes
    back off entirely to the continuation distribution; unseen words
    land in its additive floor — every bigram scores finite.

    Same scale shape as score_with_lm: three shuffle joins on narrow
    n-gram keys (model state is corpus-sized, never broadcast; the two
    scalars ride as a single-row broadcast), one map-side-combined
    per-doc average.  Returns (id_col, n_bigrams, avg_logprob) rounded
    to 4 — the cross-engine float-sum tolerance."""
    bg = _doc_bigrams(docs, id_col, text_col)
    p_cont = (F.coalesce(F.col("__n1r__"), F.lit(0)) + F.lit(alpha)) / (
        F.col("__T__") + F.lit(alpha) * (F.col("__V__") + 1)
    )
    seen = F.col("__cp__").isNotNull()
    p_seen = (
        F.greatest(
            F.coalesce(F.col("__c2__"), F.lit(0)) - F.lit(discount),
            F.lit(0.0),
        )
        / F.col("__cp__")
        + F.lit(discount) * F.col("__n1l__") / F.col("__cp__") * p_cont
    )
    logp = F.log(F.when(seen, p_seen).otherwise(p_cont))
    return (
        bg.join(bigrams, ["__w1__", "__w2__"], "left")
        .join(prefixes, "__w1__", "left")
        .join(continuations, "__w2__", "left")
        .crossJoin(F.broadcast(scalars))
        .groupBy("__id__")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 4).alias("avg_logprob"),
        )
        .select(F.col("__id__").alias(id_col), "n_bigrams", "avg_logprob")
    )
