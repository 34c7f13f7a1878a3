"""Model-based quality classification (Naive Bayes over tokens).

The GPT-3 / CCNet pipelines filter web text with a LINEAR CLASSIFIER
trained to separate a clean reference corpus from raw crawl (Brown et
al. 2020 §A "quality filtering"; Wenzek et al. 2020 trains fastText for
language/quality).  This module is that signal as pure DataFrame jobs: a
multinomial Naive Bayes classifier whose "model" IS a pair of
DataFrames — per-token class counts plus a one-row totals table — so
training is two map-side-combined aggregations and scoring is one
shuffle join on the token key.  No model file, no UDF, no driver-side
state; the same shape as operators/lm.py's bigram LM, which this
complements (LM = in-domain-ness, NB = discriminative good-vs-bad).

Model: add-alpha multinomial NB over lowercase whitespace tokens,

    log-odds(doc) = mean over tokens w of
        log( (c1(w) + a) / (T1 + a*V) ) - log( (c0(w) + a) / (T0 + a*V) )

with c_k(w) = count of w in class-k training docs, T_k = total class-k
tokens, V = training vocabulary size.  The per-token mean (not sum)
keeps the score length-invariant; the class prior is returned separately
so callers can threshold either way.  All counts are exact integers —
only the final mean is floating point, rounded like every cross-engine
float aggregate in this repo.

No reference analog (zuston/fluss-datafusion has no text operators);
part of the north-star LLM-pipeline surface.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluss_datafusion_spark.functions.text import tokens
from fluss_datafusion_spark.session import spread_small_scan


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(__id__, __tok__) — one row per token occurrence, empty docs
    dropped (no tokens to vote with)."""
    return (
        spread_small_scan(docs.filter(F.length(F.trim(F.col(text_col))) > 0))
        .select(
            F.col(id_col).alias("__id__"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok__"),
        )
    )


def train_nb_classifier(
    docs: DataFrame, id_col: str, text_col: str, label_col: str
) -> Tuple[DataFrame, DataFrame]:
    """Train on labeled docs (``label_col`` boolean-ish: truthy = the
    positive/"good" class).  Returns ``(token_counts, totals)``:

    - token_counts: ``(__tok__, __c1__, __c0__)`` — per-token
      occurrence counts in each class (one explode + one
      map-side-combined aggregation; vocabulary-sized, shuffle-joined
      at score time, NEVER broadcast);
    - totals: single row ``(__T1__, __T0__, __V__, __N1__, __N0__)`` —
      class token totals, vocabulary size, class document counts (rides
      into scoring as a one-row broadcast).

    Persist both (or write them to tables) to score many batches
    against one trained model.
    """
    lbl = F.col(label_col).cast("boolean")
    tk = _doc_tokens(docs, id_col, text_col).join(
        docs.select(F.col(id_col).alias("__id__"), lbl.alias("__y__")),
        "__id__",
    )
    token_counts = tk.groupBy("__tok__").agg(
        F.sum(F.when(F.col("__y__"), 1).otherwise(0)).alias("__c1__"),
        F.sum(F.when(F.col("__y__"), 0).otherwise(1)).alias("__c0__"),
    )
    totals = token_counts.agg(
        F.sum("__c1__").alias("__T1__"),
        F.sum("__c0__").alias("__T0__"),
        F.count(F.lit(1)).alias("__V__"),
    ).crossJoin(
        docs.agg(
            F.sum(F.when(lbl, 1).otherwise(0)).alias("__N1__"),
            F.sum(F.when(lbl, 0).otherwise(1)).alias("__N0__"),
        )
    )
    return token_counts, totals


def score_nb_classifier(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    token_counts: DataFrame,
    totals: DataFrame,
    alpha: float = 1.0,
) -> DataFrame:
    """Score documents against a trained NB model: per document the MEAN
    per-token log-odds (positive = good-class-like) plus the class log
    prior.  Returns ``(id_col, n_tokens, avg_log_odds, log_prior,
    pred_good)`` with the float columns rounded to 4 (cross-engine
    float-sum tolerance, same discipline as score_with_lm).

    Scale shape: document tokens shuffle-join the vocabulary-sized count
    table on the token key (near-unique strings — uniform hash, no
    skew); the one-row totals broadcast; the final mean is one
    map-side-combined aggregation on the doc id.  Unseen tokens degrade
    to the alpha floor via coalesce-to-zero.
    """
    tk = _doc_tokens(docs, id_col, text_col)
    log_odds = F.log(
        (F.coalesce(F.col("__c1__"), F.lit(0)) + F.lit(alpha))
        / (F.col("__T1__") + F.lit(alpha) * F.col("__V__"))
    ) - F.log(
        (F.coalesce(F.col("__c0__"), F.lit(0)) + F.lit(alpha))
        / (F.col("__T0__") + F.lit(alpha) * F.col("__V__"))
    )
    log_prior = F.log(F.col("__N1__") / F.col("__N0__"))
    return (
        tk.join(token_counts, "__tok__", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("__id__")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(log_odds), 4).alias("avg_log_odds"),
            F.round(F.first(log_prior), 4).alias("log_prior"),
            (F.avg(log_odds) + F.first(log_prior) / F.count(F.lit(1)) > 0)
            .alias("pred_good"),
        )
        .select(
            F.col("__id__").alias(id_col),
            "n_tokens",
            "avg_log_odds",
            "log_prior",
            "pred_good",
        )
    )


def nb_quality_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Self-training convenience: train on ``docs``'s weak labels and
    score every doc (the bootstrap pattern — heuristic labels train the
    model, the model generalizes past the heuristic; production trains
    on a curated reference corpus via the two-step API)."""
    token_counts, totals = train_nb_classifier(docs, id_col, text_col, label_col)
    return score_nb_classifier(
        docs, id_col, text_col, token_counts, totals, alpha
    )
