"""Byte-pair-encoding vocabulary training over a corpus (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units") — the tokenizer-training step every LLM data pipeline runs.

Scale design: classic BPE trains on the WORD-FREQUENCY DICTIONARY, not
the raw corpus — so the first step collapses the corpus to one row per
distinct word with its count (a single map-side-combined groupBy; the
dictionary is orders of magnitude smaller than the corpus and bounded
by vocabulary growth laws).  Each merge iteration is then two bounded
DataFrame jobs over the dictionary:

1. adjacent-pair frequencies: explode each word's symbol sequence into
   (left, right) pairs weighted by the word count, one
   map-side-combined agg; the best pair (freq DESC, left ASC, right
   ASC — fully deterministic) is the ONLY row the driver receives
   (model state, not data);
2. apply the merge: an Arrow-batched pandas pass rewrites each word's
   symbol array left-to-right (non-overlapping, the spec's greedy
   rule).

Lineage is truncated with localCheckpoint every few rounds (the
dedup_clusters pattern) so n_merges iterations don't stack n_merges
plans.  No SQL oracle exists for the iterative argmax (the corpus
entry is a rows-only check); the hard signal is
tests/test_bpe.py::test_learn_bpe_matches_reference — a pure-Python
reference implementation with identical tie-breaks, compared merge by
merge.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_END = "</w>"


def _word_dictionary(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over lower+whitespace tokenization — one shuffle."""
    from fluss_datafusion_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("__w__"))
        .filter(F.col("__w__") != "")
        .groupBy("__w__")
        .agg(F.count(F.lit(1)).alias("__n__"))
    )


def _merge_word(symbols: List[str], left: str, right: str, merged: str) -> List[str]:
    """Greedy left-to-right non-overlapping merge of (left, right)."""
    out = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 20,
    checkpoint_every: int = 5,
) -> List[Tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.  Returns
    [(rank, left, right, pair_freq), ...] in merge order — the model
    artifact a tokenizer consumes.  Words are split into characters
    plus a ``</w>`` end-of-word marker (the original formulation, so
    word-final subwords are distinct symbols)."""
    import pandas as pd

    spark = docs.sparkSession
    words = _word_dictionary(docs, text_col).withColumn(
        "__sym__",
        F.concat(
            F.split(F.col("__w__"), ""),
            F.array(F.lit(_END)),
        ),
    ).localCheckpoint()

    merges: List[Tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            words.select(
                "__n__",
                F.posexplode(F.slice("__sym__", 1, F.size("__sym__") - 1)).alias(
                    "__i__", "__l__"
                ),
                F.col("__sym__").alias("__s__"),
            )
            .select(
                "__n__",
                "__l__",
                F.element_at(F.col("__s__"), F.col("__i__") + 2).alias("__r__"),
            )
            .groupBy("__l__", "__r__")
            .agg(F.sum("__n__").alias("__f__"))
            .orderBy(F.col("__f__").desc(), F.col("__l__"), F.col("__r__"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        best = pairs[0]
        left, right, freq = best["__l__"], best["__r__"], int(best["__f__"])
        merges.append((rank, left, right, freq))
        merged = left + right

        def _apply(batches, left=left, right=right, merged=merged):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["__sym__"] = pdf["__sym__"].map(
                    lambda s: _merge_word(list(s), left, right, merged)
                )
                yield pdf

        words = words.mapInPandas(
            _apply, "__w__ string, __n__ long, __sym__ array<string>"
        )
        if (rank + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def bpe_merges_table(
    docs: DataFrame, text_col: str, n_merges: int = 20
) -> DataFrame:
    """``learn_bpe_merges`` as a DataFrame (rank, left, right, merged,
    pair_freq) — the corpus-entry / SQL-facing shape."""
    spark = docs.sparkSession
    merges = learn_bpe_merges(docs, text_col, n_merges=n_merges)
    return spark.createDataFrame(
        [(r, l, rt, l + rt, f) for r, l, rt, f in merges],
        "rank int, left string, right string, merged string, pair_freq bigint",
    )


def apply_bpe(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: List[Tuple[int, str, str, int]],
) -> DataFrame:
    """Tokenize the corpus with learned merge rules: every word splits
    to characters + ``</w>``, then each merge applies in rank order
    (greedy left-to-right, the trainer's exact rule).  Returns
    (id, n_tokens, tokens) with tokens space-joined — the subword
    sequence a training run consumes.

    Scale shape: the merge list is model state (a few kB broadcast into
    the Arrow workers via closure); tokenization is one mapInPandas
    pass over the corpus — no shuffle at all.  Distinct words repeat
    across documents, so the kernel memoizes per batch (the word-dict
    locality that makes BPE application cheap in practice)."""
    import pandas as pd

    rules = [(left, right, left + right) for _, left, right, _ in merges]

    def _tok(batches):
        for pdf in batches:
            cache = {}

            def word_tokens(w: str) -> List[str]:
                got = cache.get(w)
                if got is None:
                    syms = list(w) + [_END]
                    for left, right, merged in rules:
                        syms = _merge_word(syms, left, right, merged)
                    cache[w] = got = syms
                return got

            toks = []
            for text in pdf[text_col]:
                out: List[str] = []
                for w in (text or "").lower().split():
                    out.extend(word_tokens(w))
                toks.append(out)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": [len(t) for t in toks],
                    "tokens": [" ".join(t) for t in toks],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        _tok, f"{id_col} long, n_tokens long, tokens string"
    )
