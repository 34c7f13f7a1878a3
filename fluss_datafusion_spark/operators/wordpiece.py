"""WordPiece tokenizer training + application (Schuster & Nakajima
2012; the BERT tokenizer) — completing the subword-tokenizer triad next
to BPE (operators/bpe.py, frequency-greedy) and unigram-LM
(operators/unigram.py, likelihood-pruning).

WordPiece differs from BPE in BOTH phases:

- TRAINING picks the merge maximizing the unigram-likelihood gain
  ``score = freq(pair) / (freq(left) * freq(right))`` instead of raw
  pair frequency — rare-but-strongly-coupled symbol pairs merge before
  frequent-but-independent ones (the HuggingFace WordPiece trainer
  implements exactly this score);
- APPLICATION ignores the merge order entirely and greedily takes the
  LONGEST vocabulary token matching at each position (MaxMatch), with
  ``##`` marking word-internal continuation and ``[UNK]`` swallowing
  words containing out-of-vocabulary characters.

Scale design mirrors BPE's: training runs on the word-frequency
DICTIONARY (one map-side-combined groupBy collapses the corpus; the
dictionary is bounded by vocabulary growth laws, not corpus size).
Each merge round is one Spark job: pair frequencies and symbol
frequencies are two aggs over the dictionary joined on the pair's
endpoints (the symbol-freq side is vocab-sized — AQE broadcasts it),
and the single best row is all the driver receives.  Application is
one Arrow-batched ``mapInPandas`` pass with per-batch word
memoization — zero shuffles, model state (the vocab) rides the closure.

Determinism: score ties break on (left ASC, right ASC); the score is
one IEEE-double divide of exact integer counts, so the pure-Python
reference trainer (tests/test_wordpiece.py) reproduces the argmax
bit-for-bit, merge by merge.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNK = "[UNK]"
_CONT = "##"


def _word_symbols(word: str) -> List[str]:
    """BERT-style initial split: first char raw, the rest ##-prefixed."""
    return [word[0]] + [_CONT + c for c in word[1:]]


def _merge_syms(symbols: List[str], left: str, right: str, merged: str) -> List[str]:
    """Greedy left-to-right non-overlapping merge (the BPE rule)."""
    out: List[str] = []
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


def _merged_token(left: str, right: str) -> str:
    """a + ##b -> ab; ##a + ##b -> ##ab (continuation status is the
    LEFT symbol's)."""
    return left + (right[len(_CONT):] if right.startswith(_CONT) else right)


def learn_wordpiece(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 20,
    checkpoint_every: int = 5,
) -> Tuple[List[Tuple[int, str, str, float]], List[str]]:
    """Learn ``n_merges`` WordPiece merges.  Returns (merges, vocab):
    merges = [(rank, left, right, score), ...] in merge order; vocab =
    the alphabet (every initial symbol in the dictionary) plus each
    merge's product, in that order — the artifact MaxMatch consumes."""
    from fluss_datafusion_spark.operators.bpe import _word_dictionary

    words = (
        _word_dictionary(docs, text_col)
        .withColumn(
            "__sym__",
            F.concat(
                F.slice(F.split(F.col("__w__"), ""), 1, 1),
                F.transform(
                    F.slice(
                        F.split(F.col("__w__"), ""),
                        2,
                        F.greatest(
                            F.length(F.col("__w__")) - 1, F.lit(0)
                        ),
                    ),
                    lambda c: F.concat(F.lit(_CONT), c),
                ),
            ),
        )
        .localCheckpoint()
    )
    alphabet = [
        r["__s__"]
        for r in (
            words.select(F.explode("__sym__").alias("__s__"))
            .distinct()
            .orderBy("__s__")
            .collect()
        )
    ]
    vocab = list(alphabet)

    merges: List[Tuple[int, str, str, float]] = []
    for rank in range(n_merges):
        sym_freq = (
            words.select("__n__", F.explode("__sym__").alias("__s__"))
            .groupBy("__s__")
            .agg(F.sum("__n__").alias("__sf__"))
        )
        pairs = (
            words.select(
                "__n__",
                F.posexplode(
                    F.slice("__sym__", 1, F.size("__sym__") - 1)
                ).alias("__i__", "__l__"),
                F.col("__sym__").alias("__ss__"),
            )
            .select(
                "__n__",
                "__l__",
                F.element_at(F.col("__ss__"), F.col("__i__") + 2).alias("__r__"),
            )
            .groupBy("__l__", "__r__")
            .agg(F.sum("__n__").alias("__f__"))
        )
        best = (
            pairs.join(
                F.broadcast(sym_freq.withColumnRenamed("__s__", "__l__")
                            .withColumnRenamed("__sf__", "__lf__")),
                "__l__",
            )
            .join(
                F.broadcast(sym_freq.withColumnRenamed("__s__", "__r__")
                            .withColumnRenamed("__sf__", "__rf__")),
                "__r__",
            )
            .select(
                "__l__",
                "__r__",
                (
                    F.col("__f__").cast("double")
                    / (F.col("__lf__") * F.col("__rf__")).cast("double")
                ).alias("__score__"),
            )
            .orderBy(F.col("__score__").desc(), F.col("__l__"), F.col("__r__"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["__l__"], best[0]["__r__"]
        score = float(best[0]["__score__"])
        merges.append((rank, left, right, score))
        merged = _merged_token(left, right)
        vocab.append(merged)

        def _apply(batches, left=left, right=right, merged=merged):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["__sym__"] = pdf["__sym__"].map(
                    lambda s: _merge_syms(list(s), left, right, merged)
                )
                yield pdf

        words = words.mapInPandas(
            _apply, "__w__ string, __n__ long, __sym__ array<string>"
        )
        if (rank + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges, vocab


def wordpiece_tokenize_word(word: str, vocab: set) -> List[str]:
    """MaxMatch: greedy longest vocabulary token at each position;
    any position with no match makes the WHOLE word ``[UNK]`` (the
    BERT rule — partial decompositions are discarded)."""
    out: List[str] = []
    i = 0
    n = len(word)
    while i < n:
        end = n
        piece = None
        while end > i:
            cand = word[i:end] if i == 0 else _CONT + word[i:end]
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [_UNK]
        out.append(piece)
        i = end
    return out


def apply_wordpiece(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab: Sequence[str],
) -> DataFrame:
    """Tokenize the corpus by MaxMatch against the learned vocab.
    Returns (id, n_tokens, n_unk, tokens) with tokens space-joined.
    One mapInPandas pass, per-batch word memoization, no shuffle."""
    import pandas as pd

    vset = set(vocab)

    def _tok(batches):
        for pdf in batches:
            cache = {}

            def word_tokens(w: str) -> List[str]:
                got = cache.get(w)
                if got is None:
                    cache[w] = got = wordpiece_tokenize_word(w, vset)
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
                    "n_unk": [sum(1 for x in t if x == _UNK) for t in toks],
                    "tokens": [" ".join(t) for t in toks],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        _tok, f"{id_col} long, n_tokens long, n_unk long, tokens string"
    )


def wordpiece_vocab_table(
    docs: DataFrame, text_col: str, n_merges: int = 20
) -> DataFrame:
    """``learn_wordpiece`` as a DataFrame (token_id, token, is_merge,
    rank, score) — the corpus-entry / SQL-facing shape."""
    spark = docs.sparkSession
    merges, vocab = learn_wordpiece(docs, text_col, n_merges=n_merges)
    by_product = {
        _merged_token(left, right): (rank, round(score, 9))
        for rank, left, right, score in merges
    }
    rows = []
    for token_id, token in enumerate(vocab):
        rank, score = by_product.get(token, (None, None))
        rows.append((token_id, token, rank is not None, rank, score))
    return spark.createDataFrame(
        rows, "token_id int, token string, is_merge boolean, rank int, score double"
    )
