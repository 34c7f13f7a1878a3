"""WordPiece tokenizer (operators/wordpiece.py): the trainer's
likelihood-scored merges pinned against a pure-Python reference with
identical tie-breaks, and MaxMatch application semantics."""

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.wordpiece import (
    _merged_token,
    _word_symbols,
    apply_wordpiece,
    learn_wordpiece,
    wordpiece_tokenize_word,
    wordpiece_vocab_table,
)


def _reference_wordpiece(texts, n_merges):
    """Independent trainer: dict-of-words state, the same
    score = pair/(left*right) in one IEEE-double divide, ties broken
    (left ASC, right ASC)."""
    from collections import Counter

    words = Counter()
    for text in texts:
        for w in (text or "").lower().split():
            if w:
                words[w] += 1
    syms = {w: _word_symbols(w) for w in words}
    merges = []
    for rank in range(n_merges):
        sym_freq = Counter()
        pair_freq = Counter()
        for w, n in words.items():
            s = syms[w]
            for x in s:
                sym_freq[x] += n
            for a, b in zip(s, s[1:]):
                pair_freq[(a, b)] += n
        if not pair_freq:
            break
        best = min(
            pair_freq.items(),
            key=lambda kv: (-(kv[1] / (sym_freq[kv[0][0]] * sym_freq[kv[0][1]])),
                            kv[0][0], kv[0][1]),
        )
        (left, right), freq = best
        score = freq / (sym_freq[left] * sym_freq[right])
        merges.append((rank, left, right, score))
        merged = _merged_token(left, right)
        for w in syms:
            s = syms[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "quick quick brown foxes and lazy lazy dogs",
    "unrelated words appear here too apparently",
]


def test_learn_wordpiece_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    got, vocab = learn_wordpiece(docs, "text", n_merges=12)
    want = _reference_wordpiece(TEXTS, 12)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3], f"merge diverged: {g} vs {w}"
        assert g[3] == pytest.approx(w[3], rel=0, abs=0)  # same IEEE divide
    # vocab = alphabet then merge products, in order
    products = [ _merged_token(l, r) for _, l, r, _ in want ]
    assert vocab[-len(products):] == products


def test_wordpiece_score_beats_raw_frequency(spark):
    # 'aa' appears often but 'a' is everywhere (low coupling); 'qz'
    # appears rarely but q and z appear ONLY together (max coupling):
    # WordPiece must merge (q, ##z) first, BPE-by-frequency would not.
    texts = ["aa aa aa aa qz", "aa aa qz", "ab ba aa"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    merges, _ = learn_wordpiece(docs, "text", n_merges=1)
    assert (merges[0][1], merges[0][2]) == ("q", "##z")


def test_maxmatch_longest_first():
    vocab = {"un", "##able", "##b", "##le", "##a", "u", "##n", "unable"}
    assert wordpiece_tokenize_word("unable", vocab) == ["unable"]
    vocab.discard("unable")
    assert wordpiece_tokenize_word("unable", vocab) == ["un", "##able"]
    vocab.discard("##able")
    assert wordpiece_tokenize_word("unable", vocab) == ["un", "##a", "##b", "##le"]


def test_maxmatch_unk_swallows_word():
    vocab = {"a", "##b"}
    assert wordpiece_tokenize_word("abx", vocab) == ["[UNK]"]
    assert wordpiece_tokenize_word("ab", vocab) == ["a", "##b"]


def test_apply_wordpiece_roundtrip(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    _, vocab = learn_wordpiece(docs, "text", n_merges=12)
    toked = apply_wordpiece(docs, "id", "text", vocab).collect()
    by_id = {r.id: r for r in toked}
    for i, text in enumerate(TEXTS):
        row = by_id[i]
        assert row.n_unk == 0  # trained on the same corpus: full coverage
        # detok: '##' glues to the previous piece
        detok = row.tokens.replace(" ##", "").replace("##", "")
        assert detok == " ".join(text.lower().split())
        assert row.n_tokens == len(row.tokens.split())


def test_vocab_table_shape(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    vt = wordpiece_vocab_table(docs, "text", n_merges=5).collect()
    assert [r.token_id for r in vt] == list(range(len(vt)))
    merges = [r for r in vt if r.is_merge]
    assert len(merges) == 5
    assert all(r.rank is not None and r.score is not None for r in merges)
    alphabet = [r for r in vt if not r.is_merge]
    assert all(r.rank is None for r in alphabet)
