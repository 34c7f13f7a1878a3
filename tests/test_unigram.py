"""Unigram-LM tokenizer (operators/unigram.py — Kudo 2018, hard-EM
variant): trained vocab and tokenization pinned against an independent
pure-Python reference (memoized-recursion Viterbi + dict-based trainer
with identical tie-break spec), plus the coverage/round-trip
invariants."""

import math
import re
from collections import Counter
from functools import lru_cache

import pytest

from fluss_datafusion_spark.operators import unigram as U

UNK = U._UNK_PENALTY


# ---------------------------------------------------------------------------
# independent reference: memoized top-down Viterbi + pure-dict trainer
# ---------------------------------------------------------------------------


def ref_viterbi(word, logp, max_len, unk):
    @lru_cache(maxsize=None)
    def solve(i):
        # best (score, tokens-as-tuple) segmentation of word[:i];
        # ties prefer the longer last piece, i.e. smaller split point
        if i == 0:
            return (0.0, ())
        cands = []
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) > 1:
                    continue
                lp = unk
            prev = solve(j)
            cands.append((prev[0] + lp, -j, prev[1] + (piece,)))
        cands.sort(key=lambda c: (c[0], c[1]), reverse=True)
        return (cands[0][0], cands[0][2])

    return list(solve(len(word))[1])


def ref_word_dict(texts):
    counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower().strip()):
            if w:
                counter[w] += 1
    return counter


def ref_learn(texts, vocab_size, max_piece_len, seed_size, em_iters, shrink):
    wd = ref_word_dict(texts)
    sub_counts = Counter()
    for w, n in wd.items():
        for s in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - s) + 1):
                sub_counts[w[s : s + l]] += n
    chars = {p: c for p, c in sub_counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub_counts.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:seed_size]
    counts = dict(chars)
    counts.update(dict(multi))
    total = sum(counts.values())
    logp = {p: math.log(c / total) for p, c in counts.items()}
    while True:
        for _ in range(em_iters):
            unk = min(logp.values()) - UNK
            tally = Counter()
            for w, n in wd.items():
                for piece in ref_viterbi(w, logp, max_piece_len, unk):
                    tally[piece] += n
            total = sum(tally.values())
            logp = {p: math.log(c / total) for p, c in tally.items() if c > 0}
        n_chars = sum(1 for p in logp if len(p) == 1)
        n_multi = len(logp) - n_chars
        target = max(0, vocab_size - n_chars)
        if n_multi <= target:
            break
        keep = max(target, int(n_multi * shrink))
        ranked = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda x: (-x[1], x[0]),
        )[:keep]
        logp = {p: lp for p, lp in logp.items() if len(p) == 1}
        logp.update(dict(ranked))
        total = sum(math.exp(lp) for lp in logp.values())
        logp = {p: lp - math.log(total) for p, lp in logp.items()}
    return sorted(logp.items())


CORPUS = [
    "the internationalization of the international internet",
    "internal international internships matter internationally",
    "the intern ate the internal lunch",
    "nationalization denationalization renationalization",
    "the net the nation the national note",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )


def test_viterbi_matches_reference_kernel():
    logp = {"a": -2.0, "b": -2.5, "ab": -1.0, "ba": -3.0, "abab": -1.5}
    for word in ["abab", "ababab", "ba", "axb", "aaaa", "x"]:
        got = U.viterbi_tokens(word, logp, 4, min(logp.values()) - UNK)
        want = ref_viterbi(word, logp, 4, min(logp.values()) - UNK)
        assert got == want, word
        assert "".join(got) == word  # round-trip invariant


def test_viterbi_tie_prefers_longer_piece():
    # "ab" as one piece vs "a"+"b": equal scores -> longer piece wins
    logp = {"a": -1.0, "b": -1.0, "ab": -2.0}
    assert U.viterbi_tokens("ab", logp, 2, -11.0) == ["ab"]


def test_learn_unigram_matches_reference(spark):
    kw = dict(vocab_size=40, max_piece_len=5, seed_size=60, em_iters=2, shrink=0.75)
    got = U.learn_unigram(_docs(spark), "text", **kw)
    want = ref_learn(CORPUS, **kw)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (p1, lp1), (p2, lp2) in zip(got, want):
        assert math.isclose(lp1, lp2, rel_tol=1e-9), (p1, lp1, lp2)


def test_apply_unigram_matches_reference_and_roundtrips(spark):
    kw = dict(vocab_size=40, max_piece_len=5, seed_size=60, em_iters=2, shrink=0.75)
    vocab = U.learn_unigram(_docs(spark), "text", **kw)
    logp = dict(vocab)
    unk = min(logp.values()) - UNK
    rows = U.apply_unigram(_docs(spark), "doc_id", "text", vocab, max_piece_len=5)
    by_doc = {}
    for r in rows.collect():
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.token))
    for i, text in enumerate(CORPUS):
        toks = [t for _, t in sorted(by_doc[i])]
        want = []
        for w in re.split(r"\s+", text.lower().strip()):
            want.extend(ref_viterbi(w, logp, 5, unk))
        assert toks == want, i
        assert "".join(toks) == text.lower().replace(" ", "")


def test_single_chars_survive_pruning(spark):
    vocab = U.learn_unigram(
        _docs(spark), "text", vocab_size=5, max_piece_len=4, seed_size=30,
        em_iters=1, shrink=0.5,
    )
    pieces = {p for p, _ in vocab}
    used_chars = {c for t in CORPUS for c in t.lower() if not c.isspace()}
    # every character that survived any best segmentation is present;
    # coverage holds regardless via the unk fallback
    assert all(len(p) == 1 or p for p in pieces)
    rows = U.apply_unigram(_docs(spark), "doc_id", "text", vocab, max_piece_len=4)
    text_chars = set("".join(r.token for r in rows.collect()))
    assert text_chars <= used_chars


def test_logprobs_are_distribution(spark):
    vocab = U.learn_unigram(
        _docs(spark), "text", vocab_size=30, max_piece_len=4, seed_size=40,
        em_iters=1,
    )
    assert math.isclose(sum(math.exp(lp) for _, lp in vocab), 1.0, rel_tol=1e-9)
