"""BPE vocabulary training: Spark implementation vs a pure-Python
reference with identical tie-breaks (freq DESC, left ASC, right ASC) —
the hard correctness signal for the iterative operator no SQL oracle
can express."""

from collections import Counter

from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.bpe import (
    _END,
    apply_bpe,
    bpe_merges_table,
    learn_bpe_merges,
)


def _reference_bpe(texts, n_merges):
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                words[w] += 1
    dict_syms = {w: list(w) + [_END] for w in words}
    merges = []
    for rank in range(n_merges):
        pair_freq = Counter()
        for w, syms in dict_syms.items():
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] += words[w]
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), freq = best
        merges.append((rank, left, right, freq))
        merged = left + right
        for w, syms in dict_syms.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            dict_syms[w] = out
    return merges


def test_learn_bpe_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low new wide lowest newest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    got = learn_bpe_merges(df, "text", n_merges=12)
    want = _reference_bpe(texts, 12)
    assert got == want, (got, want)
    # merges compose: later merged symbols contain earlier ones
    assert any(len(l + r) > 2 for _, l, r, _ in got)


def test_learn_bpe_matches_reference_on_testdata(spark, testdata):
    from fluss_datafusion_spark.session import read_table

    docs = read_table(spark, f"{testdata}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = learn_bpe_merges(docs, "text", n_merges=8)
    want = _reference_bpe(texts, 8)
    assert got == want


def test_bpe_merges_table_shape(spark):
    df = spark.createDataFrame([(1, "aa aa ab")], "doc_id int, text string")
    out = bpe_merges_table(df, "text", n_merges=3).collect()
    assert [r["rank"] for r in out] == [0, 1, 2]
    assert all(r["merged"] == r["left"] + r["right"] for r in out)


def test_apply_bpe_matches_reference_tokenization(spark):
    from fluss_datafusion_spark.operators.bpe import _END, apply_bpe

    texts = ["low lower lowest low low", "new newer newest new newer",
             "lowly newly", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = learn_bpe_merges(df, "text", n_merges=10)

    # reference application: same greedy rule, per word
    def ref_tokens(text):
        out = []
        for w in text.lower().split():
            syms = list(w) + [_END]
            for _, left, right, _ in merges:
                res, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == left
                            and syms[i + 1] == right):
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            out.extend(syms)
        return out

    got = {r["doc_id"]: (r["n_tokens"], r["tokens"])
           for r in apply_bpe(df, "doc_id", "text", merges).collect()}
    for i, t in enumerate(texts):
        want = ref_tokens(t)
        assert got[i] == (len(want), " ".join(want)), (i, got[i], want)
    # merged symbols actually appear (the vocab compresses)
    assert any(len(s) > 2 for s in got[0][1].split())


def test_apply_bpe_consecutive_pair_runs(spark):
    """Greedy non-overlap on runs: with merge (a,a), 'aaaa' -> [aa,aa],
    'aaaaa' -> [aa,aa,a] — the case a boundary-consuming string replace
    gets wrong (the ns_training_bpe_tokens naive reference uses
    lookaround re.sub for exactly this reason)."""
    df = spark.createDataFrame(
        [(0, "aaaa aaaaa aa a")], "doc_id long, text string"
    )
    merges = [(0, "a", "a", 99)]
    row = apply_bpe(df, "doc_id", "text", merges).collect()[0]
    assert row["tokens"] == (
        "aa aa </w> aa aa a </w> aa </w> a </w>"
    )
    assert row["n_tokens"] == 11
