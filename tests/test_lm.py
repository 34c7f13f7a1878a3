"""Interpolated Kneser-Ney bigram LM (operators/lm.train_kn_lm /
score_with_kn): smoothing properties and a pure-Python reference."""

def test_kn_lm_properties(spark):
    """Interpolated Kneser-Ney: per-prefix distributions ~normalize,
    the novel-context effect ranks versatile words above frequent-but-
    bound ones, unseen prefixes back off finitely."""
    import math

    from fluss_datafusion_spark.operators.lm import (
        score_with_kn,
        train_kn_lm,
    )

    # 'san francisco' x 12: 'francisco' is frequent but appears in ONE
    # context; 'fog' appears in three distinct contexts.
    texts = (["san francisco"] * 12
             + ["thick fog", "cold fog", "gray fog",
                "san jose", "san mateo"])
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    model = train_kn_lm(train, "doc_id", "text")

    def score(text):
        df = spark.createDataFrame([(0, text)], "doc_id int, text string")
        return score_with_kn(
            df, "doc_id", "text", *model
        ).collect()[0].avg_logprob

    # novel context 'every <w>': continuation prob must favor 'fog'
    assert score("every fog") > score("every francisco")
    # seen bigram beats unseen; everything is finite
    s_seen = score("san francisco")
    s_unseen_prefix = score("zzz qqq")
    assert s_seen > s_unseen_prefix > -100
    assert all(not math.isnan(s) for s in (s_seen, s_unseen_prefix))


def test_kn_matches_pure_python(spark):
    import math

    from fluss_datafusion_spark.operators.lm import (
        score_with_kn,
        train_kn_lm,
    )

    texts = ["a b a c", "b a b", "c a"]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    # reference model
    bigrams = {}
    for t in texts:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
    cp, n1l, n1r = {}, {}, {}
    for (a, b), c in bigrams.items():
        cp[a] = cp.get(a, 0) + c
        n1l[a] = n1l.get(a, 0) + 1
        n1r[b] = n1r.get(b, 0) + 1
    V = len({w for t in texts for w in t.split()})
    T = len(bigrams)
    D, al = 0.75, 0.5

    def p(a, b):
        pc = (n1r.get(b, 0) + al) / (T + al * (V + 1))
        if a not in cp:
            return pc
        return (
            max(bigrams.get((a, b), 0) - D, 0) / cp[a]
            + D * n1l[a] / cp[a] * pc
        )

    doc = "a b c a z"
    ws = doc.split()
    want = sum(math.log(p(a, b)) for a, b in zip(ws, ws[1:])) / (len(ws) - 1)
    model = train_kn_lm(train, "doc_id", "text")
    got = score_with_kn(
        spark.createDataFrame([(0, doc)], "doc_id int, text string"),
        "doc_id", "text", *model,
    ).collect()[0]
    assert got.n_bigrams == 4
    assert abs(got.avg_logprob - round(want, 4)) < 1e-9
