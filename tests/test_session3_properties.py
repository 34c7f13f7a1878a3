"""Property-based hardening (hypothesis) for the third-session
operators: blocklist_filter vs a brute-force reference, DSIR weights vs
a pure-Python reimplementation, binarize_sign on adversarial floats."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8),
    min_size=1,
    max_size=8,
)
terms_strategy = st.lists(
    st.one_of(
        st.sampled_from(WORDS),
        st.tuples(st.sampled_from(WORDS), st.sampled_from(WORDS)).map(
            lambda t: " ".join(t)
        ),
    ),
    min_size=1,
    max_size=4,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(docs=docs_strategy, terms=terms_strategy)
@_SETTINGS
def test_blocklist_matches_bruteforce(spark, docs, terms):
    from fluss_datafusion_spark.operators.curation import blocklist_filter

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    bl = spark.createDataFrame([(t,) for t in terms], ["term"])
    got = {
        r.doc_id: (r.n_hits, list(r.hit_terms), r.blocked)
        for r in blocklist_filter(df, bl, "doc_id", "text").collect()
    }
    for i, ws in enumerate(docs):
        norm = " " + " ".join(ws) + " "
        hits = sorted({t for t in terms if f" {t} " in norm})
        assert got[i] == (len(hits), hits, bool(hits)), (i, ws, terms)


@given(
    texts=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=6).map(
            " ".join
        ),
        min_size=2,
        max_size=8,
    ),
    target_mod=st.integers(min_value=2, max_value=3),
)
@_SETTINGS
def test_dsir_matches_pure_python(spark, texts, target_mod):
    import hashlib

    from fluss_datafusion_spark.operators.training import dsir_log_weights

    B = 97

    def bucket(g):
        return int(hashlib.md5(f"dsir-0|{g}".encode()).hexdigest()[:8], 16) % B

    def grams(text):
        toks = [w for w in text.strip().lower().split() if w]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    raw_counts, tgt_counts = {}, {}
    feats = {}
    for i, tx in enumerate(texts):
        bs = [bucket(g) for g in grams(tx)]
        feats[i] = bs
        for b in bs:
            raw_counts[b] = raw_counts.get(b, 0) + 1
            if i % target_mod == 0:
                tgt_counts[b] = tgt_counts.get(b, 0) + 1
    nr, nt = sum(raw_counts.values()), sum(tgt_counts.values())
    want = {}
    for i, bs in feats.items():
        w = 0.0
        for b in bs:
            w += math.log((tgt_counts.get(b, 0) + 1) / (nt + B)) - math.log(
                (raw_counts.get(b, 0) + 1) / (nr + B)
            )
        want[i] = (w, len(bs))

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    target = df.filter(F.col("doc_id") % target_mod == 0)
    got = {
        r.doc_id: (r.log_weight, r.n_feats)
        for r in dsir_log_weights(
            df, target, "doc_id", "text", n_buckets=B
        ).collect()
    }
    for i in feats:
        assert got[i][1] == want[i][1], i
        assert abs(got[i][0] - want[i][0]) < 1e-9, i


@given(
    vec=st.lists(
        st.floats(
            min_value=-10, max_value=10, allow_nan=False, width=32
        ),
        min_size=1,
        max_size=130,
    )
)
@_SETTINGS
def test_binarize_sign_any_dim(spark, vec):
    from fluss_datafusion_spark.operators.embeddings import binarize_sign

    df = spark.createDataFrame([(0, vec)], "id int, v array<float>")
    got = binarize_sign(df, "v").collect()[0].bcode
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    words = []
    for lo in range(0, len(vec), 64):
        w = 0
        for x in vec[lo : lo + 64]:
            w = (w << 1) | (1 if f32(x) > 0 else 0)
        words.append(w - (1 << 64) if w >= (1 << 63) else w)
    assert got == words
