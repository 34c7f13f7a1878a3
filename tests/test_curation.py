"""Curation operators: decontamination, quota sampling, PII redaction,
TF-IDF.  The DuckDB-oracle parity for all four lives in the corpus
(ns_curation_*, checked by tools/check_correctness.py); these tests pin
the operator-level semantics on tiny controlled inputs."""

from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import curation


def test_decontaminate_flags_overlapping_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence with no overlap at all"),
            (3, "quick brown fox jumps high above everything"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_overlap"] for r in
           curation.decontaminate(docs, bench, "doc_id", "text", k=3, min_overlap=2).collect()}
    assert 1 in got and got[1] >= 2   # shares 'quick brown fox', 'brown fox jumps', ...
    assert 3 in got and got[3] >= 2
    assert 2 not in got


def test_quota_sample_deterministic_cap(spark):
    df = spark.range(100).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    out = curation.quota_sample(df, ["g"], 5, "v")
    rows = out.groupBy("g").agg(F.count(F.lit(1)).alias("n"), F.max("v").alias("mx")).collect()
    assert all(r["n"] == 5 for r in rows)
    # first-5 in v order: max kept value per group g is g + 4*4
    assert all(r["mx"] == r["g"] + 16 for r in rows)


def test_pii_redact_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.com and b@c.org from 10.0.0.1 call +123-456-7890")],
        "id long, t string",
    )
    r = curation.pii_redact(df, "t").collect()[0]
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (2, 1, 1)
    red = r["t_redacted"]
    assert "<EMAIL>" in red and "<IPV4>" in red and "<PHONE>" in red
    assert "a@b.com" not in red and "10.0.0.1" not in red


def test_tfidf_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(
        [(1, "common zebra zebra"), (2, "common plain"), (3, "common plain")],
        "doc_id long, text string",
    )
    out = curation.tfidf_top_terms(docs, "doc_id", "text", top_n=1)
    top = {r["doc_id"]: r["term"] for r in out.collect()}
    # zebra: tf=2, df=1 -> 2*(ln(2)+1) ≈ 3.39 beats common: 1*(ln(1)+1) = 1
    assert top[1] == "zebra"


def test_stratified_sample_matches_md5_rule(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    kept = curation.stratified_sample(df, "doc_id", 25)
    got = {r["doc_id"] for r in kept.collect()}
    import hashlib

    expected = {
        i for i in range(1000)
        if hashlib.md5(str(i).encode()).hexdigest()[:4] < format(0x4000, "04x")
    }
    assert got == expected
    # ~25% within sampling noise
    assert 0.18 < len(got) / 1000 < 0.32


def test_pack_sequences_invariants(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i % 50))) for i in range(200)],
        "doc_id long, text string",
    )
    packs = curation.pack_sequences(docs, "doc_id", "text", max_tokens=100).collect()
    all_ids = [i for r in packs for i in r["doc_ids"]]
    assert sorted(all_ids) == list(range(200))  # every doc packed exactly once
    for r in packs:
        assert r["n_docs"] == len(r["doc_ids"])
        # bins never exceed the cap unless a single long doc forced it
        assert r["n_tokens"] <= 100 or r["n_docs"] == 1
        assert r["pack_id"] == r["doc_ids"][0]


def test_chunk_documents_coverage_and_overlap(spark):
    from fluss_datafusion_spark.operators.curation import chunk_documents

    text = " ".join(f"w{i}" for i in range(250))
    docs = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, "   ")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, "doc_id", "text", chunk_tokens=100, overlap=20).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # blank doc produces nothing
    assert set(by_doc) == {1, 2}
    # short doc: one chunk, full text
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "short doc"
    # 250 tokens, stride 80: starts 0,80,160,240 -> 4 chunks
    chunks = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [c["chunk_idx"] for c in chunks] == [0, 1, 2, 3]
    assert [c["n_chunk_tokens"] for c in chunks] == [100, 100, 90, 10]
    # overlap: chunk i+1 starts 20 tokens before chunk i ends
    assert chunks[1]["chunk_text"].split()[0] == "w80"
    assert chunks[0]["chunk_text"].split()[-1] == "w99"
    # every token covered
    covered = set()
    for c in chunks:
        covered.update(c["chunk_text"].split())
    assert len(covered) == 250


def test_repetition_stats_gopher_rules(spark):
    from fluss_datafusion_spark.functions.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\nalpha beta\ngamma\n\n"),      # 3 lines, 1 dup
            (2, "spam spam spam spam spam"),               # one bigram repeated
            (3, "all words unique here now"),
            (4, ""),                                       # degenerate
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs, "doc_id", "text").collect()}
    assert got[1]["n_lines"] == 3
    assert abs(got[1]["dup_line_frac"] - 1 / 3) < 1e-9
    # "spam spam" appears 4 times out of 4 bigrams
    assert got[2]["n_bigrams"] == 4
    assert got[2]["top_bigram_frac"] == 1.0
    # unique text: top bigram appears once out of 4
    assert abs(got[3]["top_bigram_frac"] - 0.25) < 1e-9
    assert got[3]["dup_line_frac"] == 0.0
    assert got[4]["n_lines"] == 0 and got[4]["n_bigrams"] == 0
    assert got[4]["top_bigram_frac"] == 0.0


def test_quality_filter_reasons(spark):
    from fluss_datafusion_spark.operators.curation import quality_filter

    good = "The quick brown fox jumps over the lazy dog near the quiet river " * 2
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "hi"),                                   # too_short (+ low quality)
            (3, "spam spam spam spam spam spam spam"),   # repeated_ngrams
            (4, "line one here\nline one here\nline one here\nother\n"
                + good),                                 # repeated_lines
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in quality_filter(docs, "doc_id", "text").collect()}
    assert got[1]["keep"] and got[1]["reasons"] == ""
    assert not got[2]["keep"] and "too_short" in got[2]["reasons"]
    assert not got[3]["keep"] and "repeated_ngrams" in got[3]["reasons"]
    assert not got[4]["keep"] and "repeated_lines" in got[4]["reasons"]
    # reasons are sorted and comma-joined
    assert got[2]["reasons"] == ",".join(sorted(got[2]["reasons"].split(",")))


def test_dedup_representatives_total_assignment(spark):
    from fluss_datafusion_spark.operators.curation import dedup_representatives

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup_representatives(docs, pairs, "doc_id").collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),  # chain collapses to 1
        7: (7, True), 9: (9, True),                  # singletons keep themselves
    }


def test_scrub_hot_spans_drops_corpus_duplicated_spans(spark):
    from fluss_datafusion_spark.operators.curation import scrub_hot_spans

    boiler = "all rights reserved by corp"  # 5 tokens -> one hot span
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} unique alpha text one xx"),
            (2, f"{boiler} other beta words here yy"),
            (3, "totally original content with no dupes"),
            (4, boiler),  # every span hot -> clean_text ''
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_dropped"])
        for r in scrub_hot_spans(
            docs, "doc_id", "text", span_tokens=5, min_doc_freq=2
        ).collect()
    }
    # spans of doc 1: [boiler, "unique alpha text one xx"] -> first dropped
    assert got[1] == ("unique alpha text one xx", 2, 1)
    assert got[2] == ("other beta words here yy", 2, 1)
    assert got[3] == ("totally original content with no dupes", 2, 0)
    assert got[4] == ("", 1, 1)


def test_scrub_hot_spans_preserves_order(spark):
    from fluss_datafusion_spark.operators.curation import scrub_hot_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "c d zz ww")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in scrub_hot_spans(
            docs, "doc_id", "text", span_tokens=2, min_doc_freq=2
        ).collect()
    }
    # doc1 spans: "a b", "c d"(hot), "e f", "g h" -> survivors keep order
    assert got[1] == "a b e f g h"
    assert got[2] == "zz ww"


def test_domain_mixture_weights_uniform_and_target(spark):
    from fluss_datafusion_spark.operators.curation import (
        domain_mixture_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "one two three", "web"),      # 3 tokens
            (2, "four five six seven", "web"),  # 4 tokens
            (3, "a b c", "code"),             # 3 tokens
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: r
        for r in domain_mixture_weights(docs, "source", "text").collect()
    }
    assert got["web"]["n_docs"] == 2 and got["web"]["n_tokens"] == 7
    assert got["code"]["n_tokens"] == 3
    assert got["web"]["token_share"] == 0.7
    # uniform target 0.5 over share 0.7 -> 0.714286
    assert abs(got["web"]["weight"] - 0.714286) < 1e-6
    assert abs(got["code"]["weight"] - (0.5 / 0.3)) < 1e-4

    targeted = {
        r["source"]: r["weight"]
        for r in domain_mixture_weights(
            docs, "source", "text", target_shares={"web": 1.0}
        ).collect()
    }
    assert abs(targeted["web"] - 1.0 / 0.7) < 1e-4
    assert targeted["code"] == 0.0  # absent from target -> dropped


def test_domain_mixture_temperature_smoothing(spark):
    import pytest as _pytest

    from fluss_datafusion_spark.operators.curation import (
        domain_mixture_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "one two three", "web"),        # web: 7 tokens
            (2, "four five six seven", "web"),
            (3, "a b c", "code"),               # code: 3 tokens
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: r["weight"]
        for r in domain_mixture_weights(
            docs, "source", "text", temperature=0.3
        ).collect()
    }
    # target_i = share^0.3 / sum(share^0.3); weight = target / share
    n = 0.7**0.3 + 0.3**0.3
    assert abs(got["web"] - round(0.7**0.3 / n / 0.7, 6)) < 1e-6
    assert abs(got["code"] - round(0.3**0.3 / n / 0.3, 6)) < 1e-6
    # alpha < 1 upsamples the low-resource domain
    assert got["code"] > 1.0 > got["web"]
    # alpha = 1 keeps the natural mixture: every weight 1
    nat = {
        r["source"]: r["weight"]
        for r in domain_mixture_weights(
            docs, "source", "text", temperature=1.0
        ).collect()
    }
    assert nat == {"web": 1.0, "code": 1.0}
    with _pytest.raises(ValueError):
        domain_mixture_weights(
            docs, "source", "text", target_shares={"web": 1.0},
            temperature=0.3,
        )



def test_bigram_lm_scores_exact_math(spark):
    import math

    from fluss_datafusion_spark.operators.lm import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_lm_scores(docs, "doc_id", "text", alpha=0.1).collect()
    }
    # c2: ab=3 ba=1 bc=1; cp: a=3 b=2; V=3
    p_ab = (3 + 0.1) / (3 + 0.3)
    p_ba = (1 + 0.1) / (2 + 0.3)
    p_bc = (1 + 0.1) / (2 + 0.3)
    exp1 = round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 4)
    exp2 = round((math.log(p_ab) + math.log(p_bc)) / 2, 4)
    assert got[1] == (3, exp1)
    assert got[2] == (2, exp2)
    assert 3 not in got  # single-token doc has no bigrams


def test_score_with_lm_heldout_unseen_bigrams(spark):
    import math

    from fluss_datafusion_spark.operators.lm import (
        score_with_lm,
        train_bigram_lm,
    )

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    heldout = spark.createDataFrame(
        [(10, "c c")], "doc_id long, text string"
    )
    c2, cp, vocab = train_bigram_lm(train, "doc_id", "text")
    got = score_with_lm(
        heldout, "doc_id", "text", c2, cp, vocab, alpha=0.1
    ).collect()
    # (c,c) unseen, prefix c unseen: P = 0.1 / (0 + 0.1*3)
    assert got[0]["n_bigrams"] == 1
    assert got[0]["avg_logprob"] == round(math.log(0.1 / 0.3), 4)


def test_stratified_sample_boundary_fractions(spark):
    """pct=100 must keep everything (the 5-char '10000' hex threshold
    previously compared below every 4-char bucket and kept ~6%); pct=0
    keeps nothing; out-of-range raises."""
    import pytest

    df = spark.range(200).select(F.col("id").alias("doc_id"))
    assert curation.stratified_sample(df, "doc_id", 100).count() == 200
    assert curation.stratified_sample(df, "doc_id", 0).count() == 0
    with pytest.raises(ValueError):
        curation.stratified_sample(df, "doc_id", 101)
    with pytest.raises(ValueError):
        curation.stratified_sample(df, "doc_id", -1)


def test_heavy_hitters_exact_vs_bruteforce(spark):
    """Misra-Gries two-pass must return EXACTLY the tokens above N/k,
    with exact counts, regardless of partitioning (the per-partition
    summary is only a candidate superset; the recount is exact)."""
    import collections
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(200)]
    # skewed corpus: a few tokens dominate
    rows = []
    for i in range(300):
        toks = (
            ["hot"] * rng.randint(1, 4)
            + ["warm"] * rng.randint(0, 2)
            + [rng.choice(vocab) for _ in range(rng.randint(3, 10))]
        )
        rng.shuffle(toks)
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(13)

    k = 20
    got = {
        r["token"]: r["n_occurrences"]
        for r in curation.heavy_hitters(df, "text", k=k).collect()
    }
    exact = collections.Counter()
    for _, text in rows:
        exact.update(text.lower().split())
    n = sum(exact.values())
    want = {t: c for t, c in exact.items() if c * k > n}
    assert got == want
    assert "hot" in got  # the construction guarantees one true hitter


def test_sample_to_token_budget_greedy_prefix(spark):
    """Budget rule: the seeded-hash-ordered prefix with inclusive cumsum
    <= budget; deterministic; per-stratum budgets independent."""
    import hashlib

    df = spark.createDataFrame(
        [(i, "t " * 10, "a" if i % 2 else "b") for i in range(40)],
        "doc_id long, text string, source string",
    )
    kept = curation.sample_to_token_budget(
        df, "doc_id", "text", budget_tokens=50, strata_cols=["source"]
    )
    rows = [(r["doc_id"], r["source"]) for r in kept.collect()]
    # 10 tokens per doc, budget 50 -> exactly 5 docs per stratum
    for s in ("a", "b"):
        assert sum(1 for _, src in rows if src == s) == 5
    # and they are exactly the 5 smallest md5 keys of that stratum
    for s, ids in (("a", range(1, 40, 2)), ("b", range(0, 40, 2))):
        order = sorted(
            ids, key=lambda i: (hashlib.md5(f"budget-0|{i}".encode()).hexdigest(), i)
        )
        assert {d for d, src in rows if src == s} == set(order[:5])

    again = {(r["doc_id"], r["source"]) for r in curation.sample_to_token_budget(
        df, "doc_id", "text", budget_tokens=50, strata_cols=["source"]
    ).collect()}
    assert again == set(rows)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        curation.sample_to_token_budget(df, "doc_id", "text", 0)


def test_apply_mixture_downsamples_by_weight(spark):
    """A domain with weight 0.25 keeps ~25% of its docs (seeded md5
    draw); weight >= 1 keeps everything; weight 0 drops the domain."""
    rows = [(i, "text " * 5, ["heavy", "light", "drop"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    weights = spark.createDataFrame(
        [("heavy", 1.7), ("light", 0.25), ("drop", 0.0)],
        "source string, weight double",
    )
    kept = curation.apply_mixture(df, weights, "doc_id", "source").collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], 0)
        by_src[r["source"]] += 1
    assert by_src.get("heavy") == 200          # capped at 1.0 -> all kept
    assert "drop" not in by_src                # weight 0 -> gone
    assert 25 <= by_src.get("light", 0) <= 75  # ~50 of 200, wide tolerance

    again = curation.apply_mixture(df, weights, "doc_id", "source").collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in kept}


def test_normalize_text_rules(spark):
    from fluss_datafusion_spark.operators.curation import normalize_text

    df = spark.createDataFrame(
        [
            (1, "  hello\t\tworld\n\nagain  "),
            (2, "ctrl\x00\x07chars\x1fhere"),
            (3, "already clean"),
            (4, "MiXeD Case"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           normalize_text(df, "doc_id", "text").collect()}
    assert got[1]["text_norm"] == "hello world again" and got[1]["changed"]
    assert got[2]["text_norm"] == "ctrlcharshere" and got[2]["changed"]
    assert got[3]["text_norm"] == "already clean" and not got[3]["changed"]
    assert got[4]["text_norm"] == "MiXeD Case"
    low = {r["doc_id"]: r["text_norm"] for r in
           normalize_text(df, "doc_id", "text", lowercase=True).collect()}
    assert low[4] == "mixed case"
    assert all(r["n_chars_out"] <= r["n_chars_in"] for r in got.values())


def test_extract_urls_and_domain_stats(spark):
    from fluss_datafusion_spark.operators.curation import (
        domain_stats,
        extract_urls,
    )

    df = spark.createDataFrame(
        [
            (1, "see https://a.example.org/x and http://b.net/y?z=1 today"),
            (2, "plain text no links"),
            (3, "dup domain https://a.example.org/other"),
        ],
        "doc_id long, text string",
    )
    urls = {(r["doc_id"], r["url"], r["domain"])
            for r in extract_urls(df, "doc_id", "text").collect()}
    assert (1, "https://a.example.org/x", "a.example.org") in urls
    assert (1, "http://b.net/y?z=1", "b.net") in urls
    assert (3, "https://a.example.org/other", "a.example.org") in urls
    assert len(urls) == 3  # doc 2 contributes nothing
    stats = {r["domain"]: (r["n_urls"], r["n_docs"])
             for r in domain_stats(df, "doc_id", "text").collect()}
    assert stats == {"a.example.org": (2, 2), "b.net": (1, 1)}


def test_sample_exact_n_deterministic_and_exact(spark):
    from fluss_datafusion_spark.operators.curation import sample_exact_n

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"] for r in sample_exact_n(df, "doc_id", 50).collect()}
    b = {r["doc_id"] for r in sample_exact_n(df, "doc_id", 50).collect()}
    assert len(a) == 50 and a == b
    other = {r["doc_id"] for r in
             sample_exact_n(df, "doc_id", 50, seed="other").collect()}
    assert other != a
    # n >= corpus keeps everything; n=0 keeps nothing
    assert sample_exact_n(df, "doc_id", 1000).count() == 500
    assert sample_exact_n(df, "doc_id", 0).count() == 0
    # nested draws: a bigger draw contains the smaller one (prefix rule)
    bigger = {r["doc_id"] for r in sample_exact_n(df, "doc_id", 80).collect()}
    assert a <= bigger


def test_scrub_repeated_substrings_any_offset(spark):
    from fluss_datafusion_spark.operators.curation import (
        scrub_hot_spans,
        scrub_repeated_substrings,
    )

    # An 8-token duplicated run placed at DIFFERENT offsets in two docs:
    # it straddles a stride-8 segment boundary in doc 2, so segment-level
    # scrubbing misses it there but any-offset scrubbing removes it from
    # both.
    dup = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, f"{dup} unique1 tail1 end1"),
        (2, f"lead2 {dup} unique2 tail2"),
        (3, "totally different text " + " ".join(f"w{i}" for i in range(10))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r["doc_id"]: r
        for r in scrub_repeated_substrings(
            docs, "doc_id", "text", k=8, min_doc_freq=2
        ).collect()
    }
    assert out[1]["clean_text"] == "unique1 tail1 end1"
    assert out[1]["n_removed"] == 8
    assert out[2]["clean_text"] == "lead2 unique2 tail2"
    assert out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0

    seg = {
        r["doc_id"]: r
        for r in scrub_hot_spans(
            docs, "doc_id", "text", span_tokens=8, min_doc_freq=2
        ).collect()
    }
    # The stride-8 segmentation misses the run ENTIRELY: it is
    # segment-aligned only in doc 1, so the segment text occurs in just
    # one document and never becomes corpus-hot — the gap this operator
    # closes.
    assert seg[1]["n_dropped"] == 0
    assert seg[2]["n_dropped"] == 0
    assert dup.split()[0] in seg[2]["clean_text"]


def test_scrub_repeated_substrings_short_and_full_dup(spark):
    from fluss_datafusion_spark.operators.curation import (
        scrub_repeated_substrings,
    )

    same = "one two three four five six seven eight"
    rows = [
        (1, same),            # fully duplicated -> everything scrubbed
        (2, same),
        (3, "short doc"),     # < k tokens: no shingles, kept whole
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in scrub_repeated_substrings(
            docs, "doc_id", "text", k=8, min_doc_freq=2
        ).collect()
    }
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 8
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 8
    assert out[3]["clean_text"] == "short doc" and out[3]["n_removed"] == 0


def _py_weighted_sample(rows, n, seed="wsample-0"):
    """Independent A-ES reference: hashlib md5, same uniform construction."""
    import hashlib
    import math

    es = []
    for rid, w in rows:
        if w is None or w <= 0:
            continue
        h = hashlib.md5(f"{seed}|{rid}".encode()).hexdigest()
        u = (int(h[:13], 16) + 0.5) / float(1 << 52)
        es.append((-math.log(u) / float(w), rid))
    return {rid for _, rid in sorted(es)[:n]}


def test_weighted_sample_n_matches_reference(spark):
    rows = [(i, 1.0 + (i % 5)) for i in range(200)] + [(900, None), (901, 0.0), (902, -2.0)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = {r.id for r in curation.weighted_sample_n(df, "id", "w", 30).collect()}
    assert got == _py_weighted_sample(rows, 30)
    # excluded rows can never appear under any n
    all_ids = {r.id for r in curation.weighted_sample_n(df, "id", "w", 500).collect()}
    assert all_ids.isdisjoint({900, 901, 902}) and len(all_ids) == 200


def test_weighted_sample_n_deterministic_and_seeded(spark):
    rows = [(i, float(1 + i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "w"])
    a = {r.id for r in curation.weighted_sample_n(df, "id", "w", 20, seed="s1").collect()}
    b = {r.id for r in curation.weighted_sample_n(df, "id", "w", 20, seed="s1").collect()}
    c = {r.id for r in curation.weighted_sample_n(df, "id", "w", 20, seed="s2").collect()}
    assert a == b and len(a) == 20
    assert a != c  # independent draw (md5 collision of full sets ~ impossible)


def test_weighted_sample_n_respects_weights(spark):
    # 20 heavy rows (w=50) vs 180 light rows (w=1): heavy rows carry
    # ~85% of total weight, so across 5 seeds they must dominate draws.
    rows = [(i, 50.0 if i < 20 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    heavy = 0
    for s in range(5):
        got = [r.id for r in
               curation.weighted_sample_n(df, "id", "w", 20, seed=f"s{s}").collect()]
        heavy += sum(1 for i in got if i < 20)
    assert heavy >= 60  # E[heavy] ≈ 5 * 20 * 0.85 ≈ 85; 60 is a loose floor


def test_weighted_sample_n_plan_is_topk_not_global_sort(spark):
    df = spark.createDataFrame([(i, 1.0) for i in range(50)], ["id", "w"])
    out = curation.weighted_sample_n(df, "id", "w", 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_dedup_lines_ccnet(spark):
    """Line-level dedup: lines repeated across >= min_docs docs drop
    everywhere (incl. within the doc), unique lines and blank lines
    survive in original order; trim/case-insensitive matching."""
    from fluss_datafusion_spark.operators.curation import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal content one\n\nunique tail"),
            (2, "cookie banner  \nreal content two"),
            (3, "real content three\ncookie banner"),
            (4, "repeated inside\nrepeated inside"),  # within-doc only
            (5, ""),  # empty doc
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text_deduped, r.n_lines, r.n_dropped)
        for r in dedup_lines(docs, "doc_id", "text", min_docs=2).collect()
    }
    # the banner (trim+case-normalized) drops from all three docs
    assert got[1] == ("real content one\n\nunique tail", 4, 1)
    assert got[2] == ("real content two", 2, 1)
    assert got[3] == ("real content three", 2, 1)
    # min_docs counts DISTINCT docs: a within-doc repeat is kept
    assert got[4] == ("repeated inside\nrepeated inside", 2, 0)
    # empty doc: its single blank line is kept (blank never matches)
    assert got[5] == ("", 1, 0)
    # min_docs=3 spares the banner (only... it IS in 3 docs; 4 spares)
    got4 = {
        r.doc_id: r.n_dropped
        for r in dedup_lines(docs, "doc_id", "text", min_docs=4).collect()
    }
    assert all(v == 0 for v in got4.values())


def test_pseudonymize_stable_scoped_and_null_preserving(spark):
    from fluss_datafusion_spark.operators.curation import pseudonymize

    df = spark.createDataFrame(
        [(1, "a@x.com", "a@x.com"), (2, "b@y.com", None), (3, "a@x.com", "c@z.com")],
        "id bigint, email string, alt string",
    )
    out = pseudonymize(df, ["email", "alt"], salt="s").collect()
    by_id = {r.id: r for r in out}
    # stable: same value -> same token
    assert by_id[1].email == by_id[3].email
    # column-scoped: same value in a different column -> different token
    assert by_id[1].email != by_id[1].alt
    # null preserved; prefix defaults to the column name
    assert by_id[2].alt is None
    assert by_id[1].email.startswith("email_") and len(by_id[1].email) == 6 + 16
    # different salt -> different tokens
    out2 = {r.id: r for r in pseudonymize(df, ["email"], salt="t").collect()}
    assert out2[1].email != by_id[1].email
    # joins on the pseudonymized column still work
    a = pseudonymize(df.select("id", "email"), ["email"], "s")
    b = pseudonymize(df.select(F.col("email").alias("email")), ["email"], "s")
    assert a.join(b, "email").count() == 5  # 2 matches x 2 + 1


def test_canonical_url_rules(spark):
    from fluss_datafusion_spark.operators.curation import canonical_url

    cases = [
        ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
         "https://example.com/a/b?a=1&b=2"),
        ("http://Example.com:80/", "http://example.com/"),
        ("http://example.com", "http://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("https://example.com/x?fbclid=abc&gclid=1&utm_campaign=z",
         "https://example.com/x"),
        ("https://example.com/x?z=1&y=2&z=0", "https://example.com/x?y=2&z=0&z=1"),
        ("https://sub.www.example.com/x", "https://sub.www.example.com/x"),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    for r in df.select("want", canonical_url("url").alias("got")).collect():
        assert r.got == r.want, (r.got, r.want)


def test_url_dedup_groups(spark):
    from fluss_datafusion_spark.operators.curation import url_dedup_groups

    df = spark.createDataFrame(
        [
            (1, "https://example.com/p?utm_source=a"),
            (2, "HTTPS://WWW.EXAMPLE.COM:443/p"),
            (3, "https://example.com/p/"),
            (4, "https://example.com/q"),
        ],
        "id long, url string",
    )
    got = {r.canon: (r.n_dupes, r.rep_id) for r in url_dedup_groups(df, "id", "url").collect()}
    assert got == {
        "https://example.com/p": (3, 1),
        "https://example.com/q": (1, 4),
    }


def test_compression_ratio_stats(spark):
    import zlib

    from fluss_datafusion_spark.operators.curation import (
        compression_ratio_stats,
    )

    texts = [
        (1, "spam spam spam spam spam spam spam spam spam spam"),
        (2, "the quick brown fox jumps over one lazy dog tonight"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(texts, "id long, text string")
    rows = {r.id: r for r in compression_ratio_stats(df, "id", "text").collect()}
    for i, t in texts:
        b = (t or "").encode()
        assert rows[i].raw_len == len(b)
        if b:
            assert rows[i].compressed_len == len(zlib.compress(b, 6))
            assert rows[i].ratio == round(rows[i].compressed_len / len(b), 6)
        else:
            assert rows[i].ratio is None
    # the repetitive doc compresses much better than prose
    assert rows[1].ratio < rows[2].ratio


def test_html_extract_adversarial_cases(spark):
    """The WET-extraction chain survives the classic traps: a fake
    closing tag inside a script STRING, entities in the title,
    double-escaped '&amp;lt;' staying literal, nbsp decoding, block
    tags becoming line breaks, case-insensitive HREF, and noindex
    detection."""
    html = (
        '<!DOCTYPE html><html><head><title> A &amp; B &lt;t&gt; </title>'
        '<meta name="robots" content="noindex">'
        "<style>p { color: red; }</style>"
        '<script>if (1 < 2) { alert("</p>"); }</script></head><body>'
        "<h1>Head</h1><p>one  two</p><!-- gone -->"
        "<div>tail&nbsp;x &amp;lt; kept</div>"
        '<a href="https://e.com/1">l1</a> mid '
        '<a class="z" HREF="https://e.com/2">l2</a></body></html>'
    )
    df = spark.createDataFrame(
        [(1, html), (2, "<p>plain</p>"), (3, "no markup at all")],
        ["doc_id", "html"],
    )
    rows = {r.doc_id: r for r in curation.html_extract(df).collect()}
    r = rows[1]
    assert r.title == "A & B <t>"
    assert r.text == "Head\none two\ntail x &lt; kept\nl1 mid l2"
    assert r.links == ["https://e.com/1", "https://e.com/2"]
    assert r.n_links == 2 and r.noindex
    assert rows[2].text == "plain" and not rows[2].noindex
    assert rows[2].title == "" and rows[2].links == []
    assert rows[3].text == "no markup at all"


def test_readability_stats_hand_checked(spark):
    """Flesch / FK grade against hand-computed values, the syllable
    floor (vowel-less words count 1), the sentence floor (unterminated
    text is one sentence), and NULL scores on empty docs."""
    from fluss_datafusion_spark.functions.text import readability_stats

    df = spark.createDataFrame(
        [
            (1, "The cat sat on the mat. It was happy! Was it?"),
            (2, "headline with no terminator"),
            (3, ""),
            (4, "Gnarly rhythms crwth tsk."),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r for r in readability_stats(df, "doc_id", "text").collect()
    }
    r1 = rows[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (11, 3, 12)
    assert r1.flesch == round(206.835 - 1.015 * (11 / 3) - 84.6 * (12 / 11), 6)
    assert r1.fk_grade == round(0.39 * (11 / 3) + 11.8 * (12 / 11) - 15.59, 6)
    assert rows[2].n_sentences == 1  # floor: headline-style text
    assert rows[3].n_words == 0 and rows[3].flesch is None
    assert rows[4].n_syllables == 5  # gnarly=2, rhythms=1, crwth/tsk floor 1


def test_dp_aggregate_matches_pure_python(spark):
    """The seeded Laplace release replays exactly in pure Python
    (md5 uniform -> inverse CDF), clipping bounds the sum sensitivity,
    and guards refuse bad epsilon/bounds."""
    import hashlib
    import math

    import pytest as _pytest

    from fluss_datafusion_spark.operators.curation import dp_aggregate

    rows = [(g, v) for g in ("a", "b", "c") for v in (5.0, 50.0, 500.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        r.g: r
        for r in dp_aggregate(
            df, ["g"], epsilon=2.0, seed="s1", sum_col="x",
            bounds=(0, 100),
        ).collect()
    }

    def lap(metric, g, b):
        u = (
            int(hashlib.md5(f"s1|{metric}|{g}".encode()).hexdigest()[:13], 16)
            + 0.5
        ) / float(1 << 52)
        return -b * math.copysign(1.0, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))

    for g in ("a", "b", "c"):
        # clipped sum: 5 + 50 + min(500, 100) = 155
        assert got[g].dp_count == round(3 + lap("count", g, 1 / 2.0), 6)
        assert got[g].dp_sum == round(155.0 + lap("sum", g, 100 / 2.0), 6)
    # different seed -> different noise
    other = {
        r.g: r.dp_count
        for r in dp_aggregate(df, ["g"], epsilon=2.0, seed="s2").collect()
    }
    assert any(other[g] != got[g].dp_count for g in other)
    with _pytest.raises(ValueError):
        dp_aggregate(df, ["g"], epsilon=0.0)
    with _pytest.raises(ValueError):
        dp_aggregate(df, ["g"], sum_col="x")  # bounds missing
    with _pytest.raises(ValueError):
        dp_aggregate(df, ["g"], sum_col="x", bounds=(5, 5))


def test_embedding_decontaminate_ivf_matches_bruteforce(spark):
    """r12: IVF-candidate decontamination finds exactly the brute-force
    contaminated set on a cluster-structured corpus (the regime the
    candidate generation is designed for), with exact cosine scoring —
    and a benchmark member is never its own contamination."""
    import math
    import random

    rng = random.Random(7)
    dim, n_clusters = 16, 4

    def vec(c):
        v = [rng.uniform(-0.05, 0.05) for _ in range(dim)]
        for i in range(4 * c, 4 * c + 4):
            v[i] += 1.0
        return v

    rows = [(i, vec(i % n_clusters)) for i in range(120)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bench = corpus.filter(F.col("vec_id") % 30 == 0)  # one per cluster-ish

    got = {
        r.vec_id: r.n_bench_hits
        for r in curation.embedding_decontaminate(
            corpus, bench, "vec_id", "embedding", 0.5,
            n_centroids=n_clusters, n_probe=2, n_iters=2,
        ).collect()
    }

    # brute force in python
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    bench_rows = [(i, v) for i, v in rows if i % 30 == 0]
    want = {}
    for i, v in rows:
        n = sum(
            1 for bi, bv in bench_rows if bi != i and cos(v, bv) >= 0.5
        )
        if n:
            want[i] = n
    assert got == want and want
    # benchmark members appear only via OTHER bench vectors
    for bi, _ in bench_rows:
        assert got.get(bi, 0) == want.get(bi, 0)


def test_chunk_token_windows_matches_python_model(spark):
    """r12: concat-and-chunk coordinates equal a sequential python
    model, including docs spanning several windows and exact-boundary
    landings; empty docs are excluded; the distributed cumsum is
    identical at any partition count."""
    texts = {
        1: "a b c",                      # 3 tokens
        2: " ".join(["w"] * 10),         # 10 tokens -> spans the 8-cut
        3: "",                           # empty: excluded
        4: "x y z q",                    # 4
        5: " ".join(["t"] * 7),          # 7 -> ends exactly at 24
        6: "final doc here",             # 3
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    for parts in (1, 3, 7):
        got = {
            r.doc_id: (
                r.n_tokens, r.start_window, r.offset_in_window,
                r.end_window, r.n_windows,
            )
            for r in curation.chunk_token_windows(
                docs, "doc_id", "text", window=8, num_partitions=parts
            ).collect()
        }
        cum = 0
        want = {}
        for i in sorted(texts):
            n = len(texts[i].split()) if texts[i].strip() else 0
            if n == 0:
                continue
            start, end = cum, cum + n - 1
            want[i] = (
                n, start // 8, start % 8, end // 8,
                end // 8 - start // 8 + 1,
            )
            cum += n
        assert got == want, parts
    assert 3 not in got
    # doc 2 spans windows (10 tokens from offset 3): 2 windows
    assert got[2][4] == 2


def test_chunk_token_windows_plan_and_counters(spark):
    """r12: the data-side cumsum window is partitioned by __pid__ —
    never a global (single-partition) window; and a pluggable counter
    (bpe_ish_token_count) relays the window layout into that token
    space."""
    from fluss_datafusion_spark.functions.text import bpe_ish_token_count

    docs = spark.createDataFrame(
        [(i, f"somelongword{i} tiny {'x' * (i % 9)}") for i in range(50)],
        "doc_id long, text string",
    )
    unmat = curation.chunk_token_windows(
        docs, "doc_id", "text", window=8, num_partitions=4,
        _materialize=False,
    )
    plan = unmat._jdf.queryExecution().executedPlan().toString()
    window_lines = [l for l in plan.splitlines() if "sum(__n__" in l]
    assert window_lines and all("__pid__" in l for l in window_lines)

    got = {
        r.doc_id: (r.n_tokens, r.start_window)
        for r in curation.chunk_token_windows(
            docs, "doc_id", "text", window=8,
            counter=bpe_ish_token_count,
        ).collect()
    }
    # python model of the bpe-ish count: per word max(1, ceil(len/4))
    import math

    cum = 0
    for i in range(50):
        text = f"somelongword{i} tiny {'x' * (i % 9)}"
        n = sum(
            max(1, math.ceil(len(wd) / 4)) for wd in text.split()
        )
        assert got[i] == (n, cum // 8), i
        cum += n


def test_chunk_token_windows_randomized_contiguity(spark):
    """r12: across randomized corpora and partition counts, the window
    coordinates form one contiguous token stream — doc k's start equals
    doc k-1's end + 1 (in id order), conservation holds, and the layout
    is partition-count-invariant."""
    import random

    for seed in (3, 11):
        rng = random.Random(seed)
        rows = [
            (i, " ".join(f"w{rng.randrange(50)}"
                         for _ in range(rng.randrange(0, 40))))
            for i in range(rng.randrange(30, 90))
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        baseline = None
        for parts in (1, 5):
            out = sorted(
                (
                    r.doc_id, r.n_tokens, r.start_window,
                    r.offset_in_window, r.end_window, r.n_windows,
                )
                for r in curation.chunk_token_windows(
                    docs, "doc_id", "text", window=16,
                    num_partitions=parts,
                ).collect()
            )
            if baseline is None:
                baseline = out
            assert out == baseline, (seed, parts)
        # contiguity + conservation against the id-ordered stream
        pos = 0
        for doc_id, n, sw, off, ew, nw in baseline:
            assert sw == pos // 16 and off == pos % 16, doc_id
            end = pos + n - 1
            assert ew == end // 16 and nw == ew - sw + 1, doc_id
            pos += n
        assert pos == sum(
            len(t.split()) for _i, t in rows if t.strip()
        )
