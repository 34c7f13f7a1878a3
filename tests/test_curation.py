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
