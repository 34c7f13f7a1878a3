"""Training-set assembly operators: semantics and edge cases beyond the
corpus oracle parity (tests/test_northstar.py pattern)."""

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import training


def test_repeated_ngram_coverage_semantics(spark):
    """Coverage counts positions under ANY repeated window, merged, not
    double-counted; docs without cross-doc n-grams (or shorter than n)
    report 0."""
    shared = "a b c d"  # the repeated 4-gram between docs 1 and 2
    df = spark.createDataFrame(
        [
            (1, shared + " x y z"),       # positions 0..3 covered
            (2, "p q " + shared),         # positions 2..5 covered
            (3, "entirely different words here now"),
            (4, "a b"),                   # shorter than n
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["dup_fraction"])
        for r in training.repeated_ngram_coverage(
            df, "doc_id", "text", n=4, min_docs=2
        ).collect()
    }
    assert out[1] == (7, 4, round(4 / 7, 4))
    assert out[2] == (6, 4, round(4 / 6, 4))
    assert out[3] == (5, 0, 0.0)
    assert out[4] == (2, 0, 0.0)


def test_repeated_ngram_coverage_overlapping_windows_merge(spark):
    """Two overlapping repeated windows cover the union of positions."""
    # "a b c d e" appears twice -> in a 4-gram world both windows
    # [0..3] and [1..4] repeat; coverage must be 5, not 8.
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["covered_tokens"]
        for r in training.repeated_ngram_coverage(
            df, "doc_id", "text", n=4, min_docs=2
        ).collect()
    }
    assert out == {1: 5, 2: 5}


def test_deterministic_shuffle_is_stable_permutation(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["shuffle_pos"]
         for r in training.deterministic_shuffle(df, "doc_id").collect()}
    b = {r["doc_id"]: r["shuffle_pos"]
         for r in training.deterministic_shuffle(df, "doc_id").collect()}
    assert a == b                                   # reproducible
    assert sorted(a.values()) == list(range(1, 101))  # dense permutation
    other = {r["doc_id"]: r["shuffle_pos"]
             for r in training.deterministic_shuffle(
                 df, "doc_id", seed="other").collect()}
    assert other != a                               # seed changes the order


def test_shard_assignments_deterministic_and_partitioning(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = training.shard_assignments(df, "doc_id", n_shards=8)
    rows = out.collect()
    assert all(0 <= r["shard"] < 8 for r in rows)
    again = {r["doc_id"]: r["shard"]
             for r in training.shard_assignments(df, "doc_id", 8).collect()}
    assert {r["doc_id"]: r["shard"] for r in rows} == again
    # all 8 shards populated and roughly balanced on 500 uniform ids
    sizes = [sum(1 for r in rows if r["shard"] == s) for s in range(8)]
    assert min(sizes) > 0 and max(sizes) < 3 * (500 // 8)
    with pytest.raises(ValueError):
        training.shard_assignments(df, "doc_id", 0)


def test_shard_manifest_totals(spark):
    df = spark.createDataFrame(
        [(i, "tok " * (i % 5 + 1)) for i in range(50)],
        "doc_id long, text string",
    )
    man = training.shard_manifest(df, "doc_id", "text", n_shards=4).collect()
    assert sum(r["n_docs"] for r in man) == 50
    assert sum(r["n_tokens"] for r in man) == sum(i % 5 + 1 for i in range(50))
    for r in man:
        assert r["min_id"] <= r["max_id"]


def test_shuffle_rank_matches_global_sort_and_avoids_single_partition(spark):
    """ADVICE r3: the global rank must not plan as Exchange
    SinglePartition over the DATA.  The md5-prefix-bucketed rank must
    (a) equal the naive global-window rank exactly, and (b) put the
    data-side window behind a hash partitioning on the bucket; the only
    SinglePartition allowed is the tiny per-bucket offsets table."""
    from pyspark.sql import Window

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    fast = training.deterministic_shuffle(df, "doc_id", seed="s")
    key = F.md5(F.concat_ws("|", F.lit("s"), F.col("doc_id").cast("string")))
    naive = df.withColumn(
        "shuffle_pos", F.row_number().over(Window.orderBy(key, F.col("doc_id")))
    )
    assert {(r["doc_id"], r["shuffle_pos"]) for r in fast.collect()} == {
        (r["doc_id"], r["shuffle_pos"]) for r in naive.collect()
    }
    plan = fast._jdf.queryExecution().executedPlan().toString()
    window_lines = [l for l in plan.splitlines() if "row_number()" in l]
    assert window_lines and all("__bkt__" in l for l in window_lines)


def test_token_budget_global_path_no_single_partition_cumsum(spark):
    """The unstratified token-budget draw uses the same bucketed plan;
    its kept set must equal the naive global-window cumsum filter."""
    from pyspark.sql import Window
    from fluss_datafusion_spark.operators import curation
    from fluss_datafusion_spark.functions.text import token_count

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.lit("w"), F.col("id").cast("string"),
                    F.lit("x y z")).alias("text"),
    )
    fast = curation.sample_to_token_budget(df, "doc_id", "text", 300, seed="b")
    key = F.md5(F.concat_ws("|", F.lit("b"), F.col("doc_id").cast("string")))
    w = Window.orderBy(key, F.col("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = (
        df.withColumn("__tok__", token_count(F.col("text")))
        .withColumn("__cum__", F.sum("__tok__").over(w))
        .filter(F.col("__cum__") <= 300)
    )
    assert {r["doc_id"] for r in fast.collect()} == {
        r["doc_id"] for r in naive.collect()
    }
    # kept totals never exceed the budget (strict no-overshoot contract)
    total = fast.select(F.sum(token_count(F.col("text")))).collect()[0][0]
    assert total <= 300


def test_range_ranked_matches_global_sort_any_key(spark):
    """range_ranked (the arbitrary-key sibling of md5_prefix_ranked)
    must equal the naive global-window rank exactly, with the data-side
    window partitioned (no Exchange SinglePartition over the data)."""
    from pyspark.sql import Window

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.round(F.pmod(F.col("id") * 37, 100) / 7.0, 4).alias("score"),
    )
    ranked, col = training.range_ranked(
        df, [F.col("score").desc(), F.col("doc_id").asc()], num_partitions=16
    )
    naive = df.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        ),
    )
    assert {(r["doc_id"], r[col]) for r in ranked.collect()} == {
        (r["doc_id"], r["rk"]) for r in naive.collect()
    }
    # The ranked side is materialized via localCheckpoint (so the
    # offsets branch and the data branch can never see different range
    # boundaries — repartitionByRange samples nondeterministically, and
    # without the pin, divergent re-plans could mis-rank silently).  The
    # data-side window shape (row_number partitioned by __pid__, never a
    # global sort) is only visible pre-checkpoint, so assert it on the
    # unmaterialized variant.  (The offsets branch's SinglePartition
    # window over <=num_partitions count rows is intended and tiny.)
    unmat, _ = training.range_ranked(
        df,
        [F.col("score").desc(), F.col("doc_id").asc()],
        num_partitions=16,
        _materialize=False,
    )
    plan2 = unmat._jdf.queryExecution().executedPlan().toString()
    window_lines = [l for l in plan2.splitlines() if "row_number()" in l]
    assert window_lines and all("__pid__" in l for l in window_lines)


def test_quality_buckets_equal_frequency_and_order(spark):
    from fluss_datafusion_spark.operators import lm

    rows = [
        (i, ("common words repeated often " * 5) if i % 2 == 0
         else f"rare{i} gibberish{i} tokens{i} xq{i} zz{i}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = lm.quality_buckets(docs, "doc_id", "text", n_buckets=3).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket_id"], []).append(r)
    # equal-frequency terciles
    assert sorted(by_bucket) == [1, 2, 3]
    sizes = [len(by_bucket[b]) for b in (1, 2, 3)]
    assert max(sizes) - min(sizes) <= 1
    # label mapping + score ordering across buckets
    assert all(r["bucket_label"] == "head" for r in by_bucket[1])
    assert all(r["bucket_label"] == "tail" for r in by_bucket[3])
    assert min(r["avg_logprob"] for r in by_bucket[1]) >= max(
        r["avg_logprob"] for r in by_bucket[3]
    )
    # model-like (repetitive common-bigram) docs rank ahead of gibberish
    head_ids = {r["doc_id"] for r in by_bucket[1]}
    assert all(i % 2 == 0 for i in head_ids)
