"""DSIR importance resampling (operators/training.dsir_log_weights /
dsir_select): target-lookalike ordering, multiplicity counting,
determinism, Gumbel selection properties."""

from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.training import (
    dsir_log_weights,
    dsir_select,
)


def _docs(spark):
    # two "domains": cat-speak and dog-speak, plus a mixed doc
    rows = (
        [(i, "meow purr meow whiskers purr") for i in range(10)]
        + [(i + 10, "woof bark woof fetch bark") for i in range(10)]
        + [(20, "meow woof meow bark")]
        + [(21, "")]
    )
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_target_lookalikes_score_higher(spark):
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") < 10)  # cat domain
    w = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(docs, target, "doc_id", "text").collect()
    }
    assert w[0] > w[20] > w[10]  # cat doc > mixed doc > dog doc
    assert w[21] == 0.0


def test_counts_multiplicity_and_empty(spark):
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") < 10)
    out = {
        r.doc_id: r.n_feats
        for r in dsir_log_weights(docs, target, "doc_id", "text").collect()
    }
    # 5 tokens + 4 bigrams = 9 occurrences, repeats NOT collapsed
    assert out[0] == 9
    assert out[21] == 0


def test_deterministic_across_partitionings(spark):
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") < 10)
    a = sorted(
        map(
            tuple,
            dsir_log_weights(
                docs.repartition(7), target, "doc_id", "text"
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            dsir_log_weights(
                docs.coalesce(1), target.coalesce(1), "doc_id", "text"
            ).collect(),
        )
    )
    for (ida, wa, na), (idb, wb, nb) in zip(a, b):
        assert ida == idb and na == nb and abs(wa - wb) < 1e-9


def test_gumbel_select_deterministic_and_biased(spark):
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") < 10)
    w = dsir_log_weights(docs, target, "doc_id", "text")
    s1 = {r.doc_id for r in dsir_select(w, 8, "doc_id").collect()}
    s2 = {r.doc_id for r in dsir_select(w, 8, "doc_id").collect()}
    assert s1 == s2 and len(s1) == 8
    # selection is dominated by the target-domain docs
    assert len([i for i in s1 if i < 10]) >= 6
    # a different seed may pick a different set, but stays deterministic
    s3 = {r.doc_id for r in dsir_select(w, 8, "doc_id", seed="other").collect()}
    s4 = {r.doc_id for r in dsir_select(w, 8, "doc_id", seed="other").collect()}
    assert s3 == s4
