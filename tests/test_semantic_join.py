"""Cross-table semantic join (operators/similarity.semantic_join):
recall floor vs brute force on clustered vectors, exact verification
(no false positives), determinism, empty-input validation."""

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.functions.vector import cosine_fast
from fluss_datafusion_spark.operators.similarity import semantic_join
from fluss_datafusion_spark.session import read_table


def _clustered_halves(spark):
    from fluss_datafusion_spark.corpus.northstar import clustered_embeddings

    emb = clustered_embeddings(
        read_table(spark, "/root/testdata/sf0.001/embeddings.parquet")
    )
    left = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("lid"), "embedding"
    )
    right = emb.filter(F.col("vec_id") >= 25).select(
        F.col("vec_id").alias("rid"), "embedding"
    )
    return left, right


def _exact(left, right, threshold):
    return (
        left.select("lid", F.col("embedding").alias("__l__"))
        .crossJoin(right.select("rid", F.col("embedding").alias("__r__")))
        .withColumn("cos", cosine_fast(F.col("__l__"), F.col("__r__")))
        .filter(F.col("cos") >= threshold)
    )


def test_recall_floor_and_no_false_positives(spark):
    left, right = _clustered_halves(spark)
    exact = {(r.lid, r.rid) for r in _exact(left, right, 0.8).collect()}
    found = {
        (r.lid, r.rid)
        for r in semantic_join(
            left, right, "lid", "embedding", "rid", "embedding",
            threshold=0.8,
        ).collect()
    }
    assert found <= exact  # exact verify: never a false positive
    assert len(found & exact) / len(exact) >= 0.9
    assert len(exact) > 20


def test_deterministic(spark):
    left, right = _clustered_halves(spark)
    a = sorted(
        (r.lid, r.rid, round(r.cos, 9))
        for r in semantic_join(
            left, right, "lid", "embedding", "rid", "embedding"
        ).collect()
    )
    b = sorted(
        (r.lid, r.rid, round(r.cos, 9))
        for r in semantic_join(
            left.repartition(5), right.coalesce(1),
            "lid", "embedding", "rid", "embedding",
        ).collect()
    )
    assert a == b and len(a) > 0


def test_empty_left_raises(spark):
    left, right = _clustered_halves(spark)
    with pytest.raises(ValueError, match="empty left"):
        semantic_join(
            left.filter(F.lit(False)), right,
            "lid", "embedding", "rid", "embedding",
        )
