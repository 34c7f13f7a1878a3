"""r12 verify-store prune: index VERIFY stores (shingles / hashes) are
range-clustered on the doc id at build time and carry skipping
manifests, so a probe's candidate-bound verify join reads only the
files whose id bounds admit a candidate — the last O(store) scan on
the per-batch ingest path.  Exactness is pinned against the full-read
result; prune_stats_log records the file-drop evidence."""

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import incremental as inc


def _text(i):
    return f"alpha{i} bravo{i} charlie{i} delta{i} echo{i} fox{i}"


def test_dedup_verify_store_prunes_by_candidate_ids(
    spark, tmp_path, monkeypatch
):
    # test sessions run few cores -> few store files; drop the verify
    # gate (production bar: _VERIFY_PRUNE_MIN_FILES) to observe the
    # regime at test size
    monkeypatch.setattr(inc, "_VERIFY_PRUNE_MIN_FILES", 4)
    path = str(tmp_path / "didx")
    # unique text per doc: the only candidates are the batch's verbatim
    # copies of LOW-id corpus docs, so the candidate id set is narrow
    corpus = spark.createDataFrame(
        [(i, _text(i)) for i in range(4096)], "doc_id long, text string"
    )
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        inc.write_dedup_index(corpus, "doc_id", "text", path, source_id="t")
    finally:
        spark.conf.set(coalesce_key, prev)
    from fluss_datafusion_spark.catalog import skipping
    from fluss_datafusion_spark.catalog.catalog import _parquet_files

    store = path + "/shingles"
    files = sorted(_parquet_files(store))
    assert len(files) >= inc._PROBE_PRUNE_MIN_FILES
    assert len(skipping.load(store)) == len(files)
    # disjoint per-file id ranges (the range-cluster contract)
    stats = skipping.load(store)
    bounds = sorted(
        (s["__id__"][0], s["__id__"][1])
        for s in stats.values()
        if isinstance(s, dict) and "__id__" in s
    )
    assert bounds, "manifest must carry __id__ bounds"
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2, "shingle-store files must not overlap"

    # batch duplicating LOW-id corpus docs: candidates stay low-id
    batch = spark.createDataFrame(
        [(1_000_000 + j, _text(j)) for j in range(4)],
        "doc_id long, text string",
    )
    inc.prune_stats_log.clear()
    pairs = inc.incremental_dedup_pairs(
        batch, path, "doc_id", "text", threshold=0.4
    )
    got = sorted((r.id_a, r.id_b) for r in pairs.collect())
    recs = [
        r for r in inc.prune_stats_log if r["store"].endswith("shingles")
    ]
    assert recs and recs[-1]["engaged"]
    assert 0 < recs[-1]["kept"] < recs[-1]["files"], recs[-1]

    # exactness: identical pair set through a full (prune-disabled) read
    inc.prune_stats_log.clear()
    import unittest.mock as mock

    with mock.patch.object(
        inc, "_PROBE_PRUNE_MIN_FILES", 10**9
    ), mock.patch.object(inc, "_VERIFY_PRUNE_MIN_FILES", 10**9):
        full_pairs = inc.incremental_dedup_pairs(
            batch, path, "doc_id", "text", threshold=0.4
        )
        want = sorted((r.id_a, r.id_b) for r in full_pairs.collect())
    assert got == want and got, "pruned and full probes must agree"


def test_hamming_verify_store_prunes_by_candidate_ids(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(inc, "_VERIFY_PRUNE_MIN_FILES", 4)
    path = str(tmp_path / "hidx")
    base = spark.range(0, 4096).select(
        F.col("id").alias("media_id"),
        (F.col("id") * 65537).alias("dhash"),
    )
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        inc.write_hamming_index(base, "media_id", "dhash", path)
    finally:
        spark.conf.set(coalesce_key, prev)
    from fluss_datafusion_spark.catalog import skipping
    from fluss_datafusion_spark.catalog.catalog import _parquet_files

    store = path + "/hashes"
    files = sorted(_parquet_files(store))
    assert len(files) >= inc._PROBE_PRUNE_MIN_FILES
    assert len(skipping.load(store)) == len(files)

    batch = spark.createDataFrame(
        [(9001, 5 * 65537)], "media_id long, dhash long"
    )
    inc.prune_stats_log.clear()
    pairs = inc.incremental_hamming_pairs(
        batch, path, "media_id", "dhash", max_hamming=2
    )
    assert [(r.id_a, r.id_b) for r in pairs.collect()] == [(5, 9001)]
    recs = [
        r for r in inc.prune_stats_log if r["store"].endswith("hashes")
    ]
    assert recs and recs[-1]["engaged"]
    assert 0 < recs[-1]["kept"] < recs[-1]["files"], recs[-1]
