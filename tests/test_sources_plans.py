"""Tests for the snapshot-scan source (reference A1 semantics:
plan-time-pinned bounded reads) and the plan-audit helpers."""

import os

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.plans.audit import (
    has_pushed_filter,
    plan_facts,
    read_columns,
    shuffle_count,
    uses_broadcast_join,
)
from fluss_datafusion_spark.sources.snapshot import (
    incremental_scan,
    list_snapshot_files,
    snapshot_scan,
)


@pytest.fixture()
def log_dir(spark, tmp_path):
    out = str(tmp_path / "log")
    spark.range(0, 100).withColumn("v", F.col("id") * 2).coalesce(1).write.parquet(out)
    return out


def _append(spark, path, start, end):
    spark.range(start, end).withColumn("v", F.col("id") * 2).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_snapshot_scan_pins_file_list(spark, log_dir):
    """Files appended after plan time are invisible — the reference's
    read-to-latest-offset isolation (src/provider.rs:336-345)."""
    df = snapshot_scan(spark, log_dir)
    _append(spark, log_dir, 100, 150)
    assert df.count() == 100  # action after append still sees the snapshot
    assert snapshot_scan(spark, log_dir).count() == 150  # new snapshot sees all


def test_snapshot_scan_projection_and_limit(spark, log_dir):
    df = snapshot_scan(spark, log_dir, columns=["v"], limit=7)
    rows = df.collect()
    assert len(rows) == 7
    assert rows[0].asDict().keys() == {"v"}
    # projection reaches the scan: only `v` is read
    assert read_columns(snapshot_scan(spark, log_dir, columns=["v"])) == [["v"]]


def test_incremental_scan(spark, log_dir):
    first = list_snapshot_files(log_dir)
    assert incremental_scan(spark, log_dir, first).count() == 0
    _append(spark, log_dir, 100, 130)
    delta = incremental_scan(spark, log_dir, first)
    assert delta.count() == 30
    assert delta.agg(F.min("id")).collect()[0][0] == 100


def test_missing_path_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        snapshot_scan(spark, str(tmp_path / "nope"))


def test_plan_facts_pushdown(spark, log_dir):
    df = snapshot_scan(spark, log_dir).filter(F.col("id") == 5)
    assert has_pushed_filter(df, "id")
    facts = plan_facts(df)
    assert facts["joins"] == []


def test_plan_facts_broadcast_join(spark, log_dir):
    big = snapshot_scan(spark, log_dir)
    small = spark.range(0, 10).withColumnRenamed("id", "id2")
    joined = big.join(F.broadcast(small), big.id == small.id2)
    assert uses_broadcast_join(joined)
    assert shuffle_count(joined) >= 1  # the broadcast exchange


def test_pk_lookup_bucket_pruning(spark, tmp_path):
    """A PK lookup on a bucketed table must prune to ONE __bkt__ dir:
    the partition filter appears in the scan and only that directory's
    files are read."""
    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.plans.audit import plan_text

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE kv (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))"
        " DISTRIBUTED BY (id) INTO 8 BUCKETS"
    )
    e.sql("INSERT INTO kv SELECT id, concat('v', id) FROM range(0, 1000)")
    out = e.catalog.lookup("kv", 7)
    rows = out.collect()
    assert [(r["id"], r["v"]) for r in rows] == [(7, "v7")]
    text = plan_text(out)
    assert "__bkt__" in text  # partition filter reached the scan
    # upsert still wins inside the pruned bucket
    e.sql("INSERT INTO kv VALUES (7, 'v7b')")
    assert e.catalog.lookup("kv", 7).collect()[0]["v"] == "v7b"


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Two tables bucketBy'd on the join key join with ZERO exchanges —
    the co-located join `DISTRIBUTED BY ... INTO n BUCKETS` exists for."""
    from fluss_datafusion_spark.operators.colocate import (
        colocated_join,
        write_bucketed,
    )
    from fluss_datafusion_spark.plans.audit import plan_facts
    from fluss_datafusion_spark.session import read_table

    orders = read_table(spark, "/root/testdata/sf0.001/orders.parquet")
    cust = read_table(spark, "/root/testdata/sf0.001/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(orders, "orders_b", 8, ["o_custkey"], sorted_by=["o_custkey"])
    write_bucketed(cust, "customer_b", 8, ["o_custkey"], sorted_by=["o_custkey"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "orders_b", "customer_b", ["o_custkey"])
        facts = plan_facts(joined)
        assert facts["exchanges"] == 0, facts["text"]
        assert "SortMergeJoin" in facts["joins"]
        plain = orders.join(cust, "o_custkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_range_join_is_hash_join_not_nested_loop(spark):
    """point_in_interval_join must plan as an equi hash/sort-merge join
    on the bucket id — never BroadcastNestedLoopJoin/CartesianProduct,
    which is what the raw inequality predicate would produce."""
    import duckdb

    from fluss_datafusion_spark.corpus import QUERIES, ORACLES, load_all
    from fluss_datafusion_spark.plans.audit import plan_facts

    load_all()
    df = QUERIES["st_range_join"](spark, "/root/testdata/sf0.001")
    facts = plan_facts(df)
    assert not {"BroadcastNestedLoopJoin", "CartesianProduct"} & set(
        facts["joins"]
    ), facts["text"]

    con = duckdb.connect()
    for name in ("events",):
        con.sql(
            f"CREATE VIEW {name} AS FROM '/root/testdata/sf0.001/{name}.parquet'"
        )
    expected = con.sql(ORACLES["st_range_join"]).df()
    got = df.toPandas()
    assert len(got) == len(expected)
    assert abs(got["total_value"].sum() - expected["total_value"].sum()) < 1e-6


def test_dedup_plans_never_broadcast_corpus(spark):
    """VERDICT r1 findings 1-3: with auto-broadcast disabled, the dedup
    plans must not hint-broadcast anything corpus-sized.  ngram/embedding
    plans carry NO BroadcastExchange at all; minhash may broadcast only
    the candidate-bound verify slice (the LeftSemi-filtered shingles)."""
    from fluss_datafusion_spark.operators import dedup
    from fluss_datafusion_spark.session import read_table

    docs = read_table(spark, "/root/testdata/sf0.001/documents.parquet")
    emb = read_table(spark, "/root/testdata/sf0.001/embeddings.parquet")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for df in (
            dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.4),
            dedup.embedding_cosine_pairs(
                emb, "vec_id", "embedding", block_col="label"
            ),
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastExchange" not in plan, plan

        plan = (
            dedup.minhash_lsh_pairs(docs, "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the only broadcasts left are the two hinted verify branches,
        # each fed by the LeftSemi candidate filter (never the raw table)
        assert plan.count("BroadcastExchange") <= 2, plan
        assert "LeftSemi" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_embedding_pairs_refuses_unblocked_all_pairs(spark):
    """Without a block key the pair join is an all-pairs nested loop —
    the operator must refuse unless explicitly opted in."""
    import pytest as _pytest

    from fluss_datafusion_spark.operators import dedup
    from fluss_datafusion_spark.session import read_table

    emb = read_table(spark, "/root/testdata/sf0.001/embeddings.parquet")
    with _pytest.raises(ValueError, match="all-pairs"):
        dedup.embedding_cosine_pairs(emb, "vec_id", "embedding")
    # explicit opt-in still works for test-scale inputs
    n = (
        dedup.embedding_cosine_pairs(
            emb.limit(20), "vec_id", "embedding", allow_all_pairs=True
        )
        .count()
    )
    assert n >= 0


def test_partitioned_table_scan_prunes_partitions(spark, tmp_path):
    """A filter on a PARTITIONED BY column must prune to that
    partition's directory (PartitionFilters in the scan), reading none
    of the other partitions' files — the layout contract that makes
    date-partitioned 100 TB tables scannable."""
    from fluss_datafusion_spark import EngineSession

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh_part"))
    e.sql(
        "CREATE TABLE part_ev (id BIGINT NOT NULL, dt STRING, val BIGINT,"
        " PRIMARY KEY (id)) PARTITIONED BY (dt)"
    )
    e.sql(
        "INSERT INTO part_ev VALUES"
        " (1, '2024-01-01', 10), (2, '2024-01-02', 20), (3, '2024-01-03', 30)"
    )
    df = e.sql("SELECT id, val FROM part_ev WHERE dt = '2024-01-02'")
    assert [r["id"] for r in df.collect()] == [2]

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-02" in plan, plan
    # and the physical layout is one directory per dt value
    import os

    table_dir = e.catalog.table_path(e.catalog.get_table("part_ev"))
    assert sorted(d for d in os.listdir(table_dir) if d.startswith("dt=")) == [
        "dt=2024-01-01", "dt=2024-01-02", "dt=2024-01-03",
    ]
