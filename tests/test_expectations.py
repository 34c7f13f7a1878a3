"""Data-quality expectations (operators/expectations.expect /
expect_fk): rule arithmetic on crafted violations, NULL conventions,
the uniqueness/Expand discipline, FK orphans."""

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.expectations import expect, expect_fk


def _df(spark):
    rows = [
        (1, "a", 10.0, "ok-1"),
        (2, "a", 20.0, "ok-2"),
        (3, None, 5.0, "bad"),
        (4, "z", 200.0, None),
        (4, "a", None, "ok-3"),
    ]
    return spark.createDataFrame(rows, "id int, cat string, x double, tag string")


def test_rule_arithmetic(spark):
    out = {
        (r.rule, r.column): r
        for r in expect(
            _df(spark),
            [
                {"kind": "not_null", "column": "cat"},
                {"kind": "unique", "columns": ["id"]},
                {"kind": "accepted_values", "column": "cat", "values": ["a"]},
                {"kind": "between", "column": "x", "lo": 0, "hi": 100},
                {"kind": "matches", "column": "tag", "pattern": "^ok-"},
                {"kind": "row_count", "min": 3, "max": 10},
            ],
        ).collect()
    }
    assert out[("not_null", "cat")].n_violations == 1
    assert out[("unique", "id")].n_violations == 1  # id 4 twice
    assert out[("accepted_values", "cat")].n_violations == 1  # 'z'
    # NULL x skips the range rule; 200.0 violates
    assert out[("between", "x")].n_violations == 1
    assert out[("matches", "tag")].n_violations == 1  # 'bad'; NULL skipped
    rc = out[("row_count", None)]
    assert rc.n_violations == 0 and rc.passed
    assert all(r.n_rows == 5 for r in out.values())


def test_row_count_shortfall_and_excess(spark):
    df = _df(spark)
    short = expect(df, [{"kind": "row_count", "min": 8}]).collect()[0]
    assert short.n_violations == 3 and not short.passed
    over = expect(df, [{"kind": "row_count", "min": 0, "max": 2}]).collect()[0]
    assert over.n_violations == 3 and not over.passed


def test_multicol_unique_and_null_keys(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (None, "a"), (2, None)]
    df = spark.createDataFrame(rows, "k int, g string")
    r = expect(df, [{"kind": "unique", "columns": ["k", "g"]}]).collect()[0]
    # NULL-key rows (2) are excluded; 3 non-null rows, 2 distinct -> 1 dup
    assert r.n_violations == 1 and not r.passed


def test_unknown_rule_raises(spark):
    with pytest.raises(ValueError, match="unknown rule kind"):
        expect(_df(spark), [{"kind": "positive", "column": "x"}])


def test_fk_orphans_and_null_fk(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id int, pid int"
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    r = expect_fk(child, "pid", parent, "pk").collect()[0]
    assert r.n_orphans == 1 and not r.passed  # 99; NULL is not an orphan
    ok = expect_fk(
        child.filter(F.col("id") < 3), "pid", parent, "pk"
    ).collect()[0]
    assert ok.n_orphans == 0 and ok.passed


def test_expectations_stream_matches_batch(spark, testdata, tmp_path):
    """Streaming rule counts per window equal the batch evaluation of
    the same plan; uniqueness refuses."""
    import pytest as _pytest

    from fluss_datafusion_spark.session import read_table
    from fluss_datafusion_spark.streaming.events import (
        chunk_df_for_replay,
        expectations_stream,
        run_to_memory,
    )

    ev = read_table(spark, f"{testdata}/events.parquet").select(
        "ts", "user_id", "value"
    )
    rules = [
        {"kind": "not_null", "column": "user_id"},
        {"kind": "between", "column": "value", "lo": 0, "hi": 50},
        {"kind": "row_count", "min": 3},
    ]
    batch = {
        tuple(r) for r in expectations_stream(ev, rules).collect()
    }
    replay = chunk_df_for_replay(ev, str(tmp_path / "replay"), n_chunks=4)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    run_to_memory(
        expectations_stream(stream, rules),
        "exp_stream_eq",
        output_mode="complete",
    )
    streamed = {tuple(r) for r in spark.table("exp_stream_eq").collect()}
    assert streamed == batch and len(batch) > 0
    with _pytest.raises(ValueError, match="uniqueness"):
        expectations_stream(ev, [{"kind": "unique", "columns": ["user_id"]}])


def test_quarantine_split_row_routing(spark):
    """Row-level routing: clean rows drop the helper column, violators
    carry every failed rule name; table-scoped rules refuse."""
    import pytest as _pytest

    from fluss_datafusion_spark.operators.expectations import (
        quarantine_split,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, None, 5.0),        # not_null violation
            (3, "zz", 200.0),      # accepted_values AND between
            (4, "b", 50.0),
        ],
        "id long, cat string, v double",
    )
    rules = [
        {"kind": "not_null", "column": "cat"},
        {"kind": "accepted_values", "column": "cat", "values": ["a", "b"]},
        {"kind": "between", "column": "v", "lo": 0, "hi": 100},
    ]
    clean, quarantined = quarantine_split(df, rules)
    assert sorted(r.id for r in clean.collect()) == [1, 4]
    assert clean.columns == ["id", "cat", "v"]
    got = {r.id: sorted(r.failed_rules) for r in quarantined.collect()}
    assert got == {
        2: ["not_null_cat"],
        3: ["accepted_values_cat", "between_v"],
    }
    with _pytest.raises(ValueError):
        quarantine_split(df, [{"kind": "unique", "column": "id"}])


def test_quarantine_sink_dead_letter_replay(spark, tmp_path):
    """Streaming dead-letter routing through the engine insert path:
    clean rows upsert; violators land in the dead-letter table with
    their rule names, fixable and replayable into the clean table."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.operators.expectations import (
        quarantine_sink,
    )

    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE clean_t (id BIGINT NOT NULL, v DOUBLE,"
        " PRIMARY KEY (id))"
    )
    e.sql(
        "CREATE TABLE dead_t (id BIGINT NOT NULL, v DOUBLE,"
        " failed_rules STRING, PRIMARY KEY (id))"
    )
    replay = str(tmp_path / "replay")
    os.makedirs(replay)
    base = time.time()
    batches = [
        [(1, 10.0), (2, -5.0), (3, 20.0)],
        [(4, 999.0), (5, 30.0)],
    ]
    for i, rows in enumerate(batches):
        fp = os.path.join(replay, f"b{i:05d}.parquet")
        pq.write_table(
            pa.table(
                {"id": [r[0] for r in rows], "v": [r[1] for r in rows]}
            ),
            fp,
        )
        os.utime(fp, (base + i, base + i))
    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    metrics = []
    quarantine_sink(
        stream,
        e.catalog,
        "clean_t",
        "dead_t",
        [{"kind": "between", "column": "v", "lo": 0, "hi": 100}],
        str(tmp_path / "ckpt"),
        metrics=metrics,
    ).awaitTermination()
    assert sorted(r.id for r in e.sql("SELECT id FROM clean_t").collect()) == [1, 3, 5]
    dead = {r.id: r.failed_rules for r in e.sql("SELECT * FROM dead_t").collect()}
    assert dead == {2: "between_v", 4: "between_v"}
    assert metrics == [
        {"batch_id": 0, "n_clean": 2, "n_quarantined": 1},
        {"batch_id": 1, "n_clean": 1, "n_quarantined": 1},
    ]
    # the dead-letter pattern: fix and replay into the clean table
    e.sql("INSERT INTO clean_t SELECT id, 0.0 AS v FROM dead_t")
    assert e.sql("SELECT count(*) FROM clean_t").collect()[0][0] == 5
