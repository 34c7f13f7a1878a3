"""Streaming funnel (streaming.events.funnel_stream): in-order replay
final states equal the batch operator, stage monotonicity across
batches, within-window truncation, bad-step validation."""

import datetime

import pytest
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.funnel import funnel
from fluss_datafusion_spark.streaming.events import (
    chunk_df_for_replay,
    funnel_stream,
    run_to_memory,
)

STEPS = ["view", "click", "purchase"]


def _latest_per_user(spark, name):
    """Update-mode sink: the row with the highest stage per user is the
    final chain state (stage is monotone)."""
    df = spark.table(name)
    w = (
        df.groupBy("user_id")
        .agg(F.max("stage").alias("stage"))
    )
    return {
        (r.user_id, r.stage): None for r in w.collect()
    }


def test_stream_final_states_match_batch(spark, testdata, tmp_path):
    from fluss_datafusion_spark.session import read_table

    ev = read_table(spark, f"{testdata}/events.parquet").select(
        "user_id", "ts", "event_type"
    )
    batch = {
        (r.user_id, r.stage): None
        for r in funnel(ev, "user_id", "ts", "event_type", STEPS).collect()
        if r.stage > 0
    }
    replay = chunk_df_for_replay(ev, str(tmp_path / "replay"), n_chunks=4)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    run_to_memory(
        funnel_stream(stream, STEPS),
        "funnel_stream_eq",
        output_mode="update",
    )
    streamed = _latest_per_user(spark, "funnel_stream_eq")
    assert streamed == batch and len(batch) > 0


def _ts(m):
    return datetime.datetime(2024, 3, 1, 10, m)


def test_chain_semantics_and_emission(spark, tmp_path):
    rows = [
        # user 1 completes; the click BEFORE the view must not count
        (1, _ts(0), "click"),
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        # user 2 stalls at view
        (2, _ts(1), "view"),
        (2, _ts(1), "purchase"),  # same-ts: not strictly after -> ignored
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    replay = chunk_df_for_replay(df, str(tmp_path / "r"), n_chunks=2)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    run_to_memory(funnel_stream(stream, STEPS), "funnel_sem", "update")
    final = {}
    for r in sorted(
        spark.table("funnel_sem").collect(), key=lambda r: r.stage
    ):
        final[r.user_id] = r  # highest stage wins (stage is monotone)
    assert final[1].stage == 3
    assert final[1].t_1 == _ts(1) and final[1].t_2 == _ts(2)
    assert final[2].stage == 1 and final[2].t_2 is None


def test_within_window_truncates(spark, tmp_path):
    rows = [
        (1, _ts(0), "view"),
        (1, _ts(1), "click"),
        (1, _ts(30), "purchase"),  # 30 min after t_1: outside 600s
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    replay = chunk_df_for_replay(df, str(tmp_path / "r"), n_chunks=1)
    stream = spark.readStream.schema(df.schema).parquet(replay)
    run_to_memory(
        funnel_stream(stream, STEPS, within_seconds=600),
        "funnel_win",
        "update",
    )
    r = spark.table("funnel_win").orderBy(F.col("stage").desc()).collect()[0]
    assert r.stage == 2 and r.t_3 is None


def test_step_validation(spark):
    df = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    with pytest.raises(ValueError, match="at least 2"):
        funnel_stream(df, ["view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_stream(df, ["view", "view"])
