"""Streaming drift monitor (streaming.events.drift_stream +
operators.drift.reference_model): micro-batch replay equals the batch
evaluation of the same plan, drifted windows flag, NULL-bin handling."""

import datetime

from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.drift import reference_model
from fluss_datafusion_spark.streaming.events import (
    chunk_df_for_replay,
    drift_stream,
    run_to_memory,
)


def _ts(h, m=0):
    return datetime.datetime(2024, 3, 1, h, m)


def test_stream_equals_batch(spark, testdata, tmp_path):
    from fluss_datafusion_spark.session import read_table

    ev = read_table(spark, f"{testdata}/events.parquet").select("ts", "value")
    model = reference_model(ev, ["value"], n_bins=10, eps=2**-20)
    batch = {
        tuple(r): None
        for r in drift_stream(ev, model, ["value"]).collect()
    }
    replay = chunk_df_for_replay(ev, str(tmp_path / "replay"), n_chunks=4)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    run_to_memory(
        drift_stream(stream, model, ["value"]),
        "drift_stream_eq",
        output_mode="complete",
    )
    streamed = {
        tuple(r): None for r in spark.table("drift_stream_eq").collect()
    }
    assert streamed == batch and len(batch) > 0


def test_drifted_window_flags(spark):
    # reference: uniform 0..9; window at hour 5 shifted to 100..109
    ref = spark.createDataFrame(
        [(float(i % 10),) for i in range(1000)], ["value"]
    )
    model = reference_model(ref, ["value"], n_bins=10)
    rows = [(_ts(4, i % 60), float(i % 10)) for i in range(200)] + [
        (_ts(5, i % 60), 100.0 + i % 10) for i in range(200)
    ]
    cur = spark.createDataFrame(rows, ["ts", "value"])
    out = {
        r.window_start.hour: r
        for r in drift_stream(cur, model, ["value"]).collect()
    }
    assert not out[4].drifted and out[4].psi < 0.05
    assert out[5].drifted and out[5].psi > 1.0
    assert out[4].n == 200 and out[5].n == 200


def test_null_bin_counted(spark):
    ref = spark.createDataFrame(
        [(float(i),) for i in range(100)], ["value"]
    )
    model = reference_model(ref, ["value"], n_bins=10)
    cur = spark.createDataFrame(
        [(_ts(1), None)] * 50 + [(_ts(1), 5.0)] * 50,
        "ts timestamp, value double",
    )
    row = drift_stream(cur, model, ["value"]).collect()[0]
    assert row.n == 100  # NULLs are rows too
    assert row.drifted  # half the mass moved into the NULL bin
    assert row.tv > 0.4
