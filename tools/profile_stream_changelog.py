"""Decompose the stream_changelog bench entry (VERDICT r8 item 7): is
the wall time the changelog KERNEL (per-bucket python loop) or the
streaming harness floor (micro-batch scheduling + state-store tasks +
python worker round-trips any stateful pandas op pays)?

Three variants over the identical replay source / trigger cadence:
  A. real changelog_stream (state_buckets=64)      — the bench entry
  B. no-op applyInPandasWithState, same shuffle/state shape — harness
     + python round-trip floor with a trivial kernel
  C. JVM-only stateful op (dropDuplicates)          — harness floor
     with no python in the loop

Usage: python tools/profile_stream_changelog.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fluss_datafusion_spark.session import build_spark  # noqa: E402
from fluss_datafusion_spark.streaming.events import (  # noqa: E402
    changelog_stream,
    chunk_table_for_replay,
    events_stream,
    run_to_memory,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = build_spark(app_name="profile-stream-changelog")
spark.sparkContext.setLogLevel("ERROR")

replay_root = tempfile.mkdtemp(prefix="prof_replay_")
replay = chunk_table_for_replay(
    spark, sf_dir, os.path.join(replay_root, "events"), n_chunks=8
)
spark.conf.set("spark.sql.shuffle.partitions", "8")


def timed(name, build, output_mode, runs=3):
    ts = []
    for i in range(runs):
        t0 = time.time()
        run_to_memory(
            build(events_stream(spark, replay, max_files_per_trigger=2)),
            f"prof_{name}_{i}",
            output_mode=output_mode,
        )
        ts.append(round(time.time() - t0, 2))
    med = sorted(ts)[len(ts) // 2]
    print(f"{name}: {sorted(ts)} (median {med})")
    return med


def real(s):
    return changelog_stream(
        s.withWatermark("ts", "0 seconds"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        image_cols=["event_id", "event_type", "value"],
        ttl=None,
        state_buckets=64,
    )


def noop(s):
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        n = 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"bucket": [key[0]], "n": [n]})

    bucketed = s.withColumn(
        "__bucket__", F.pmod(F.xxhash64("user_id"), F.lit(64)).cast("int")
    )
    return bucketed.groupBy("__bucket__").applyInPandasWithState(
        update, "bucket int, n long", "n long", "update",
        GroupStateTimeout.NoTimeout,
    )


def jvm(s):
    return s.withWatermark("ts", "2 hours").dropDuplicates(["event_id"])


# warm the engine once (first stream pays listener/codegen init)
timed("warm", jvm, "append", runs=1)
a = timed("A_real_changelog", real, "update")
b = timed("B_noop_pandas_state", noop, "update")
c = timed("C_jvm_dropdup", jvm, "append")
print(
    f"kernel cost (A-B): {a - b:.2f}s; python round-trip (B-C): "
    f"{b - c:.2f}s; harness floor (C): {c:.2f}s"
)
shutil.rmtree(replay_root, ignore_errors=True)
spark.stop()
