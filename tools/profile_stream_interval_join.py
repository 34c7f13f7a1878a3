"""Per-batch decomposition of the stream_interval_join bench entry
(VERDICT r12 item 7): where do the seconds go — micro-batch scheduling,
two-sided state-store init, the join itself, or the trailing no-data
watermark-flush batch Spark schedules after the last data batch?

Prints each micro-batch's durationMs breakdown from the query progress
events (the same numbers the r11 floor profile quoted), plus an A/B of
``spark.sql.streaming.noDataMicroBatches.enabled`` (the inner interval
join emits rows eagerly; the flush batch exists only to advance the
watermark and evict state, which an AvailableNow run throws away at
termination anyway — output rows must be identical).

Usage: python tools/profile_stream_interval_join.py [sf_dir]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fluss_datafusion_spark.session import build_spark  # noqa: E402
from fluss_datafusion_spark.streaming.events import (  # noqa: E402
    chunk_table_for_replay,
    events_stream,
    interval_join_streams,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = build_spark(app_name="profile-stream-interval-join")
spark.sparkContext.setLogLevel("ERROR")

replay_root = tempfile.mkdtemp(prefix="prof_replay_")
replay = chunk_table_for_replay(
    spark, sf_dir, os.path.join(replay_root, "events"), n_chunks=8
)
spark.conf.set("spark.sql.shuffle.partitions", "8")


def build(s):
    purchases = s.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = s.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    return interval_join_streams(
        purchases, clicks, on=["user_id"],
        left_ts="p_ts", right_ts="c_ts",
        bound="1 hour", watermark="4 hours",
    ).select("purchase_id", "user_id", "click_id")


def run_once(name, no_data_batches: bool):
    spark.conf.set(
        "spark.sql.streaming.noDataMicroBatches.enabled",
        str(no_data_batches).lower(),
    )
    t0 = time.time()
    q = (
        build(events_stream(spark, replay, max_files_per_trigger=4))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.time() - t0, 2)
    rows = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n
    batches = []
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        batches.append(
            {
                "batch": d.get("batchId"),
                "inputRows": d.get("numInputRows"),
                "durationMs": d.get("durationMs"),
            }
        )
    print(f"\n{name} (noDataMicroBatches={no_data_batches}): wall={wall}s rows={rows}")
    for b in batches:
        print(f"  batch {b['batch']}: in={b['inputRows']} {b['durationMs']}")
    return wall, rows


# warm the JVM/codegen once
run_once("warm", True)
w1, r1 = run_once("with_flush_a", True)
w2, r2 = run_once("no_flush_a", False)
w3, r3 = run_once("with_flush_b", True)
w4, r4 = run_once("no_flush_b", False)
assert r1 == r2 == r3 == r4, "output rows must be identical"
print(f"\nrows identical: {r1}")
print(f"with flush: {[w1, w3]}  without: {[w2, w4]}")

shutil.rmtree(replay_root, ignore_errors=True)
spark.stop()
