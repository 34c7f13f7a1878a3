"""Per-statement + per-phase profile of the DML lifecycle (VERDICT r7
item 1: stop guessing — measure one warm REFRESH / MERGE end-to-end).

Runs the q57 statement sequence in a warm session, printing wall time
per statement, then cProfiles the two REFRESH statements and dumps the
top cumulative-time functions so the dominant fixed-cost component is
named, not inferred.

Usage: python tools/profile_dml.py [sf_dir] [--cprofile]
"""

import cProfile
import os
import pstats
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
do_cprofile = "--cprofile" in sys.argv

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from fluss_datafusion_spark import EngineSession  # noqa: E402
from fluss_datafusion_spark.session import read_table  # noqa: E402


def run_once(label, profile_refresh=False):
    root = os.path.join(tempfile.gettempdir(), "spark_graft_profile_dml")
    shutil.rmtree(root, ignore_errors=True)
    e = EngineSession(spark=spark, warehouse=os.path.join(root, "wh"))
    read_table(spark, f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") <= 2000
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("g"),
        F.floor("o_totalprice").cast("bigint").alias("x"),
    ).createOrReplaceTempView("mv_seed")

    stmts = [
        "CREATE TABLE mv_src (k BIGINT NOT NULL, g STRING, x BIGINT,"
        " PRIMARY KEY (k))",
        "INSERT INTO mv_src SELECT * FROM mv_seed",
        "CREATE MATERIALIZED VIEW mv_agg AS"
        " SELECT g, count(*) AS n, count(x) AS nx, sum(x) AS sx,"
        " avg(x) AS ax, min(x) AS mn, max(x) AS mx FROM mv_src GROUP BY g",
        "UPDATE mv_src SET g = 'U1' WHERE k % 97 = 0",
        "DELETE FROM mv_src WHERE k % 53 = 0",
        "INSERT INTO mv_src VALUES (1000001, 'Z', 10),"
        " (1000002, 'Z', NULL), (1000003, 'Z', 25)",
        "REFRESH MATERIALIZED VIEW mv_agg",
        "UPDATE mv_src SET x = x + 7 WHERE g = 'O'",
        "DELETE FROM mv_src WHERE g = 'U1'",
        "REFRESH MATERIALIZED VIEW mv_agg",
    ]
    total = 0.0
    prof = cProfile.Profile() if profile_refresh else None
    for s in stmts:
        t0 = time.perf_counter()
        if prof is not None and s.startswith(("REFRESH", "UPDATE", "DELETE")):
            prof.enable()
            e.sql(s)
            prof.disable()
        else:
            e.sql(s)
        dt = time.perf_counter() - t0
        total += dt
        print(f"  {dt*1000:8.1f} ms  {s[:70]}")
    t0 = time.perf_counter()
    n = e.sql("SELECT * FROM mv_agg").count()
    dt = time.perf_counter() - t0
    print(f"  {dt*1000:8.1f} ms  SELECT (rows={n})")
    print(f"[{label}] total {total + dt:.2f} s")
    return prof


print("=== cold run (plan/codegen warmup) ===")
run_once("cold")
print("=== warm run ===")
prof = run_once("warm", profile_refresh=do_cprofile)
if prof is not None:
    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    print("\n=== top cumulative (UPDATE/DELETE/REFRESH statements) ===")
    st.print_stats(45)
spark.stop()
