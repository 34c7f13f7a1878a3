"""Per-query profiling for optimization rounds: run one corpus query
with the bench's noop-sink methodology N times, print per-run wall
times, and dump ``.explain("formatted")`` to ``plans/<tag>/<query>_<label>.txt``.

Usage:
  python tools/profile_query.py [--sf DIR] [--runs N] [--tag r13]
                                [--label before|after] query [query ...]

Timings here are for SAME-SESSION A/B comparison (run before-change and
after-change scripts back to back on a quiet host); the committed bench
numbers come from bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--label", default=None, help="plan dump suffix; omit to skip dump")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from fluss_datafusion_spark.session import build_spark

    spark = build_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    queries.update(getattr(entry_mod.corpus, "EXTRA_QUERIES", {}))

    # same warmup spirit as bench.py, minimal: JVM codegen + python workers
    spark.range(1000).selectExpr("sum(id) AS s").write.format("noop").mode(
        "overwrite"
    ).save()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    for name in args.queries:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        times = []
        for i in range(args.runs):
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: {times} median={sorted(times)[len(times)//2]}")
        if args.label:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            out = os.path.join(plans_dir, f"{name}_{args.label}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"  plan -> {out}")
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
