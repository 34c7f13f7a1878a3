"""Phase decomposition of ns_retrieval_index_lifecycle (VERDICT r12
item 3 — the most expensive bench entry, 8-vs-32-core scaling ratio
0.12): wall per lifecycle phase (write first half, append second half,
load + topk query), and the Spark job count each phase launches — the
entry is suspected to be job-floor x width dominated, not compute.

Usage: python tools/profile_index_lifecycle.py [sf_dir] [runs]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fluss_datafusion_spark.corpus import t  # noqa: E402
from fluss_datafusion_spark.operators import retrieval  # noqa: E402
from fluss_datafusion_spark.session import build_spark  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = build_spark(app_name="profile-index-lifecycle")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

docs = t(spark, sf_dir, "documents")
# warm codegen/python workers
docs.limit(100).write.format("noop").mode("overwrite").save()


def jobs_between(fn):
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    # job-group trick: run under a unique group so we can count its jobs
    gid = f"prof-{time.time()}"
    sc.setJobGroup(gid, "profile")
    t0 = time.time()
    out = fn()
    wall = time.time() - t0
    jobs = tracker.getJobIdsForGroup(gid)
    sc.setJobGroup(None, None)
    return wall, len(jobs or []), out


for r in range(runs):
    cut = 250
    root = os.path.join(tempfile.gettempdir(), "prof_bm25idx")
    shutil.rmtree(root, ignore_errors=True)
    phases = {}

    w, j, _ = jobs_between(lambda: retrieval.write_bm25_index(
        docs.filter(F.col("doc_id") < cut), "doc_id", "text", root))
    phases["write"] = (round(w, 2), j)
    w, j, _ = jobs_between(lambda: retrieval.append_to_bm25_index(
        docs.filter(F.col("doc_id") >= cut), "doc_id", "text", root))
    phases["append"] = (round(w, 2), j)

    def load_and_query():
        postings, doc_stats, corpus_stats = retrieval.load_bm25_index(
            spark, root)
        queries = spark.createDataFrame(
            [(0, "hash join fast")], ["qid", "qtext"])
        res = retrieval.bm25_topk(
            postings, doc_stats, corpus_stats, queries, "qid", "qtext", k=10)
        res.write.format("noop").mode("overwrite").save()

    w, j, _ = jobs_between(load_and_query)
    phases["load_topk"] = (round(w, 2), j)
    total = round(sum(p[0] for p in phases.values()), 2)
    print(f"run {r}: total={total}s  " + "  ".join(
        f"{k}={v[0]}s/{v[1]}jobs" for k, v in phases.items()))

spark.stop()
