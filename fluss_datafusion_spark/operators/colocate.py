"""Co-located (shuffle-free) joins via Spark-native bucketed tables.

The engine catalog's ``__bkt__`` directory layout prunes point lookups,
but Spark can't *trust* it for join planning (no metastore bucketing
spec).  For the fact-to-fact joins that dominate at 100 TB, write both
sides ``bucketBy`` the join key into the session catalog once; every
subsequent equi-join on that key is planned WITHOUT any Exchange — the
tables' hash distribution is reused across queries, which is exactly
the amortization ``DISTRIBUTED BY ... INTO n BUCKETS`` promises.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    keys: Sequence[str],
    sorted_by: Sequence[str] = (),
) -> None:
    """Materialize ``df`` as a Spark-catalog bucketed (and optionally
    sort-ordered) table.  Joins/aggregations on ``keys`` between tables
    bucketed with the same (n_buckets, keys) run shuffle-free."""
    writer = df.write.bucketBy(n_buckets, *keys)
    if sorted_by:
        writer = writer.sortBy(*sorted_by)
    writer.mode("overwrite").saveAsTable(table)


def colocated_join(
    spark, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket keys.  The plan contains
    no shuffle when both sides were written with the same bucket spec
    (assert with plans.audit.shuffle_count == 0)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
