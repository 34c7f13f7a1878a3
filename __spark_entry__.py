"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are built from the corpus registries in
``fluss_datafusion_spark.corpus`` — one entry per implemented operator
from SURVEY.md §2 (Tier B relational surface + north-star
LLM-data-pipeline operators).  ``entry()`` runs the flagship six-table
join (TPC-H Q5 analog) at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fluss_datafusion_spark import corpus  # noqa: E402

corpus.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from fluss_datafusion_spark.corpus.relational import q05_local_supplier

    return q05_local_supplier(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(corpus.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(corpus.ORACLES)
