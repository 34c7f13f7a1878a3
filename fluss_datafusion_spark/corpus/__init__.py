"""Query corpus: every operator capability from SURVEY.md §2, as
(PySpark implementation, DuckDB oracle SQL) pairs.

This is the engine's executable capability inventory.  The driver runs
``__spark_entry__.queries()`` / ``oracle_sql()`` which are built from the
registries here.  Tier B (relational) queries exercise the surface the
reference delegates to DataFusion (src/cli.rs:116-122 — every unrewritten
SQL string); we get the same surface from Spark SQL / Catalyst.
North-star modules add the LLM-data-pipeline operators.

Conventions (driver compare = row-count + schema + order-insensitive
value hash over name-sorted columns):
- every computed column is aliased identically in Spark and oracle SQL;
- floating aggregates are rounded on both sides (sum-order across
  engines differs in the last bits);
- integer aggregates are CAST to BIGINT in DuckDB (its SUM yields
  HUGEINT, Spark yields BIGINT);
- raw event timestamps are CAST(ts AS TIMESTAMP) in DuckDB (its
  TIMESTAMP_NS would keep ns precision; Spark truncates to µs).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

QUERIES: Dict[str, Callable] = {}
ORACLES: Dict[str, str] = {}

# The driver's per-round correctness pass covers the FIRST 50 registered
# queries.  Core entries (QUERIES) are sized to exactly that window —
# every north-star / streaming differentiator plus one representative
# per Tier B capability.  ``extended=True`` entries are the long tail of
# per-function variants: same oracle discipline, checked by pytest and
# tools/check_correctness.py, but kept out of the driver window so the
# differentiating operators always get hard-signal rows.
EXTRA_QUERIES: Dict[str, Callable] = {}
EXTRA_ORACLES: Dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None, extended: bool = False):
    """Register a corpus query.  ``oracle=None`` marks a genuinely
    non-SQL-expressible op (driver falls back to a rows-only check);
    ``extended=True`` registers into the pytest-only registry."""

    q, o = (EXTRA_QUERIES, EXTRA_ORACLES) if extended else (QUERIES, ORACLES)

    def deco(fn):
        q[name] = fn
        if oracle is not None:
            o[name] = oracle
        fn.__corpus_name__ = name
        return fn

    return deco


def t(spark, sf_dir: str, name: str):
    """Load one testdata table as a DataFrame (ns-timestamp safe), and pin
    the session timezone to UTC so timestamp results are deterministic."""
    from fluss_datafusion_spark.session import read_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_table(spark, os.path.join(sf_dir, f"{name}.parquet"))


def v(spark, sf_dir: str, *names: str) -> None:
    """Register testdata tables as temp views for spark.sql-based queries."""
    for name in names:
        t(spark, sf_dir, name).createOrReplaceTempView(name)


def load_all() -> None:
    """Import every corpus module so their registrations run.

    Registration order is part of the driver contract: the correctness
    pass checks the first 50 registered queries, so the north-star and
    streaming differentiators register BEFORE the relational surface
    (VERDICT r1 finding: they previously registered last and fell
    outside the checked window)."""
    from fluss_datafusion_spark.corpus import northstar  # noqa: F401
    from fluss_datafusion_spark.corpus import streaming_batch  # noqa: F401
    from fluss_datafusion_spark.corpus import relational  # noqa: F401
