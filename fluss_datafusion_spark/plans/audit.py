"""Physical-plan inspection: the facts that decide whether a plan
survives a 100x scale-up — filter pushdown into the scan, column-pruned
read schema, join strategy selection, shuffle count.

Used by tests (assert a plan property, not just a result) and by
``tools/explain_audit.py`` (writes PLANS.md).
"""

from __future__ import annotations

import re
from typing import Dict, List

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    """Executed-plan string (AdaptiveSparkPlan skeleton: join strategies,
    exchanges and scan metadata are decided; NOTE under AQE the string
    never carries WholeStageCodegen span annotations — a `df.write`
    creates its own QueryExecution, so this df's plan never finalizes —
    which is why no codegen metric is reported here)."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_facts(df: DataFrame) -> Dict:
    text = plan_text(df)
    return {
        "pushed_filters": sorted(
            # tolerate Spark's scan-metadata truncation (long Location
            # strings push the closing bracket past
            # spark.sql.maxMetadataStringLength and it never appears)
            {
                m.rstrip(". ")
                for m in re.findall(r"PushedFilters: \[([^\n\]]*)\]?", text)
                if m.strip(". ")
            }
        ),
        "read_schemas": sorted(set(re.findall(r"ReadSchema: struct<([^>]*)>", text))),
        "joins": sorted(
            set(
                re.findall(
                    r"(\w*HashJoin\w*|SortMergeJoin|BroadcastNestedLoopJoin|CartesianProduct)",
                    text,
                )
            )
        ),
        "exchanges": len(re.findall(r"Exchange ", text)),
        "text": text,
    }


def read_columns(df: DataFrame) -> List[List[str]]:
    """Column lists actually read from each scan (pruning evidence)."""
    return [
        [c.split(":")[0] for c in rs.split(",") if c]
        for rs in plan_facts(df)["read_schemas"]
    ]


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True if some predicate on ``column`` reached the data source.
    Word-boundary match — a bare substring test would false-positive
    short names (e.g. 'id' inside IsNotNull(vec_id))."""
    pat = re.compile(rf"[(,]\s*{re.escape(column)}\s*[),]")
    return any(pat.search(p) for p in plan_facts(df)["pushed_filters"])


def uses_broadcast_join(df: DataFrame) -> bool:
    return any("Broadcast" in j for j in plan_facts(df)["joins"])


def shuffle_count(df: DataFrame) -> int:
    return plan_facts(df)["exchanges"]
