"""Data-quality expectations — the dbt-test / Great-Expectations
surface a pipeline gates a table release on, expressed as Spark plans:

- ``expect``: declarative per-column rules (not_null, unique,
  accepted_values, between, matches, row_count) evaluated into a
  violation report;
- ``expect_fk``: referential-integrity audit (child rows with no
  parent — the orphan count a lakehouse checks after independent
  ingests).

Scale shape: every non-uniqueness rule is a CONDITIONAL SUM in one
shared aggregation — one corpus scan for the whole suite, no UDFs.
Uniqueness rules each add one exact count_distinct aggregation, kept
SEPARATE deliberately: multiple count(DISTINCT) expressions in a single
aggregate make Catalyst plan an Expand (one input duplicate per
distinct clause — the q45 lesson), so each runs as its own
2-aggregation plan and the 1-row results cross-join back.  The FK audit
is a left-anti join counted map-side.

No reference analog (zuston/fluss-datafusion has no quality surface);
north-star extension the same tables get audited with.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KINDS = (
    "not_null",
    "unique",
    "accepted_values",
    "between",
    "matches",
    "row_count",
)


def _violation_expr(rule: Dict):
    kind = rule["kind"]
    col = F.col(rule["column"]) if rule.get("column") else None
    if kind == "not_null":
        return col.isNull()
    if kind == "accepted_values":
        vals = list(rule["values"])
        return col.isNotNull() & ~col.isin(vals)
    if kind == "between":
        lo, hi = rule["lo"], rule["hi"]
        return col.isNotNull() & (
            (col < F.lit(lo)) | (col > F.lit(hi))
        )
    if kind == "matches":
        return col.isNotNull() & ~col.rlike(rule["pattern"])
    raise ValueError(f"unknown rule kind: {kind}")


def expect(df: DataFrame, rules: Sequence[Dict]) -> DataFrame:
    """Evaluate an expectation suite; one report row per rule:
    (rule, column, n_violations, n_rows, passed).

    Rule dicts: {"kind": "not_null", "column": c} ·
    {"kind": "unique", "columns": [c, ...]} ·
    {"kind": "accepted_values", "column": c, "values": [...]} ·
    {"kind": "between", "column": c, "lo": x, "hi": y} ·
    {"kind": "matches", "column": c, "pattern": regex} ·
    {"kind": "row_count", "min": n[, "max": m]} — violations for
    row_count are |shortfall/excess| so the report stays numeric.

    ``passed`` = n_violations == 0.  NULLs violate not_null only (the
    SQL convention: range/set/regex rules skip NULLs)."""
    rules = list(rules)
    for r in rules:
        if r["kind"] not in _KINDS:
            raise ValueError(f"unknown rule kind: {r['kind']}")
    scan_aggs = [F.count(F.lit(1)).alias("__n__")]
    labels: List = []
    for i, r in enumerate(rules):
        if r["kind"] in ("unique", "row_count"):
            continue
        scan_aggs.append(
            F.sum(_violation_expr(r).cast("long")).alias(f"__v{i}__")
        )
    base = df.agg(*scan_aggs)
    for i, r in enumerate(rules):
        if r["kind"] != "unique":
            continue
        cols = [F.col(c) for c in r["columns"]]
        # exact distinct per uniqueness rule, its own aggregation (see
        # module docstring: multiple distincts in one agg -> Expand)
        d = df.agg(
            F.count_distinct(*cols).alias(f"__d{i}__"),
            F.sum(
                F.when(
                    F.greatest(*[c.isNull() for c in cols])
                    if len(cols) > 1
                    else cols[0].isNull(),
                    1,
                ).otherwise(0)
            ).alias(f"__dn{i}__"),
        )
        base = base.crossJoin(F.broadcast(d))
    row_exprs = []
    for i, r in enumerate(rules):
        kind = r["kind"]
        column = (
            r.get("column")
            or (",".join(r["columns"]) if r.get("columns") else None)
        )
        if kind == "unique":
            # duplicates = non-null rows minus distinct combos (NULL
            # keys are not comparable; count_distinct skips them)
            viol = (
                F.col("__n__")
                - F.coalesce(F.col(f"__dn{i}__"), F.lit(0))
                - F.col(f"__d{i}__")
            )
        elif kind == "row_count":
            lo = r.get("min", 0)
            hi = r.get("max")
            shortfall = F.greatest(F.lit(lo) - F.col("__n__"), F.lit(0))
            excess = (
                F.greatest(F.col("__n__") - F.lit(hi), F.lit(0))
                if hi is not None
                else F.lit(0)
            )
            viol = shortfall + excess
        else:
            viol = F.col(f"__v{i}__")
        row_exprs.append(
            F.struct(
                F.lit(kind).alias("rule"),
                F.lit(column).cast("string").alias("column"),
                viol.cast("long").alias("n_violations"),
                F.col("__n__").alias("n_rows"),
                (viol == 0).alias("passed"),
            )
        )
    return base.select(
        F.explode(F.array(*row_exprs)).alias("__r__")
    ).select("__r__.*")


def expect_fk(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
) -> DataFrame:
    """Referential-integrity audit: count child rows whose non-NULL key
    has no parent (NULL FKs are legitimate SQL and not orphans).  One
    left-anti join — Catalyst broadcasts a small parent on stats —
    counted map-side.  Returns one row: (rule='fk', column, n_orphans,
    n_rows, passed)."""
    n_rows = child.count()
    orphans = (
        child.select(F.col(child_col).alias("__k__"))
        .filter(F.col("__k__").isNotNull())
        .join(
            parent.select(F.col(parent_col).alias("__k__")).distinct(),
            "__k__",
            "left_anti",
        )
        .count()
    )
    spark = child.sparkSession
    return spark.createDataFrame(
        [("fk", child_col, orphans, n_rows, orphans == 0)],
        "rule string, column string, n_orphans long, n_rows long,"
        " passed boolean",
    )


def quarantine_split(
    df: DataFrame, rules: Sequence[Dict]
) -> "tuple[DataFrame, DataFrame]":
    """Row-level expectation routing: (clean, quarantined) where a row
    quarantines iff it violates ANY row-scoped rule (not_null /
    accepted_values / between / matches — unique and row_count are
    table-scoped and refuse here), and the quarantined frame carries a
    ``failed_rules`` array naming every violated rule.  Both branches
    are single-pass projections of the same violation expressions the
    ``expect`` report aggregates — zero UDFs, no shuffle, linear at
    100 TB."""
    names, exprs = [], []
    for rule in rules:
        if rule["kind"] in ("unique", "row_count"):
            raise ValueError(
                f"{rule['kind']} is table-scoped; quarantine_split routes"
                " rows — audit it with expect() instead"
            )
        name = rule.get("name") or f"{rule['kind']}_{rule.get('column')}"
        names.append(name)
        exprs.append(_violation_expr(rule))
    failed = F.array_compact(
        F.array(
            *[
                F.when(e, F.lit(n)).otherwise(F.lit(None))
                for n, e in zip(names, exprs)
            ]
        )
    )
    tagged = df.withColumn("failed_rules", failed)
    clean = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    quarantined = tagged.filter(F.size("failed_rules") > 0)
    return clean, quarantined


def quarantine_sink(
    stream: DataFrame,
    catalog,
    clean_table: str,
    dead_letter_table: str,
    rules: Sequence[Dict],
    checkpoint: str,
    metrics=None,
):
    """Continuous dead-letter routing — the streaming form of
    ``quarantine_split`` (Delta Live Tables' expectations-with-DROP
    pattern): per micro-batch, rows that pass every row-scoped rule
    upsert/append into ``clean_table``; violators land in
    ``dead_letter_table`` with their ``failed_rules`` array (stringed
    — the dead-letter schema stays engine-typed) so they can be
    inspected, fixed and replayed.  Both writes go through the
    engine's insert path (seq/constraints/upsert semantics); the
    stream itself is stateless, so restarts recover from the
    checkpoint.  ``metrics`` records {batch_id, n_clean, n_quarantined}
    per batch."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        clean, quarantined = quarantine_split(batch_df, rules)
        dead = quarantined.withColumn(
            "failed_rules", F.array_join("failed_rules", ",")
        )
        n_clean = catalog.insert(clean_table, clean)
        n_quarantined = catalog.insert(dead_letter_table, dead)
        if metrics is not None:
            metrics.append(
                {
                    "batch_id": batch_id,
                    "n_clean": n_clean,
                    "n_quarantined": n_quarantined,
                }
            )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
