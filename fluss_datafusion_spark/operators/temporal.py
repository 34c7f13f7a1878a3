"""Event-time temporal table join (Flink's ``FOR SYSTEM_TIME AS OF
left.event_time`` versioned-table join): each fact row joins the
dimension VERSION that was current at the fact's OWN event time — not
today's snapshot (that's the processing-time lookup join,
streaming/events.lookup_enrich_sink) and not one global as-of anchor
(that's ``catalog.read(as_of_seq=...)``).

The reference exposes only the current-snapshot read of a PK table
(src/provider.rs:336-353); here the log-structured history the engine
already keeps (``__seq__`` stamps + per-statement commit clocks in
``_commits.json``) IS the versioned table, so the join needs no extra
storage:

1. ``table_history``: one row per (key, statement-version) — the last
   write each statement made per key, stamped with the statement seq
   and its wall-clock commit time; tombstones kept and flagged.
2. ``temporal_join``: an as-of join (operators/asof.py — the single
   sort-merge-pass union trick, no pair explosion) of facts into that
   history on (key, version_ts <= fact_ts); a fact landing on a
   tombstoned interval gets NULL attributes, exactly like joining the
   dimension as it stood then.

Scale shape: history derivation is one per-key window over the log
(the same pass merge-on-read makes anyway); the join is one
shuffle+sort on (key, ts).  Versions-per-key is bounded by compaction,
which also sets the earliest joinable time — facts older than the
compaction floor see the floor state (documented lakehouse semantics).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluss_datafusion_spark.operators.asof import asof_join

_SEQ = "__seq__"
_SUB = "__sub__"
_DEL = "__del__"


def table_history(catalog, name: str) -> DataFrame:
    """(logical columns..., __valid_from_seq__, __valid_from_ts__,
    __tombstone__): every per-statement version of every key, valid
    from its commit instant until the key's next version."""
    spec = catalog.get_table(name)
    if not spec.has_primary_key:
        raise ValueError(
            f"temporal join requires a primary-key table; "
            f"{spec.qualified_name} is an append-only log"
        )
    log = catalog._log_df(spec)
    pk = list(spec.primary_key)
    # within one statement the last write per key wins (the engine's
    # upsert rule, catalog.insert)
    w = Window.partitionBy(*pk, _SEQ).orderBy(F.col(_SUB).desc())
    versions = (
        log.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__", _SUB)
    )
    commits = catalog._load_commits(spec)
    if not commits:
        raise ValueError(
            f"{spec.qualified_name} has no commit clock; cannot anchor "
            "versions in time"
        )
    commit_rows = [
        (int(seq), datetime.fromtimestamp(ts, tz=timezone.utc).replace(tzinfo=None))
        for seq, ts in sorted(commits.items())
    ]
    commit_df = catalog.spark.createDataFrame(
        commit_rows, f"{_SEQ} long, __valid_from_ts__ timestamp"
    )
    cols = [c.name for c in spec.columns]
    return versions.join(F.broadcast(commit_df), _SEQ).select(
        *cols,
        F.col(_SEQ).alias("__valid_from_seq__"),
        "__valid_from_ts__",
        F.coalesce(F.col(_DEL), F.lit(False)).alias("__tombstone__"),
    )


def temporal_join(
    facts: DataFrame,
    fact_ts_col: str,
    history: DataFrame,
    on: Sequence[str],
    value_cols: Optional[List[str]] = None,
    use_seq: bool = False,
    fact_seq_col: Optional[str] = None,
) -> DataFrame:
    """Join each fact row to the dimension version current at its event
    time (``use_seq=True``: at its statement seq — the exactly-
    reproducible form; wall-clock ties between sub-second commits make
    seq anchoring the right choice for replay/tests).

    Returns the facts with the dimension's value columns appended;
    NULL where no version existed yet or the key was deleted at that
    instant."""
    on = list(on)
    anchor = "__valid_from_seq__" if use_seq else "__valid_from_ts__"
    left_anchor = fact_seq_col if use_seq else fact_ts_col
    if use_seq and fact_seq_col is None:
        raise ValueError("use_seq=True needs fact_seq_col")
    if value_cols is None:
        value_cols = [
            c
            for c in history.columns
            if c not in on
            and c not in ("__valid_from_seq__", "__valid_from_ts__", "__tombstone__")
        ]
    joined = asof_join(
        facts,
        history,
        on,
        left_ts=left_anchor,
        right_ts=anchor,
        right_value_cols=value_cols + ["__tombstone__"],
    )
    # a fact whose matched version is a tombstone saw a deleted key:
    # blank the attributes (the dimension had no row then)
    out = joined
    for c in value_cols:
        out = out.withColumn(
            c, F.when(F.col("__tombstone__"), F.lit(None)).otherwise(F.col(c))
        )
    return out.drop("__tombstone__")


def temporal_enrich(
    catalog,
    facts: DataFrame,
    fact_ts_col: str,
    dim_table: str,
    on: Sequence[str],
    value_cols: Optional[List[str]] = None,
) -> DataFrame:
    """One-call event-time enrichment against an engine PK table."""
    return temporal_join(
        facts, fact_ts_col, table_history(catalog, dim_table), on, value_cols
    )


def scd2_versions(
    history: DataFrame,
    keys: Sequence[str],
    track_cols: Optional[Sequence[str]] = None,
    seq_col: str = "__valid_from_seq__",
    ts_col: Optional[str] = "__valid_from_ts__",
    tombstone_col: str = "__tombstone__",
) -> DataFrame:
    """Fold a per-key version stream into a Type-2 slowly-changing
    dimension (Kimball SCD2; the Delta Live Tables ``APPLY CHANGES ...
    STORED AS SCD TYPE 2`` shape): one row per (key, attribute
    version) with ``valid_from`` / ``valid_to`` / ``is_current`` /
    ``version``.

    Semantics (the standard warehouse contract):

    - a new version OPENS only when a TRACKED attribute actually
      changes (null-safely) — an upsert that rewrites identical values
      is suppressed, so churn-heavy CDC feeds don't explode the
      dimension;
    - a delete CLOSES the key's open version (``valid_to`` = the
      delete's anchor) without emitting a row of its own; a later
      re-insert opens a fresh version (rebirth), even with the
      pre-delete attribute values;
    - ``valid_to`` is NULL on the open version; ``is_current`` is true
      exactly there; ``version`` numbers the key's surviving versions
      from 1;
    - untracked columns report the version-opener's values.

    Scale shape: two window passes over (key, seq) — ONE shuffle on
    the key, no joins, no driver state; versions-per-key is bounded by
    the upstream feed (for engine tables, by compaction).  The input
    is any frame with one row per (key, seq) plus a tombstone flag —
    ``table_history`` produces exactly this; any Debezium/CDF-shaped
    feed reduces to it with one aggregation.
    """
    keys = list(keys)
    anchors = [seq_col] + ([ts_col] if ts_col else [])
    if track_cols is None:
        track_cols = [
            c
            for c in history.columns
            if c not in keys and c not in anchors and c != tombstone_col
        ]
    track_cols = list(track_cols)
    w = Window.partitionBy(*keys).orderBy(seq_col)
    tomb = F.coalesce(F.col(tombstone_col), F.lit(False))
    prev_tomb = F.lag(tomb).over(w)
    is_first = F.lag(F.col(seq_col)).over(w).isNull()
    attrs_same = F.lit(True)
    for c in track_cols:
        attrs_same = attrs_same & F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    opens = (
        # first event opens iff it's a real row (a leading tombstone —
        # a delete of a key never seen — anchors nothing)
        (is_first & ~tomb)
        # alive/dead flip always matters: close-by-delete and rebirth
        | (~is_first & (tomb != prev_tomb))
        # alive→alive: only a tracked-attribute change opens a version
        | (~is_first & ~tomb & ~prev_tomb & ~attrs_same)
    )
    kept = history.withColumn("__scd_open__", opens).filter("__scd_open__")
    wk = Window.partitionBy(*keys).orderBy(seq_col)
    kept = kept.withColumn("__valid_to_seq__", F.lead(F.col(seq_col)).over(wk))
    if ts_col:
        kept = kept.withColumn("__valid_to_ts__", F.lead(F.col(ts_col)).over(wk))
    out = kept.filter(~tomb).withColumn(
        "__version__", F.row_number().over(wk).cast("int")
    )
    payload = [c for c in history.columns if c not in anchors and c != tombstone_col]
    return out.select(
        *payload,
        F.col(seq_col),
        F.col("__valid_to_seq__"),
        *([F.col(ts_col), F.col("__valid_to_ts__")] if ts_col else []),
        F.col("__valid_to_seq__").isNull().alias("__is_current__"),
        "__version__",
    )


def scd2_history(
    catalog,
    name: str,
    track_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """The engine PK table's full write history as a Type-2 dimension:
    ``table_history`` (the log the table already keeps — no extra
    storage, no CDC subscription) folded by ``scd2_versions``.  Version
    anchors carry BOTH the statement seq (exact, replayable) and the
    wall-clock commit instant (human-facing)."""
    spec = catalog.get_table(name)
    return scd2_versions(
        table_history(catalog, name),
        keys=list(spec.primary_key),
        track_cols=track_cols,
    )
