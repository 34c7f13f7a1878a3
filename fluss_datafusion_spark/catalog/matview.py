"""Incrementally-maintained materialized views over PK tables.

The lakehouse pattern Delta Live Tables / Materialize / Flink dynamic
tables provide: a GROUP BY aggregate view whose stored result is kept
current by applying the source table's CHANGE STREAM, not by
re-aggregating the corpus.  This is the natural consumer of the
engine's table↔changelog duality (``catalog.read_changes`` — the
bounded CDC read): each refresh processes only the statements since
the view's last checkpoint, so refresh cost is O(changes), not
O(source).

Supported view shape (the classic incrementally-maintainable algebra):

    SELECT g1, g2, agg1 AS a1, ... FROM src [WHERE pred] GROUP BY g1, g2

with the self-maintainable aggregates ``count(*)``, ``count(x)``,
``sum(x)``, ``avg(x)`` — a +I/+U image contributes positively, a -U/-D
image negatively, and group disappearance falls out of the hidden
per-group row count reaching zero — plus ``min(x)``/``max(x)`` via
BOUNDED RESCAN: inserts fold into the stored extremum directly
(least/greatest), and a retraction at-or-past the stored extremum
flags just that group for recomputation from the source (a
semi-join-restricted scan touching only the flagged groups' rows —
the standard IVM treatment of non-self-maintainable aggregates; see
Gupta & Mumick, "Maintenance of Materialized Views", 1995).  GROUP BY
columns become the view table's PRIMARY KEY, so they must be non-null
in every source row the WHERE clause admits (enforced at build; add a
NOT NULL conjunct to the WHERE to carve out null groups).

Delta-maintenance math per refresh window:

    sign(op)   = +1 for +I/+U, -1 for -U/-D
    d_count    = SUM(sign)                        (per group)
    d_sum(x)   = SUM(sign * x)   [nulls drop out via the count]
    new        = old + d          (changed groups only: the delta
                                   LEFT-joins the view, never a full
                                   view scan at refresh)
    d_min(x)   = least(old, min over +images); rescan the group iff
                 min over -images <= stored min (symmetric for max)
    group gone = hidden row count hits 0 → PK tombstone

SQL sums over zero non-null values are NULL, so every sum/avg carries a
hidden non-null count; ``avg`` additionally stores its hidden sum and
recomputes ``sum/count`` for the groups a refresh touches.  Floating
sums accumulate the usual ± rounding under retraction; exact types
(int/bigint/decimal) maintain exactly.  If the source compacted past
the view's checkpoint, the bounded CDC read refuses and the refresh
transparently falls back to a full rebuild — the same contract as any
CDC consumer checkpointed below the floor.

Scale shape: a refresh is one changelog derivation filtered to the seq
window (a parquet scan + one window pass), one map-side-combined delta
aggregation keyed on the group columns, one broadcast-or-shuffle LEFT
join of (tiny) delta against the view, and two appends (upserts +
tombstones).  Nothing corpus-sized is recomputed, collected, or
broadcast.

No reference analog (zuston/fluss-datafusion has neither changelogs nor
views); part of the lakehouse surface beyond the reference.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluss_datafusion_spark.catalog.metadata import (
    ColumnSpec,
    TableSpec,
    spark_type_to_ddl,
)

_MV_FILE = "_mv.json"
_STAR = "__mv_star__"  # hidden per-group row count (group liveness)

_SELECT_RE = re.compile(
    r"^\s*SELECT\s+(?P<items>.*?)\s+FROM\s+(?P<src>(?:`[^`]*`|[\w.])+)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"\s+GROUP\s+BY\s+(?P<groups>.*?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_AGG_RE = re.compile(
    r"^(?P<fn>count|sum|avg|min|max)\s*\(\s*(?P<arg>\*|`?[\w]+`?)\s*\)"
    r"\s+AS\s+(?P<alias>`?[\w]+`?)\s*$",
    re.IGNORECASE,
)


def parse_matview_select(select_sql: str) -> Dict:
    """Parse the maintainable-view SELECT into
    {source, where, group_cols, aggs:[{fn, col, alias}]}."""
    match = _SELECT_RE.match(select_sql.strip().rstrip(";"))
    if not match:
        raise ValueError(
            "materialized views support exactly "
            "'SELECT cols, aggs FROM t [WHERE pred] GROUP BY cols': "
            f"{select_sql!r}"
        )
    strip = lambda s: s.strip().strip("`")  # noqa: E731
    group_cols = [strip(c) for c in match.group("groups").split(",")]
    aggs: List[Dict] = []
    seen_groups = []
    from fluss_datafusion_spark.catalog.ddl import _split_top_level

    for item in _split_top_level(match.group("items")):
        item = item.strip()
        agg = _AGG_RE.match(item)
        if agg:
            arg = agg.group("arg")
            fn = agg.group("fn").lower()
            if arg == "*" and fn != "count":
                raise ValueError(f"{fn}(*) is not a valid aggregate")
            aggs.append(
                {
                    "fn": fn,
                    "col": None if arg == "*" else strip(arg),
                    "alias": strip(agg.group("alias")),
                }
            )
        elif strip(item) in group_cols:
            seen_groups.append(strip(item))
        else:
            raise ValueError(
                f"unsupported select item {item!r}: must be a GROUP BY "
                "column or count/sum/avg(...) AS alias"
            )
    if seen_groups != group_cols:
        raise ValueError(
            "select list must lead with the GROUP BY columns in order "
            f"(got {seen_groups}, grouped by {group_cols})"
        )
    if not aggs:
        raise ValueError("materialized view needs at least one aggregate")
    names = group_cols + [a["alias"] for a in aggs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate output column names in {names}")
    return {
        "source": match.group("src").replace("`", ""),
        "where": (match.group("where") or "").strip() or None,
        "group_cols": group_cols,
        "aggs": aggs,
    }


def _physical_aggs(mv: Dict) -> List:
    """Aggregate Columns for the view's PHYSICAL schema, evaluated over
    (possibly sign-weighted) source rows.  Used by both the initial
    full build (sign=1) and the delta aggregation."""
    cols = [F.sum(F.lit(1)).alias(_STAR)]
    for a in mv["aggs"]:
        alias, c = a["alias"], a["col"]
        nn = (
            None
            if c is None
            else F.when(F.col(c).isNotNull(), 1).otherwise(0)
        )
        if a["fn"] == "count":
            cols.append(
                F.sum(F.lit(1) if nn is None else nn).alias(alias)
            )
        elif a["fn"] in ("min", "max"):
            # the extremum itself IS the physical state (NULL iff no
            # non-null value — min/max's own null semantics)
            agg_fn = F.min if a["fn"] == "min" else F.max
            cols.append(agg_fn(F.col(c)).alias(alias))
        else:  # sum / avg: hidden non-null count + raw sum
            cols.append(F.sum(nn).alias(f"__mv_cnt_{alias}"))
            cols.append(
                F.sum(F.when(F.col(c).isNotNull(), F.col(c))).alias(
                    f"__mv_sum_{alias}"
                )
            )
    return cols


def _user_projection(mv: Dict) -> List:
    """User-facing columns derived from the physical ones."""
    out = [F.col(c) for c in mv["group_cols"]]
    for a in mv["aggs"]:
        alias = a["alias"]
        if a["fn"] in ("count", "min", "max"):
            out.append(F.col(alias))
        elif a["fn"] == "sum":
            out.append(
                F.when(
                    F.col(f"__mv_cnt_{alias}") > 0, F.col(f"__mv_sum_{alias}")
                ).alias(alias)
            )
        else:  # avg
            out.append(
                (F.col(f"__mv_sum_{alias}") / F.col(f"__mv_cnt_{alias}"))
                .alias(alias)
            )
    return out


def _mv_path(catalog, name: str) -> str:
    return os.path.join(catalog.table_path(catalog.get_table(name)), _MV_FILE)


def _load_mv(catalog, name: str) -> Dict:
    try:
        with open(_mv_path(catalog, name)) as fh:
            return json.load(fh)
    except OSError:
        raise ValueError(f"{name} is not a materialized view") from None


def _save_mv(catalog, name: str, mv: Dict) -> None:
    path = _mv_path(catalog, name)
    with open(path + ".tmp", "w") as fh:
        json.dump(mv, fh)
    os.replace(path + ".tmp", path)


def _register_user_view(catalog, name: str, mv: Dict) -> None:
    """Re-register the session view so SELECT * FROM <mv> shows the
    user-facing columns (hidden __mv_* support columns projected
    away).  Must run after every write to the backing table, because
    the catalog's own registration exposes the physical schema."""
    spec = catalog.get_table(name)
    df = catalog.read(name).select(*_user_projection(mv))
    df.createOrReplaceTempView(catalog._view_name(spec))
    if spec.database == catalog.default_database:
        df.createOrReplaceTempView(spec.name)


def _full_state(catalog, mv: Dict) -> DataFrame:
    src = catalog.read(mv["source"])
    if mv["where"]:
        src = src.filter(F.expr(mv["where"]))
    return src.groupBy(*mv["group_cols"]).agg(*_physical_aggs(mv))


def create_matview(catalog, name: str, select_sql: str) -> int:
    """CREATE MATERIALIZED VIEW: parse, validate against the source,
    create the backing PK table, run the initial full build, checkpoint
    the source seq.  Returns the number of groups materialized."""
    mv = parse_matview_select(select_sql)
    src_spec = catalog.get_table(mv["source"])
    if not src_spec.has_primary_key:
        raise ValueError(
            "materialized views require a primary-key source (the "
            "changelog derivation needs PK semantics); "
            f"{src_spec.qualified_name} is a log table"
        )
    src_cols = {c.name for c in src_spec.columns}
    referenced = set(mv["group_cols"]) | {
        a["col"] for a in mv["aggs"] if a["col"] is not None
    }
    missing = referenced - src_cols
    if missing:
        raise ValueError(f"unknown source columns: {sorted(missing)}")

    # checkpoint BEFORE building: a concurrent write between checkpoint
    # and build is re-applied by the next refresh (idempotent per-seq
    # windows), never lost
    checkpoint = catalog.current_seq(mv["source"])
    state = _full_state(catalog, mv)
    null_groups = state
    for g in mv["group_cols"]:
        null_groups = null_groups.filter(F.col(g).isNull())
    if null_groups.limit(1).count() > 0:
        raise ValueError(
            "GROUP BY columns become the view's PRIMARY KEY and must be "
            "non-null; add e.g. 'col IS NOT NULL' to the WHERE clause"
        )

    cols = [
        ColumnSpec(
            name=f.name,
            type_name=spark_type_to_ddl(f.dataType),
            nullable=f.name not in mv["group_cols"],
        )
        for f in state.schema.fields
    ]
    db, table = catalog._resolve(name)
    catalog.create_table(
        TableSpec(
            database=db,
            name=table,
            columns=cols,
            primary_key=list(mv["group_cols"]),
            properties={"materialized_view": "true"},
        ),
        if_not_exists=False,
    )
    n = catalog.insert(name, state)
    mv["last_seq"] = checkpoint
    _save_mv(catalog, name, mv)
    _register_user_view(catalog, name, mv)
    return n


def refresh_matview(catalog, name: str) -> Dict[str, int]:
    """REFRESH MATERIALIZED VIEW: apply the source's bounded change
    stream since the last checkpoint.  Returns
    {"upserted": n, "deleted": n, "full_rebuild": 0|1}."""
    mv = _load_mv(catalog, name)
    spec = catalog.get_table(name)
    now = catalog.current_seq(mv["source"])
    if now <= mv["last_seq"]:
        _register_user_view(catalog, name, mv)
        return {"upserted": 0, "deleted": 0, "full_rebuild": 0}
    try:
        changes = catalog.read_changes(
            mv["source"], from_seq=mv["last_seq"], to_seq=now
        )
    except ValueError:
        # source compacted past our checkpoint: the exact change window
        # is gone — rebuild from the snapshot (the standard CDC-consumer
        # fallback), then checkpoint at now
        state = _full_state(catalog, mv).localCheckpoint()
        catalog.truncate_table(name)
        n = catalog.insert(name, state)
        mv["last_seq"] = now
        _save_mv(catalog, name, mv)
        _register_user_view(catalog, name, mv)
        return {"upserted": n, "deleted": 0, "full_rebuild": 1}

    if mv["where"]:
        changes = changes.filter(F.expr(mv["where"]))
    sign = F.when(F.col("op").isin("+I", "+U"), F.lit(1)).otherwise(F.lit(-1))

    delta_cols = [F.sum(sign).alias(f"__d_{_STAR}")]
    for a in mv["aggs"]:
        alias, c = a["alias"], a["col"]
        nn_sign = (
            sign
            if c is None
            else F.when(F.col(c).isNotNull(), sign).otherwise(0)
        )
        if a["fn"] == "count":
            delta_cols.append(F.sum(nn_sign).alias(f"__d_{alias}"))
        elif a["fn"] in ("min", "max"):
            # inserted-side extremum maintains the easy direction; the
            # retracted-side extremum decides whether the group needs a
            # bounded rescan (a retraction at-or-past the stored
            # extremum invalidates it — the non-self-maintainable case)
            agg_fn = F.min if a["fn"] == "min" else F.max
            delta_cols.append(
                agg_fn(F.when(sign > 0, F.col(c))).alias(f"__d_ins_{alias}")
            )
            delta_cols.append(
                agg_fn(F.when(sign < 0, F.col(c))).alias(f"__d_ret_{alias}")
            )
        else:
            delta_cols.append(F.sum(nn_sign).alias(f"__d_cnt_{alias}"))
            delta_cols.append(
                F.sum(
                    F.when(F.col(c).isNotNull(), sign * F.col(c)).otherwise(
                        F.lit(None)
                    )
                ).alias(f"__d_sum_{alias}")
            )
    delta = changes.groupBy(*mv["group_cols"]).agg(*delta_cols)

    # only groups the window touched: delta LEFT-joins the view state
    merged = delta.join(catalog.read(name), mv["group_cols"], "left")
    add = lambda old, d: (  # noqa: E731
        F.coalesce(F.col(old), F.lit(0)) + F.coalesce(F.col(d), F.lit(0))
    )
    new_cols = {_STAR: add(_STAR, f"__d_{_STAR}")}
    rescan_flags = []
    for a in mv["aggs"]:
        alias = a["alias"]
        if a["fn"] == "count":
            new_cols[alias] = add(alias, f"__d_{alias}")
        elif a["fn"] in ("min", "max"):
            # maintained path: fold the inserted-side extremum in
            # (least/greatest skip NULLs, matching min/max semantics)
            fold = F.least if a["fn"] == "min" else F.greatest
            new_cols[alias] = fold(F.col(alias), F.col(f"__d_ins_{alias}"))
            ret = F.col(f"__d_ret_{alias}")
            breaches = (
                ret <= F.col(alias) if a["fn"] == "min" else ret >= F.col(alias)
            )
            rescan_flags.append(
                ret.isNotNull() & (F.col(alias).isNull() | breaches)
            )
        else:
            new_cols[f"__mv_cnt_{alias}"] = add(
                f"__mv_cnt_{alias}", f"__d_cnt_{alias}"
            )
            new_cols[f"__mv_sum_{alias}"] = F.when(
                new_cols[f"__mv_cnt_{alias}"] > 0,
                add(f"__mv_sum_{alias}", f"__d_sum_{alias}"),
            )
    needs_rescan = F.lit(False)
    for flag in rescan_flags:
        needs_rescan = needs_rescan | flag
    merged = merged.select(
        *mv["group_cols"],
        F.col(_STAR).isNotNull().alias("__mv_existed__"),
        needs_rescan.alias("__mv_rescan__"),
        *[c.alias(n) for n, c in new_cols.items()],
    ).localCheckpoint()  # pin against the self-read below

    schema_order = [c.name for c in spec.columns]
    upserts = merged.filter(
        (F.col(_STAR) > 0) & ~F.col("__mv_rescan__")
    ).select(*schema_order)
    # bounded rescan: groups whose stored extremum was retracted are
    # recomputed from the source — a semi-join-restricted scan touching
    # only those groups' rows, never the whole view (dead groups skip
    # the rescan: they are tombstoned regardless)
    rescan_keys = merged.filter(
        (F.col(_STAR) > 0) & F.col("__mv_rescan__")
    ).select(*mv["group_cols"])
    src = catalog.read(mv["source"])
    if mv["where"]:
        src = src.filter(F.expr(mv["where"]))
    rescanned = (
        src.join(rescan_keys, mv["group_cols"], "left_semi")
        .groupBy(*mv["group_cols"])
        .agg(*_physical_aggs(mv))
        .select(*schema_order)
    )
    n_up = catalog.insert(name, upserts.unionByName(rescanned))
    # phantom groups (born and fully retracted inside one window, or
    # nulled out by WHERE) get no tombstone — they were never in the view
    dead = merged.filter(
        (F.col(_STAR) <= 0) & F.col("__mv_existed__")
    ).select(
        *[
            (
                F.col(f.name)
                if f.name in spec.primary_key
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in spec.spark_schema().fields
        ]
    )
    from fluss_datafusion_spark.catalog.catalog import _footer_row_count

    n_del = _footer_row_count(catalog._append_log(spec, dead, deleted=True))
    mv["last_seq"] = now
    _save_mv(catalog, name, mv)
    _register_user_view(catalog, name, mv)
    return {"upserted": n_up, "deleted": n_del, "full_rebuild": 0}


def is_matview(catalog, name: str) -> bool:
    return os.path.exists(_mv_path(catalog, name))


def matview_refresh_sink(catalog, name: str, checkpoint: str):
    """CONTINUOUS materialized-view maintenance: follow the source
    table's log directory as a file stream and re-run
    :func:`refresh_matview` on every new commit — the Delta Live
    Tables / Materialize "always fresh" mode, driven by the same
    exactly-once machinery as manual REFRESH.

    The stream is purely the TRIGGER: each micro-batch's content is
    discarded, and the refresh itself reads the bounded CDC window from
    the view's seq checkpoint, so duplicate triggers, replays after
    restart, and commits that race a running batch are all absorbed by
    the checkpoint (a refresh that sees no new seq is a no-op).  That
    keeps one delta implementation — no drift between batch and
    streaming maintenance.

    Runs with availableNow (catch up over the retained log, then stop —
    call again to catch up further); swap the trigger for a continuous
    deployment.  Returns the StreamingQuery.
    """
    mv = _load_mv(catalog, name)
    src_spec = catalog.get_table(mv["source"])
    stream = (
        catalog.spark.readStream.schema(catalog._stored_schema(src_spec))
        .parquet(catalog.table_path(src_spec))
        .select("__seq__")
    )

    def _apply(batch_df, batch_id):
        refresh_matview(catalog, name)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
