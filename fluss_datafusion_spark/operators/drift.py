"""Distribution-drift detection between two corpus snapshots.

The data-quality gate a training pipeline runs before a new corpus
version ships: per feature, compare the CURRENT snapshot's value
distribution against a REFERENCE snapshot (the last blessed version)
and flag features whose drift statistic crosses a threshold.

Statistics (the standard monitoring trio, all closed-form over one
binned histogram pair):

* **PSI** (population stability index): Σ (cᵢ − rᵢ) · ln(cᵢ / rᵢ) over
  bins i — the industry screen (<0.1 stable, 0.1–0.25 moderate, >0.25
  major shift).
* **KL divergence** D(cur ‖ ref) = Σ cᵢ · ln(cᵢ / rᵢ).
* **Total variation** ½ Σ |cᵢ − rᵢ| — bounded in [0, 1], robust to
  empty bins.

Binning is FIXED-WIDTH over the reference snapshot's [min, max]
(deterministic — quantile binning would make the result depend on
sketch internals): bin(x) = clamp(⌊(x − min) / w⌋, 0, B−1) with
w = (max − min) / B; values outside the reference range clamp into the
edge bins (out-of-range mass is exactly what drift detection must
see), and NULLs get their own bin.  Both sides' histograms are
ε-smoothed (fractions floored at ``eps``) so empty bins keep PSI/KL
finite — the standard practice, and replicable in any SQL engine,
which is what the DuckDB oracle does.

Scale shape: ONE aggregation over each snapshot — every feature's bin
id is computed in the same projection (pure JVM expressions from the
broadcast min/max literals), stacked into (column, bin) rows by an
inline explode, and counted with full map-side combine.  The shuffle
key space is |columns| × (bins + 1): constant-sized regardless of
corpus size, so the reduce side is trivially small at any scale.  No
UDFs, no driver-side data.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bin id reserved for NULLs (bins 0..n_bins-1 hold values)
_NULL_BIN = -1


def _bin_edges(ref: DataFrame, columns: Sequence[str]):
    """{col: (min, max)} from ONE aggregation over the reference."""
    aggs = []
    for c in columns:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    row = ref.agg(*aggs).collect()[0]
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in columns}


def _bin_expr(c: str, mn, mx, n_bins: int):
    """The shared fixed-width bin id expression (see module docstring);
    also the streaming monitor's binning, so batch and stream agree by
    construction."""
    x = F.col(c).cast("double")
    if mn is None or mx is None or mx <= mn:
        # degenerate reference (constant or all-NULL column): one
        # value bin — everything that equals the constant lands in
        # bin 0, anything else clamps there too; drift then shows
        # only through the NULL bin, documented behavior
        return F.when(x.isNull(), F.lit(_NULL_BIN)).otherwise(F.lit(0))
    width = (mx - mn) / n_bins
    raw = F.floor((x - F.lit(mn)) / F.lit(width)).cast("int")
    return F.when(x.isNull(), F.lit(_NULL_BIN)).otherwise(
        F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw))
    )


def _histogram(
    df: DataFrame, columns: Sequence[str], edges, n_bins: int
) -> DataFrame:
    """(column, bin, n) — every feature binned in one scan + one
    map-side-combined count on the tiny (column, bin) key space."""
    structs = []
    for c in columns:
        mn, mx = edges[c]
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                _bin_expr(c, mn, mx, n_bins).alias("bin"),
            )
        )
    return (
        df.select(F.explode(F.array(*structs)).alias("__cb__"))
        .groupBy(
            F.col("__cb__.column").alias("column"),
            F.col("__cb__.bin").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    columns: Sequence[str],
    n_bins: int = 10,
    eps: float = 1e-6,
    psi_threshold: float = 0.25,
) -> DataFrame:
    """Per-feature drift of ``cur`` against ``ref``.

    Returns one row per column: (column, psi, kl, tv, drifted) with
    ``drifted = psi > psi_threshold``.  See the module docstring for
    definitions, binning, and the scale argument.
    """
    edges = _bin_edges(ref, columns)
    h_ref = _histogram(ref, columns, edges, n_bins).withColumnRenamed(
        "n", "n_ref"
    )
    h_cur = _histogram(cur, columns, edges, n_bins).withColumnRenamed(
        "n", "n_cur"
    )
    joined = h_ref.join(h_cur, ["column", "bin"], "full_outer").fillna(
        0, subset=["n_ref", "n_cur"]
    )
    w = F.sum  # totals per column ride a window-free second agg
    totals = joined.groupBy("column").agg(
        w("n_ref").alias("t_ref"), w("n_cur").alias("t_cur")
    )
    frac = (
        joined.join(totals, "column")
        .withColumn(
            "r", F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(eps))
        )
        .withColumn(
            "c", F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(eps))
        )
    )
    return (
        frac.groupBy("column")
        .agg(
            F.sum(
                (F.col("c") - F.col("r")) * F.log(F.col("c") / F.col("r"))
            ).alias("psi_raw"),
            F.sum(F.col("c") * F.log(F.col("c") / F.col("r"))).alias(
                "kl_raw"
            ),
            (F.sum(F.abs(F.col("c") - F.col("r"))) / 2).alias("tv_raw"),
        )
        .select(
            "column",
            F.round("psi_raw", 6).alias("psi"),
            F.round("kl_raw", 6).alias("kl"),
            F.round("tv_raw", 6).alias("tv"),
            (F.col("psi_raw") > psi_threshold).alias("drifted"),
        )
    )


def schema_drift(ref: DataFrame, cur: DataFrame) -> DataFrame:
    """Schema-level drift between two snapshots: one row per column that
    was ADDED, REMOVED, or TYPE-CHANGED — the metadata companion to
    :func:`distribution_drift` (a pipeline checks schema first; a
    removed feature is a harder failure than a shifted one).

    Pure metadata (no data read, no jobs): the result is a local
    relation built from the two schemas.  Columns: (column, change ∈
    {added, removed, type_changed}, ref_type, cur_type)."""
    ref_types = {f.name: f.dataType.simpleString() for f in ref.schema.fields}
    cur_types = {f.name: f.dataType.simpleString() for f in cur.schema.fields}
    rows = []
    for name in sorted(set(ref_types) | set(cur_types)):
        r, c = ref_types.get(name), cur_types.get(name)
        if r is None:
            rows.append((name, "added", None, c))
        elif c is None:
            rows.append((name, "removed", r, None))
        elif r != c:
            rows.append((name, "type_changed", r, c))
    spark = ref.sparkSession
    return spark.createDataFrame(
        rows, "column string, change string, ref_type string, cur_type string"
    )


def reference_model(
    ref: DataFrame,
    columns: Sequence[str],
    n_bins: int = 10,
    eps: float = 1e-6,
) -> dict:
    """Freeze a reference snapshot into a tiny drift model: per column
    the bin edges (min, max) and the ε-smoothed reference fraction for
    EVERY bin (-1 = NULL bin, 0..n_bins-1 = value bins, absent bins
    floored at ``eps``).  Two jobs total (edge agg + histogram of
    |columns| × (n_bins + 1) rows); the model is a plain dict —
    literal-sized, rides any closure, and is what the STREAMING monitor
    (streaming.events.drift_stream) compares live windows against."""
    edges = _bin_edges(ref, columns)
    hist = _histogram(ref, columns, edges, n_bins).collect()
    counts = {(r["column"], r["bin"]): r["n"] for r in hist}
    model = {"n_bins": n_bins, "eps": eps, "columns": {}}
    for c in columns:
        total = sum(n for (cc, _), n in counts.items() if cc == c)
        fracs = {}
        for b in range(-1, n_bins):
            n = counts.get((c, b), 0)
            fracs[b] = max(n / total, eps) if total else eps
        model["columns"][c] = {"edges": edges[c], "fracs": fracs}
    return model
