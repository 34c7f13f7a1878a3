"""Training-set assembly operators: the last mile between a curated
corpus and a training run.

- ``repeated_ngram_coverage``: substring-level duplication signal — the
  fraction of each document's token positions covered by an n-gram that
  also appears in another document (the metric behind substring-dedup
  policies; cf. Lee et al. 2022, "Deduplicating Training Data Makes
  Language Models Better", and the Gopher/RefinedWeb repetition
  filters).  Whole-document dedup (operators/dedup.py) misses partial
  overlap — boilerplate headers, quoted passages, templated spans; this
  measures it directly.
- ``deterministic_shuffle``: a reproducible global permutation of the
  corpus (sort by a seeded md5 of the id) — training wants documents in
  random order, and a seed-keyed hash makes the order identical across
  engines, runs, and cluster sizes, with no RNG state to plumb.
- ``shard_assignments`` / ``shard_manifest``: deterministic hash
  sharding of the corpus into N output shards plus the per-shard
  manifest (docs, tokens) a downstream loader reads.

Scale shapes (100 TB posture):
- repeated_ngram_coverage is three map-side-combined shuffles — n-gram
  group count, repeated-position semi-join (same key, reusable
  partitioning), per-doc coverage agg.  Grouping is by the n-gram STRING
  so the SQL oracle reproduces counts exactly; a production run at
  corpus scale would group by a 128-bit hash (collision odds ~1e-20)
  to cut shuffle bytes — same plan, narrower key.
- deterministic_shuffle ranks inside 16^prefix_len md5-prefix buckets
  in parallel and broadcast-joins preceding-bucket offsets — no
  Exchange SinglePartition (a Window.orderBy global rank would be a
  one-task sort).  The md5 sort key is computed map-side.
- shard assignment is a narrow projection (zero shuffles); the manifest
  is one groupBy over n_shards groups.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluss_datafusion_spark.functions.text import token_count, tokens
from fluss_datafusion_spark.session import spread_small_scan


def repeated_ngram_coverage(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document coverage by cross-document repeated n-grams.

    Returns (id, n_tokens, covered_tokens, dup_fraction): a token
    position is *covered* when at least one n-gram window containing it
    occurs in >= ``min_docs`` distinct documents.  Documents shorter
    than ``n`` tokens have coverage 0.

    Tokenization: lower + trim + whitespace split (the corpus-wide
    canonical cheap tokenizer), so results line up with the other text
    operators and the SQL oracle.
    """
    tk = spread_small_scan(docs).select(
        F.col(id_col).alias("__id__"),
        tokens(F.lower(F.col(text_col))).alias("__tk__"),
    )
    counts = tk.select(
        "__id__", F.size("__tk__").alias("n_tokens")
    )
    # One row per n-gram start position: (doc, pos, gram).  slice() is
    # 1-indexed; sequence(0, size-n) yields every valid 0-based start.
    grams = (
        tk.filter(F.size("__tk__") >= n)
        .select(
            "__id__",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__tk__") - n),
                    lambda i: F.concat_ws(" ", F.slice("__tk__", i + 1, n)),
                )
            ).alias("__pos__", "__g__"),
        )
    )
    repeated = (
        grams.groupBy("__g__")
        .agg(F.count_distinct("__id__").alias("__nd__"))
        .filter(F.col("__nd__") >= min_docs)
        .select("__g__")
    )
    # Positions whose window is repeated; each covers tokens [pos, pos+n).
    covered = (
        grams.join(repeated, "__g__", "left_semi")
        .select(
            "__id__",
            F.explode(
                F.sequence(F.col("__pos__"), F.col("__pos__") + (n - 1))
            ).alias("__t__"),
        )
        .groupBy("__id__")
        .agg(F.count_distinct("__t__").alias("covered_tokens"))
    )
    return (
        counts.join(covered, "__id__", "left")
        .select(
            F.col("__id__").alias(id_col),
            "n_tokens",
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.round(
                F.coalesce("covered_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)),
                4,
            ).alias("dup_fraction"),
        )
    )


def _md5_sort_key(id_col: str, seed: str):
    return F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))


def md5_prefix_ranked(
    df: DataFrame,
    key_col: str,
    tiebreak_col: str,
    prefix_len: int = 3,
    sum_col: str = None,
):
    """Scalable global rank under an md5-hex sort key, WITHOUT the
    ``Window.orderBy`` single-partition exchange (a one-task global sort
    that dies at scale).

    md5 hex digits sort lexicographically (0-9 < a-f in ASCII), so the
    global order by (key, tiebreak) equals (prefix-bucket, key, tiebreak)
    order for any prefix split.  And md5 is uniform, so a ``prefix_len``-
    char bucket key yields 16^prefix_len near-equal groups.  Therefore:
    rank inside each bucket in parallel (hash-partitioned window), count
    rows per bucket (map-side-combined agg over <= 16^prefix_len groups),
    turn counts into preceding-bucket offsets (a window over the TINY
    counts table only), and broadcast-join the offsets back:
    global_rank = bucket_offset + within-bucket rank.

    Default 3 hex chars = 4096 buckets (~25 GB/bucket at 100 TB); raise
    ``prefix_len`` for bigger corpora — cost is only the offsets table.

    Returns (ranked_df, rank_col_name): ``__grank__`` is the dense
    1-based BIGINT global rank; internal columns are already dropped.
    With ``sum_col`` the result also carries ``__gcum__`` — the global
    inclusive running sum of that column under the same order (same
    plan: within-bucket cumsum + broadcast preceding-bucket sums).
    """
    bkt = F.substring(F.col(key_col), 1, prefix_len)
    w = Window.partitionBy("__bkt__").orderBy(key_col, tiebreak_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (
        df.withColumn("__bkt__", bkt)
        .withColumn("__rn__", F.row_number().over(w))
    )
    aggs = [F.count(F.lit(1)).alias("__n__")]
    if sum_col is not None:
        ranked = ranked.withColumn("__cs__", F.sum(sum_col).over(wcum))
        aggs.append(F.sum(sum_col).alias("__s__"))
    counts = ranked.groupBy("__bkt__").agg(*aggs)
    woff = Window.orderBy("__bkt__").rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        "__bkt__",
        F.coalesce(F.sum("__n__").over(woff), F.lit(0)).alias("__off__"),
    ]
    if sum_col is not None:
        off_cols.append(
            F.coalesce(F.sum("__s__").over(woff), F.lit(0)).alias("__soff__")
        )
    offsets = counts.select(*off_cols)
    out = (
        ranked.join(F.broadcast(offsets), "__bkt__")
        .withColumn("__grank__", F.col("__off__") + F.col("__rn__"))
    )
    if sum_col is not None:
        out = out.withColumn("__gcum__", F.col("__soff__") + F.col("__cs__"))
        out = out.drop("__cs__", "__soff__")
    return out.drop("__bkt__", "__rn__", "__off__"), "__grank__"


def deterministic_shuffle(
    docs: DataFrame, id_col: str, seed: str = "shuffle-0", prefix_len: int = 3
) -> DataFrame:
    """Global pseudorandom permutation: every row gains ``shuffle_pos``
    (1-based, dense) = its rank under md5(seed|id).  Changing the seed
    yields an independent permutation; the same seed reproduces the same
    order on any engine.

    Scale shape: bucketed parallel rank + broadcast offsets
    (``md5_prefix_ranked``), not a global-window sort — no
    Exchange SinglePartition anywhere in the plan."""
    ranked, rank_col = md5_prefix_ranked(
        docs.withColumn("__key__", _md5_sort_key(id_col, seed)),
        "__key__",
        id_col,
        prefix_len=prefix_len,
    )
    return ranked.withColumn("shuffle_pos", F.col(rank_col)).drop(
        "__key__", rank_col
    )


def shard_assignments(
    docs: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "shard-0",
) -> DataFrame:
    """Deterministic shard id per document: the first 8 hex digits of
    md5(seed|id) parsed as an integer, mod ``n_shards``.  Pure narrow
    projection (no shuffle); reproducible on any engine that has md5 —
    the property that lets a resumed or re-run pipeline land every doc
    in the same shard file."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    bucket = F.conv(
        F.substring(_md5_sort_key(id_col, seed), 1, 8), 16, 10
    ).cast("long")
    return docs.withColumn("shard", (bucket % n_shards).cast("int"))


def shard_manifest(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int,
    seed: str = "shard-0",
) -> DataFrame:
    """Per-shard manifest (shard, n_docs, n_tokens, min_id, max_id): what
    a training loader consults before opening shard files.  One
    map-side-combined groupBy over at most ``n_shards`` groups."""
    assigned = shard_assignments(docs, id_col, n_shards, seed)
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_col))).alias("n_tokens"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def range_ranked(
    df: DataFrame,
    order_cols,
    num_partitions: int = 64,
    _materialize: bool = True,
):
    """Scalable global rank under an ARBITRARY sort order, without the
    ``Window.orderBy`` single-partition exchange — the general-key
    sibling of ``md5_prefix_ranked`` (which needs an md5-hex key for its
    prefix bucketing).

    ``repartitionByRange`` on the order columns puts each partition on a
    contiguous slice of the global order (equal keys land together, and
    the caller's tiebreak column makes the order strict), so:
    row_number inside each range partition in parallel, count rows per
    partition (tiny agg), window the counts into preceding-partition
    offsets, broadcast them back: global_rank = offset + local rank.
    The range exchange's sampling pass decides only the SPLIT POINTS —
    the resulting rank is exactly the (order_cols) total order
    regardless of where the boundaries fall.

    ``order_cols``: list of Columns (use ``F.col(c).desc()`` for
    descending) — the last one should be a unique tiebreak.  Returns
    ``(ranked_df, "__grank__")`` like md5_prefix_ranked.
    """
    part = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "__pid__", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid__").orderBy(*order_cols)
    # MATERIALIZE the partition-id-stamped ranks before branching: the
    # counts/offsets branch and the data branch below must see the SAME
    # range boundaries, but repartitionByRange draws its split points
    # from a nondeterministic sampling pass — with exchange reuse
    # disabled (spark.sql.exchange.reuse=false) or divergent AQE
    # re-plans, two executions could bucket rows differently and the
    # offsets would silently disagree with the data side's partition
    # ids.  localCheckpoint pins one physical result for both branches
    # (a lost block then fails loudly instead of mis-ranking).
    ranked = part.withColumn("__rn__", F.row_number().over(w))
    if _materialize:  # tests pass False to plan-assert the window shape
        ranked = ranked.localCheckpoint(eager=True)
    counts = ranked.groupBy("__pid__").agg(F.count(F.lit(1)).alias("__n__"))
    woff = Window.orderBy("__pid__").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid__",
        F.coalesce(F.sum("__n__").over(woff), F.lit(0)).alias("__off__"),
    )
    out = ranked.join(F.broadcast(offsets), "__pid__").withColumn(
        "__grank__", (F.col("__off__") + F.col("__rn__")).cast("long")
    )
    return out.drop("__pid__", "__rn__", "__off__"), "__grank__"


def assign_splits(
    df: DataFrame,
    id_col: str,
    fractions=None,
    seed: str = "split-0",
    group_col: str = None,
) -> DataFrame:
    """Deterministic train/val/test assignment with an optional
    LEAKAGE GUARD: with ``group_col`` given (e.g. a dedup-cluster
    representative or content fingerprint), every row of a group lands
    in the SAME split — near-duplicate documents scattered across train
    and test silently inflate eval scores, the classic contamination a
    random row-level split cannot prevent.

    Assignment is a pure function of (seed, group key): the md5 hex of
    ``seed|key`` maps to a uniform u ∈ [0, 1) (first 12 hex chars / 16¹²)
    and cumulative fraction thresholds pick the split — reproducible
    across runs, engines (any SQL with md5 replays it), and cluster
    sizes; adding documents never reassigns existing ones.  Pure JVM
    expressions on the scan, no shuffle, no state."""
    fractions = dict(fractions or {"train": 0.9, "val": 0.05, "test": 0.05})
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    key = group_col or id_col
    u = (
        F.conv(F.substring(_md5_sort_key(key, seed), 1, 12), 16, 10)
        .cast("double")
        / float(16 ** 12)
    )
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def _dsir_feats(df: DataFrame, id_col: str, text_col: str, seed: str):
    """(id, bucket) WITH MULTIPLICITY: lowercase whitespace tokens plus
    word bigrams, each occurrence hashed to its md5 bucket id (the
    n_buckets modulo is applied by the caller so the hash itself stays
    bucket-count-free)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    # zip_with pads the shorter side with NULL, so both slices must be
    # exactly len-1 long or a phantom NULL bigram rides along
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    gram = F.explode(F.concat(toks, bigrams)).alias("__g__")
    return df.select(F.col(id_col).alias("__id__"), gram).select(
        "__id__",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + "|"), F.col("__g__"))), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        .alias("__h__"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 10000,
    seed: str = "dsir-0",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): score every RAW document by how much more likely its
    hashed n-gram features are under the TARGET distribution than under
    the raw one,

        log_weight(doc) = Σ_f  ln p_target(b(f)) − ln p_raw(b(f))

    summed over the document's unigram + bigram occurrences (with
    multiplicity), where each side's bucket distribution is
    Laplace-smoothed:  p(b) = (n_b + 1) / (N + n_buckets).  Documents
    that look like the target (a curated domain sample) get positive
    weights; selection is then ``dsir_select`` (Gumbel-top-n, the
    paper's sampling-without-replacement trick) or a plain top-n.

    Scale shape: two map-side-combined bucket counts (key space =
    n_buckets, constant at any corpus size), ONE broadcast join of the
    ≤ n_buckets log-ratio table against the raw side's exploded
    features, one per-doc sum.  The hash is seeded md5 — deterministic
    across engines, which is what the DuckDB oracle replays.

    Returns one row per raw document: (id, log_weight, n_feats) —
    n_feats = 0 and log_weight = 0.0 for empty documents."""
    mod = F.lit(n_buckets)
    raw_feats = _dsir_feats(raw, id_col, text_col, seed).withColumn(
        "__b__", F.col("__h__") % mod
    )
    tgt_feats = _dsir_feats(target, id_col, text_col, seed).withColumn(
        "__b__", F.col("__h__") % mod
    )
    rc = raw_feats.groupBy("__b__").agg(F.count(F.lit(1)).alias("n_raw"))
    tc = tgt_feats.groupBy("__b__").agg(F.count(F.lit(1)).alias("n_tgt"))
    totals_r = rc.agg(F.sum("n_raw")).collect()[0][0] or 0
    totals_t = tc.agg(F.sum("n_tgt")).collect()[0][0] or 0
    lr = (
        rc.join(tc, "__b__", "full_outer")
        .fillna(0, subset=["n_raw", "n_tgt"])
        .select(
            "__b__",
            (
                F.log((F.col("n_tgt") + 1) / F.lit(totals_t + n_buckets))
                - F.log((F.col("n_raw") + 1) / F.lit(totals_r + n_buckets))
            ).alias("__lr__"),
        )
    )
    # features absent from BOTH counts cannot occur in raw docs; the
    # left join below is belt-and-braces for scoring foreign frames
    default_lr = math.log(1.0 / (totals_t + n_buckets)) - math.log(
        1.0 / (totals_r + n_buckets)
    )
    per_doc = (
        raw_feats.join(F.broadcast(lr), "__b__", "left")
        .groupBy("__id__")
        .agg(
            F.sum(F.coalesce(F.col("__lr__"), F.lit(default_lr))).alias(
                "__w__"
            ),
            F.count(F.lit(1)).alias("__nf__"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("__id__"))
        .distinct()
        .join(per_doc, "__id__", "left")
        .select(
            F.col("__id__").alias(id_col),
            F.coalesce(F.col("__w__"), F.lit(0.0)).alias("log_weight"),
            F.coalesce(F.col("__nf__"), F.lit(0))
            .cast("long")
            .alias("n_feats"),
        )
    )


def dsir_select(
    weights: DataFrame,
    n: int,
    id_col: str,
    weight_col: str = "log_weight",
    seed: str = "dsir-sel-0",
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-n selection over DSIR log-weights — the paper's
    sampling-without-replacement: key = log_weight / temperature + G
    with G = −ln(−ln u) and u a seeded md5 uniform of the id, so the
    draw is deterministic, engine-reproducible, and needs no RNG state.
    TakeOrderedAndProject keeps n (no global sort)."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + "|"), F.col(id_col).cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 52))
    gumbel = -F.log(-F.log(u))
    key = F.col(weight_col) / F.lit(temperature) + gumbel
    return (
        weights.withColumn("__key__", key)
        .orderBy(F.col("__key__").desc(), F.col(id_col))
        .limit(n)
        .drop("__key__")
    )
