"""Data-curation operators for LLM training pipelines: benchmark
decontamination, per-group quota sampling, PII redaction, TF-IDF term
scoring.

No reference analog — the reference (zuston/fluss-datafusion) is a SQL
CLI over Fluss storage; these are the north-star extension surface a
training-data pipeline runs over the same tables.  Everything is a
declarative DataFrame plan (Catalyst owns join strategy and pushdown);
the shapes are chosen for the 100 TB posture — inverted-index joins
instead of pair scans, window quotas instead of driver-side sampling,
JVM regexp instead of Python UDFs.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluss_datafusion_spark.functions.text import tokens, word_shingles
from fluss_datafusion_spark.session import spread_small_scan


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: Optional[str] = None,
    k: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Train/test contamination check: training documents sharing at
    least ``min_overlap`` distinct word-k-shingles with a benchmark
    (eval) corpus.

    Scale shape: the benchmark's DISTINCT shingle set is small by
    construction (eval suites are orders of magnitude smaller than the
    corpus), so the inner join against the corpus's exploded shingles is
    effectively a semi-probe — Catalyst broadcasts the benchmark side on
    its own stats (no forced hint; a huge "benchmark" degrades to a
    shuffle join instead of OOMing).  The overlap count gets map-side
    combine; the corpus is exploded exactly once.

    Returns (id_col, n_overlap) for contaminated documents only.
    """
    bench_text = bench_text_col or text_col
    bench_sh = benchmark.select(
        F.explode(word_shingles(F.col(bench_text), k)).alias("__s__")
    ).distinct()
    doc_sh = docs.select(
        F.col(id_col).alias("__id__"),
        F.explode(word_shingles(F.col(text_col), k)).alias("__s__"),
    )
    return (
        doc_sh.join(bench_sh, "__s__")
        .groupBy("__id__")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
        .select(F.col("__id__").alias(id_col), "n_overlap")
    )


def embedding_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_centroids: int = 16,
    n_probe: int = 2,
    n_iters: int = 2,
) -> DataFrame:
    """Embedding-space train/test contamination, IVF-bucketed (r12):
    corpus items whose embedding sits within cosine >= ``threshold`` of
    ANY benchmark vector.  The SCALE variant of
    ``embedding_contamination`` above (which scores every corpus row
    against every broadcast bench vector — right when the bench side is
    eval-suite-sized): here candidates come from shared coarse-quantizer
    lists, so a large benchmark costs O(corpus x bench / n_centroids)
    exact cosines instead of corpus x bench.

    Scale shape (the IVF candidate discipline, similarity.py): train a
    coarse quantizer on the corpus sample, give every corpus vector its
    ONE nearest list and every benchmark vector its ``n_probe`` nearest
    lists, broadcast the (eval-suite-sized) benchmark side into a join
    on the list id — O(corpus x bench / n_centroids) candidate pairs
    instead of corpus x bench — then verify each candidate with the
    EXACT cosine: the approximation only generates candidates, never
    scores.  A benchmark vector whose duplicate fell outside its probed
    lists is the (tunable) recall tradeoff every ANN-based
    decontamination makes.

    Returns (id_col, n_bench_hits) for contaminated corpus items only;
    a corpus row that IS a benchmark row is not its own contamination
    (pairs with equal ids are dropped).
    """
    from fluss_datafusion_spark.operators import similarity

    centroids = similarity.train_ivf_centroids(
        corpus, vec_col, id_col, n_centroids, n_iters
    )
    c_assign = similarity.ivf_assign_udf(centroids, n_probe=1)
    c = spread_small_scan(corpus).select(
        F.col(id_col).alias("__cid__"),
        F.col(vec_col).alias("__cv__"),
        c_assign(F.col(vec_col))[0].alias("__list__"),
    )
    b_assign = similarity.ivf_assign_udf(centroids, n_probe=n_probe)
    b = benchmark.select(
        F.col(id_col).alias("__bid__"),
        F.col(vec_col).alias("__bv__"),
        F.explode(b_assign(F.col(vec_col))).alias("__list__"),
    )
    # corpus side carries ONE list per row, so (cid, bid) candidate
    # pairs are unique by construction — count() is a distinct count
    from fluss_datafusion_spark.functions.vector import cosine_fast

    return (
        F.broadcast(b)
        .join(c, "__list__")
        .filter(F.col("__cid__") != F.col("__bid__"))
        .filter(
            cosine_fast(F.col("__cv__"), F.col("__bv__"))
            >= F.lit(threshold)
        )
        .groupBy("__cid__")
        .agg(F.count(F.lit(1)).alias("n_bench_hits"))
        .select(F.col("__cid__").alias(id_col), "n_bench_hits")
    )


def quota_sample(
    df: DataFrame,
    group_cols: List[str],
    n_per_group: int,
    order_col: str,
    ascending: bool = True,
) -> DataFrame:
    """Deterministic per-group quota: keep the first ``n_per_group`` rows
    of each group in ``order_col`` order (domain caps, source balancing).
    One window over the group key — a single hash shuffle, no driver
    sampling; ``order_col`` must be unique per group for determinism
    (use a tuple-breaking column upstream otherwise)."""
    ordering = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*group_cols).orderBy(ordering)
    return (
        df.withColumn("__qrn__", F.row_number().over(w))
        .filter(F.col("__qrn__") <= n_per_group)
        .drop("__qrn__")
    )


# Patterns deliberately restricted to RE2-compatible constructs (no
# lookarounds) so the identical regex runs in Spark (Java regex) and any
# RE2-based oracle engine.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d{3}[- ]\d{3}[- ]\d{4}",
}


def pii_redact(df: DataFrame, text_col: str) -> DataFrame:
    """Redact common PII shapes (emails, IPv4 addresses, phone-like
    numbers) with typed placeholders, and count what was redacted.
    All JVM-side regexp expressions — full scan speed, no UDFs."""
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    redacted = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return out.withColumn(f"{text_col}_redacted", redacted)


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 3,
    min_term_len: int = 1,
) -> DataFrame:
    """Per-document top-N TF-IDF terms (smooth idf = ln((N+1)/(df+1))+1).

    Scale shape: one explode over the corpus; tf and df are both
    map-side-combined aggregations; the document total N joins in as a
    broadcast of a single row; top-N is a window over the doc id.  The
    term dictionary never materializes on the driver.

    Returns (id_col, term, tf, df, score, rank) with rank 1..top_n by
    (score desc, term asc) — fully deterministic.
    """
    toks = docs.select(
        F.col(id_col).alias("__id__"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.length("term") >= min_term_len)
    tf = toks.groupBy("__id__", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("__N__"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("__N__") + 1) / (F.col("df") + 1)) + 1), 6
            ),
        )
    )
    w = Window.partitionBy("__id__").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            F.col("__id__").alias(id_col), "term", "tf", "df", "score", "rank"
        )
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fraction_pct: int,
    strata_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Deterministic hash-based sampling: keep a row iff the first 4 hex
    digits of md5(id) fall below ``fraction_pct`` % of 0x10000.  Unlike
    ``df.sample()`` this is reproducible across runs, engines, and
    cluster sizes (md5 is everywhere), needs no seed plumbing, and is a
    pure narrow filter — no shuffle at all.  The comparison is done on
    the fixed-length lowercase hex STRING (lexicographic == numeric for
    uniform-width hex), so any oracle engine reproduces it without hex
    parsing.  ``strata_cols`` only salt the hash so each stratum draws
    an independent sample; per-stratum EXACT quotas are
    ``quota_sample``'s job."""
    if not 0 <= fraction_pct <= 100:
        raise ValueError(f"fraction_pct must be in [0, 100], got {fraction_pct}")
    if fraction_pct == 100:
        # 0x10000 formats as the 5-char '10000', which compares BELOW
        # every 4-char bucket lexicographically and would keep ~6% of
        # rows instead of all of them.
        return df
    parts = [F.col(id_col).cast("string")] + [
        F.col(c).cast("string") for c in (strata_cols or [])
    ]
    threshold = format(int(0x10000 * fraction_pct / 100), "04x")
    bucket = F.substring(F.md5(F.concat_ws("|", *parts)), 1, 4)
    return df.filter(bucket < F.lit(threshold))


def sample_to_token_budget(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget_tokens: int,
    seed: str = "budget-0",
    strata_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Draw a ~``budget_tokens``-token sample: order documents by a
    seeded md5 of the id (a deterministic, engine-reproducible random
    order) and keep the greedy prefix whose cumulative token count stays
    within budget — "give me a 2B-token draw of this corpus", the
    request every training run starts with.  With ``strata_cols`` the
    budget applies PER STRATUM (uniform domain draws; pair with
    ``domain_mixture_weights`` for weighted ones).

    The kept total NEVER exceeds the budget: a document is admitted only
    if the inclusive cumulative sum stays within it, so the draw
    undershoots by at most the first rejected document's length
    (strict no-overshoot contract, deterministic on any engine; the
    oracle applies the same ``cum <= budget`` rule).

    Scale shape: with strata, one hash-ordered window per stratum
    (shuffles on the stratum key) computing a running token sum.
    Without strata, a ``Window.partitionBy()`` running sum would be an
    Exchange SinglePartition (one-task global sort), so the global case
    instead uses md5-prefix bucketing (``training.md5_prefix_ranked``):
    parallel within-bucket cumsums + broadcast preceding-bucket sums.
    No collect, no iteration; token counts are pure JVM expressions.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    from fluss_datafusion_spark.functions.text import token_count

    key = F.md5(
        F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))
    )
    tok = df.withColumn("__tok__", token_count(F.col(text_col)))
    if not strata_cols:
        from fluss_datafusion_spark.operators.training import md5_prefix_ranked

        ranked, rank_col = md5_prefix_ranked(
            tok.withColumn("__key__", key), "__key__", id_col,
            sum_col="__tok__",
        )
        return (
            ranked.filter(F.col("__gcum__") <= budget_tokens)
            .drop("__key__", rank_col, "__gcum__", "__tok__")
        )
    parts = [F.col(c) for c in strata_cols]
    w = (
        Window.partitionBy(*parts)
        .orderBy(key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tok.withColumn("__cum__", F.sum("__tok__").over(w))
        .filter(F.col("__cum__") <= budget_tokens)
        .drop("__tok__", "__cum__")
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 512,
) -> DataFrame:
    """Greedy sequence packing for training: concatenate documents into
    bins of at most ``max_tokens`` whitespace tokens (first-fit in id
    order WITHIN each partition).  Returns one row per packed sequence:
    (pack_id, doc_ids, n_docs, n_tokens).

    Scale shape: packing is partition-local (applyInPandas over a hash
    of the id — any partitioning works since bins never need to be
    globally optimal), so there is exactly one shuffle and no global
    sort; pack_id = first doc id in the bin, globally unique.  Documents
    longer than ``max_tokens`` become singleton bins (truncation is the
    tokenizer's job downstream)."""
    import pandas as pd

    # unannotated on purpose: applyInPandas infers the eval type from
    # hints when ANY are present and warns on a partially-hinted
    # (key, pdf) signature; no hints = the plain GROUPED_MAP fallback
    def pack(key, pdf):
        pdf = pdf.sort_values("__id__")
        bins, bin_ids, bin_tok = [], [], 0
        out = []
        for i, n in zip(pdf["__id__"], pdf["__n__"]):
            if bin_ids and bin_tok + n > max_tokens:
                out.append((bin_ids[0], list(bin_ids), len(bin_ids), bin_tok))
                bin_ids, bin_tok = [], 0
            bin_ids.append(int(i))
            bin_tok += int(n)
        if bin_ids:
            out.append((bin_ids[0], list(bin_ids), len(bin_ids), bin_tok))
        return pd.DataFrame(
            out, columns=["pack_id", "doc_ids", "n_docs", "n_tokens"]
        )

    from fluss_datafusion_spark.functions.text import token_count

    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    sized = docs.select(
        F.col(id_col).alias("__id__"),
        token_count(F.col(text_col)).alias("__n__"),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(parallelism))).alias("__part__"),
    )
    return sized.groupBy("__part__").applyInPandas(
        pack, "pack_id long, doc_ids array<long>, n_docs int, n_tokens long"
    )


def chunk_token_windows(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 512,
    num_partitions: int = 64,
    counter=None,
    _materialize: bool = True,
) -> DataFrame:
    """GPT-style concat-and-chunk packing (r12): documents in ``id``
    order are concatenated into ONE token stream and cut into fixed
    ``window``-token training windows — documents SPAN window
    boundaries (no padding, no discarded remainders), the dominant
    pretraining data layout (GPT-2/3, LLaMA).  The complement of
    ``pack_sequences`` above, which bin-packs whole documents and pads.

    Returns one row per non-empty document: (id, n_tokens,
    start_window, offset_in_window, end_window, n_windows) — enough for
    a trainer shard to locate every document's tokens inside the
    chunked stream, and for attention-masking tools to know which
    windows mix documents.

    Scale shape: the global token CUMSUM runs as per-range-partition
    local cumsums plus broadcast prefix offsets (the ``range_ranked``
    pattern, operators/training.py) — never a single-partition global
    window.  The ranked frame is localCheckpoint-pinned so the offsets
    branch and the data branch see the SAME nondeterministically-
    sampled range boundaries; the resulting offsets are the pure
    id-order cumsum regardless of where the boundaries fell.

    ``counter``: a Column-returning callable mapping the text column to
    the per-document token count — whitespace ``token_count`` by
    default; pass ``text.bpe_ish_token_count`` (or a real tokenizer's
    count) to lay windows out in the trainer's token space.
    """
    from fluss_datafusion_spark.functions.text import token_count

    counter = counter or token_count
    sized = docs.select(
        F.col(id_col).alias("__id__"),
        counter(F.col(text_col)).cast("long").alias("__n__"),
    ).filter(F.col("__n__") > 0)
    part = sized.repartitionByRange(
        num_partitions, F.col("__id__")
    ).withColumn("__pid__", F.spark_partition_id())
    w = Window.partitionBy("__pid__").orderBy("__id__")
    ranked = part.withColumn("__c__", F.sum("__n__").over(w))
    if _materialize:  # tests pass False to plan-assert the window shape
        ranked = ranked.localCheckpoint(eager=True)
    totals = ranked.groupBy("__pid__").agg(F.max("__c__").alias("__t__"))
    woff = Window.orderBy("__pid__").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__pid__",
        F.coalesce(F.sum("__t__").over(woff), F.lit(0)).alias("__off__"),
    )
    start = F.col("__off__") + F.col("__c__") - F.col("__n__")
    start_w = F.floor(start / window).cast("long")
    end_w = F.floor((start + F.col("__n__") - 1) / window).cast("long")
    return (
        ranked.join(F.broadcast(offsets), "__pid__")
        .select(
            F.col("__id__").alias(id_col),
            F.col("__n__").alias("n_tokens"),
            start_w.alias("start_window"),
            (start % window).cast("long").alias("offset_in_window"),
            end_w.alias("end_window"),
            (end_w - start_w + 1).cast("long").alias("n_windows"),
        )
    )


def embedding_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    vec_col: str,
    bench_id_col: Optional[str] = None,
    bench_vec_col: Optional[str] = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-space train/test contamination: corpus rows whose vector
    is within cosine ``threshold`` of ANY benchmark vector (n-gram
    decontamination misses paraphrases; this catches them).

    Scale shape: the benchmark side is small by construction and joins
    as a stats-based broadcast (no hint) against the streamed corpus —
    a narrow map-side pass, no shuffle of the corpus; the per-corpus-row
    best match reduces with map-side combine.  For benchmark sets too
    big for every corpus row to score every bench vector,
    ``embedding_decontaminate`` (r12) is the IVF-bucketed variant of
    this operator: candidates from shared coarse lists, exact cosine on
    candidates only.

    Returns (id_col, bench_id, cos) — the strongest benchmark match per
    contaminated corpus row.
    """
    from fluss_datafusion_spark.functions.vector import cosine as _cos

    b_id = bench_id_col or id_col
    b_vec = bench_vec_col or vec_col
    c = corpus.select(
        F.col(id_col).alias("__id__"), F.col(vec_col).alias("__v__")
    )
    b = benchmark.select(
        F.col(b_id).alias("bench_id"), F.col(b_vec).alias("__bv__")
    )
    scored = (
        spread_small_scan(c)
        .crossJoin(b)
        .withColumn("cos", _cos(F.col("__v__"), F.col("__bv__")))
        .filter(F.col("cos") >= threshold)
    )
    w = Window.partitionBy("__id__").orderBy(
        F.col("cos").desc(), F.col("bench_id").asc()
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select(F.col("__id__").alias(id_col), "bench_id", "cos")
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping fixed-size token chunks (the RAG
    / context-window preprocessing step): chunk i covers tokens
    ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the last chunk starts at the
    last stride boundary < n_tokens, so every token lands in >=1 chunk.

    Returns (doc_id, chunk_idx, chunk_text, n_chunk_tokens).

    Scale shape: pure narrow plan — sequence() builds the chunk-start
    list per row, posexplode fans out, slice + array_join materialize
    each chunk.  All built-in expressions (no UDF), no shuffle at all:
    chunking is embarrassingly parallel per input partition.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    from fluss_datafusion_spark.functions.text import tokens

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, ..., last multiple < n
    starts = F.sequence(
        F.lit(0),
        F.when(n > 0, (n - 1) - F.pmod(n - 1, F.lit(stride))).otherwise(F.lit(0)),
        F.lit(stride),
    )
    chunk = F.slice(F.col("__toks__"), F.col("__start__") + 1, chunk_tokens)
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            toks.alias("__toks__"),
            F.posexplode(starts).alias("chunk_idx", "__start__"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).alias("n_chunk_tokens"),
        )
    )


def build_vocab(
    docs: DataFrame,
    text_col: str,
    top_n: int = 1000,
) -> DataFrame:
    """Corpus vocabulary: the ``top_n`` most frequent whitespace tokens
    with rank and cumulative corpus coverage — the fast first pass of
    tokenizer/vocab construction over a training corpus.

    Returns (token, n_occurrences, rank, cum_coverage) ordered by rank;
    ties break on the token string so results are deterministic.

    Scale shape: one explode + one map-side-combined count per distinct
    token, then TakeOrdered(top_n) — O(tokens log top_n) per partition,
    never a global sort of the full vocabulary.  The window pass that
    assigns rank/cumsum runs on the top_n survivors only (single tiny
    partition, bounded by top_n).  The total-token denominator rides in
    via a 1-row cross join (broadcast by stats).
    """
    from pyspark.sql import Window

    from fluss_datafusion_spark.functions.text import tokens

    counts = (
        spread_small_scan(docs.filter(F.length(F.trim(F.col(text_col))) > 0))
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    total = counts.agg(F.sum("n_occurrences").alias("__total__"))
    top = counts.orderBy(F.col("n_occurrences").desc(), "token").limit(top_n)
    w = Window.orderBy(F.col("n_occurrences").desc(), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(total)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("n_occurrences").desc(), "token")
            ),
        )
        .withColumn(
            "cum_coverage", F.sum("n_occurrences").over(w) / F.col("__total__")
        )
        .select("token", "n_occurrences", "rank", "cum_coverage")
    )


def heavy_hitters(
    docs: DataFrame,
    text_col: str,
    k: int = 100,
) -> DataFrame:
    """EXACT heavy hitters without a full-vocabulary shuffle: every token
    whose corpus frequency is strictly greater than total_tokens / k,
    with its exact count.  The scale-path complement to ``build_vocab``
    (which shuffles one row per distinct token) the way MinHash+LSH
    complements exact all-pairs Jaccard.

    Two passes, both bounded:

    1. **Candidate pass** — a Misra-Gries summary of size ``k`` per
       partition (Arrow-batched mapInPandas, pure dict arithmetic).
       Pigeonhole over partition token totals: any token with global
       count > N/k has, in at least one partition, local count >
       N_p/k, and MG at capacity k retains every such local heavy
       hitter — so the union of partition summaries (<= P*k tokens) is
       a SUPERSET of the true heavy hitters.  No shuffle: summaries
       stream straight into the next stage.
    2. **Verify pass** — re-scan, keep only candidate tokens (hash
       semi-join against the <= P*k candidate set; the only shuffle is
       the map-side-combined count over candidates), count exactly,
       and filter with integer arithmetic (cnt * k > N — no float
       threshold edge).

    Returns (token, n_occurrences) — the exact, deterministic set an
    oracle reproduces with a plain GROUP BY/HAVING.
    """
    from typing import Iterator

    import pandas as pd

    from fluss_datafusion_spark.functions.text import tokens

    toks = spread_small_scan(
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
    ).select(tokens(F.lower(F.col(text_col))).alias("__tk__"))

    def mg_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        for pdf in batches:
            for arr in pdf["__tk__"]:
                for tok in arr:
                    if tok in summary:
                        summary[tok] += 1
                    elif len(summary) < k:
                        summary[tok] = 1
                    else:
                        # decrement-all step, dropping zeros
                        dead = []
                        for key in summary:
                            summary[key] -= 1
                            if summary[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del summary[key]
        yield pd.DataFrame({"token": list(summary.keys())})

    candidates = toks.mapInPandas(mg_partials, "token string").distinct()
    exploded = toks.select(F.explode("__tk__").alias("token"))
    counts = (
        exploded.join(candidates, "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    total = toks.agg(
        F.sum(F.size("__tk__")).alias("__total__")
    )
    return (
        counts.crossJoin(total)  # 1-row side, broadcast by stats
        .filter(F.col("n_occurrences") * k > F.col("__total__"))
        .select("token", "n_occurrences")
    )


def quality_filter(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 5,
    min_quality: float = 0.3,
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.5,
) -> DataFrame:
    """Composite document filter in the Gopher/MassiveText style: apply
    the cheap heuristic rules in one pass and report WHICH rules failed,
    not just a boolean — pipelines keep the reasons column for ablation
    and monitoring.

    Rules: too_short (token count), low_quality (heuristic score),
    repeated_lines (dup-line fraction), repeated_ngrams (top-bigram
    fraction).  Returns (id, keep, reasons) where reasons is a sorted
    comma-joined string of failed rule names ('' when keep).

    Scale shape: the scalar rules are pure expressions on the scan; the
    repetition metrics reuse ``repetition_stats`` (one explode + two
    map-side-combined aggs); one join on the doc id brings them
    together.  No UDFs, no driver-side logic.
    """
    from fluss_datafusion_spark.functions.text import (
        quality_score,
        repetition_stats,
        token_count,
    )

    rep = repetition_stats(docs, id_col, text_col)
    scored = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("__ntok__"),
        quality_score(F.col(text_col)).alias("__q__"),
    ).join(rep, id_col)
    rules = [
        ("low_quality", F.col("__q__") < min_quality),
        ("repeated_lines", F.col("dup_line_frac") > max_dup_line_frac),
        (
            "repeated_ngrams",
            (F.col("n_bigrams") > 0)
            & (F.col("top_bigram_frac") > max_top_bigram_frac),
        ),
        ("too_short", F.col("__ntok__") < min_tokens),
    ]
    reasons = F.array_join(
        F.array_sort(
            F.filter(
                F.array(
                    *[F.when(cond, F.lit(name)) for name, cond in rules]
                ),
                lambda x: x.isNotNull(),
            )
        ),
        ",",
    )
    return scored.select(
        id_col,
        reasons.alias("reasons"),
    ).withColumn("keep", F.col("reasons") == "")


def scrub_hot_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 16,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Corpus-duplicated span removal in the C4 / RefinedWeb style
    (Raffel et al. 2020 removed any three-sentence span occurring more
    than once in the corpus; RefinedWeb scrubs duplicated lines): split
    each document into consecutive ``span_tokens``-token segments, drop
    every segment whose exact text appears in at least ``min_doc_freq``
    DISTINCT documents, and reassemble the survivors in order.

    Unlike document-level dedup this removes boilerplate *inside*
    otherwise-unique documents (headers, license blocks, navigation
    text) — the step that document-granularity MinHash cannot do.

    Returns (id_col, clean_text, n_spans, n_dropped); ``clean_text`` is
    '' when every span was corpus-duplicated.

    Scale shape: segmentation is a pure narrow plan (sequence + slice +
    posexplode, no UDF).  The hot-span table is one map-side-combined
    distinct-count aggregation keyed by the span text (uniform hash —
    spans are near-unique strings).  Marking is a plain shuffle join of
    segments against the hot set (NOT a broadcast: a boilerplate-heavy
    corpus makes the hot set O(corpus); stats/AQE may still choose
    broadcast when it is genuinely small).  Reassembly shuffles once on
    the doc id with an ordered-struct collect.  Three shuffles total,
    each map-side combined, nothing quadratic, nothing driver-side.
    """
    from fluss_datafusion_spark.functions.text import tokens

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0),
        F.when(n > 0, (n - 1) - F.pmod(n - 1, F.lit(span_tokens))).otherwise(
            F.lit(0)
        ),
        F.lit(span_tokens),
    )
    span = F.slice(F.col("__toks__"), F.col("__start__") + 1, span_tokens)
    segs = (
        spread_small_scan(docs.filter(F.length(F.trim(F.col(text_col))) > 0))
        .select(
            F.col(id_col).alias("__id__"),
            toks.alias("__toks__"),
            F.posexplode(starts).alias("__seg__", "__start__"),
        )
        .select(
            "__id__",
            "__seg__",
            F.array_join(span, " ").alias("__span__"),
        )
    )
    hot = (
        segs.groupBy("__span__")
        .agg(F.countDistinct("__id__").alias("__df__"))
        .filter(F.col("__df__") >= min_doc_freq)
        .select("__span__", F.lit(True).alias("__hot__"))
    )
    marked = segs.join(hot, "__span__", "left")
    kept = F.filter(
        F.array_sort(
            F.collect_list(
                F.when(
                    ~F.coalesce(F.col("__hot__"), F.lit(False)),
                    F.struct(F.col("__seg__"), F.col("__span__")),
                )
            )
        ),
        lambda x: x.isNotNull(),
    )
    return (
        marked.groupBy("__id__")
        .agg(
            F.array_join(
                F.transform(kept, lambda x: x["__span__"]), " "
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(
                F.coalesce(F.col("__hot__"), F.lit(False)).cast("long")
            ).alias("n_dropped"),
        )
        .select(
            F.col("__id__").alias(id_col), "clean_text", "n_spans", "n_dropped"
        )
    )


def scrub_repeated_substrings(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_doc_freq: int = 2,
) -> DataFrame:
    """ExactSubstr-style repeated-substring removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", §3.1):
    remove every token covered by a ``k``-token run whose exact text
    also appears in at least ``min_doc_freq`` DISTINCT documents —
    at ANY token offset, unlike ``scrub_hot_spans``'s stride-``k``
    segmentation, which misses duplicated text that straddles a segment
    boundary.  Lee et al. build a corpus-wide suffix array; the
    distributed equivalent here is an every-offset k-gram inverted
    index: a k-gram match is exactly a length->=k repeated substring,
    and the union of covered positions equals the suffix-array answer
    at k-token resolution.

    Returns (id_col, clean_text, n_tokens, n_removed) over every
    non-empty document; ``clean_text`` rejoins surviving tokens in
    order ('' when the whole document was duplicated text).

    Scale shape: shingling is a narrow plan over a ONCE-materialized
    token array (transform+slice — O(n*k) work, 1 output row per token,
    the same cost class as every inverted-index dedup path here).  The
    duplicate set is one map-side-combined distinct-count agg on the
    shingle text (near-unique strings — uniform hash); marking is a
    semi-join against it (NOT a broadcast — boilerplate-heavy corpora
    make it O(corpus)); coverage explodes each duplicated occurrence
    into its k positions (O(dup * k), sparse by assumption) and
    reassembly shuffles once on the doc id.  Nothing quadratic, nothing
    driver-side.
    """
    from fluss_datafusion_spark.functions.text import tokens

    base = spread_small_scan(
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
    ).select(
        F.col(id_col).alias("__id__"),
        tokens(F.col(text_col)).alias("__toks__"),
    )
    n = F.size("__toks__")
    sh_structs = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda s: F.struct(
            s.alias("start"),
            F.array_join(F.slice("__toks__", s + 1, k), " ").alias("sh"),
        ),
    )
    shingles = (
        base.filter(n >= k)
        .select("__id__", F.explode(sh_structs).alias("__s__"))
        .select(
            "__id__",
            F.col("__s__.start").alias("__start__"),
            F.col("__s__.sh").alias("__sh__"),
        )
    )
    hot = (
        shingles.groupBy("__sh__")
        .agg(F.countDistinct("__id__").alias("__df__"))
        .filter(F.col("__df__") >= min_doc_freq)
        .select("__sh__")
    )
    covered = (
        shingles.join(hot, "__sh__", "leftsemi")
        .select(
            "__id__",
            F.explode(
                F.sequence(F.col("__start__"), F.col("__start__") + (k - 1))
            ).alias("__pos__"),
        )
        .distinct()
    )
    tok_pos = base.select(
        "__id__", F.posexplode("__toks__").alias("__pos__", "__tok__")
    )
    kept = (
        tok_pos.join(covered, ["__id__", "__pos__"], "left_anti")
        .groupBy("__id__")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos__", "__tok__"))
                    ),
                    lambda x: x["__tok__"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("__n_kept__"),
        )
    )
    return (
        base.select("__id__", n.alias("n_tokens"))
        .join(kept, "__id__", "left")
        .select(
            F.col("__id__").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (
                F.col("n_tokens") - F.coalesce(F.col("__n_kept__"), F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )


def domain_mixture_weights(
    docs: DataFrame,
    group_col: str,
    text_col: str,
    target_shares: Optional[dict] = None,
    temperature: Optional[float] = None,
) -> DataFrame:
    """Per-domain sampling weights to hit a target token mixture (the
    Pile/DoReMi-style domain-reweighting step): for each value of
    ``group_col`` compute its token share of the corpus and the sampling
    weight ``target_share / actual_share`` that a downstream sampler
    multiplies into per-document keep probabilities.  ``target_shares``
    maps group value -> desired share (defaults to the uniform mixture
    1/n_groups; missing keys get 0 — i.e. drop that domain).

    ``temperature`` instead derives the targets from the data itself by
    exponentiated-share smoothing — target_i = share_i^α / Σ share_j^α,
    the multilingual upsampling rule (Conneau et al. 2020 §5.1 /
    Raffel et al. 2020 §3.4.3 use α≈0.3): α = 1 keeps the natural
    mixture, α → 0 approaches uniform, so low-resource domains are
    upsampled without hand-written shares.  Mutually exclusive with
    ``target_shares``.

    Returns (group_col, n_docs, n_tokens, token_share, weight), shares
    and weights rounded to 6.

    Scale shape: one map-side-combined aggregation over the corpus; the
    per-group table is O(domains) (tiny), so the totals ride in via a
    single-row broadcast cross join — and the temperature normalizer
    Σ share^α is a window sum over that same tiny table.  No second
    pass over the data.
    """
    if target_shares is not None and temperature is not None:
        raise ValueError("pass target_shares or temperature, not both")
    from fluss_datafusion_spark.functions.text import token_count

    stats = (
        spread_small_scan(docs)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_col))).alias("n_tokens"),
        )
    )
    totals = stats.agg(
        F.sum("n_tokens").alias("__total__"),
        F.count(F.lit(1)).alias("__ngroups__"),
    )
    share = F.col("n_tokens") / F.col("__total__")
    if temperature is not None:
        # target_i = share_i^α / Σ share_j^α — the normalizer is a
        # window sum over the O(domains) per-group table (no shuffle
        # of corpus data; the table is partitions-of-one at this size)
        norm = F.sum(F.pow(share, F.lit(temperature))).over(
            Window.partitionBy()
        )
        target = F.pow(share, F.lit(temperature)) / norm
    elif target_shares is None:
        target = F.lit(1.0) / F.col("__ngroups__")
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target_shares.items() for x in kv]
        )
        target = F.coalesce(
            mapping[F.col(group_col).cast("string")], F.lit(0.0)
        )
    return (
        stats.crossJoin(F.broadcast(totals))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            F.round(share, 6).alias("token_share"),
            F.round(target / share, 6).alias("weight"),
        )
    )


def apply_mixture(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str,
    group_col: str,
    weight_col: str = "weight",
    seed: str = "mixture-0",
) -> DataFrame:
    """Materialize a mixture: keep each document with probability
    ``min(1, weight)`` of its domain — the downstream half of
    ``domain_mixture_weights`` (weights > 1 mean the domain should be
    UP-sampled; a keep-filter can only cap at 1.0 — epoch-level
    repetition is the trainer's lever, so the cap is documented, not
    hidden).  The draw is a seeded md5 threshold per document:
    deterministic, engine-reproducible, independent across domains.

    Scale shape: the weights table is O(domains) and joins as a
    stats-based broadcast against the streamed corpus; the keep
    decision is a pure map-side expression — one narrow pass, no
    shuffle of the corpus.
    """
    w = weights.select(
        F.col(group_col).alias("__grp__"),
        F.least(F.lit(1.0), F.col(weight_col).cast("double")).alias("__frac__"),
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.join(w, docs[group_col] == w["__grp__"])
        .filter(bucket < F.col("__frac__") * F.lit(4294967296.0))
        .drop("__grp__", "__frac__")
    )


def dedup_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """Total keep/drop assignment from pairwise near-dup output: resolve
    pairs to clusters (``dedup_clusters``) and keep exactly one
    representative per cluster (the min id); documents in no pair keep
    themselves.  Returns docs plus (cluster_id, keep).

    Scale shape: the cluster table is one row per document THAT APPEARS
    IN A PAIR (small for a healthy corpus); the join back to the corpus
    is a left join on the uniformly-hashed doc id.
    """
    from fluss_datafusion_spark.operators.dedup import dedup_clusters

    clusters = dedup_clusters(pairs).withColumnRenamed("doc_id", "__cid__")
    return (
        docs.join(clusters, docs[id_col] == clusters["__cid__"], "left")
        .drop("__cid__")
        .withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
        )
        .withColumn("keep", F.col("cluster_id") == F.col(id_col))
    )


def normalize_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lowercase: bool = False,
) -> DataFrame:
    """Canonical text cleanup (the C4/RefinedWeb-style normalization
    pass that precedes dedup and filtering): strip ASCII control
    characters, collapse whitespace runs to single spaces, trim, and
    optionally lowercase.  Returns (id, text_norm, changed, n_chars_in,
    n_chars_out).

    Engine-portability note: the whitespace class is the EXPLICIT
    ``[ \\t\\n\\r\\f]`` — Java regex ``\\s`` includes vertical tab
    (\\x0B) while RE2-family engines' does not, so ``\\s`` would
    silently diverge between Spark and an RE2 oracle.  All JVM regexp
    expressions, zero shuffles."""
    ctrl = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
    ws = "[ \\t\\n\\r\\f]+"
    norm = F.regexp_replace(F.col(text_col), ctrl, "")
    norm = F.regexp_replace(norm, ws, " ")
    norm = F.trim(norm)
    if lowercase:
        norm = F.lower(norm)
    return df.select(
        F.col(id_col),
        norm.alias("text_norm"),
        (norm != F.col(text_col)).alias("changed"),
        F.length(F.col(text_col)).alias("n_chars_in"),
        F.length(norm).alias("n_chars_out"),
    )


URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?:/[^ \t\n\r\f]*)?"
DOMAIN_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def extract_urls(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per URL occurrence in the corpus: (id, url, domain).
    RE2-compatible patterns (no lookarounds) so the identical regex runs
    in Spark and any RE2 oracle; pure JVM regexp + one explode, no
    shuffle."""
    urls = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
        ).alias("url"),
    )
    return urls.withColumn(
        "domain", F.regexp_extract(F.col("url"), DOMAIN_PATTERN, 1)
    )


#: query parameters that never change page identity (analytics litter) —
#: the standard strip-list web-dedup pipelines apply before URL keying
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref|ref_src|mc_cid|mc_eid)="
)


def canonical_url(url) -> "F.Column":
    """Canonical form of a URL for identity keying — the normalization
    every web-corpus dedup runs before grouping by URL (CommonCrawl /
    CCNet pipelines dedupe fetches of the same page under cosmetically
    different URLs).  Rules, all RFC-3986-sanctioned equivalences plus
    the two standard aggressive ones (www., tracking params):

    - scheme and host lowercase; leading ``www.`` dropped;
    - default ports dropped (``:80`` for http, ``:443`` for https);
    - fragment dropped (never sent to the server);
    - trailing slash dropped from non-root paths; empty path -> ``/``;
    - tracking query parameters removed (TRACKING_PARAM_RE), remaining
      parameters SORTED (order never changes identity in practice) and
      rejoined; an emptied query drops its ``?``.

    Pure JVM expressions (regexp + array lambdas), zero UDFs, zero
    shuffles — canonicalization is a map-side column like any other.
    """
    url = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    rest = F.regexp_replace(
        F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", ""),
        r"#.*$",
        "",
    )
    auth = F.regexp_replace(
        F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1)), r"^www\.", ""
    )
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1), F.regexp_replace(path, r"/$", "")
        ).otherwise(path)
    )
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    q = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def url_dedup_groups(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Group fetches by canonical URL: (canon, n_dupes, rep_id) with the
    smallest id as the deterministic representative — the URL-level
    dedup pass web pipelines run before any content-level dedup.  One
    map-side-combined groupBy on the canonical key."""
    return (
        df.select(F.col(id_col).alias("__id__"), canonical_url(url_col).alias("canon"))
        .groupBy("canon")
        .agg(
            F.count(F.lit(1)).alias("n_dupes"),
            F.min("__id__").alias("rep_id"),
        )
    )


def domain_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-domain corpus footprint — (domain, n_urls, n_docs) — the
    table every web-scrape curation policy starts from (domain
    allowlists/blocklists, per-domain caps via ``quota_sample``).
    One explode + one map-side-combined groupBy."""
    return (
        extract_urls(df, id_col, text_col)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
    )


def sample_exact_n(
    df: DataFrame,
    id_col: str,
    n: int,
    seed: str = "sample-0",
) -> DataFrame:
    """EXACTLY ``n`` uniformly-pseudorandom rows (or all rows if the
    corpus is smaller), deterministic across runs, engines, and cluster
    sizes: the n smallest rows under md5(seed|id) order.  What
    ``df.sample()`` can't promise (approximate fraction, seed tied to
    partitioning) and ``stratified_sample`` doesn't (percentage, not a
    count).

    Scale shape: rank via ``training.md5_prefix_ranked`` — parallel
    within-bucket ranks + broadcast offsets, no single-partition sort,
    no driver-side sampling.  Changing the seed draws an independent
    sample; the same seed always returns the same rows.
    """
    if n < 0:
        raise ValueError(f"n must be non-negative, got {n}")
    from fluss_datafusion_spark.operators.training import md5_prefix_ranked

    key = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    ranked, rank_col = md5_prefix_ranked(
        df.withColumn("__key__", key), "__key__", id_col
    )
    return ranked.filter(F.col(rank_col) <= n).drop("__key__", rank_col)


def weighted_sample_n(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    seed: str = "wsample-0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of exactly ``n`` rows
    (Efraimidis & Spirakis 2006, algorithm A-ES): each row draws an
    exponential variate e_i = -ln(u_i) / w_i from a deterministic
    md5-seeded uniform u_i, and the n smallest e_i win — equivalent to
    sequential draws proportional to weight, without replacement.  The
    standard primitive for mixture-weighted corpus draws (sample domains
    proportionally to quality score / target mixture weight) that
    ``df.sample()`` cannot express at all.

    Deterministic across runs, engines, and cluster sizes: u_i is built
    from the first 13 hex chars of md5(seed|id) — 52 bits, exactly
    representable in a double — so the same seed always selects the
    same rows and a different seed draws an independent sample.

    Scale shape: the uniform, the variate, and the weight guard are all
    JVM expressions; selection is ``orderBy(e).limit(n)`` which Spark
    plans as TakeOrderedAndProject — per-partition top-n heaps merged
    once, NO single-partition global sort (the same physical shape as
    any top-k).  n is a driver-merged result-set size, as with LIMIT.

    Rows with weight <= 0 or NULL never qualify (they'd draw e = inf).
    """
    if n < 0:
        raise ValueError(f"n must be non-negative, got {n}")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
                1, 13,
            ),
            16, 10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 52))
    e = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__e__", e)
        .orderBy(F.col("__e__").asc(), F.col(id_col).asc())
        .limit(n)
        .drop("__e__")
    )


def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    out_col: str = "text_deduped",
) -> DataFrame:
    """CCNet-style line-level deduplication (Wenzek et al., LREC 2020):
    drop every LINE whose normalized form (trim + lowercase) appears in
    at least ``min_docs`` distinct documents — boilerplate headers,
    navigation chrome, and licence blocks repeat verbatim across pages
    and this removes them at line granularity, which document-level
    near-dup (Jaccard/MinHash) cannot (the documents differ) and
    k-gram substring scrub over-segments (a short line is below k).

    Returns (id, out_col, n_lines, n_dropped) with surviving lines
    rejoined in original order; blank lines never count as duplicates
    and are always kept (they are formatting, not content).

    Scale shape: one explode to (doc, pos, line), one map-side-combined
    distinct-doc count on the normalized-line key, one semi-join-shaped
    marking join, one per-doc reassembly agg — every stage keyed, no
    driver state, cost Σ lines like every other per-token pass."""
    lines = (
        spread_small_scan(df)
        .select(
            F.col(id_col).alias("__doc__"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias(
                "__pos__", "__line__"
            ),
        )
        .withColumn("__norm__", F.lower(F.trim(F.col("__line__"))))
    )
    hot = (
        lines.filter(F.col("__norm__") != "")
        .groupBy("__norm__")
        .agg(F.countDistinct("__doc__").alias("__df__"))
        .filter(F.col("__df__") >= min_docs)
        .select("__norm__")
    )
    marked = lines.join(
        hot.withColumn("__hot__", F.lit(True)), "__norm__", "left"
    ).withColumn(
        "__drop__",
        F.coalesce(F.col("__hot__"), F.lit(False))
        & (F.col("__norm__") != ""),
    )
    return (
        marked.groupBy("__doc__")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("__drop__"),
                                F.struct(
                                    F.col("__pos__"), F.col("__line__")
                                ),
                            )
                        )
                    ),
                    lambda s: s.getField("__line__"),
                ),
                "\n",
            ).alias(out_col),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("__drop__").cast("int")).alias("n_dropped"),
        )
        .select(
            F.col("__doc__").alias(id_col),
            out_col,
            F.col("n_lines").cast("int").alias("n_lines"),
            F.col("n_dropped").cast("int").alias("n_dropped"),
        )
    )


def pseudonymize(
    df: DataFrame,
    cols: Sequence[str],
    salt: str,
    prefix_map: Optional[Dict[str, str]] = None,
    keep_null: bool = True,
) -> DataFrame:
    """Deterministic column pseudonymization (the GDPR/CCPA-grade
    de-identification step training pipelines run before sharing): each
    listed column's value is replaced by ``<prefix>_<md5(salt|col|value)
    [:16]>`` — stable (the same value always maps to the same token, so
    joins/groupBys on the column still work), irreversible without the
    salt, and column-scoped (the same email in two different columns
    yields two different tokens, preventing cross-column linkage).

    ``prefix_map`` overrides the default prefix (the column name) —
    e.g. {"email": "user"}.  NULLs stay NULL (``keep_null=False`` maps
    them to a token too, hiding WHICH rows had values).

    Pure JVM expressions (md5/concat) — zero shuffles, zero UDFs;
    replayable bit-for-bit by any engine with md5, so de-identified
    exports remain oracle-checkable."""
    out = df
    for col in cols:
        prefix = (prefix_map or {}).get(col, col)
        token = F.concat(
            F.lit(f"{prefix}_"),
            F.substring(
                F.md5(
                    F.concat_ws("|", F.lit(salt), F.lit(col), F.col(col).cast("string"))
                ),
                1,
                16,
            ),
        )
        if keep_null:
            out = out.withColumn(
                col, F.when(F.col(col).isNull(), F.lit(None)).otherwise(token)
            )
        else:
            out = out.withColumn(col, token)
    return out


def compression_ratio_stats(
    df: DataFrame, id_col: str, text_col: str, level: int = 6
) -> DataFrame:
    """Per-document zlib compression ratio — the Gopher/FineWeb-class
    quality signal built-in heuristics miss: highly repetitive or
    template junk compresses far below normal prose, near-random noise
    barely compresses at all, so curation pipelines band-pass on the
    ratio.  Returns (id, raw_len, compressed_len, ratio) with
    ratio = compressed/raw bytes (NULL for empty text); zlib level is
    pinned so the statistic is deterministic.

    One Arrow-batched pass, no shuffle — the ratio is a map-side column
    like any other quality feature and composes with quality_filter."""
    import pandas as pd
    import zlib

    def _map(batches):
        for pdf in batches:
            raw, comp, ratio = [], [], []
            for text in pdf[text_col]:
                b = (text or "").encode("utf-8")
                raw.append(len(b))
                if not b:
                    comp.append(None)
                    ratio.append(None)
                    continue
                c = len(zlib.compress(b, level))
                comp.append(c)
                ratio.append(round(c / len(b), 6))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_len": raw,
                    "compressed_len": pd.array(comp, dtype="Int64"),
                    "ratio": pd.array(ratio, dtype="float64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        _map, f"{id_col} long, raw_len long, compressed_len long, ratio double"
    )


def blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    id_col: str,
    text_col: str,
    term_col: str = "term",
) -> DataFrame:
    """C4-style bad-words filtering (Raffel et al. 2020 §2.2 removed any
    page containing a word on a public blocklist): flag every document
    containing any blocklist TERM, where a term is one lowercase word
    or a multi-word phrase matched on word boundaries.

    Scale shape — a JOIN, not a regex union: the document side explodes
    to DISTINCT lowercased tokens (corpus-token-sized, map-side
    combined) and equi-joins the blocklist on the term's FIRST word;
    multi-word phrases then verify by word-boundary containment on the
    space-normalized text.  A 50k-term list as one regex alternation is
    quadratic-ish per char in the automaton and un-pushable; the join
    form broadcasts a small list automatically (AQE) and shuffles both
    sides when the list itself is corpus-scale (trademark/URL lists).
    No UDFs anywhere.

    Returns one row per input document: (id, n_hits = distinct matched
    terms, hit_terms = sorted array, blocked = n_hits > 0)."""
    norm_text = F.concat(
        F.lit(" "),
        F.array_join(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), " "),
        F.lit(" "),
    )
    doc_tokens = docs.select(
        F.col(id_col).alias("__id__"),
        norm_text.alias("__norm__"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        ).alias("__tok__"),
    )
    # normalize the term exactly like the text: lowercase, whitespace
    # runs collapsed to single spaces (so " Hash   Value " matches)
    terms = blocklist.select(
        F.array_join(
            F.split(F.lower(F.trim(F.col(term_col))), r"\s+"), " "
        ).alias("__term__")
    ).distinct()
    terms = terms.withColumn(
        "__tok__", F.split(F.col("__term__"), r"\s+").getItem(0)
    )
    hits = (
        doc_tokens.join(terms, "__tok__")
        .filter(
            F.col("__norm__").contains(
                F.concat(F.lit(" "), F.col("__term__"), F.lit(" "))
            )
        )
        .groupBy("__id__")
        .agg(
            F.count_distinct("__term__").alias("n_hits"),
            F.array_sort(F.collect_set("__term__")).alias("hit_terms"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("__id__"))
        .distinct()
        .join(hits, "__id__", "left")
        .select(
            F.col("__id__").alias(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
            F.coalesce(
                F.col("hit_terms"), F.array().cast("array<string>")
            ).alias("hit_terms"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("blocked"),
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: Optional[str] = None,
) -> DataFrame:
    """Privacy audit of a training table before release (Sweeney 2002
    k-anonymity; Machanavajjhala 2007 l-diversity): group rows by the
    quasi-identifier combination and flag equivalence classes smaller
    than ``k`` — each such class's rows are re-identifiable by joining
    public data on the quasi-identifiers.  With ``sensitive_col`` the
    audit also reports ``l`` = distinct sensitive values per class
    (l = 1 means membership alone discloses the sensitive value even
    when k holds).

    ONE map-side-combined aggregation on the quasi-identifier key —
    the class count is corpus-independent when identifiers are
    generalized (the intended use), and nothing else shuffles.

    Returns one row per equivalence class: (quasi cols..., n,
    violates_k[, l, violates_l -- l < 2])."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("l"))
    out = df.groupBy(*quasi_cols).agg(*aggs)
    out = out.withColumn("violates_k", F.col("n") < k)
    if sensitive_col is not None:
        out = out.withColumn("violates_l", F.col("l") < 2)
    return out


def mutual_information(
    df: DataFrame, col_pairs: Sequence, base: Optional[float] = None
) -> DataFrame:
    """Pairwise mutual information between categorical columns — the
    data-profiling signal for redundant features and leakage screens
    (a feature with high MI against the label column leaks it):

        MI(X, Y) = Σ_xy p(x, y) · ln( p(x, y) / (p(x) p(y)) )

    plus the normalized variant NMI = MI / min(H(X), H(Y)) (0 when
    either side is constant).  NULLs count as a regular category (a
    NULL pattern that predicts another column is exactly what a leakage
    screen must see).

    Scale shape: ONE aggregation per pair on the (x, y) key space plus
    two marginal rollups DERIVED from it (no second corpus scan); the
    joint key space is |X| × |Y| — profiling-sized, not corpus-sized.
    All-JVM expressions.

    Returns (col_x, col_y, mi, nmi, n_joint) per requested pair."""
    spark = df.sparkSession
    results = None
    for cx, cy in col_pairs:
        joint = (
            df.select(
                F.col(cx).cast("string").alias("__x__"),
                F.col(cy).cast("string").alias("__y__"),
            )
            .groupBy("__x__", "__y__")
            .agg(F.count(F.lit(1)).alias("__n__"))
        )
        tot = F.sum("__n__").over(Window.partitionBy())
        px = F.sum("__n__").over(Window.partitionBy("__x__"))
        py = F.sum("__n__").over(Window.partitionBy("__y__"))
        scored = joint.select(
            (F.col("__n__") / tot).alias("pxy"),
            (px / tot).alias("px"),
            (py / tot).alias("py"),
        )
        agg = scored.agg(
            F.sum(
                F.col("pxy")
                * F.log(F.col("pxy") / (F.col("px") * F.col("py")))
            ).alias("mi"),
            F.count(F.lit(1)).alias("n_joint"),
        )
        # H(X)/H(Y) via tiny rollups of the joint (global windows over
        # the profiling-sized joint table, never over the corpus)
        def entropy(marginal_col: str) -> DataFrame:
            frac = (
                joint.groupBy(marginal_col)
                .agg(F.sum("__n__").alias("nm"))
                .select(
                    (
                        F.col("nm") / F.sum("nm").over(Window.partitionBy())
                    ).alias("p")
                )
            )
            return frac.agg(
                F.sum(-F.col("p") * F.log("p")).alias("h")
            )

        hx = entropy("__x__")
        hy = entropy("__y__")
        row = (
            agg.select("mi", "n_joint")
            .crossJoin(hx.select(F.col("h").alias("hx")))
            .crossJoin(hy.select(F.col("h").alias("hy")))
            .select(
                F.lit(cx).alias("col_x"),
                F.lit(cy).alias("col_y"),
                F.round("mi", 6).alias("mi"),
                F.round(
                    F.when(
                        F.least("hx", "hy") > 0,
                        F.col("mi") / F.least("hx", "hy"),
                    ).otherwise(F.lit(0.0)),
                    6,
                ).alias("nmi"),
                F.col("n_joint").cast("long").alias("n_joint"),
            )
        )
        results = row if results is None else results.unionByName(row)
    return results


def discretize_quantiles(
    df: DataFrame,
    cols: Sequence[str],
    n_bins: int = 4,
    exact: bool = False,
    relative_error: float = 0.001,
) -> DataFrame:
    """Equal-frequency (quantile) binning — the feature-engineering
    discretizer (Spark MLlib's QuantileDiscretizer shape, rebuilt on
    plain SQL so the cutpoints are engine-reproducible): per column,
    compute the ``n_bins - 1`` interior quantile cutpoints, then append
    ``{col}_bin`` = the number of cutpoints strictly below the value
    (0..n_bins-1; NULLs stay NULL).  Cutpoints are rounded to 6
    decimals BEFORE assignment so a cross-engine last-ulp difference in
    the interpolated quantile cannot flip a boundary value's bin.

    Scale shape: ONE aggregation per call (all columns' quantiles in
    the same agg — ``approx_percentile`` sketches by default, the
    bounded-memory 100 TB path; ``exact=True`` switches to the exact
    interpolated ``percentile`` for oracle-grade reproducibility), then
    a pure narrow projection — no shuffle of the corpus, no UDFs."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    probs = [i / n_bins for i in range(1, n_bins)]
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {int(1.0 / relative_error)}"
    aggs = [
        F.expr(
            f"{fn}({c}, array({', '.join(str(p) for p in probs)}){acc})"
        ).alias(f"__q_{c}")
        for c in cols
    ]
    row = df.agg(*aggs).collect()[0]
    out = df
    for c in cols:
        cuts = [round(float(v), 6) for v in row[f"__q_{c}"]]
        bin_expr = None
        for cut in cuts:
            term = (F.col(c) > F.lit(cut)).cast("int")
            bin_expr = term if bin_expr is None else bin_expr + term
        out = out.withColumn(
            f"{c}_bin",
            F.when(F.col(c).isNull(), F.lit(None)).otherwise(bin_expr),
        )
    return out


def html_extract(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """HTML -> text boilerplate extraction — the WET-extraction stage
    every web-corpus pipeline starts from (C4 strips markup before its
    heuristics, Raffel et al. 2020 §2.2; CCNet/RefinedWeb consume the
    pre-extracted WET text): strip scripts/styles/comments/head, turn
    block-level tags into line breaks, drop remaining tags, decode the
    common entities, and normalize whitespace — plus the page-level
    metadata curation keys on (title, robots-noindex, outbound links).

    Entirely JVM regexp expressions (one whole-stage-codegen projection,
    zero UDFs, no shuffle — linear in corpus bytes at 100 TB), and every
    pattern is RE2-compatible (no backreferences or lookarounds) so the
    DuckDB oracle replays the chain verbatim.  Entity decode order:
    specific entities first, ``&amp;`` LAST — "&amp;lt;" must decode to
    the literal "&lt;", not "<".

    Returns (id, title, text, links array, n_links, noindex)."""
    entities = (
        (r"&lt;", "<"),
        (r"&gt;", ">"),
        (r"&quot;", "\""),
        (r"&#39;", "'"),
        (r"&nbsp;", " "),
        (r"&amp;", "&"),
    )
    h = F.col(html_col)
    title = F.regexp_extract(h, r"(?is)<title[^>]*>([^<]*)</title>", 1)
    for pat, rep in entities:
        title = F.regexp_replace(title, pat, rep)
    title = F.trim(title).alias("title")
    noindex = h.rlike(
        r"(?is)<meta[^>]*content\s*=\s*\"[^\"]*noindex"
    ).alias("noindex")
    links = F.expr(
        f"regexp_extract_all({html_col},"
        " '(?is)<a[^>]*href\\\\s*=\\\\s*\"([^\"]*)\"', 1)"
    ).alias("links")
    body = h
    for pat, rep in (
        (r"(?is)<script[^>]*>.*?</script>", " "),
        (r"(?is)<style[^>]*>.*?</style>", " "),
        (r"(?is)<head[^>]*>.*?</head>", " "),
        (r"(?s)<!--.*?-->", " "),
        (
            r"(?is)</?(p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table"
            r"|section|article|header|footer|blockquote)[^>]*>",
            "\n",
        ),
        (r"(?s)<[^>]+>", " "),
        *entities,
        (r"[ \t\r\f]+", " "),
        (r" ?\n ?", "\n"),
        (r"\n+", "\n"),
        (r"^\s+|\s+$", ""),
    ):
        body = F.regexp_replace(body, pat, rep)
    return df.select(
        F.col(id_col),
        title,
        body.alias("text"),
        links,
        F.size(links).alias("n_links"),
        noindex,
    )


def dp_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    seed: str = "dp-0",
    sum_col: Optional[str] = None,
    bounds: Optional[tuple] = None,
) -> DataFrame:
    """ε-differentially-private aggregate release (the Laplace
    mechanism, Dwork et al. 2006) — the privacy-preserving way to
    publish per-group statistics of a training corpus: per group emit
    ``count + Laplace(1/ε)`` and, when ``sum_col``/``bounds`` are
    given, the per-row-CLIPPED sum + ``Laplace(max(|lo|,|hi|)/ε)``
    (clipping bounds the sensitivity — without it a single row could
    shift the sum arbitrarily and no finite noise suffices).

    Noise is drawn by inverse-CDF from a seeded md5 uniform
    (u = 52-bit md5 prefix of seed|metric|group-key; X =
    −b·sgn(u−½)·ln(1−2|u−½|)), so the release is deterministic and
    engine-replayable — the reproducible-pipeline form; a production
    release keeps the seed secret, which is the only difference between
    this and the textbook mechanism.  One map-side-combined aggregation
    (noise is a per-GROUP expression, O(groups) work); scores rounded
    at 6.  NULL group keys are excluded (concat_ws would alias them
    with empty strings)."""
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    if (sum_col is None) != (bounds is None):
        raise ValueError("sum_col and bounds come together")
    gcols = [F.col(c) for c in group_cols]
    grouped = df
    for c in group_cols:
        grouped = grouped.filter(F.col(c).isNotNull())
    aggs = [F.count(F.lit(1)).alias("__n__")]
    if sum_col is not None:
        lo, hi = bounds
        if not lo < hi:
            raise ValueError("bounds must be (lo, hi) with lo < hi")
        clipped = F.greatest(
            F.lit(float(lo)),
            F.least(F.lit(float(hi)), F.col(sum_col).cast("double")),
        )
        aggs.append(F.sum(clipped).alias("__s__"))
    stats = grouped.groupBy(*gcols).agg(*aggs)

    def lap(metric: str, b: float):
        key = F.concat_ws(
            "|", F.lit(seed), F.lit(metric),
            *[F.col(c).cast("string") for c in group_cols],
        )
        u = (
            F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double")
            + F.lit(0.5)
        ) / F.lit(float(1 << 52))
        return (
            F.lit(-b)
            * F.signum(u - 0.5)
            * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
        )

    out = [
        *group_cols,
        F.round(F.col("__n__") + lap("count", 1.0 / epsilon), 6).alias(
            "dp_count"
        ),
    ]
    if sum_col is not None:
        sens = max(abs(float(bounds[0])), abs(float(bounds[1])))
        out.append(
            F.round(
                F.col("__s__") + lap("sum", sens / epsilon), 6
            ).alias("dp_sum")
        )
    return stats.select(*out)
