"""North-star corpus: LLM-data-pipeline operators over documents /
embeddings / events — deduplication (exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine), similarity search (brute-force + LSH ANN),
text analysis (stats, language-ID, fingerprints), multimodal plumbing,
as-of join, sessionization.

Oracle notes:
- MinHash+LSH shares the *exact* Jaccard oracle: candidates are verified
  exactly, and with r=2/b=64 fixed-seed banding the candidate recall at
  j>=0.4 is 1-(1-0.16)^64 ≈ 1-1.4e-5 — deterministic for a given corpus
  (validated against the oracle at sf0.001 and sf0.01).
- SimHash / ANN entries use the q45_sketch_bounds pattern: the raw
  signatures / approximate neighbor sets are engine-specific, but each
  entry emits oracle-reproducible values (md5 text-group stats, exact
  top-10 ids) plus an in-query property boolean (one-signature-per-
  exact-dup-group, recall >= floor) that both engines state — no
  rows-only rows remain in the driver window.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from fluss_datafusion_spark.corpus import query, t
from fluss_datafusion_spark.functions import multimodal
from fluss_datafusion_spark.functions import text as tx
from fluss_datafusion_spark.operators import dedup, sessionize, similarity
from fluss_datafusion_spark.operators.asof import asof_join

# --------------------------------------------------------------------------
# deduplication
# --------------------------------------------------------------------------


@query(
    "ns_dedup_exact",
    oracle="""
    SELECT md5(array_to_string(regexp_split_to_array(lower(trim(text)), '\\s+')[1:5], ' '))
               AS prefix_fp,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           count(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def ns_dedup_exact(spark, sf_dir):
    """Exact dedup by boilerplate-head fingerprint: one hash-groupBy,
    the O(n) dedup primitive (reference has nothing comparable; this is
    the north-star extension surface)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.withColumn("prefix_fp", tx.prefix_fingerprint(F.col("text"), 5))
        .groupBy("prefix_fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


_EXACT_JACCARD_ORACLE = """
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(tk) - 2),
                   i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS s
        FROM toks WHERE len(tk) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(a.s || b.s)), 4) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(a.s || b.s)) >= 0.4
"""


@query(
    # r7 rotation: extended — the inverted-index pair-counting family
    # keeps core rows via ns_dedup_minhash_lsh (same exact-Jaccard oracle)
    "ns_dedup_ngram_jaccard", extended=True, oracle=_EXACT_JACCARD_ORACLE,
)
def ns_dedup_ngram_jaccard(spark, sf_dir):
    """Exact all-pairs word-3-gram Jaccard (threshold 0.4).  Quadratic —
    the correctness baseline; at scale you block (by lang/source) or use
    the MinHash+LSH variant below."""
    docs = t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.4)
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


@query("ns_dedup_minhash_lsh", oracle=_EXACT_JACCARD_ORACLE)
def ns_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(128) + LSH(64 bands x 2 rows) candidates, exactly
    verified — linear-ish scale path; shares the exact-Jaccard oracle
    (see module docstring for the recall argument)."""
    docs = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_perm=128, rows_per_band=2, threshold=0.4
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


@query(
    # r6 rotation: -> extended (VERDICT r5 #7 — dedup keeps 7 core rows;
    # the displaced slot funds ns_retrieval_hybrid in the driver window)
    "ns_dedup_simhash", extended=True,
    oracle="""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0 ELSE
               CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS INT)
           END AS n_tokens,
           TRUE AS order_invariant,
           TRUE AS scale_invariant
    FROM documents
    """,
)
def ns_dedup_simhash(spark, sf_dir):
    """64-bit SimHash with a DETERMINISTIC oracle (the q45_sketch_bounds
    pattern, closing the r2 rows-only gap).  The raw signature depends
    on Spark's xxhash64, which no oracle engine has, and the corpus has
    no exact-duplicate texts to group — so the entry asserts the
    algorithm's two algebraic invariants PER DOCUMENT, both exactly
    decidable and both stated blind by the oracle:

    - ``order_invariant``: SimHash is a pure function of the token
      MULTISET, so the signature of the token-sorted text equals the
      original's (catches positional hashing / nondeterministic
      tokenization bugs);
    - ``scale_invariant``: doubling the text doubles every bit's vote
      sum, preserving sign and zero, so the signature is unchanged
      (catches majority-vote threshold bugs, e.g. >= vs >).

    ``n_tokens`` anchors the row to oracle-computable data.  Plan
    shape: the three variants explode from one scan (no re-read), one
    token explode + one 64-vote agg over 3N rows, one final groupBy per
    doc — all map-side-combined shuffles, nothing on the driver."""
    docs = t(spark, sf_dir, "documents")
    lowered = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    variants = docs.select(
        F.col("doc_id"),
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("v"), F.col("text").alias("vt")),
                F.struct(
                    F.lit(1).alias("v"),
                    F.array_join(F.sort_array(lowered), " ").alias("vt"),
                ),
                F.struct(
                    F.lit(2).alias("v"),
                    F.concat_ws(" ", F.col("text"), F.col("text")).alias("vt"),
                ),
            )
        ).alias("var"),
    ).select(
        (F.col("doc_id") * 4 + F.col("var.v")).alias("vid"),
        F.col("var.vt").alias("text"),
    )
    sig = dedup.simhash(variants, "vid", "text").select(
        (F.col("vid") / 4).cast("long").alias("doc_id"),
        F.pmod("vid", F.lit(4)).cast("int").alias("v"),
        "simhash",
    )
    per_doc = sig.groupBy("doc_id").agg(
        F.max(F.when(F.col("v") == 0, F.col("simhash"))).alias("s0"),
        F.max(F.when(F.col("v") == 1, F.col("simhash"))).alias("s1"),
        F.max(F.when(F.col("v") == 2, F.col("simhash"))).alias("s2"),
    )
    counts = docs.select("doc_id", tx.token_count(F.col("text")).alias("n_tokens"))
    return counts.join(per_doc, "doc_id").select(
        "doc_id",
        "n_tokens",
        (F.col("s0") == F.col("s1")).alias("order_invariant"),
        (F.col("s0") == F.col("s2")).alias("scale_invariant"),
    )


@query(
    "ns_dedup_embedding",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(
               list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(b.v, x -> x*x)))), 6) AS cos
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
          / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
             * sqrt(list_sum(list_transform(b.v, x -> x*x)))) >= 0.3
    """,
)
def ns_dedup_embedding(spark, sf_dir):
    """Embedding near-dup pairs (cosine >= 0.3) blocked by label — the
    blocked pair join keeps the quadratic term bounded per block."""
    emb = t(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_cosine_pairs(
        emb, "vec_id", "embedding", threshold=0.3, block_col="label"
    )
    return pairs.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------


@query(
    "ns_sim_topk_bruteforce",
    oracle="""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id, c.vec_id AS neighbor_id,
               list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x*x)))) AS cos
        FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
    )
    SELECT vec_id, neighbor_id, round(cos, 6) AS cos,
           CAST(rank AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def ns_sim_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-10 for query vectors (vec_id < 5): broadcast
    queries x streamed corpus, window top-k.  The correctness baseline
    for ANN."""
    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    res = similarity.cosine_topk(
        emb, queries_df, "vec_id", "embedding", "vec_id", "embedding", k=11
    )
    # cosine_topk keeps self-matches; drop them and re-rank to top-10.
    res = res.filter(F.col("neighbor_id") != F.col("vec_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        res.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("vec_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


_EXACT_TOP10_ORACLE = """
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id, c.vec_id AS neighbor_id,
               list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x*x)))) AS cos
        FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
    ),
    topk AS (
        SELECT vec_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= 10
    )
    SELECT vec_id,
           array_to_string(list(neighbor_id ORDER BY neighbor_id), ',') AS exact_ids,
           TRUE AS recall_ok
    FROM topk GROUP BY vec_id
"""


_CLUSTERED_TOP10_ORACLE = """
    WITH e AS (
        SELECT vec_id,
               list_transform(range(len(embedding)), i ->
                   CAST(embedding[i + 1] AS DOUBLE)
                   + CASE WHEN (i // 4) = (vec_id % 16)
                          THEN 1.0 ELSE 0.0 END) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id, c.vec_id AS neighbor_id,
               list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x*x)))) AS cos
        FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
    ),
    topk AS (
        SELECT vec_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= 10
    )
    SELECT vec_id,
           array_to_string(list(neighbor_id ORDER BY neighbor_id), ',') AS exact_ids,
           TRUE AS recall_ok
    FROM topk GROUP BY vec_id
"""


def clustered_embeddings(emb):
    """Deterministic cluster-structure injection for the IVF fixture:
    vector i gains +1.0 on the 4-dim block ``[4c, 4c+4)`` where
    ``c = vec_id % 16`` — 16 well-separated clusters over the unit-norm
    isotropic base vectors (within-cluster cos ~0.85, cross ~0.1).
    Pure IEEE arithmetic on the same float32 inputs in both engines, so
    the DuckDB oracle reproduces the vectors bit-for-bit.  This is the
    regime real embedding corpora live in (the raw synthetic embeddings
    are isotropic — any honest IVF's recall there equals the probed
    corpus fraction, which misgrades the operator; see ROADMAP r6)."""
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x, i: x.cast("double")
            + F.when(
                F.floor(i / F.lit(4)) == F.col("vec_id") % 16, F.lit(1.0)
            ).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )


def _ann_recall_entry(spark, sf_dir, ann_fn, floor: float, emb_fn=None):
    """Shared shape for the ANN entries' deterministic-oracle form (the
    q45_sketch_bounds pattern): run the ANN path AND the exact top-10 in
    one query, emit the exact ids (which the oracle reproduces verbatim
    via SQL brute force) plus a ``recall_ok`` boolean — ANN top-10
    overlap with exact top-10 >= floor.  Both algorithms are
    deterministic (seeded hyperplanes / seedless smallest-id IVF init),
    so the booleans are a pure function of the corpus and the driver's
    value hash is stable.  The brute-force side scans queries x corpus —
    that is the standard ANN eval harness (5 query vectors), not the
    production read path, which touches only probed buckets/lists."""
    from pyspark.sql import Window

    emb = t(spark, sf_dir, "embeddings")
    if emb_fn is not None:
        emb = emb_fn(emb)
    queries_df = emb.filter(F.col("vec_id") < 5)
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))

    def top10(res):
        return (
            res.filter(F.col("neighbor_id") != F.col("vec_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("vec_id", "neighbor_id")
        )

    ann = top10(ann_fn(emb, queries_df))
    exact = top10(
        similarity.cosine_topk(
            emb, queries_df, "vec_id", "embedding", "vec_id", "embedding", k=11
        )
    )
    hits = (
        ann.join(exact, ["vec_id", "neighbor_id"])
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        exact.groupBy("vec_id")
        .agg(
            # Serialized (not array<bigint>) because the driver's pandas
            # canonicalizer cannot sort/hash list-valued cells; numeric
            # sort first so ordering matches the oracle's ORDER BY.
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("neighbor_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("exact_ids"),
            F.count(F.lit(1)).alias("n_exact"),
        )
        .join(hits, "vec_id", "left")
        .select(
            "vec_id",
            "exact_ids",
            (
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact")
                >= F.lit(floor)
            ).alias("recall_ok"),
        )
    )


@query("ns_sim_ann_lsh", oracle=_EXACT_TOP10_ORACLE)
def ns_sim_ann_lsh(spark, sf_dir):
    """Approximate top-10 via 16-table random-hyperplane LSH, verified
    with a deterministic oracle: exact top-10 ids (SQL-reproducible) +
    in-query recall >= 0.75 boolean.  n_tables=16/n_planes=4 measured
    min per-query recall 0.8 at sf0.001 and sf0.01 (8 tables bottomed
    at 0.5 — below any honest floor)."""
    return _ann_recall_entry(
        spark,
        sf_dir,
        lambda emb, q: similarity.lsh_ann_topk(
            emb, q, "vec_id", "embedding", "vec_id", "embedding",
            k=11, dim=64, n_planes=4, n_tables=16,
        ),
        floor=0.75,
    )


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------


@query(
    "ns_text_stats",
    oracle="""
    WITH d AS (
        SELECT doc_id, text,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS tk,
               length(text) AS n_char,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
        FROM documents
    )
    SELECT doc_id,
           CAST(len(tk) AS INT) AS n_tokens,
           CAST(list_sum(list_transform(tk,
                w -> greatest(1, CAST(ceil(length(w) / 4.0) AS INT)))) AS INT)
               AS bpe_tokens,
           round((least(1.0, len(tk) / 20.0)
                  + (CASE WHEN n_char > 0 THEN CAST(n_alpha AS DOUBLE)/n_char ELSE 0 END)
                  + (CASE WHEN len(tk) > 0
                          AND CAST(n_char AS DOUBLE)/len(tk) BETWEEN 3 AND 12
                          THEN 1.0 ELSE 0.0 END)) / 3.0, 4) AS quality
    FROM d
    """,
)
def ns_text_stats(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("n_tokens"),
        tx.bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
        F.round(tx.quality_score(F.col("text")), 4).alias("quality"),
    )


@query(
    "ns_text_sentences",
    oracle="""
    WITH p AS (
        -- punctuation-bearing fixture synthesized deterministically
        -- from the raw corpus (documents carry no punctuation): every
        -- 15-word run becomes three 5-word sentences cycling . ! ?
        SELECT doc_id,
               regexp_replace(text,
                   '((\\w+ ){4}\\w+) ((\\w+ ){4}\\w+) ((\\w+ ){4}\\w+) ',
                   '\\1. \\3! \\5? ', 'g') AS pt
        FROM documents WHERE doc_id < 120
    ),
    s AS (
        SELECT doc_id,
               unnest(string_split(
                   regexp_replace(pt, '([.!?]) ', '\\1|', 'g'), '|'))
                   AS sentence
        FROM p
    )
    SELECT doc_id, sentence,
           CAST(len(string_split(sentence, ' ')) AS INT) AS n_words,
           CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT)
               AS n_sentences
    FROM s WHERE length(sentence) > 0
    """,
    extended=True,
)
def ns_text_sentences(spark, sf_dir):
    """Sentence segmentation (r10 — VERDICT r9 item 7, previously
    blocked on 'documents carry no punctuation'): the fixture is
    SYNTHESIZED in-query — a deterministic regex stamps cycling
    terminators onto every 15-word run, identically in Spark and the
    DuckDB oracle — then functions.text.sentences splits on
    terminator-then-space boundaries as a pure JVM expression chain
    (mark-then-split; no lookbehind, no UDFs).  Per-sentence rows carry
    word counts and the per-doc sentence count.

    Scale shape: one scan -> explode; no shuffle except the per-doc
    count window (constant-width key), and at 100 TB the window can be
    replaced by a size() on the pre-explode array — kept here to pin
    the windowed form too."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    pt = F.regexp_replace(
        F.col("text"),
        r"((\w+ ){4}\w+) ((\w+ ){4}\w+) ((\w+ ){4}\w+) ",
        "$1. $3! $5? ",
    )
    exploded = docs.select(
        "doc_id",
        F.explode(tx.sentences(pt)).alias("sentence"),
    )
    return exploded.select(
        "doc_id",
        "sentence",
        F.size(F.split(F.col("sentence"), " ")).cast("int").alias("n_words"),
        F.count("*")
        .over(Window.partitionBy("doc_id"))
        .cast("long")
        .alias("n_sentences"),
    )


_LANGID_ORACLE = """
    WITH s AS (
        SELECT doc_id, lang,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        FROM documents
    ),
    h AS (
        SELECT doc_id, lang,
            CAST(len(list_filter(tk, w -> w IN ('the','and','of','to','a'))) AS INT) AS s_en,
            CAST(len(list_filter(tk, w -> w IN ('der','die','und','das','ist'))) AS INT) AS s_de,
            CAST(len(list_filter(tk, w -> w IN ('le','la','et','les','des'))) AS INT) AS s_fr,
            CAST(len(list_filter(tk, w -> w IN ('el','la','que','de','los'))) AS INT) AS s_es,
            CAST(len(list_filter(tk, w -> w IN ('的','是','了','在','我'))) AS INT) AS s_zh
        FROM s
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
                WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                WHEN s_es >= s_zh THEN 'es'
                ELSE 'zh' END AS pred_lang
    FROM h
"""


@query(
    "ns_text_langid",
    oracle=_LANGID_ORACLE,
    extended=True,  # r5 fourth window: rotated out for q63_analyze_stats
    # (text keeps ns_text_stats in the driver window); still
    # hash-checked in CORRECTNESS_SELF.
)
def ns_text_langid(spark, sf_dir):
    """Stopword-ratio language ID (first-max-wins in en,de,fr,es,zh
    order — the oracle encodes the identical cascade)."""
    docs = t(spark, sf_dir, "documents")
    return tx.lang_id_table(docs, "doc_id", "text").select(
        "doc_id", "lang", "pred_lang"
    )


@query(
    "ns_text_fingerprint",
    extended=True,  # r5: rotated out for ns_retrieval_bm25
    # (text category keeps ns_text_stats / ns_text_langid in core)
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           md5(array_to_string(
               regexp_split_to_array(lower(trim(text)), '\\s+')[1:5], ' ')) AS prefix_fp
    FROM documents
    """,
)
def ns_text_fingerprint(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.fingerprint(F.col("text")).alias("fp"),
        tx.prefix_fingerprint(F.col("text"), 5).alias("prefix_fp"),
    )


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------


@query(
    "ns_multimodal_payload",
    extended=True,  # r8 rotation: -> extended for ns_dedup_image_phash
    # (multimodal keeps ns_multimodal_features + ns_multimodal_resize
    # core; the incoming row exercises decode AND the dedup family)
    oracle="""
    SELECT doc_id AS media_id,
           'application/octet-stream' AS content_type,
           CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
           sha256(text) AS payload_sha256
    FROM documents
    """,
)
def ns_multimodal_payload(spark, sf_dir):
    """Binary-column metadata pass (no decode): octet length + sha256
    over the payload, all JVM built-ins."""
    media = multimodal.documents_as_media(t(spark, sf_dir, "documents"))
    return multimodal.payload_stats(media)


@query(
    "ns_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
           CAST(doc_id % 512 + 1 AS INT) AS width,
           CAST((doc_id * 7) % 512 + 1 AS INT) AS height
    FROM documents
    """,
)
def ns_multimodal_features(spark, sf_dir):
    """REAL image decode: per document a valid PNG/GIF/BMP/JPEG header
    payload is synthesized (dims derived arithmetically from doc_id),
    then ``probe_image_meta`` parses format/width/height back from the
    raw bytes in an Arrow-batched mapInPandas kernel.  The oracle
    derives the same dims arithmetically — so the byte-level parse is
    verified against an independent computation."""
    media = multimodal.synthesize_image_media(
        t(spark, sf_dir, "documents"), id_col="doc_id"
    )
    return multimodal.probe_image_meta(media)


@query(
    "ns_multimodal_bmp_decode",
    extended=True,
    oracle="""
    SELECT doc_id AS media_id,
           CAST(doc_id % 16 + 1 AS INT) AS width,
           CAST((doc_id * 7) % 16 + 1 AS INT) AS height,
           ROUND(CAST(doc_id % 256 AS DOUBLE), 6) AS mean_r,
           ROUND(CAST((doc_id * 7) % 256 AS DOUBLE), 6) AS mean_g,
           ROUND(CAST((doc_id * 13) % 256 AS DOUBLE), 6) AS mean_b
    FROM documents
    """,
)
def ns_multimodal_bmp_decode(spark, sf_dir):
    """REAL full-pixel decode: per document a complete uncompressed
    24-bit BMP (header + pixel array, constant color derived from
    doc_id) is synthesized, then ``bmp_pixel_stats`` decodes the actual
    pixel bytes back (stride padding + bottom-up rows) and reports
    per-channel means.  The oracle derives the same stats
    arithmetically, so byte-level pixel decoding is verified against an
    independent computation — no imaging library anywhere."""
    media = multimodal.synthesize_bmp_media(
        t(spark, sf_dir, "documents"), id_col="doc_id"
    )
    stats = multimodal.bmp_pixel_stats(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@query(
    "ns_multimodal_png_decode",
    extended=True,
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(doc_id % 16 + 1 AS INT) AS width,
               CAST((doc_id * 7) % 16 + 1 AS INT) AS height
        FROM documents
    )
    SELECT doc_id AS media_id, width, height,
           ROUND(list_avg(list_transform(range(height),
                 y -> (31*y + doc_id) % 256)), 6) AS mean_r,
           ROUND(list_avg(list_transform(range(height),
                 y -> (31*y + 7*doc_id) % 256)), 6) AS mean_g,
           ROUND(list_avg(list_transform(range(height),
                 y -> (31*y + 13*doc_id) % 256)), 6) AS mean_b
    FROM dims
    """,
)
def ns_multimodal_png_decode(spark, sf_dir):
    """REAL compressed-pixel decode: per document a complete RGB PNG
    (real zlib stream, CRCs, scanline filters cycling through all five
    spec types) is synthesized, then ``png_pixel_stats`` inflates and
    unfilters the actual pixel bytes back and reports per-channel means.
    Row y of image id is the constant color ((31y+id)%256, (31y+7id)%256,
    (31y+13id)%256), so the oracle reproduces every mean with a range()
    aggregate — byte-exact verification of the stdlib-only PNG decoder
    (the r2 NotImplementedError boundary, now closed), no imaging
    library anywhere."""
    media = multimodal.synthesize_png_media(
        t(spark, sf_dir, "documents"), id_col="doc_id"
    )
    stats = multimodal.png_pixel_stats(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@query(
    "ns_multimodal_resize",  # r7: rotated in; r8 4th: -> extended for
    extended=True,           # ns_multimodal_scene_ingest
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(doc_id % 16 + 1 AS INT) AS w,
               CAST((doc_id * 7) % 16 + 1 AS INT) AS h
        FROM documents
    )
    SELECT doc_id AS media_id,
           w AS src_width, h AS src_height,
           CAST(8 AS INT) AS out_width, CAST(8 AS INT) AS out_height,
           ROUND(list_avg(list_transform(range(8),
                 j -> (31 * least((j * h) // 8, h - 1) + doc_id) % 256)),
                 4) AS mean_r,
           ROUND(list_avg(list_transform(range(8),
                 j -> (31 * least((j * h) // 8, h - 1) + 7 * doc_id) % 256)),
                 4) AS mean_g,
           ROUND(list_avg(list_transform(range(8),
                 j -> (31 * least((j * h) // 8, h - 1) + 13 * doc_id) % 256)),
                 4) AS mean_b,
           true AS decoded_ok
    FROM dims
    """,
)
def ns_multimodal_resize(spark, sf_dir):
    """Decode → RESIZE → featurize (r6 — the thumbnail step vision
    pipelines run between decode and the encoder): every synthesized
    PNG is resized to 8x8 with the documented nearest mapping
    src = min(floor(j*h/8), h-1), then per-channel means of the RESIZED
    pixels are emitted.  Fixture rows are constant per y, so the oracle
    replays the exact sampled-row means with a range() aggregate —
    byte-exact verification of the resize kernel's index math through
    the full decode path (Adam7 payloads included)."""
    media = multimodal.synthesize_png_media(
        t(spark, sf_dir, "documents"), id_col="doc_id"
    )
    return multimodal.image_resize_stats(media, 8, 8, method="nearest")


@query(
    "ns_multimodal_image_phash", extended=True,
    oracle="""
    WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200),
    bits AS (
        SELECT id, list_sum(list_transform(range(64), k ->
            CASE WHEN
                (CASE WHEN id >= 100 AND ((k % 8) * 16) // 9 = 0
                           AND 2 * (k // 8) = 0
                      THEN 255
                      ELSE (5 * (((k % 8) * 16) // 9) * (((k % 8) * 16) // 9)
                              * (id % 50 + 1)
                            + (2 * (k // 8)) * (7 + 3 * (id % 50))
                            + 13 * (((k % 8) * 16) // 9)) % 251
                 END)
                <
                (5 * ((((k % 8) + 1) * 16) // 9) * ((((k % 8) + 1) * 16) // 9)
                   * (id % 50 + 1)
                 + (2 * (k // 8)) * (7 + 3 * (id % 50))
                 + 13 * ((((k % 8) + 1) * 16) // 9)) % 251
            THEN CAST(1 AS HUGEINT) << (63 - CAST(k AS INTEGER))
            ELSE CAST(0 AS HUGEINT) END)) AS raw
        FROM ids
    )
    SELECT id AS media_id,
           CAST(CASE WHEN raw >= CAST(1 AS HUGEINT) << 63
                     THEN raw - (CAST(1 AS HUGEINT) << 64)
                     ELSE raw END AS BIGINT) AS dhash,
           true AS decoded_ok
    FROM bits
    """,
)
def ns_multimodal_image_phash(spark, sf_dir):
    """Perceptual dHash hash-checked BIT FOR BIT cross-engine (r8 —
    functions/multimodal.image_dhash_stats): decode the gradient-BMP
    fixture (synthesize_gradient_bmp_media — content closed-form in the
    id, one-pixel perturbation for ids >= 100), grayscale, nearest-
    resize to 8x9, pack the 64 horizontal-gradient comparisons MSB-
    first into a signed 64-bit value.  DuckDB re-derives every bit from
    the pixel formula and the documented scale-floor sampling grid
    (ys = 2r, xs = 16j//9) and re-packs the signed value — a single
    wrong comparison, sample index, or bit position hash-mismatches.
    The pipeline is the multimodal near-dup signal; pairing is
    ns_dedup_image_phash."""
    media = multimodal.synthesize_gradient_bmp_media(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        id_col="doc_id",
    )
    return multimodal.image_dhash_stats(media).select(
        "media_id", "dhash", "decoded_ok"
    )


@query(
    "ns_dedup_image_phash",  # r8: rotated INTO the core window (image
    # near-dup differentiator; OUT: ns_multimodal_payload)
    oracle="""
    WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(CASE WHEN (a.id < 100) = (b.id < 100) THEN 0 ELSE 1 END
                AS INTEGER) AS ham
    FROM ids a JOIN ids b ON a.id % 50 = b.id % 50 AND a.id < b.id
    """,
)
def ns_dedup_image_phash(spark, sf_dir):
    """Image near-duplicate detection end to end (r8 — decode →
    perceptual dHash → banded Hamming LSH → exact popcount verify;
    operators/dedup.hamming_near_dup_pairs): the gradient-BMP fixture
    plants 50 clusters of 4 pixel-identical copies, half of them
    carrying a one-pixel perturbation that flips EXACTLY one dHash bit
    by construction.  The pair set must be exactly the within-cluster
    pairs with ham = 0 for same-perturbation pairs and 1 across — a
    missed band, a wrong popcount, or a cross-cluster false positive
    (clusters are > 2 bits apart, test-pinned) all hash-mismatch.
    Scale shape: one (band, slice) shuffle with bucket-local pair
    expansion, never an all-pairs join — the SimHash posture applied to
    image fingerprints."""
    from fluss_datafusion_spark.operators.dedup import hamming_near_dup_pairs

    media = multimodal.synthesize_gradient_bmp_media(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        id_col="doc_id",
    )
    hashes = multimodal.image_dhash_stats(media)
    return hamming_near_dup_pairs(
        hashes, "media_id", "dhash", max_hamming=2
    ).select("id_a", "id_b", "ham")


@query(
    "ns_multimodal_resample",
    extended=True,
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8000 + (doc_id % 4) * 4000 AS INT) AS rate_in,
           CAST(16000 AS INT) AS rate_out,
           CAST(doc_id % 100 + 1 AS INT) AS frames_in,
           CAST(round((doc_id % 100 + 1) * 16000.0
                      / (8000 + (doc_id % 4) * 4000)) AS INT) AS frames_out,
           ROUND(CAST(doc_id % 2000 - 1000 AS DOUBLE), 4) AS mean_amp,
           ROUND(CAST(abs(doc_id % 2000 - 1000) AS DOUBLE), 4) AS rms,
           true AS decoded_ok
    FROM documents
    """,
)
def ns_multimodal_resample(spark, sf_dir):
    """Decode → RESAMPLE → featurize for audio (r6 — the rate
    normalization speech encoders need): every synthesized PCM16 WAV
    (rates 8/12/16/20 kHz) is resampled to 16 kHz with the documented
    start-aligned linear kernel and the resampled mean/RMS emitted.
    Constant-amplitude fixtures make resampling a fixed point, so the
    oracle states every output — incl. the exact resampled frame count
    round(n·16000/rate), whose ratios never land on .5 (no
    rounding-mode divergence) — closed-form."""
    media = multimodal.synthesize_wav_media(
        t(spark, sf_dir, "documents"), id_col="doc_id"
    )
    return multimodal.wav_resample_stats(media, 16000, method="linear")


@query(
    "ns_multimodal_fake_features",
    extended=True,
    oracle="""
    SELECT doc_id AS media_id,
           8 AS n_features,
           TRUE AS features_in_range,
           TRUE AS decoded_ok
    FROM documents
    """,
)
def ns_multimodal_fake_features(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction with the
    deterministic fake decoder, upgraded from rows-only to the q45
    boolean-oracle pattern: the feature VALUES are Python-side (no SQL
    oracle), but the pipeline contract — one 8-float vector per payload,
    every component in the fake's documented [0, 2) range, decode
    success — is exactly decidable per row and stated blind by the
    oracle.  Real-value coverage lives in the BMP/PNG/WAV decode
    entries, which check actual pixel/sample math."""
    media = multimodal.documents_as_media(t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media, fake=True)
    return feats.select(
        "media_id",
        F.size("feature").alias("n_features"),
        F.forall(
            "feature", lambda x: (x >= 0) & (x < 2)
        ).alias("features_in_range"),
        "decoded_ok",
    )


# --------------------------------------------------------------------------
# as-of join + sessionization
# --------------------------------------------------------------------------


@query(
    "ns_asof_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, c.event_id AS last_click_id
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def ns_asof_join(spark, sf_dir):
    """For each purchase, the most recent click by the same user at or
    before the purchase (one sort-merge pass — see operators/asof.py)."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("last_click_id"), "user_id", "ts"
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["last_click_id"],
    ).select("event_id", "user_id", "last_click_id")


@query(
    "ns_sessionize",
    oracle="""
    WITH g AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
               lag(CAST(ts AS TIMESTAMP)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ),
    m AS (
        SELECT user_id,
               CASE WHEN prev IS NULL OR ts > prev + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM g
    ),
    sessions AS (
        SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM m GROUP BY user_id
    ),
    sizes AS (
        SELECT user_id, session_id, count(*) AS sz FROM (
            SELECT user_id,
                   sum(CASE WHEN prev IS NULL OR ts > prev + INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id,
                   ts, event_id
            FROM g
        ) GROUP BY user_id, session_id
    )
    SELECT s.user_id, s.n_sessions, s.n_events,
           (SELECT max(sz) FROM sizes z WHERE z.user_id = s.user_id) AS max_session_events
    FROM sessions s
    """,
)
def ns_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min timeout): per-user session count,
    event count, and largest session."""
    ev = t(spark, sf_dir, "events")
    return sessionize.session_stats(
        ev, "user_id", "ts", gap="30 minutes", order_tiebreak="event_id"
    )


@query("ns_sim_ann_ivf", oracle=_CLUSTERED_TOP10_ORACLE)
def ns_sim_ann_ivf(spark, sf_dir):
    """Approximate top-10 via IVF inverted lists over CLUSTERED vectors
    (``clustered_embeddings`` — a deterministic +1.0-block transform the
    DuckDB oracle reproduces bit-for-bit), verified with the same
    deterministic-oracle shape as the LSH entry: exact top-10 ids +
    in-query recall >= 0.8 boolean.

    r7 entry reshape (VERDICT r6 item 1): the raw synthetic embeddings
    are ISOTROPIC — on them any honest IVF's recall equals the probed
    corpus fraction, so the r6 entry had to probe 12/16 lists
    (near-brute-force, 2.3x slower) to hold its floor, misrepresenting
    the operator.  With real cluster structure the r6 k-means|| seeding
    (Bahmani 2012, `similarity.py:_kmeans_parallel_seeds`) covers every
    true cluster and n_probe=2 of 16 holds recall 1.0 — the ~12.5%-of-
    corpus scan that is IVF's actual value at 100 TB.  Complements LSH —
    the two standard ANN scale paths."""
    return _ann_recall_entry(
        spark,
        sf_dir,
        lambda emb, q: similarity.ivf_ann_topk(
            emb, q, "vec_id", "embedding", "vec_id", "embedding",
            k=11, n_centroids=16, n_probe=2, n_iters=2,
        ),
        floor=0.8,
        emb_fn=clustered_embeddings,
    )


@query("ns_sim_ann_ivfpq", extended=True, oracle=_CLUSTERED_TOP10_ORACLE)
def ns_sim_ann_ivfpq(spark, sf_dir):
    """IVF-PQ approximate top-10 (r8 — similarity.pq_ann_topk, the
    FAISS IVFPQ + refine shape): the IVF coarse quantizer picks
    n_probe=2 of 16 lists, probed candidates are scored by asymmetric
    distance over 8-byte product-quantization codes (~32x smaller than
    the float32 vectors — at 100 TB the scoring scan reads codes, full
    vectors are touched only by the shortlist re-rank semi-join), and
    the ADC shortlist re-ranks with exact cosine.  Same clustered
    fixture and deterministic-oracle shape as ns_sim_ann_ivf: exact
    top-10 ids (DuckDB brute-forces them) + recall_ok >= 0.8 boolean.
    Codebook training is one md5-keyed sample job, farthest-first
    seeded — fully deterministic."""
    return _ann_recall_entry(
        spark,
        sf_dir,
        lambda emb, q: similarity.pq_ann_topk(
            emb, q, "vec_id", "embedding", "vec_id", "embedding",
            k=11, n_centroids=16, n_probe=2, m=8, ks=16, n_iters=2,
        ),
        floor=0.8,
        emb_fn=clustered_embeddings,
    )


# --------------------------------------------------------------------------
# data curation (decontamination, quotas, PII, TF-IDF)
# --------------------------------------------------------------------------


@query(
    "ns_curation_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(tk) - 2),
                   i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS s
        FROM toks WHERE len(tk) >= 3
    ),
    bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 100 = 0),
    doc_sh AS (SELECT doc_id, unnest(s) AS shingle FROM sh)
    SELECT doc_id, count(*) AS n_overlap
    FROM doc_sh JOIN bench USING (shingle)
    GROUP BY doc_id HAVING count(*) >= 2
    """,
)
def ns_curation_decontaminate(spark, sf_dir):
    """Train/test contamination: docs sharing >=2 word-3-shingles with a
    'benchmark' slice (doc_id % 100 = 0 stands in for an eval suite)."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 0)
    return curation.decontaminate(
        docs, bench, "doc_id", "text", k=3, min_overlap=2
    )


@query(
    "ns_contamination_embedding", extended=True,
    oracle="""
    WITH e AS (
        SELECT vec_id,
               list_transform(range(len(embedding)), i ->
                   CAST(embedding[i + 1] AS DOUBLE)
                   + CASE WHEN (i // 4) = (vec_id % 16)
                          THEN 1.0 ELSE 0.0 END) AS v
        FROM embeddings
    ),
    b AS (SELECT vec_id AS bid, v AS bv FROM e WHERE vec_id % 97 = 0),
    pairs AS (
        SELECT c.vec_id, b.bid,
               list_sum(list_transform(list_zip(c.v, b.bv),
                                       p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(c.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(b.bv, x -> x*x)))) AS cos
        FROM e c JOIN b ON c.vec_id <> b.bid
    )
    SELECT vec_id, count(*) AS n_bench_hits, TRUE AS recall_ok
    FROM pairs WHERE cos >= 0.5 GROUP BY vec_id
    """,
)
def ns_contamination_embedding(spark, sf_dir):
    """Embedding-space decontamination (r12 — paraphrased eval leakage
    that shares no n-grams): corpus vectors within cosine >= 0.5 of any
    benchmark vector (vec_id % 97 = 0 stands in for the eval suite) on
    the CLUSTERED fixture, where within-cluster cos ~0.85 and cross
    ~0.1 put the threshold in a wide margin both engines resolve
    identically.  Deterministic-oracle form (the ANN entries' shape):
    the EXACT brute-force contaminated set is the hash-checked result,
    and the IVF-candidate path (curation.embedding_decontaminate — the
    production read at 100 TB, O(corpus x bench / n_centroids)) rides
    as an in-query ``recall_ok`` >= 0.95 boolean the oracle states as
    TRUE."""
    from fluss_datafusion_spark.functions.vector import cosine_fast
    from fluss_datafusion_spark.operators import curation

    emb = clustered_embeddings(t(spark, sf_dir, "embeddings"))
    bench = emb.filter(F.col("vec_id") % 97 == 0)
    b2 = bench.select(
        F.col("vec_id").alias("__bid__"), F.col("embedding").alias("__bv__")
    )
    exact = (
        emb.crossJoin(F.broadcast(b2))
        .filter(F.col("vec_id") != F.col("__bid__"))
        .filter(
            cosine_fast(F.col("embedding"), F.col("__bv__")) >= F.lit(0.5)
        )
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_bench_hits"))
    )
    approx = curation.embedding_decontaminate(
        emb, bench, "vec_id", "embedding", 0.5,
        n_centroids=16, n_probe=2, n_iters=2,
    )
    rec = (
        exact.join(
            approx.select("vec_id", F.lit(True).alias("__hit__")),
            "vec_id",
            "left",
        )
        .agg(
            (
                F.count("__hit__") / F.count(F.lit(1)) >= F.lit(0.95)
            ).alias("recall_ok")
        )
    )
    return exact.crossJoin(F.broadcast(rec))


@query(
    "ns_curation_token_windows", extended=True,
    oracle="""
    WITH sized AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0 ELSE
                   CAST(len(regexp_split_to_array(lower(trim(text)),
                                                  '\\s+')) AS BIGINT)
               END AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM sized WHERE n_tokens > 0
    )
    SELECT doc_id, n_tokens,
           CAST((cum - n_tokens) // 512 AS BIGINT) AS start_window,
           CAST((cum - n_tokens) % 512 AS BIGINT) AS offset_in_window,
           CAST((cum - 1) // 512 AS BIGINT) AS end_window,
           CAST((cum - 1) // 512 - (cum - n_tokens) // 512 + 1 AS BIGINT)
               AS n_windows
    FROM c
    """,
)
def ns_curation_token_windows(spark, sf_dir):
    """Concat-and-chunk packing (curation.chunk_token_windows — the
    GPT-2/3/LLaMA pretraining layout, boundary-spanning 512-token
    windows over the id-ordered token stream).  The global token cumsum
    runs as range-partition local cumsums + broadcast prefix offsets
    (never a single-partition window); DuckDB replays the same cumsum
    with one window function and states every document's window
    coordinates exactly."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents")
    return curation.chunk_token_windows(
        docs, "doc_id", "text", window=512
    )


@query(
    "ns_curation_quota_sample", extended=True,
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn <= 10
    """,
)
def ns_curation_quota_sample(spark, sf_dir):
    """Per-language quota: deterministic first-10 docs per lang (source
    balancing / domain caps) via one window shuffle."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return curation.quota_sample(docs, ["lang"], 10, "doc_id")


@query(
    "ns_curation_pii_redact", extended=True,
    oracle="""
    WITH d AS (
        SELECT doc_id,
               text || ' contact: user' || doc_id ||
               '@example.com at 192.168.0.' || doc_id % 256 AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
               AS n_email,
           CAST(len(regexp_extract_all(t,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INT)
               AS n_ipv4,
           CAST(len(regexp_extract_all(t,
               '\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}')) AS INT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g'),
               '\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}', '<PHONE>', 'g')) AS redacted_md5
    FROM d
    """,
)
def ns_curation_pii_redact(spark, sf_dir):
    """PII redaction parity: synthetic emails/IPs appended to each doc,
    redacted with the shared RE2-safe patterns; the md5 of the redacted
    text must match the oracle byte-for-byte."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 192.168.0."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("t"),
    )
    out = curation.pii_redact(docs, "t")
    return out.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_ipv4").cast("int").alias("n_ipv4"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.md5(F.col("t_redacted")).alias("redacted_md5"),
    )


@query(
    "ns_curation_tfidf", extended=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE length(term) >= 1 GROUP BY 1, 2),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS N FROM documents)
    SELECT doc_id, term, tf, df, score, CAST(rank AS INT) AS rank
    FROM (
        SELECT doc_id, term, tf, df,
               round(tf * (ln((N + 1.0) / (df + 1.0)) + 1), 6) AS score,
               row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY round(tf * (ln((N + 1.0) / (df + 1.0)) + 1), 6)
                       DESC, term) AS rank
        FROM tf JOIN dft USING (term) CROSS JOIN n
    ) WHERE rank <= 3
    """,
)
def ns_curation_tfidf(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (smooth idf), deterministic
    (score desc, term asc) ranking."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents")
    return curation.tfidf_top_terms(docs, "doc_id", "text", top_n=3)


@query(
    "ns_curation_stratified_sample", extended=True,
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|' || lang), 1, 4) < '1999'
    """,
)
def ns_curation_stratified_sample(spark, sf_dir):
    """Deterministic ~10% stratified sample (md5-prefix filter salted by
    lang) — reproducible across engines/cluster sizes, zero shuffles."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return curation.stratified_sample(docs, "doc_id", 10, strata_cols=["lang"])


@query(
    "ns_curation_pack_sequences",
    extended=True,
    oracle="""
    SELECT count(*) AS n_docs,
           CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
               END) AS BIGINT) AS n_tokens,
           TRUE AS bins_within_limit,
           TRUE AS docs_packed_once
    FROM documents
    """,
)
def ns_curation_pack_sequences(spark, sf_dir):
    """Greedy partition-local sequence packing into 512-token bins, with
    a DETERMINISTIC oracle in the q45 pattern: bin COMPOSITION depends
    on the hash partitioning (no SQL oracle can reproduce it), but the
    packing invariants are exactly decidable — every document appears
    in exactly one bin, token totals are conserved, and every
    multi-doc bin respects the limit (oversized singletons are the
    documented pass-through).  The entry aggregates to one row of
    oracle-reproducible totals + invariant booleans; per-bin shapes
    stay covered by tests/test_curation.py."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents")
    packed = curation.pack_sequences(docs, "doc_id", "text", max_tokens=512)
    stats = packed.agg(
        F.sum("n_docs").cast("long").alias("__td__"),
        F.sum("n_tokens").cast("long").alias("__tt__"),
        F.max(
            F.when((F.col("n_tokens") > 512) & (F.col("n_docs") > 1), 1).otherwise(0)
        ).alias("__viol__"),
    )
    membership = packed.select(F.explode("doc_ids").alias("__d__")).agg(
        F.count_distinct("__d__").alias("__nd__"),
        F.count(F.lit(1)).alias("__nall__"),
    )
    return stats.crossJoin(membership).select(
        F.col("__td__").alias("n_docs"),
        F.col("__tt__").alias("n_tokens"),
        (F.col("__viol__") == 0).alias("bins_within_limit"),
        (
            (F.col("__nd__") == F.col("__nall__"))
            & (F.col("__nd__") == F.col("__td__"))
        ).alias("docs_packed_once"),
    )


@query(
    "ns_curation_embedding_contamination", extended=True,
    oracle="""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    b AS (SELECT vec_id AS bench_id, v FROM e WHERE vec_id % 100 = 0),
    scored AS (
        SELECT c.vec_id, b.bench_id,
               list_sum(list_transform(list_zip(c.v, b.v), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(c.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(b.v, x -> x*x)))) AS cos
        FROM e c, b
    )
    SELECT vec_id, bench_id, round(cos, 6) AS cos
    FROM (
        SELECT vec_id, bench_id, cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, bench_id) AS rn
        FROM scored WHERE cos >= 0.8
    ) WHERE rn = 1
    """,
)
def ns_curation_embedding_contamination(spark, sf_dir):
    """Embedding-space contamination vs a benchmark slice (vec_id % 100
    = 0): strongest benchmark match per corpus vector at cos >= 0.8."""
    from fluss_datafusion_spark.operators import curation

    emb = t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 100 == 0)
    out = curation.embedding_contamination(
        emb, bench, "vec_id", "embedding", threshold=0.8
    )
    return out.select("vec_id", "bench_id", F.round("cos", 6).alias("cos"))


@query(
    "ns_text_repetition", extended=True,
    oracle="""
    WITH lines AS (
        SELECT doc_id,
               list_filter(list_transform(string_split(text, chr(10)),
                                          l -> trim(l)),
                           l -> length(l) > 0) AS ls
        FROM documents
    ),
    linestats AS (
        SELECT doc_id,
               CAST(len(ls) AS INT) AS n_lines,
               CASE WHEN len(ls) > 0
                    THEN (len(ls) - len(list_distinct(ls))) / CAST(len(ls) AS DOUBLE)
                    ELSE 0.0 END AS dup_line_frac
        FROM lines
    ),
    tk AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    bg AS (
        SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
        FROM tk, unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    cnt AS (
        SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
    ),
    perdoc AS (
        SELECT doc_id, max(c) AS top, CAST(sum(c) AS BIGINT) AS n_bigrams
        FROM cnt GROUP BY doc_id
    )
    SELECT l.doc_id, l.n_lines, round(l.dup_line_frac, 6) AS dup_line_frac,
           coalesce(p.n_bigrams, 0) AS n_bigrams,
           round(coalesce(p.top / CAST(p.n_bigrams AS DOUBLE), 0.0), 6)
               AS top_bigram_frac
    FROM linestats l LEFT JOIN perdoc p USING (doc_id)
    """,
)
def ns_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality filters: duplicate-line fraction
    (array expressions, no shuffle) and most-frequent-bigram fraction
    (one explode + two map-side-combined aggs)."""
    from fluss_datafusion_spark.functions.text import repetition_stats

    out = repetition_stats(t(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(
        "doc_id",
        "n_lines",
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        "n_bigrams",
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
    )


@query(
    "ns_curation_chunking", extended=True,
    oracle="""
    WITH tk AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    st AS (
        SELECT doc_id, t, u.s AS start
        FROM tk,
             unnest(generate_series(0, len(t) - 1 - ((len(t) - 1) % 96), 96))
                 AS u(s)
    )
    SELECT doc_id,
           CAST(start / 96 AS INT) AS chunk_idx,
           array_to_string(t[start + 1 : start + 128], ' ') AS chunk_text,
           CAST(len(t[start + 1 : start + 128]) AS INT) AS n_chunk_tokens
    FROM st
    """,
)
def ns_curation_chunking(spark, sf_dir):
    """Overlapping token-window chunking (chunk=128, overlap=32 ->
    stride 96): pure narrow plan, no shuffle; every token lands in at
    least one chunk."""
    from fluss_datafusion_spark.operators import curation

    return curation.chunk_documents(
        t(spark, sf_dir, "documents"), "doc_id", "text",
        chunk_tokens=128, overlap=32,
    )


_CLUSTERS_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(tk) - 2),
                   i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS s
        FROM toks WHERE len(tk) >= 3
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(a.s || b.s)) >= 0.4
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges)
    , reach AS (
        WITH RECURSIVE r(node, label) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.dst, r.label FROM r JOIN edges e ON e.src = r.node
        ) SELECT * FROM r
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
"""


@query("ns_dedup_clusters", oracle=_CLUSTERS_ORACLE)
def ns_dedup_clusters(spark, sf_dir):
    """Near-dup pairs -> connected components: per-doc cluster ids via
    min-label propagation (the keep/drop resolution step after any
    pairwise dedup).  Oracle: transitive closure by recursive CTE,
    cluster_id = min reachable doc id."""
    docs = t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.4)
    return dedup.dedup_clusters(pairs)


@query(
    "ns_curation_vocab", extended=True,
    oracle="""
    WITH tk AS (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
        FROM documents WHERE length(trim(text)) > 0
    ),
    cnt AS (SELECT token, count(*) AS n_occurrences FROM tk GROUP BY token),
    tot AS (SELECT sum(n_occurrences) AS total FROM cnt),
    top AS (
        SELECT token, n_occurrences,
               row_number() OVER (ORDER BY n_occurrences DESC, token) AS rnk
        FROM cnt ORDER BY n_occurrences DESC, token LIMIT 50
    )
    SELECT token, n_occurrences, CAST(rnk AS INT) AS rank,
           round(CAST(sum(n_occurrences) OVER (ORDER BY rnk) AS DOUBLE)
                 / (SELECT total FROM tot), 6) AS cum_coverage
    FROM top
    """,
)
def ns_curation_vocab(spark, sf_dir):
    """Top-50 corpus vocabulary with cumulative coverage: one explode +
    map-side-combined counts + TakeOrdered (never a global sort of the
    full vocabulary)."""
    from fluss_datafusion_spark.operators import curation

    out = curation.build_vocab(t(spark, sf_dir, "documents"), "text", top_n=50)
    return out.select(
        "token", "n_occurrences", "rank",
        F.round("cum_coverage", 6).alias("cum_coverage"),
    )


@query(
    "ns_multimodal_wav_decode", extended=True,
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
           CAST(doc_id % 2 + 1 AS INT) AS channels,
           CAST(doc_id % 100 + 1 AS INT) AS n_frames,
           ROUND(CAST(doc_id % 100 + 1 AS DOUBLE) * 1000
                 / (8000 + (doc_id % 4) * 4000), 6) AS duration_ms,
           ROUND(CAST(doc_id % 2000 - 1000 AS DOUBLE), 6) AS mean_amp,
           ROUND(CAST(abs(doc_id % 2000 - 1000) AS DOUBLE), 6) AS rms
    FROM documents
    """,
)
def ns_multimodal_wav_decode(spark, sf_dir):
    """REAL audio sample decode: per document a complete 16-bit PCM WAV
    (RIFF/fmt/data chunks + constant-amplitude sample array, all fields
    derived from doc_id) is synthesized, then ``wav_pcm_stats`` parses
    the chunk headers and decodes the actual sample bytes back.  The
    oracle derives the same stats arithmetically — byte-level audio
    decoding verified with no audio library anywhere."""
    media = multimodal.synthesize_wav_media(
        t(spark, sf_dir, "documents"), id_col="doc_id"
    )
    stats = multimodal.wav_pcm_stats(media)
    return stats.select(
        "media_id", "sample_rate", "channels", "n_frames",
        F.round("duration_ms", 6).alias("duration_ms"),
        F.round("mean_amp", 6).alias("mean_amp"),
        F.round("rms", 6).alias("rms"),
    )


@query(
    "ns_curation_quality_filter",
    oracle="""
    WITH d AS (
        SELECT doc_id, text,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS tk,
               length(text) AS n_char,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
        FROM documents
    ),
    q AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(tk) END AS ntok,
               (least(1.0, len(tk) / 20.0)
                + (CASE WHEN n_char > 0 THEN CAST(n_alpha AS DOUBLE)/n_char ELSE 0 END)
                + (CASE WHEN len(tk) > 0
                        AND CAST(n_char AS DOUBLE)/len(tk) BETWEEN 3 AND 12
                        THEN 1.0 ELSE 0.0 END)) / 3.0 AS qs
        FROM d
    ),
    lines AS (
        SELECT doc_id,
               list_filter(list_transform(string_split(text, chr(10)),
                                          l -> trim(l)),
                           l -> length(l) > 0) AS ls
        FROM documents
    ),
    linestats AS (
        SELECT doc_id,
               CASE WHEN len(ls) > 0
                    THEN (len(ls) - len(list_distinct(ls))) / CAST(len(ls) AS DOUBLE)
                    ELSE 0.0 END AS dlf
        FROM lines
    ),
    bg AS (
        SELECT d.doc_id, tk[i] || ' ' || tk[i + 1] AS bigram
        FROM d, unnest(generate_series(1, len(tk) - 1)) AS u(i)
    ),
    cnt AS (
        SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
    ),
    perdoc AS (
        SELECT doc_id, max(c) AS top, CAST(sum(c) AS BIGINT) AS nbg
        FROM cnt GROUP BY doc_id
    )
    SELECT q.doc_id,
           coalesce(array_to_string(list_sort(list_filter([
               CASE WHEN q.qs < 0.3 THEN 'low_quality' END,
               CASE WHEN l.dlf > 0.3 THEN 'repeated_lines' END,
               CASE WHEN coalesce(p.nbg, 0) > 0
                    AND p.top / CAST(p.nbg AS DOUBLE) > 0.5
                    THEN 'repeated_ngrams' END,
               CASE WHEN q.ntok < 5 THEN 'too_short' END
           ], x -> x IS NOT NULL)), ','), '') AS reasons,
           coalesce(array_to_string(list_sort(list_filter([
               CASE WHEN q.qs < 0.3 THEN 'low_quality' END,
               CASE WHEN l.dlf > 0.3 THEN 'repeated_lines' END,
               CASE WHEN coalesce(p.nbg, 0) > 0
                    AND p.top / CAST(p.nbg AS DOUBLE) > 0.5
                    THEN 'repeated_ngrams' END,
               CASE WHEN q.ntok < 5 THEN 'too_short' END
           ], x -> x IS NOT NULL)), ','), '') = '' AS keep
    FROM q JOIN linestats l USING (doc_id) LEFT JOIN perdoc p USING (doc_id)
    """,
)
def ns_curation_quality_filter(spark, sf_dir):
    """Composite Gopher-style keep/drop filter with per-rule reasons —
    scalar rules on the scan + repetition metrics joined on the doc id."""
    from fluss_datafusion_spark.operators import curation

    return curation.quality_filter(t(spark, sf_dir, "documents"), "doc_id", "text")


def _incr_index_path(sf_dir):
    """Shared on-disk location of the incremental-dedup LSH index for
    one scale factor — ns_dedup_idx_build (re)builds it, and
    ns_dedup_incremental probes it (via ensure_dedup_index, so the
    probe self-heals when run standalone but never pays the build when
    the index is current)."""
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_incr_idx_{os.path.basename(sf_dir.rstrip('/'))}",
    )


def _incr_source_id(sf_dir):
    """Corpus identity for the index freshness token, derived from the
    source file's stat (no scan): the probe must not pay a count() per
    batch just to trust its index.  A real deployment keys this on the
    table's snapshot/version id."""
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    return f"docs:{st.st_size}:{st.st_mtime_ns}:mod5"


@query(
    "ns_dedup_idx_build",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        FROM documents WHERE doc_id % 5 != 0
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(tk) - 2),
                   i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS s
        FROM toks WHERE len(tk) >= 3
    )
    SELECT doc_id, CAST(len(s) AS INT) AS n_shingles FROM sh
    """,
)
def ns_dedup_idx_build(spark, sf_dir):
    """One-time corpus index BUILD, measured on its own: persist the
    LSH band-bucket assignment + shingle store for the corpus slice
    (doc_id % 5 != 0), then read the shingle store back as the
    hash-checked result (per-doc distinct-shingle counts — DuckDB
    re-derives them from the raw text, certifying the store's content).
    Splitting build from probe is the point: at 100 TB the index is
    built once (plus appends) while every ingest batch pays only the
    O(batch) probe, so the two costs must be visible separately."""
    from fluss_datafusion_spark.operators import incremental

    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    path = _incr_index_path(sf_dir)
    incremental.write_dedup_index(
        corpus, "doc_id", "text", path, source_id=_incr_source_id(sf_dir)
    )
    idx = spark.read.parquet(os.path.join(path, "shingles"))
    return idx.select(
        F.col("__id__").alias("doc_id"),
        F.size("__sh__").alias("n_shingles"),
    )


@query(
    "ns_dedup_incremental",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(tk) - 2),
                   i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS s
        FROM toks WHERE len(tk) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(a.s || b.s)), 4) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(a.s || b.s)) >= 0.4
      AND NOT (a.doc_id % 5 != 0 AND b.doc_id % 5 != 0)
    """,
)
def ns_dedup_incremental(spark, sf_dir):
    """Incremental dedup PROBE: the 'new batch' (doc_id % 5 == 0)
    probes the persisted corpus index — emitting batch-vs-corpus and
    batch-vs-batch pairs only, exactly verified.  The index build is a
    separate measured entry (ns_dedup_idx_build); ensure_dedup_index
    here only rebuilds when the marker is missing/stale (standalone
    correctness runs), so the benched time is the O(batch) probe the
    ingest path pays per batch.  Shares the exact Jaccard oracle
    restricted to pairs touching the batch."""
    from fluss_datafusion_spark.operators import incremental

    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    path = _incr_index_path(sf_dir)
    incremental.ensure_dedup_index(
        corpus, "doc_id", "text", path, source_id=_incr_source_id(sf_dir)
    )
    pairs = incremental.incremental_dedup_pairs(
        batch, path, "doc_id", "text", threshold=0.4
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


@query(
    "ns_curation_sample_exact_n",
    extended=True,
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang, row_number() OVER (
            ORDER BY md5('sample-0' || '|' || CAST(doc_id AS VARCHAR)),
                     doc_id) AS rk
        FROM documents
    ) WHERE rk <= 40
    """,
)
def ns_curation_sample_exact_n(spark, sf_dir):
    """Exactly-N deterministic sample (the n smallest rows under a
    seeded md5 of the id): what df.sample() can't promise (exact count,
    engine-independent seed).  Runs on the md5-prefix bucketed rank —
    no single-partition sort; the oracle brute-forces the same order
    with a window."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return curation.sample_exact_n(docs, "doc_id", n=40, seed="sample-0")


@query(
    "ns_multimodal_avi_frames",
    extended=True,
    oracle="""
    SELECT doc_id AS media_id, CAST(u.f AS INT) AS frame_index,
           CAST(doc_id % 8 + 2 AS INT) AS width,
           CAST((3 * doc_id) % 8 + 2 AS INT) AS height,
           CAST((11 * doc_id + 29 * u.f) % 256 AS DOUBLE) AS mean_r,
           CAST((13 * doc_id + 31 * u.f) % 256 AS DOUBLE) AS mean_g,
           CAST((17 * doc_id + 37 * u.f) % 256 AS DOUBLE) AS mean_b
    FROM documents, unnest([0, 2, 4]) AS u(f)
    """,
)
def ns_multimodal_avi_frames(spark, sf_dir):
    """REAL video decode with frame sampling: per document a complete
    uncompressed AVI (RIFF hdrl/avih/strl + movi '00db' DIB frames) is
    synthesized, then ``avi_frame_stats(every=2)`` walks the container
    and decodes ONLY frames 0/2/4 — sampling before pixel work, the
    production video-feature pattern.  Flat frame colors are closed-form
    functions of (id, frame), so the oracle states every mean exactly.
    Completes the multimodal triad: images (BMP/PNG/JPEG), audio (WAV),
    video (AVI) — all pure-stdlib decoders of published layouts."""
    media = multimodal.synthesize_avi_media(
        t(spark, sf_dir, "documents"), id_col="doc_id"
    )
    stats = multimodal.avi_frame_stats(media, every=2)
    return stats.select(
        "media_id", "frame_index", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@query(
    "ns_curation_domain_stats",
    extended=True,
    oracle="""
    WITH d AS (
        SELECT doc_id,
               text || ' see https://src' || doc_id % 7 ||
               '.example.org/p/' || doc_id ||
               CASE WHEN doc_id % 3 = 0
                    THEN ' and http://mirror.example.net'
                    ELSE '' END AS t
        FROM documents
    ),
    u AS (
        SELECT doc_id,
               unnest(regexp_extract_all(t,
                   'https?://[A-Za-z0-9.-]+(?:/[^ \\t\\n\\r\\f]*)?')) AS url
        FROM d
    )
    SELECT regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM u GROUP BY 1
    """,
)
def ns_curation_domain_stats(spark, sf_dir):
    """Per-domain corpus footprint over synthesized in-text URLs (the
    web-curation policy table): URL extraction + domain parse with
    RE2-compatible regexes shared verbatim by the oracle, then one
    map-side-combined groupBy."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://src"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org/p/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" and http://mirror.example.net"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return curation.domain_stats(docs, "doc_id", "text")


@query(
    "ns_curation_normalize",
    extended=True,
    oracle="""
    WITH n AS (
        SELECT doc_id, text,
               trim(regexp_replace(regexp_replace(text,
                   '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
                   '[ \\t\\n\\r\\f]+', ' ', 'g')) AS tn
        FROM documents
    )
    SELECT doc_id, md5(tn) AS norm_md5, tn <> text AS changed,
           CAST(length(text) AS INT) AS n_chars_in,
           CAST(length(tn) AS INT) AS n_chars_out
    FROM n
    """,
)
def ns_curation_normalize(spark, sf_dir):
    """Canonical text cleanup (control-char strip + whitespace collapse
    + trim — the normalization pass ahead of dedup/filtering), verified
    byte-exactly via md5.  The whitespace class is the explicit
    [ \\t\\n\\r\\f]: Java regex \\s includes vertical tab, RE2's does
    not, so \\s would silently diverge between the engines."""
    from fluss_datafusion_spark.operators import curation

    out = curation.normalize_text(t(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(
        "doc_id",
        F.md5("text_norm").alias("norm_md5"),
        "changed",
        F.col("n_chars_in").cast("int").alias("n_chars_in"),
        F.col("n_chars_out").cast("int").alias("n_chars_out"),
    )


@query("ns_training_bpe_merges", extended=True)
def ns_training_bpe_merges(spark, sf_dir):
    """BPE vocabulary training (Sennrich 2016) over the documents
    corpus: 20 merge rules learned iteratively on the word-frequency
    dictionary — per round one pair-frequency agg (argmax row to the
    driver, model state only) + one Arrow-batched merge rewrite.  The
    iterative argmax is not SQL-expressible (rows-only here); the hard
    check is tests/test_bpe.py, which compares every merge against a
    pure-Python reference with identical tie-breaks, including on this
    same documents table."""
    from fluss_datafusion_spark.operators.bpe import bpe_merges_table

    docs = t(spark, sf_dir, "documents")
    return bpe_merges_table(docs, "text", n_merges=20)


@query(
    "ns_training_bpe_tokens", extended=True,
    oracle=r"""
    SELECT doc_id,
           array_to_string(
               regexp_split_to_array(lower(trim(text)), '\s+'), ' '
           ) AS detok,
           true AS ref_match
    FROM documents
    """,
)
def ns_training_bpe_tokens(spark, sf_dir):
    """BPE APPLICATION hash-checked cross-engine (r5 — this moves BPE
    off the rows-only list): train 20 merges, tokenize every document
    with ``apply_bpe`` (memoized Arrow kernel, zero shuffles), then pin
    the output two independent ways.  (1) ``detok``: stripping spaces
    and turning ``</w>`` back into word boundaries must losslessly
    reconstruct the lower-cased whitespace-normalized text — DuckDB
    recomputes that directly from ``documents.text``, so a single
    wrong/lost/reordered token hash-mismatches.  (2) ``ref_match``: a
    structurally different naive reference (space-joined string with a
    lookaround ``re.sub`` per rule — left-to-right non-overlapping like
    the spec, boundaries non-consuming so consecutive pair occurrences
    all merge, no memoization) re-tokenizes each doc in a second kernel
    and must agree exactly; the oracle asserts the boolean true.  The
    iterative TRAINER itself stays pinned merge-by-merge against a
    pure-Python reference in tests/test_bpe.py."""
    import pandas as pd

    from fluss_datafusion_spark.operators.bpe import (
        _END,
        apply_bpe,
        learn_bpe_merges,
    )

    docs = t(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, "text", n_merges=20)
    toked = apply_bpe(docs, "doc_id", "text", merges)

    rules = [(left, right, left + right) for _, left, right, _ in merges]

    def _ref(batches):
        import re

        compiled = [
            (
                re.compile(
                    f"(?<= ){re.escape(left)} {re.escape(right)}(?= )"
                ),
                merged,
            )
            for left, right, merged in rules
        ]
        for pdf in batches:
            out = []
            for text in pdf["text"]:
                words = []
                for w in (text or "").lower().split():
                    joined = " " + " ".join(list(w) + [_END]) + " "
                    for pat, merged in compiled:
                        joined = pat.sub(merged, joined)
                    words.append(joined.strip())
                out.append(" ".join(words))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ref_tokens": out}
            )

    ref = docs.select("doc_id", "text").mapInPandas(
        _ref, "doc_id long, ref_tokens string"
    )
    return toked.join(ref, "doc_id").select(
        "doc_id",
        F.rtrim(
            F.regexp_replace(
                F.regexp_replace(F.col("tokens"), " ", ""), "</w>", " "
            )
        ).alias("detok"),
        (F.col("tokens") == F.col("ref_tokens")).alias("ref_match"),
    )


@query(
    "ns_training_wordpiece_tokens", extended=True,
    oracle=r"""
    SELECT doc_id,
           array_to_string(
               regexp_split_to_array(lower(trim(text)), '\s+'), ' '
           ) AS detok,
           CAST(0 AS BIGINT) AS n_unk,
           true AS ref_match
    FROM documents
    """,
)
def ns_training_wordpiece_tokens(spark, sf_dir):
    """WordPiece train + MaxMatch application hash-checked cross-engine
    (r8 — operators/wordpiece.py; completes the BPE / unigram-LM /
    WordPiece tokenizer triad): train 20 likelihood-scored merges
    (score = pair/(left*right), the BERT/HuggingFace trainer rule —
    NOT BPE's raw frequency), tokenize every document by greedy
    longest-match against the learned vocab, then pin the output two
    independent ways.  (1) ``detok``: stripping the ``##`` continuation
    glue must losslessly reconstruct the lower-cased
    whitespace-normalized text, which DuckDB recomputes from raw
    ``documents.text``; ``n_unk`` must be 0 corpus-wide (trained on the
    same corpus, every character is in the alphabet) — a single [UNK]
    hash-mismatches.  (2) ``ref_match``: a structurally different
    reference kernel re-tokenizes each word via the regex engine's
    ordered alternation (vocab pieces longest-first) and must agree
    exactly.  The trainer itself stays pinned merge-by-merge against a
    pure-Python reference in tests/test_wordpiece.py."""
    import pandas as pd

    from fluss_datafusion_spark.operators.wordpiece import (
        _CONT,
        _UNK,
        apply_wordpiece,
        learn_wordpiece,
    )

    docs = t(spark, sf_dir, "documents")
    merges, vocab = learn_wordpiece(docs, "text", n_merges=20)
    toked = apply_wordpiece(docs, "doc_id", "text", vocab)

    starts = sorted(
        (v for v in vocab if not v.startswith(_CONT)), key=len, reverse=True
    )
    conts = sorted(
        (v[len(_CONT):] for v in vocab if v.startswith(_CONT)),
        key=len,
        reverse=True,
    )

    def _ref(batches):
        import re

        start_re = re.compile("|".join(re.escape(v) for v in starts))
        cont_re = re.compile("|".join(re.escape(v) for v in conts))

        def word_ref(w):
            out, i = [], 0
            while i < len(w):
                m = (start_re if i == 0 else cont_re).match(w, i)
                if m is None or m.end() == i:
                    return [_UNK]
                out.append(m.group(0) if i == 0 else _CONT + m.group(0))
                i = m.end()
            return out

        for pdf in batches:
            out = []
            for text in pdf["text"]:
                toks = []
                for w in (text or "").lower().split():
                    toks.extend(word_ref(w))
                out.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ref_tokens": out})

    ref = docs.select("doc_id", "text").mapInPandas(
        _ref, "doc_id long, ref_tokens string"
    )
    return toked.join(ref, "doc_id").select(
        "doc_id",
        F.rtrim(
            F.regexp_replace(
                F.regexp_replace(F.col("tokens"), F.lit(" " + _CONT), F.lit("")),
                F.lit(_CONT),
                F.lit(""),
            )
        ).alias("detok"),
        "n_unk",
        (F.col("tokens") == F.col("ref_tokens")).alias("ref_match"),
    )


@query(
    # r6 rotation: -> extended (VERDICT r5 #7 — the embedding-dedup
    # category keeps ns_dedup_embedding core; this slot funds
    # ns_graph_components in the driver window)
    "ns_dedup_semantic", extended=True,
    oracle="""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    c AS (
        SELECT vec_id AS cid, v AS cv FROM e
        WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 8)
    ),
    scored AS (
        SELECT e.vec_id, c.cid,
               list_sum(list_transform(list_zip(e.v, c.cv), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(e.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(c.cv, x -> x*x)))) AS cos
        FROM e CROSS JOIN c
    ),
    assigned AS (
        SELECT vec_id, cid AS cluster FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cos DESC, cid) AS rk
            FROM scored
        ) WHERE rk = 1
    ),
    drops AS (
        SELECT DISTINCT b.vec_id AS drop_id
        FROM assigned a
        JOIN assigned b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE list_sum(list_transform(list_zip(ea.v, eb.v), p -> p[1] * p[2]))
              / (sqrt(list_sum(list_transform(ea.v, x -> x*x)))
                 * sqrt(list_sum(list_transform(eb.v, x -> x*x)))) >= 0.4
    )
    SELECT a.vec_id, a.cluster,
           a.vec_id NOT IN (SELECT drop_id FROM drops) AS keep
    FROM assigned a
    """,
)
def ns_dedup_semantic(spark, sf_dir):
    """SemDeDup-style semantic dedup: deterministic zero-iteration
    clustering (centroids = smallest-id vectors, argmax-cosine
    assignment) + within-cluster near-dup drops at cosine >= 0.4,
    keep-lowest-id.  Every decision — assignment argmax, threshold
    compare — runs on bit-identical cosines in both engines (the
    dim-order accumulation argument), so the oracle reproduces the
    keep set exactly, not statistically."""
    from fluss_datafusion_spark.operators.dedup import semantic_dedup

    emb = t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, "vec_id", "embedding", n_clusters=8, threshold=0.4)


@query(
    "ns_multimodal_jpeg_decode",
    extended=True,
    oracle="""
    SELECT doc_id AS media_id,
           CAST(doc_id % 16 + 1 AS INT) AS width,
           CAST((5 * doc_id) % 16 + 1 AS INT) AS height,
           CAST((37 * doc_id + 11) % 256 AS DOUBLE) AS mean_r,
           CAST((37 * doc_id + 11) % 256 AS DOUBLE) AS mean_g,
           CAST((37 * doc_id + 11) % 256 AS DOUBLE) AS mean_b
    FROM documents
    """,
)
def ns_multimodal_jpeg_decode(spark, sf_dir):
    """REAL JPEG pixel decode cycling FOUR codings (r5): baseline
    grayscale, progressive grayscale (SOF2 successive approximation),
    baseline SUBSAMPLED 4:2:0 RGB, and PROGRESSIVE+SUBSAMPLED combined
    (interleaved-MCU DC scans over per-component ceil-block AC
    extents): per document a complete JPEG — DQT, generated DHT
    tables, entropy-coded scans with byte stuffing — is synthesized,
    then ``jpeg_pixel_stats`` Huffman-decodes, dequantizes and IDCTs
    the actual coefficients back.  Flat images quantize to a single DC
    coefficient and R=G=B content carries chroma exactly 128, so the
    decode is EXACT under all four codings and the oracle states every
    mean in closed form."""
    media = multimodal.synthesize_jpeg_media(
        t(spark, sf_dir, "documents"), id_col="doc_id"
    )
    stats = multimodal.jpeg_pixel_stats(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@query(
    "ns_pipeline_ingest_e2e",
    extended=True,
    oracle="""
    WITH d AS (
        SELECT doc_id, text,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS tk,
               length(text) AS n_char,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
        FROM documents
    ),
    q AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(tk) END AS ntok,
               (least(1.0, len(tk) / 20.0)
                + (CASE WHEN n_char > 0 THEN CAST(n_alpha AS DOUBLE)/n_char ELSE 0 END)
                + (CASE WHEN len(tk) > 0
                        AND CAST(n_char AS DOUBLE)/len(tk) BETWEEN 3 AND 12
                        THEN 1.0 ELSE 0.0 END)) / 3.0 AS qs
        FROM d
    ),
    lines AS (
        SELECT doc_id,
               list_filter(list_transform(string_split(text, chr(10)),
                                          l -> trim(l)),
                           l -> length(l) > 0) AS ls
        FROM documents
    ),
    linestats AS (
        SELECT doc_id,
               CASE WHEN len(ls) > 0
                    THEN (len(ls) - len(list_distinct(ls))) / CAST(len(ls) AS DOUBLE)
                    ELSE 0.0 END AS dlf
        FROM lines
    ),
    bg AS (
        SELECT d.doc_id, tk[i] || ' ' || tk[i + 1] AS bigram
        FROM d, unnest(generate_series(1, len(tk) - 1)) AS u(i)
    ),
    perdoc AS (
        SELECT doc_id, max(c) AS top, CAST(sum(c) AS BIGINT) AS nbg
        FROM (SELECT doc_id, bigram, count(*) AS c
              FROM bg GROUP BY doc_id, bigram) GROUP BY doc_id
    ),
    curated AS (
        SELECT q.doc_id, doc_id % 2 AS batch,
               regexp_replace(regexp_replace(regexp_replace(d.text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                   '<IPV4>', 'g'),
                   '\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}', '<PHONE>', 'g')
                   AS rtext
        FROM q JOIN d USING (doc_id)
             JOIN linestats l USING (doc_id)
             LEFT JOIN perdoc p USING (doc_id)
        WHERE q.qs >= 0.3 AND q.ntok >= 5 AND l.dlf <= 0.3
          AND NOT (coalesce(p.nbg, 0) > 0
                   AND p.top / CAST(p.nbg AS DOUBLE) > 0.5)
    ),
    shing AS (
        SELECT doc_id, batch,
               list_distinct(list_transform(range(len(rtk) - 2),
                   i -> rtk[i+1] || ' ' || rtk[i+2] || ' ' || rtk[i+3])) AS s
        FROM (SELECT doc_id, batch,
                     regexp_split_to_array(lower(trim(rtext)), '\\s+') AS rtk
              FROM curated)
        WHERE len(rtk) >= 3
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.batch AS batch_a, b.batch AS batch_b
        FROM shing a JOIN shing b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(a.s || b.s)) >= 0.4
    ),
    -- batch 0 ingests first into an empty index: drop the greater id of
    -- every within-batch-0 pair
    b0 AS (
        SELECT doc_id FROM curated WHERE batch = 0
          AND doc_id NOT IN (
            SELECT greatest(id_a, id_b) FROM pairs
            WHERE batch_a = 0 AND batch_b = 0)
    ),
    -- batch 1: drop docs pairing with an indexed batch-0 SURVIVOR
    -- (corpus copy wins), plus the greater id of within-batch-1 pairs
    b1 AS (
        SELECT doc_id FROM curated WHERE batch = 1
          AND doc_id NOT IN (
            SELECT CASE WHEN batch_a = 1 THEN id_a ELSE id_b END
            FROM pairs
            WHERE batch_a <> batch_b
              AND (CASE WHEN batch_a = 0 THEN id_a ELSE id_b END)
                  IN (SELECT doc_id FROM b0))
          AND doc_id NOT IN (
            SELECT greatest(id_a, id_b) FROM pairs
            WHERE batch_a = 1 AND batch_b = 1)
    )
    SELECT doc_id, md5(rtext) AS redacted_md5
    FROM curated
    WHERE doc_id IN (SELECT doc_id FROM b0)
       OR doc_id IN (SELECT doc_id FROM b1)
    """,
)
def ns_pipeline_ingest_e2e(spark, sf_dir):
    """The COMPOSED continuous-ingest pipeline, end to end: the
    documents table replayed as a two-micro-batch stream (doc_id parity
    split, even batch first) through ``dedup_ingest_sink`` — per batch:
    quality filter -> PII redaction -> LSH dedup probe against the
    persisted index (corpus-copy-wins drop rule) -> upsert survivors
    into a PK engine table -> append survivors to the index so the next
    batch dedups against them.  Returns the final table as
    (doc_id, md5(redacted text)).

    The oracle replays the same decisions in SQL: the composite quality
    rules (ns_curation_quality_filter's), the redaction regexes
    (ns_curation_pii_redact's), exact Jaccard >= 0.4 pairs on REDACTED
    text (LSH recall ~1 at this threshold — the same argument every
    dedup entry's oracle rests on), batch-0 greater-id drops, then
    batch-1 drops against batch-0 survivors and within batch 1."""
    import shutil
    import tempfile
    import time as _time

    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.operators.incremental import (
        curation_ingest_transform,
        dedup_ingest_sink,
        write_dedup_index,
    )

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_e2e_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    replay = os.path.join(root, "replay")
    os.makedirs(replay)
    src = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    base = _time.time()
    for i in (0, 1):  # one flat file per micro-batch, mtime-ordered
        fp = os.path.join(replay, f"b{i:05d}.parquet")
        pq.write_table(
            src.filter(pc.equal(pc.bit_wise_and(src["doc_id"], 1), i)), fp
        )
        os.utime(fp, (base + i, base + i))

    e = EngineSession(spark=spark, warehouse=os.path.join(root, "wh"))
    e.sql(
        "CREATE TABLE pipeline_docs (doc_id BIGINT NOT NULL, text STRING,"
        " PRIMARY KEY (doc_id))"
    )
    index = os.path.join(root, "idx")
    write_dedup_index(
        spark.createDataFrame([], docs.schema), "doc_id", "text", index
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    dedup_ingest_sink(
        stream, e.catalog, "pipeline_docs", index,
        os.path.join(root, "ckpt"),
        threshold=0.4, transform=curation_ingest_transform(),
    ).awaitTermination()
    return e.sql(
        "SELECT doc_id, md5(text) AS redacted_md5 FROM pipeline_docs"
    )


@query(
    "ns_curation_span_scrub",
    extended=True,  # r8 third-session rotation: -> extended for
    # ns_linkage_fs_em (span scrubbing stays evidenced via
    # ns_curation_substring_scrub / ns_dedup_shared_spans + tests)
    oracle="""
    WITH tk AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    segs AS (
        SELECT doc_id, CAST(u.s / 16 AS INT) AS seg_idx,
               array_to_string(t[u.s + 1 : u.s + 16], ' ') AS span
        FROM tk,
             unnest(generate_series(0, len(t) - 1 - ((len(t) - 1) % 16), 16))
                 AS u(s)
    ),
    hot AS (
        SELECT span FROM segs GROUP BY span
        HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT s.doc_id,
           coalesce(string_agg(CASE WHEN h.span IS NULL THEN s.span END,
                               ' ' ORDER BY s.seg_idx), '') AS clean_text,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN h.span IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped
    FROM segs s LEFT JOIN hot h ON s.span = h.span
    GROUP BY s.doc_id
    """,
)
def ns_curation_span_scrub(spark, sf_dir):
    """C4/RefinedWeb-style duplicated-span scrub: drop 16-token segments
    occurring in >=2 distinct documents, reassemble the rest in order.
    Three map-side-combined shuffles, nothing quadratic."""
    from fluss_datafusion_spark.operators import curation

    return curation.scrub_hot_spans(
        t(spark, sf_dir, "documents"), "doc_id", "text",
        span_tokens=16, min_doc_freq=2,
    )


@query(
    "ns_quality_lm_score",
    oracle="""
    WITH tk AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
        FROM documents
        WHERE length(trim(text)) > 0
          AND len(regexp_split_to_array(trim(text), '\\s+')) >= 2
    ),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM tk, unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
    cp AS (SELECT w1, count(*) AS cp FROM bg GROUP BY w1),
    v AS (SELECT count(DISTINCT tok) AS vs
          FROM (SELECT unnest(t) AS tok FROM tk) u)
    SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((c2.c2 + 0.1) / (cp.cp + 0.1 * v.vs))), 4)
               AS avg_logprob
    FROM bg JOIN c2 USING (w1, w2) JOIN cp USING (w1) CROSS JOIN v
    GROUP BY bg.doc_id
    """,
)
def ns_quality_lm_score(spark, sf_dir):
    """CCNet-style LM quality signal: add-0.1-smoothed bigram LM trained
    on the corpus as two count DataFrames, each document scored by its
    mean bigram log-probability.  Train = 2 map-side-combined aggs;
    score = 2 shuffle joins on the n-gram key + 1 per-doc avg."""
    from fluss_datafusion_spark.operators import lm

    return lm.bigram_lm_scores(
        t(spark, sf_dir, "documents"), "doc_id", "text", alpha=0.1
    )


@query(
    "ns_curation_mixture", extended=True,
    oracle="""
    WITH stats AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                        END) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
                   count(*) AS ng FROM stats)
    SELECT source, n_docs, n_tokens,
           round(n_tokens / CAST(total AS DOUBLE), 6) AS token_share,
           round((1.0 / ng) / (n_tokens / CAST(total AS DOUBLE)), 6) AS weight
    FROM stats CROSS JOIN tot
    """,
)
def ns_curation_mixture(spark, sf_dir):
    """Pile/DoReMi-style domain mixture weights: per-source token share
    and the uniform-target sampling weight, in one map-side-combined
    pass plus a single-row broadcast of the totals."""
    from fluss_datafusion_spark.operators import curation

    return curation.domain_mixture_weights(
        t(spark, sf_dir, "documents"), "source", "text"
    )


# --------------------------------------------------------------------------
# training-set assembly (operators/training.py)
# --------------------------------------------------------------------------


@query(
    "ns_training_ngram_coverage",
    extended=True,
    oracle="""
    WITH tk AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    ng AS (
        SELECT doc_id, CAST(u.i AS INT) AS pos,
               array_to_string(t[u.i+1 : u.i+8], ' ') AS g
        FROM tk, unnest(range(len(t) - 8 + 1)) AS u(i)
        WHERE len(t) >= 8
    ),
    rep AS (SELECT g FROM ng GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    cov AS (
        SELECT ng.doc_id, count(DISTINCT pos + k.k) AS covered
        FROM ng JOIN rep USING (g), unnest(range(8)) AS k(k)
        GROUP BY ng.doc_id
    )
    SELECT tk.doc_id, CAST(len(t) AS INT) AS n_tokens,
           CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_tokens,
           round(coalesce(cov.covered, 0) / greatest(len(t), 1), 4)
               AS dup_fraction
    FROM tk LEFT JOIN cov ON tk.doc_id = cov.doc_id
    """,
)
def ns_training_ngram_coverage(spark, sf_dir):
    """Substring-level duplication: fraction of each document's token
    positions covered by an 8-gram that also occurs in another document
    (whole-doc dedup can't see partial overlap — boilerplate, quoted
    passages).  Oracle reproduces the construction with unnest/range
    window arithmetic."""
    from fluss_datafusion_spark.operators import training

    return training.repeated_ngram_coverage(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=8, min_docs=2
    )


@query(
    "ns_training_shuffle",
    extended=True,
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (
               ORDER BY md5('shuffle-0' || '|' || CAST(doc_id AS VARCHAR)),
                        doc_id) AS INT) AS shuffle_pos
    FROM documents
    """,
)
def ns_training_shuffle(spark, sf_dir):
    """Deterministic global corpus permutation (seeded md5 sort key):
    the reproducible document-order shuffle a training run consumes.
    Both engines derive the identical permutation from md5."""
    from fluss_datafusion_spark.operators import training

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return training.deterministic_shuffle(docs, "doc_id", seed="shuffle-0")


@query(
    "ns_training_shards",
    extended=True,
    oracle="""
    WITH a AS (
        SELECT doc_id,
               CAST(CAST(('0x' || substr(
                   md5('shard-0' || '|' || CAST(doc_id AS VARCHAR)), 1, 8))
                   AS UBIGINT) % 8 AS INT) AS shard,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
               END AS ntok
        FROM documents
    )
    SELECT shard, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id
    FROM a GROUP BY shard
    """,
)
def ns_training_shards(spark, sf_dir):
    """Deterministic hash sharding into 8 output shards + the per-shard
    manifest (docs, tokens, id range) a training loader consults.
    Assignment is md5-hex mod n — reproducible on any engine, so a
    re-run lands every doc in the same shard."""
    from fluss_datafusion_spark.operators import training

    return training.shard_manifest(
        t(spark, sf_dir, "documents"), "doc_id", "text", n_shards=8,
        seed="shard-0",
    )


@query(
    "ns_curation_heavy_hitters",
    extended=True,
    oracle="""
    WITH tk AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    ex AS (SELECT unnest(t) AS token FROM tk),
    tot AS (SELECT count(*) AS n FROM ex)
    SELECT token, count(*) AS n_occurrences
    FROM ex CROSS JOIN tot
    GROUP BY token, tot.n
    HAVING count(*) * 50 > tot.n
    """,
)
def ns_curation_heavy_hitters(spark, sf_dir):
    """EXACT heavy hitters (tokens with > 2% of all corpus occurrences)
    via two bounded passes — per-partition Misra-Gries candidate
    summaries (superset guarantee by pigeonhole), then an exact recount
    restricted to candidates.  Unlike build_vocab there is never a
    one-row-per-distinct-token shuffle; the oracle recomputes the same
    set with a plain GROUP BY/HAVING."""
    from fluss_datafusion_spark.operators import curation

    return curation.heavy_hitters(t(spark, sf_dir, "documents"), "text", k=50)


@query(
    "ns_fuzzy_name_pairs",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS distance
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def ns_fuzzy_name_pairs(spark, sf_dir):
    """Exact edit-distance-1 name pairs via deletion-neighborhood
    (FastSS) blocking + built-in levenshtein verify — entity resolution
    without the n² comparison the oracle brute-forces.  Blocking recall
    is 1.0 by construction (distance-1 pairs always share a deletion
    variant), so the result is EXACT and hash-checkable."""
    from fluss_datafusion_spark.operators.fuzzy import fuzzy_join_pairs

    cust = t(spark, sf_dir, "customer")
    return fuzzy_join_pairs(cust, "c_custkey", "c_name").select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    )


@query(
    "ns_dedup_containment", extended=True,  # r5: rotated out for q59_matview_join (dedup keeps 9 core rows; same inverted-index plan family as ns_dedup_ngram_jaccard)
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(tk) - 2),
                   i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS s
        FROM toks WHERE len(tk) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / least(len(a.s), len(b.s)), 4) AS containment
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / least(len(a.s), len(b.s)) >= 0.6
    """,
)
def ns_dedup_containment(spark, sf_dir):
    """Shingle-containment pairs (|A∩B|/min — the subset/quote signal
    Jaccard misses; Broder's resemblance-vs-containment distinction)
    at threshold 0.6, via the same inverted-index plan as the Jaccard
    entry.  Oracle brute-forces the identical ratio."""
    docs = t(spark, sf_dir, "documents")
    pairs = dedup.ngram_containment_pairs(docs, "doc_id", "text", k=3, threshold=0.6)
    return pairs.select(
        "id_a", "id_b", F.round("containment", 4).alias("containment")
    )


@query(
    "ns_curation_token_budget",
    extended=True,
    oracle="""
    WITH scored AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
               END AS tok,
               md5('budget-0' || '|' || CAST(doc_id AS VARCHAR)) AS k
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, tok,
               sum(tok) OVER (PARTITION BY source ORDER BY k, doc_id
                              ROWS UNBOUNDED PRECEDING) AS c
        FROM scored
    )
    SELECT doc_id, source, CAST(tok AS INT) AS n_tokens
    FROM cum WHERE c <= 700
    """,
)
def ns_curation_token_budget(spark, sf_dir):
    """Token-budgeted corpus draw: per source, keep the greedy
    seeded-md5-ordered prefix of documents whose cumulative token count
    stays within 700 (binding for every source at test scale) — the deterministic '<N>-token sample per domain'
    every training run starts with.  Both engines derive the identical
    draw from md5 ordering + a running-sum window."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents")
    kept = curation.sample_to_token_budget(
        docs, "doc_id", "text", budget_tokens=700, strata_cols=["source"]
    )
    return kept.select(
        "doc_id", "source", tx.token_count(F.col("text")).alias("n_tokens")
    )


@query("ns_dedup_clusters_star", extended=True, oracle=_CLUSTERS_ORACLE)
def ns_dedup_clusters_star(spark, sf_dir):
    """The large-star/small-star variant of duplicate clustering
    (Kiveris SoCC'14 — O(log^2 n) rounds regardless of graph diameter)
    checked against the SAME recursive-CTE transitive-closure oracle as
    the propagation entry: two independent algorithms, one ground
    truth."""
    docs = t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.4)
    return dedup.dedup_clusters_star(pairs)


@query(
    "ns_curation_apply_mixture",
    extended=True,
    oracle="""
    WITH stats AS (
        SELECT source,
               CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
                   count(*) AS ng FROM stats),
    w AS (
        SELECT source,
               least(1.0, round((1.0 / ng) / (n_tokens / CAST(total AS DOUBLE)), 6))
                   AS frac
        FROM stats CROSS JOIN tot
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN w ON d.source = w.source
    WHERE CAST(('0x' || substr(
              md5('mixture-0' || '|' || CAST(d.doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT) < w.frac * 4294967296.0
    """,
)
def ns_curation_apply_mixture(spark, sf_dir):
    """Mixture MATERIALIZATION: compute uniform-target domain weights
    (the ns_curation_mixture computation) and actually resample the
    corpus with them — per-doc seeded-md5 keep draws at min(1, weight)
    per domain.  Both engines derive the identical kept set; the weights
    ride in as an O(domains) broadcast against the streamed corpus."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents")
    weights = curation.domain_mixture_weights(docs, "source", "text")
    kept = curation.apply_mixture(docs, weights, "doc_id", "source")
    return kept.select("doc_id", "source")


@query(
    "ns_quality_nb_classifier", extended=True,
    oracle=r"""
    WITH lab AS (
        SELECT doc_id, text,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\s+'))
                END) >= 30 AS y
        FROM documents
    ),
    tk AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        FROM lab WHERE length(trim(text)) > 0
    ),
    cnt AS (
        SELECT tok,
               CAST(sum(CASE WHEN l.y THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN l.y THEN 0 ELSE 1 END) AS BIGINT) AS c0
        FROM tk JOIN lab l USING (doc_id)
        GROUP BY tok
    ),
    tot AS (
        SELECT CAST(sum(c1) AS BIGINT) AS T1,
               CAST(sum(c0) AS BIGINT) AS T0,
               count(*) AS V
        FROM cnt
    ),
    pri AS (
        SELECT CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS N1,
               CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS N0
        FROM lab
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(avg(ln((coalesce(c.c1, 0) + 1.0) / (tot.T1 + 1.0 * tot.V))
                   - ln((coalesce(c.c0, 0) + 1.0) / (tot.T0 + 1.0 * tot.V))),
                 4) AS avg_log_odds,
           round(ln(CAST(pri.N1 AS DOUBLE) / pri.N0), 4) AS log_prior,
           (avg(ln((coalesce(c.c1, 0) + 1.0) / (tot.T1 + 1.0 * tot.V))
              - ln((coalesce(c.c0, 0) + 1.0) / (tot.T0 + 1.0 * tot.V)))
            + ln(CAST(pri.N1 AS DOUBLE) / pri.N0) / count(*)) > 0 AS pred_good
    FROM tk t
    LEFT JOIN cnt c USING (tok)
    CROSS JOIN tot CROSS JOIN pri
    GROUP BY t.doc_id, tot.T1, tot.T0, tot.V, pri.N1, pri.N0
    """,
)
def ns_quality_nb_classifier(spark, sf_dir):
    """Model-based quality filtering (GPT-3/CCNet-style linear
    classifier): bootstrap-train a multinomial Naive Bayes on weak
    labels (docs with >= 30 tokens = "good" class) and score every
    document with its length-invariant mean per-token log-odds.  Train =
    two map-side-combined aggregations; score = one shuffle join on the
    token key; the model is a pair of DataFrames, never a broadcast of
    corpus-sized state.  The oracle replays the same counts in SQL —
    integer counts are exact on both engines, the one float mean rounds
    at 4 like every cross-engine float aggregate here."""
    from fluss_datafusion_spark.functions.text import token_count
    from fluss_datafusion_spark.operators import quality_model

    docs = t(spark, sf_dir, "documents").withColumn(
        "__good__", token_count(F.col("text")) >= 30
    )
    return quality_model.nb_quality_scores(
        docs, "doc_id", "text", "__good__", alpha=1.0
    )


@query(
    "ns_curation_substring_scrub", extended=True,
    oracle=r"""
    WITH tk AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    sh AS (
        SELECT doc_id, u.s AS s,
               array_to_string(t[u.s + 1 : u.s + 8], ' ') AS shv
        FROM tk, unnest(generate_series(0, len(t) - 8)) AS u(s)
        WHERE len(t) >= 8
    ),
    hot AS (
        SELECT shv FROM sh GROUP BY shv
        HAVING count(DISTINCT doc_id) >= 2
    ),
    cov AS (
        SELECT DISTINCT sh.doc_id, c.pos
        FROM sh JOIN hot USING (shv),
             unnest(generate_series(sh.s, sh.s + 7)) AS c(pos)
    ),
    tokpos AS (
        SELECT doc_id, u.s AS pos, t[u.s + 1] AS tok
        FROM tk, unnest(generate_series(0, len(t) - 1)) AS u(s)
    )
    SELECT tk.doc_id,
           coalesce(
               (SELECT string_agg(tp.tok, ' ' ORDER BY tp.pos)
                FROM tokpos tp
                LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.pos = tp.pos
                WHERE tp.doc_id = tk.doc_id AND cov.pos IS NULL),
               '') AS clean_text,
           CAST(len(tk.t) AS BIGINT) AS n_tokens,
           CAST(coalesce(
               (SELECT count(*) FROM cov WHERE cov.doc_id = tk.doc_id), 0)
               AS BIGINT) AS n_removed
    FROM tk
    """,
)
def ns_curation_substring_scrub(spark, sf_dir):
    """Any-offset repeated-substring removal (Lee et al. 2022
    ExactSubstr at 8-token resolution): every token covered by an
    8-gram whose exact text recurs in >=2 distinct documents is
    scrubbed, wherever in the document it starts — the finer-grained
    sibling of ns_curation_span_scrub's stride-16 segmentation.  The
    oracle replays the identical inverted-index construction in SQL."""
    from fluss_datafusion_spark.operators import curation

    return curation.scrub_repeated_substrings(
        t(spark, sf_dir, "documents"), "doc_id", "text",
        k=8, min_doc_freq=2,
    )


@query(
    "ns_multimodal_audio_spectral", extended=True,
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(2 + doc_id % 6 AS INT) AS n_windows,
           CAST(1 + doc_id % 20 AS INT) AS dominant_bin,
           ROUND((1 + doc_id % 20) * 125.0, 2) AS dominant_hz,
           CASE WHEN 1 + doc_id % 20 <= 10 THEN 1.0 ELSE 0.0 END AS band_low,
           CASE WHEN 1 + doc_id % 20 >= 11 THEN 1.0 ELSE 0.0 END AS band_mid,
           0.0 AS band_high,
           true AS decoded_ok
    FROM documents
    """,
)
def ns_multimodal_audio_spectral(spark, sf_dir):
    """REAL frequency-domain audio analysis: per document a float32 WAV
    of a pure sine tone bin-aligned to the 64-sample analysis window is
    synthesized (k = 1 + doc_id % 20 cycles per window), then
    ``audio_spectral_features`` decodes the samples and runs a real
    numpy FFT per window.  The ENTIRE row is closed-form: dominant bin
    exactly k, frequency k * 8000/64 Hz, and — because the float
    fixture leaves only ~1e-7 off-bin rounding noise (r5; PCM16
    quantization used to block this) — the low/mid/high band-energy
    shares are exactly 1/0 by which third k falls in (33-bin rfft minus
    DC = 32 bins; thirds of 10/10/12; k <= 20 never reaches the high
    band)."""
    media = multimodal.synthesize_tone_media(
        t(spark, sf_dir, "documents"), id_col="doc_id"
    )
    return multimodal.audio_spectral_features(media, n_fft=64)


@query(
    "ns_quality_lm_buckets", extended=True,
    oracle="""
    WITH tk AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
        FROM documents
        WHERE length(trim(text)) > 0
          AND len(regexp_split_to_array(trim(text), '\\s+')) >= 2
    ),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM tk, unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
    cp AS (SELECT w1, count(*) AS cp FROM bg GROUP BY w1),
    v AS (SELECT count(DISTINCT tok) AS vs
          FROM (SELECT unnest(t) AS tok FROM tk) u),
    scores AS (
        SELECT bg.doc_id,
               round(avg(ln((c2.c2 + 0.1) / (cp.cp + 0.1 * v.vs))), 4)
                   AS avg_logprob
        FROM bg JOIN c2 USING (w1, w2) JOIN cp USING (w1) CROSS JOIN v
        GROUP BY bg.doc_id
    ),
    r AS (
        SELECT doc_id, avg_logprob,
               row_number() OVER (ORDER BY avg_logprob DESC, doc_id) AS rk,
               count(*) OVER () AS n
        FROM scores
    )
    SELECT doc_id, avg_logprob,
           CAST(floor((rk - 1) * 3.0 / n) AS INT) + 1 AS bucket_id,
           CASE CAST(floor((rk - 1) * 3.0 / n) AS INT) + 1
                WHEN 1 THEN 'head' WHEN 3 THEN 'tail' ELSE 'middle'
           END AS bucket_label
    FROM r
    """,
)
def ns_quality_lm_buckets(spark, sf_dir):
    """CCNet head/middle/tail corpus split: every document ranked by its
    bigram-LM score and cut into equal-frequency terciles with pure
    integer arithmetic — the quality-bucketed mixture CCNet trains on.
    The global rank is training.range_ranked (range-partitioned
    parallel rank + broadcast offsets — no single-partition sort); the
    oracle replays score + row_number ranking in SQL."""
    from fluss_datafusion_spark.operators import lm

    return lm.quality_buckets(
        t(spark, sf_dir, "documents"), "doc_id", "text", n_buckets=3
    )


@query(
    "ns_sim_hard_negatives", extended=True,
    oracle="""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id, c.vec_id AS neighbor_id,
               list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x*x)))) AS cos
        FROM e q JOIN e c ON q.vec_id < 8 AND c.vec_id <> q.vec_id
    )
    SELECT vec_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored WHERE cos >= 0.3 AND cos < 0.8
    ) WHERE rank <= 10
    """,
)
def ns_sim_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: per anchor
    (vec_id < 8), the top-10 in-band (0.3 <= cos < 0.8) neighbors —
    similar enough to confuse, below the near-dup band.  Brute-force
    baseline plan (broadcast anchors x streamed corpus, band pruned
    before the per-anchor window); the exclusion-pairs path is
    pytest-pinned."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.hard_negatives(
        emb, emb.filter(F.col("vec_id") < 8),
        "vec_id", "embedding", "vec_id", "embedding",
        k=10, band=(0.3, 0.8),
    )


# --------------------------------------------------------------------------
# full-text retrieval (BM25 over an inverted index)
# --------------------------------------------------------------------------


@query(
    "ns_retrieval_bm25",  # r5: CORE - BM25 retrieval differentiator
    # (rotated in; displaced ns_text_fingerprint -> extended)

    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term <> '' GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks
           WHERE term <> '' GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    q AS (SELECT DISTINCT doc_id AS query_id, term FROM tf
          WHERE doc_id % 101 = 0),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        FROM q
        JOIN tf USING (term)
        JOIN dft USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
    FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def ns_retrieval_bm25(spark, sf_dir):
    """BM25 top-5 retrieval (Lucene-variant idf, k1=1.2 b=0.75) with a
    query batch of every 101st document's text against the full corpus.
    Build = two map-side-combined aggs; search = broadcast query terms
    into a term-key hash join + one (query, doc) sum + per-query top-k
    window.  Deterministic: score rounded to 4, rank ties broken by
    doc_id."""
    from fluss_datafusion_spark.operators import retrieval

    docs = t(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("qid"), F.col("text").alias("qtext")
    )
    return retrieval.bm25_search(
        docs, "doc_id", "text", queries, "qid", "qtext", k=5
    )


@query(
    "ns_retrieval_index_lifecycle",  # r7: rotated INTO the core window
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term <> '' GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks
           WHERE term <> '' GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    q AS (SELECT 0 AS query_id, unnest(['hash', 'join', 'fast']) AS term),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        FROM q
        JOIN tf USING (term)
        JOIN dft USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
    FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def ns_retrieval_index_lifecycle(spark, sf_dir):
    """Persisted BM25 index lifecycle (r6): write the first half of the
    corpus, APPEND the second half (pure parquet append — df/N/avgdl
    derive at load, so the appended index ranks exactly like a full
    rebuild), load, query.  The DuckDB oracle scores the WHOLE corpus
    in one pass: a hash match proves append+load == rebuild
    cross-engine."""
    import shutil
    import tempfile

    from fluss_datafusion_spark.operators import retrieval

    docs = t(spark, sf_dir, "documents")
    cut = 250
    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_bm25idx_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    retrieval.write_bm25_index(
        docs.filter(F.col("doc_id") < cut), "doc_id", "text", root
    )
    retrieval.append_to_bm25_index(
        docs.filter(F.col("doc_id") >= cut), "doc_id", "text", root
    )
    postings, doc_stats, corpus_stats = retrieval.load_bm25_index(spark, root)
    queries = spark.createDataFrame([(0, "hash join fast")], ["qid", "qtext"])
    return retrieval.bm25_topk(
        postings, doc_stats, corpus_stats, queries, "qid", "qtext", k=10
    )


@query(
    "ns_curation_weighted_sample", extended=True,
    oracle="""
    WITH w AS (
        SELECT doc_id,
               CAST(1.0 + (doc_id % 5) AS DOUBLE) AS wgt,
               -ln((CAST(concat('0x', substr(md5('wsample-0|' ||
                        CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 0.5)
                   / 4503599627370496.0)
                   / CAST(1.0 + (doc_id % 5) AS DOUBLE) AS e
        FROM documents
    )
    SELECT doc_id, wgt FROM w ORDER BY e, doc_id LIMIT 40
    """,
)
def ns_curation_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    exactly 40 docs drawn proportionally to weight 1+(doc_id%5) under a
    deterministic md5-seeded exponential key — the mixture-weighted
    corpus draw df.sample() cannot express.  DuckDB replays the exact
    variate (52-bit uniform is exactly representable) and must select
    the identical set."""
    from fluss_datafusion_spark.operators import curation

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.lit(1.0) + (F.col("doc_id") % 5).cast("double")).alias("wgt"),
    )
    return curation.weighted_sample_n(docs, "doc_id", "wgt", 40)


# --------------------------------------------------------------------------
# link-graph centrality (web-corpus quality weighting)
# --------------------------------------------------------------------------


@query(
    "ns_graph_pagerank",  # r5: CORE - graph centrality differentiator
    # (rotated in; displaced st_sliding_window -> extended)
    oracle="""
    WITH e AS (
        SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    outd AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / n AS r FROM nodes CROSS JOIN nn),
    d0 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0
           WHERE id NOT IN (SELECT src FROM outd)),
    c0 AS (SELECT dst AS id, sum(r / deg) AS c
           FROM e JOIN outd USING (src) JOIN r0 ON r0.id = e.src GROUP BY 1),
    r1 AS (SELECT nodes.id, 0.15 / n + 0.85 * (coalesce(c, 0) + dm / n) AS r
           FROM nodes CROSS JOIN nn CROSS JOIN d0
           LEFT JOIN c0 ON nodes.id = c0.id),
    d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1
           WHERE id NOT IN (SELECT src FROM outd)),
    c1 AS (SELECT dst AS id, sum(r / deg) AS c
           FROM e JOIN outd USING (src) JOIN r1 ON r1.id = e.src GROUP BY 1),
    r2 AS (SELECT nodes.id, 0.15 / n + 0.85 * (coalesce(c, 0) + dm / n) AS r
           FROM nodes CROSS JOIN nn CROSS JOIN d1
           LEFT JOIN c1 ON nodes.id = c1.id),
    d2 AS (SELECT coalesce(sum(r), 0) AS dm FROM r2
           WHERE id NOT IN (SELECT src FROM outd)),
    c2 AS (SELECT dst AS id, sum(r / deg) AS c
           FROM e JOIN outd USING (src) JOIN r2 ON r2.id = e.src GROUP BY 1),
    r3 AS (SELECT nodes.id, 0.15 / n + 0.85 * (coalesce(c, 0) + dm / n) AS r
           FROM nodes CROSS JOIN nn CROSS JOIN d2
           LEFT JOIN c2 ON nodes.id = c2.id)
    SELECT id, round(r * n, 5) AS rank_norm FROM r3 CROSS JOIN nn
    """,
)
def ns_graph_pagerank(spark, sf_dir):
    """PageRank (3 power iterations, d=0.85) over the real
    customer->supplier purchase graph (orders x lineitem).  Suppliers
    have no out-edges, so every iteration exercises the
    dangling-mass redistribution that keeps sum(rank) = 1.  DuckDB
    unrolls the identical iterations; rank_norm = rank * N rounded
    to 5 absorbs cross-engine float-sum order."""
    from fluss_datafusion_spark.operators import graph

    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return graph.pagerank(e, "src", "dst", damping=0.85, n_iters=3)


@query(
    "ns_retrieval_bm25_phrase", extended=True,
    oracle="""
    WITH alltoks AS (
        SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        FROM documents
    ),
    matched AS (
        SELECT doc_id FROM alltoks
        WHERE len(tk) >= 2 AND list_contains(
            list_transform(range(len(tk) - 1),
                           i -> tk[i+1] || ' ' || tk[i+2]),
            'join order')
    ),
    toks AS (
        SELECT a.doc_id, unnest(a.tk) AS term
        FROM alltoks a JOIN matched USING (doc_id)
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term <> '' GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks
           WHERE term <> '' GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    q AS (SELECT 0 AS query_id, unnest(['join', 'order', 'fast']) AS term),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        FROM q
        JOIN tf USING (term)
        JOIN dft USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
    FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def ns_retrieval_bm25_phrase(spark, sf_dir):
    """Phrase-restricted BM25 (r5 — the '"join order" fast' search
    shape): the exact-phrase filter prunes the corpus with a
    word-2-shingle membership test BEFORE indexing, then BM25 ranks
    within the matching subcorpus (whose own df/avgdl are the
    statistically right collection stats).  DuckDB rebuilds the shingle
    filter and the full scoring chain."""
    from fluss_datafusion_spark.operators import retrieval

    docs = t(spark, sf_dir, "documents")
    queries = spark.createDataFrame([(0, "join order fast")], ["qid", "qtext"])
    return retrieval.bm25_phrase_search(
        docs, "doc_id", "text", queries, "qid", "qtext",
        phrase="join order", k=10,
    )


@query(
    "ns_retrieval_phrase_positional",  # r7: rotated INTO the core window
    oracle="""
    WITH alltoks AS (
        SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        FROM documents
    ),
    pos AS (
        SELECT doc_id, unnest(tk) AS term, generate_subscripts(tk, 1) AS p
        FROM alltoks
    ),
    matched AS (
        SELECT DISTINCT a.doc_id
        FROM pos a JOIN pos b ON a.doc_id = b.doc_id
        WHERE a.term = 'hash' AND b.term = 'join'
          AND b.p > a.p AND b.p - a.p - 1 <= 2
    ),
    toks AS (
        SELECT a.doc_id, unnest(a.tk) AS term
        FROM alltoks a JOIN matched USING (doc_id)
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term <> '' GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks
           WHERE term <> '' GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    q AS (SELECT 0 AS query_id, unnest(['hash', 'join', 'fast']) AS term),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        FROM q
        JOIN tf USING (term)
        JOIN dft USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
    FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def ns_retrieval_phrase_positional(spark, sf_dir):
    """Positional proximity retrieval (r6 — Lucene's ``"hash join"~2``):
    term positions stored in the postings, ordered-proximity match
    decided by a greedy minimal position chain in JVM array lambdas
    (positions p1 < p2 with span <= slop), then BM25 ranks within the
    matching subcorpus.  Unlike the r5 shingle phrase filter this
    matches interleaved occurrences ("hash inner join") — the oracle
    replays positions with a DuckDB position self-join and re-scores
    the full BM25 chain."""
    from fluss_datafusion_spark.operators import retrieval

    docs = t(spark, sf_dir, "documents")
    queries = spark.createDataFrame([(0, "hash join fast")], ["qid", "qtext"])
    return retrieval.bm25_proximity_search(
        docs, "doc_id", "text", queries, "qid", "qtext",
        phrase="hash join", slop=2, k=10,
    )


@query(
    "ns_retrieval_bm25f", extended=True,
    oracle="""
    WITH split AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
        FROM documents
    ),
    occ AS (
        SELECT doc_id, 'title' AS fld, unnest(ts[1:4]) AS term FROM split
        UNION ALL
        SELECT doc_id, 'body' AS fld, unnest(ts[5:]) AS term FROM split
    ),
    tf AS (SELECT doc_id, fld, term, count(*) AS tf FROM occ
           WHERE term <> '' GROUP BY 1, 2, 3),
    dl AS (SELECT doc_id, fld, count(*) AS dl FROM occ
           WHERE term <> '' GROUP BY 1, 2),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM dl),
    fstats AS (
        SELECT fld, sum(dl) / (SELECT n FROM n_docs) AS avgdl,
               CASE fld WHEN 'title' THEN 2.5 ELSE 1.0 END AS w
        FROM dl GROUP BY fld
    ),
    dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    q AS (
        SELECT DISTINCT doc_id AS query_id, term FROM (
            SELECT doc_id, unnest(ts) AS term FROM split
            WHERE doc_id % 101 = 0
        ) WHERE term <> ''
    ),
    wtf AS (
        SELECT q.query_id, tf.doc_id, tf.term,
               sum(w * tf / (1 - 0.75 + 0.75 * dl.dl / avgdl)) AS wtf
        FROM q
        JOIN tf USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id AND tf.fld = dl.fld
        JOIN fstats ON tf.fld = fstats.fld
        GROUP BY 1, 2, 3
    ),
    scored AS (
        SELECT query_id, wtf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5))
                   * wtf * (1.2 + 1) / (wtf + 1.2)), 4) AS score
        FROM wtf
        JOIN dft USING (term)
        CROSS JOIN n_docs
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
    FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def ns_retrieval_bm25f(spark, sf_dir):
    """BM25F field-weighted top-5 retrieval (Robertson/Zaragoza/Taylor
    2004 simple variant, the Lucene combined_fields scorer): documents
    split into a title field (first 4 tokens, weight 2.5) and a body
    field (rest, weight 1.0); per-field length-normalized tfs combine
    into one pseudo-frequency saturated once per term.  Queries = every
    101st document's full text.  DuckDB replays the whole fielded chain
    — per-field tf/dl, doc-level df, avgdl over all indexed docs —
    and every score and rank hash-checks."""
    from fluss_datafusion_spark.operators import retrieval

    docs = t(spark, sf_dir, "documents")
    ts = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    fielded = docs.select(
        "doc_id",
        F.array_join(F.slice(ts, 1, 4), " ").alias("title"),
        F.array_join(
            F.when(F.size(ts) > 4, F.slice(ts, 5, 1 << 30)).otherwise(
                F.array().cast("array<string>")
            ),
            " ",
        ).alias("body"),
    )
    queries = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("qid"), F.col("text").alias("qtext")
    )
    return retrieval.bm25f_search(
        fielded, "doc_id", {"title": 2.5, "body": 1.0},
        queries, "qid", "qtext", k=5,
    )


@query(
    "ns_retrieval_bm25_pruned", extended=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term <> '' GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks
           WHERE term <> '' GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    q_raw AS (SELECT DISTINCT doc_id AS query_id, term FROM tf
              WHERE doc_id % 101 = 0),
    ub AS (
        SELECT query_id, term,
               ln(1 + (n - df + 0.5) / (df + 0.5)) * (1.2 + 1) AS ub
        FROM q_raw JOIN dft USING (term) CROSS JOIN stats
    ),
    q AS (
        SELECT query_id, term FROM (
            SELECT query_id, term,
                   coalesce(sum(ub) OVER (
                       PARTITION BY query_id ORDER BY ub DESC, term
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum,
                   sum(ub) OVER (PARTITION BY query_id) AS tot
            FROM ub
        ) WHERE cum < 0.7 * tot - 1e-12
    ),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        FROM q
        JOIN tf USING (term)
        JOIN dft USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
    FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def ns_retrieval_bm25_pruned(spark, sf_dir):
    """WAND-style query-term pruning (Broder 2003 upper bounds, the
    MaxScore/WAND batch analog): each query keeps only the highest-
    impact prefix of its terms holding 70% of the UB(t) = idf*(k1+1)
    mass — the low-idf tail (whose postings lists are the Zipf head,
    i.e. the expensive keys) never reaches the postings join.  DuckDB
    replays the deterministic pruning rule (UB-desc/term-asc cumulative
    window) and the downstream BM25 chain; scores and ranks
    hash-check."""
    from fluss_datafusion_spark.operators import retrieval

    docs = t(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("qid"), F.col("text").alias("qtext")
    )
    return retrieval.bm25_search(
        docs, "doc_id", "text", queries, "qid", "qtext",
        k=5, term_keep_mass=0.7,
    )


@query(
    "ns_embedding_pca", extended=True,
    oracle="""
    SELECT count(*) AS n, CAST(max(len(embedding)) AS INT) AS dim,
           4 AS k, TRUE AS orthonormal_ok, TRUE AS variance_desc_ok,
           TRUE AS mean_ok, TRUE AS whiten_ok, TRUE AS truncation_ok
    FROM embeddings WHERE embedding IS NOT NULL
    """,
)
def ns_embedding_pca(spark, sf_dir):
    """Distributed PCA + whitening over the embeddings table
    (operators/embeddings.py — the SemDeDup/ANN preprocessing step):
    one Arrow-batched moment pass reduced in Spark (driver sees
    1 + d + d^2 scalars), eigendecomposition on the d x d covariance,
    shuffle-free matmul transform.  The q45 pattern: the entry verifies
    its own invariants with wide margins — component orthonormality,
    variance-descending eigenvalues, the fitted mean equals the
    SQL-aggregated per-coordinate mean, whitened output has ~identity
    covariance and ~zero mean (checked by re-fitting PCA on it through
    the same distributed path), and truncated eigenvalues equal the
    full spectrum's head — and the oracle pins n/dim/k."""
    import numpy as np

    from fluss_datafusion_spark.operators import embeddings as E

    emb = t(spark, sf_dir, "embeddings").na.drop(subset=["embedding"])
    model = E.pca_fit(emb, "embedding", k=4)
    dim, n = model["dim"], model["n"]
    comps = np.array(model["components"])
    ev = np.array(model["eigenvalues"])
    orthonormal_ok = bool(
        np.allclose(comps @ comps.T, np.eye(4), atol=1e-8)
    )
    variance_desc_ok = bool(np.all(np.diff(ev) <= 1e-12))
    sql_mean = (
        emb.agg(
            *[
                F.avg(F.element_at(F.col("embedding"), i + 1)).alias(f"m{i}")
                for i in range(dim)
            ]
        ).collect()[0]
    )
    mean_ok = bool(
        np.allclose(model["mean"], [sql_mean[i] for i in range(dim)],
                    atol=1e-6)
    )
    white = E.pca_transform(emb, "embedding", model, "p", whiten=True)
    refit = E.pca_fit(white, "p", k=4)
    whiten_ok = bool(
        np.allclose(refit["eigenvalues"], 1.0, atol=0.05)
        and np.allclose(refit["mean"], 0.0, atol=1e-6)
    )
    full = E.pca_fit(emb, "embedding", k=dim)
    truncation_ok = bool(
        np.allclose(full["eigenvalues"][:4], ev, rtol=1e-8)
    )
    return spark.createDataFrame(
        [
            (
                n, dim, 4, orthonormal_ok, variance_desc_ok,
                mean_ok, whiten_ok, truncation_ok,
            )
        ],
        "n long, dim int, k int, orthonormal_ok boolean,"
        " variance_desc_ok boolean, mean_ok boolean, whiten_ok boolean,"
        " truncation_ok boolean",
    )


@query(
    "ns_sketch_kmv",  # r5: CORE - hash-checked raw sketch estimate differentiator
    oracle="""
    WITH h AS (
        SELECT DISTINCT o_orderstatus AS g,
               CAST(concat('0x', substr(md5('kmv-0|' ||
                    CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        FROM orders WHERE o_custkey IS NOT NULL
    ),
    sk AS (
        SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
        FROM h
    ),
    est AS (
        SELECT g, count(*) AS n, max(hv) AS uk
        FROM sk WHERE rn <= 128 GROUP BY g
    ),
    ex AS (
        SELECT o_orderstatus AS g, count(DISTINCT o_custkey) AS exact
        FROM orders GROUP BY g
    )
    SELECT est.g AS g,
           round(CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
                 ELSE 127 / (CAST(uk AS DOUBLE) / 1152921504606846976.0)
                 END, 4) AS distinct_est,
           CAST(exact AS BIGINT) AS exact_distinct,
           abs(round(CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
                 ELSE 127 / (CAST(uk AS DOUBLE) / 1152921504606846976.0)
                 END, 4) / exact - 1) < 0.5 AS bound_ok
    FROM est JOIN ex ON est.g = ex.g
    """,
)
def ns_sketch_kmv(spark, sf_dir):
    """KMV bottom-k distinct sketch (operators/sketches.py — Beyer et
    al. 2007): per order status, the k=128 smallest md5-60bit hashes of
    o_custkey estimate the distinct customer count.  Unlike HLL (whose
    register internals are engine-defined, so q45/q46's raw estimates
    are rows-only), the KMV ESTIMATE itself is deterministic and DuckDB
    replays it bit-for-bit from the same hash chain — a hash-checked
    raw sketch estimate, plus the exact count and an error-bound
    boolean."""
    from fluss_datafusion_spark.operators import sketches as K

    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("g"), "o_custkey"
    )
    est = K.kmv_distinct(orders, ["g"], "o_custkey", k=128)
    exact = orders.groupBy("g").agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return est.join(exact, "g").select(
        "g",
        "distinct_est",
        "exact_distinct",
        (
            F.abs(F.col("distinct_est") / F.col("exact_distinct") - 1) < 0.5
        ).alias("bound_ok"),
    )


@query(
    "ns_sketch_kmv_setops", extended=True,
    oracle="""
    WITH a AS (
        SELECT DISTINCT CAST(concat('0x', substr(md5('kmv-0|' ||
                    CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        FROM orders WHERE o_totalprice > 150000
    ),
    b AS (
        SELECT DISTINCT CAST(concat('0x', substr(md5('kmv-0|' ||
                    CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ),
    sa AS (SELECT hv FROM a ORDER BY hv LIMIT 256),
    sb AS (SELECT hv FROM b ORDER BY hv LIMIT 256),
    u AS (
        SELECT hv FROM (SELECT hv FROM sa UNION SELECT hv FROM sb)
        ORDER BY hv LIMIT 256
    ),
    ue AS (SELECT count(*) AS n, max(hv) AS uk FROM u),
    nboth AS (
        SELECT count(*) AS nb FROM u
        WHERE hv IN (SELECT hv FROM sa) AND hv IN (SELECT hv FROM sb)
    ),
    uest AS (
        SELECT round(CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
               ELSE 255 / (CAST(uk AS DOUBLE) / 1152921504606846976.0)
               END, 4) AS union_est, n FROM ue
    )
    SELECT union_est,
           round(CAST(nb AS DOUBLE) / n * union_est, 4) AS intersect_est,
           round(CAST(nb AS DOUBLE) / n, 4) AS jaccard_est
    FROM uest, nboth
    """,
)
def ns_sketch_kmv_setops(spark, sf_dir):
    """KMV sketch set algebra (the queries HLL cannot answer): how many
    DISTINCT customers placed a >150k order AND a high-priority order —
    union, intersection, and Jaccard estimated from two mergeable
    bottom-256 sketches via rho = |S_k(A∪B) ∩ S_A ∩ S_B| / |S_k(A∪B)|.
    Every estimate is a deterministic function of the md5 hash chain;
    DuckDB replays all three bit-for-bit."""
    from fluss_datafusion_spark.operators import sketches as K

    orders = t(spark, sf_dir, "orders").withColumn("g", F.lit(1))
    a = orders.filter(F.col("o_totalprice") > 150000)
    b = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    out = K.kmv_set_estimates(
        K.kmv_sketch(a, ["g"], "o_custkey", k=256),
        K.kmv_sketch(b, ["g"], "o_custkey", k=256),
        ["g"],
        256,
    )
    return out.select("union_est", "intersect_est", "jaccard_est")


@query(
    "ns_curation_line_dedup", extended=True,
    oracle="""
    WITH corpus AS (
        SELECT doc_id, replace(text, ' the ', chr(10) || 'the ') AS text
        FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               replace(text, ' the ', chr(10) || 'the ')
        FROM documents WHERE doc_id % 37 = 0
    ),
    ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM corpus),
    raw AS (
        SELECT doc_id, generate_subscripts(arr, 1) AS pos,
               unnest(arr) AS line
        FROM ls
    ),
    lines AS (
        SELECT doc_id, pos, line, lower(trim(line)) AS norm FROM raw
    ),
    hot AS (
        SELECT norm FROM lines WHERE norm <> ''
        GROUP BY norm HAVING count(DISTINCT doc_id) >= 2
    ),
    marked AS (
        SELECT doc_id, pos, line,
               (norm <> '' AND norm IN (SELECT norm FROM hot)) AS drp
        FROM lines
    )
    SELECT doc_id,
           md5(coalesce(string_agg(CASE WHEN NOT drp THEN line END,
                                   chr(10) ORDER BY pos), '')) AS dedup_md5,
           CAST(count(*) AS INT) AS n_lines,
           CAST(sum(CASE WHEN drp THEN 1 ELSE 0 END) AS INT) AS n_dropped
    FROM marked GROUP BY doc_id
    """,
)
def ns_curation_line_dedup(spark, sf_dir):
    """CCNet line-level deduplication (Wenzek 2020 — the boilerplate
    scrub document-level near-dup cannot express): documents are lined
    on a deterministic ' the ' boundary, a 1-in-37 slice is duplicated
    under shifted ids (so its every line becomes a cross-doc dup), and
    every line appearing in >= 2 distinct docs is dropped with
    survivors rejoined in order.  DuckDB replays lining, normalization,
    the distinct-doc line counts, and the byte-exact md5 of every
    deduplicated document."""
    from fluss_datafusion_spark.operators.curation import dedup_lines

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.replace(
            F.col("text"), F.lit(" the "), F.lit("\nthe ")
        ).alias("text"),
    )
    dup = docs.filter(F.col("doc_id") % 37 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    out = dedup_lines(docs.unionByName(dup), "doc_id", "text", min_docs=2)
    return out.select(
        "doc_id",
        F.md5(F.col("text_deduped")).alias("dedup_md5"),
        "n_lines",
        "n_dropped",
    )


@query(
    "ns_text_hashing_vectorizer", extended=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
        FROM documents
    ),
    w AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5('htf-0|' || tok), 1, 15))
                    AS BIGINT) % 64 AS idx,
               count(*) AS cnt
        FROM toks WHERE tok <> '' GROUP BY 1, 2
    )
    SELECT doc_id, CAST(idx AS INT) AS idx,
           round(cnt / sqrt(sum(cnt * cnt)
                 OVER (PARTITION BY doc_id)), 6) AS weight
    FROM w
    """,
)
def ns_text_hashing_vectorizer(spark, sf_dir):
    """Feature hashing (Weinberger 2009 "hashing trick"): documents
    become 64-wide L2-normalized term-frequency vectors via
    md5-60bit-mod-dim bucketing — the model-free featurizer that feeds
    PCA/whitening, cosine similarity, and embedding dedup when no
    learned embeddings exist.  The entry emits the nonzero (doc, bucket,
    weight) coordinates; DuckDB replays the hash chain, counts, and L2
    normalization and every coordinate hash-checks."""
    from fluss_datafusion_spark.operators.embeddings import (
        hashed_tf_vectors,
    )

    vecs = hashed_tf_vectors(
        t(spark, sf_dir, "documents"), "doc_id", "text", dim=64, l2=True
    )
    return (
        vecs.select(
            "doc_id", F.posexplode(F.col("vector")).alias("idx", "w")
        )
        .filter(F.col("w") != 0.0)
        .select("doc_id", "idx", F.round("w", 6).alias("weight"))
    )


@query(
    "ns_sketch_cms", extended=True,
    oracle="""
    WITH pv AS (
        SELECT o_orderstatus AS g, CAST(o_custkey AS VARCHAR) AS v,
               count(*) AS w
        FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1, 2
    ),
    rows_i AS (SELECT unnest(range(3)) AS i),
    cells AS (
        SELECT g, i,
               CAST(concat('0x', substr(md5('cms-0|' || CAST(i AS VARCHAR)
                    || '|' || v), 1, 15)) AS BIGINT) % 256 AS b,
               CAST(sum(w) AS BIGINT) AS cnt
        FROM pv, rows_i GROUP BY 1, 2, 3
    ),
    cand AS (
        SELECT g, ck FROM (SELECT DISTINCT o_orderstatus AS g FROM orders),
                          (SELECT unnest(range(50)) AS ck)
    ),
    qa AS (
        SELECT cand.g, cand.ck, rows_i.i,
               CAST(concat('0x', substr(md5('cms-0|' || CAST(rows_i.i AS VARCHAR)
                    || '|' || CAST(cand.ck AS VARCHAR)), 1, 15)) AS BIGINT)
                    % 256 AS b
        FROM cand, rows_i
    ),
    est AS (
        SELECT qa.g, qa.ck, min(coalesce(cells.cnt, 0)) AS freq_est
        FROM qa LEFT JOIN cells
          ON cells.g = qa.g AND cells.i = qa.i AND cells.b = qa.b
        GROUP BY 1, 2
    ),
    ex AS (
        SELECT o_orderstatus AS g, o_custkey AS ck, count(*) AS exact
        FROM orders GROUP BY 1, 2
    ),
    tot AS (
        SELECT o_orderstatus AS g, count(*) AS n
        FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
    )
    SELECT est.g AS g, CAST(est.ck AS BIGINT) AS custkey,
           CAST(freq_est AS BIGINT) AS freq_est,
           CAST(coalesce(ex.exact, 0) AS BIGINT) AS exact_freq,
           freq_est >= coalesce(ex.exact, 0) AS ge_ok,
           freq_est <= coalesce(ex.exact, 0)
               + 2.718281828459045 / 256 * tot.n AS bound_ok
    FROM est
    LEFT JOIN ex ON ex.g = est.g AND ex.ck = est.ck
    JOIN tot ON tot.g = est.g
    """,
)
def ns_sketch_cms(spark, sf_dir):
    """Count-min sketch (operators/sketches.py — Cormode &
    Muthukrishnan 2005): per order status, a 3x256 CMS of o_custkey
    frequencies, point-estimated for custkeys 0..49.  Counters are the
    deterministic md5-60bit chain, so DuckDB rebuilds every cell and
    every min-over-rows estimate bit-for-bit — a hash-checked raw
    sketch row (the mergeable-shard property is pinned cell-wise by
    tests/test_cms.py).  Columns: the estimate, the exact count, the
    never-underestimate boolean (always true) and the eps=e/w error
    bound per the per-group mass."""
    from fluss_datafusion_spark.operators import sketches as K

    width, depth = 256, 3
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("g"), "o_custkey"
    )
    sk = K.cms_sketch(orders, ["g"], "o_custkey", width=width, depth=depth)
    cand = (
        orders.select("g").distinct()
        .crossJoin(spark.range(50).select(F.col("id").alias("o_custkey")))
    )
    est = K.cms_estimate(sk, cand, ["g"], "o_custkey", width, depth).select(
        "g",
        F.col("o_custkey").cast("bigint").alias("custkey"),
        F.col("freq_est").cast("bigint").alias("freq_est"),
    )
    exact = orders.groupBy("g", F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("exact")
    )
    tot = orders.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    return (
        est.join(exact, ["g", "custkey"], "left")
        .join(tot, "g")
        .select(
            "g",
            "custkey",
            "freq_est",
            F.coalesce(F.col("exact"), F.lit(0)).cast("bigint").alias("exact_freq"),
            (F.col("freq_est") >= F.coalesce(F.col("exact"), F.lit(0))).alias("ge_ok"),
            (
                F.col("freq_est")
                <= F.coalesce(F.col("exact"), F.lit(0))
                + 2.718281828459045 / width * F.col("n")
            ).alias("bound_ok"),
        )
    )


@query(
    # r6 rotation: -> CORE (VERDICT r5 #7 — RRF fusion is the RAG
    # retrieval differentiator; displaced ns_dedup_simhash stays green
    # in the extended registry)
    "ns_retrieval_hybrid",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term <> '' GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks
           WHERE term <> '' GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    q AS (SELECT DISTINCT doc_id AS query_id, term FROM tf
          WHERE doc_id % 101 = 0),
    lex_scored AS (
        SELECT q.query_id, tf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        FROM q
        JOIN tf USING (term)
        JOIN dft USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        WHERE tf.doc_id <> q.query_id
        GROUP BY 1, 2
    ),
    lex AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS r
        FROM lex_scored
    ),
    e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    dense_scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x*x)))) AS cos
        FROM e q JOIN e c ON q.vec_id % 101 = 0 AND c.vec_id <> q.vec_id
    ),
    dense AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, doc_id) AS r
        FROM dense_scored
    ),
    fused AS (
        SELECT query_id, doc_id,
               round(sum(1.0 / (60 + r)), 6) AS rrf_score,
               CAST(count(*) AS INT) AS n_lists
        FROM (SELECT * FROM lex WHERE r <= 10
              UNION ALL SELECT * FROM dense WHERE r <= 10)
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, rrf_score, n_lists, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_score DESC, doc_id) AS rank
        FROM fused
    ) WHERE rank <= 5
    """,
)
def ns_retrieval_hybrid(spark, sf_dir):
    """Hybrid lexical+dense retrieval fused with RRF (Cormack 2009 —
    operators/retrieval.py rrf_fuse/hybrid_search): BM25 top-10 and
    exact-cosine top-10 per query (every 101st document as query text,
    its embedding as query vector, self excluded), fused by
    sum 1/(60+rank) — the calibration-free combiner RAG pipelines run.
    Both branch rankings and the fused score are deterministic
    (rounded score / bit-identical cosine / integer-rank reciprocals),
    so DuckDB replays the full pipeline."""
    from fluss_datafusion_spark.operators.retrieval import hybrid_search

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    queries = (
        docs.filter(F.col("doc_id") % 101 == 0)
        .select(F.col("doc_id").alias("qid"), F.col("text").alias("qtext"))
        .join(
            emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
            "qid",
        )
    )
    return hybrid_search(
        docs, "doc_id", "text", emb, "vec_id", "embedding",
        queries, "qid", "qtext", "qvec", k=5, depth=10,
    )


@query(
    "ns_ts_rolling_zscore", extended=True,
    oracle="""
    WITH o AS (
        SELECT event_id, event_type, value,
               avg(value) OVER w AS m,
               stddev_samp(value) OVER w AS s,
               count(value) OVER w AS h
        FROM (SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
              FROM events)
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type, value,
           round(CASE WHEN h >= 5 AND s IS NOT NULL AND s > 0
                      THEN (value - m) / s END, 6) AS zscore,
           coalesce(CASE WHEN h >= 5 AND s IS NOT NULL AND s > 0
                         THEN abs((value - m) / s) > 3.0 END,
                    false) AS is_anomaly
    FROM o
    """,
)
def ns_ts_rolling_zscore(spark, sf_dir):
    """Trailing-window z-score anomaly detection
    (operators/timeseries.zscore_anomalies): every event scored against
    the mean/std of its event type's previous 20 events (frame excludes
    the current row so a spike cannot dilute its own baseline; null
    until 5 prior rows; zero-variance baselines yield null, not NaN).
    One window pass — bounded frame state, shuffle only on the group
    key; the monitoring primitive that runs unchanged on a 100 TB
    event log."""
    from fluss_datafusion_spark.operators.timeseries import zscore_anomalies

    ev = t(spark, sf_dir, "events")
    out = zscore_anomalies(
        ev, ["event_type"], "ts", "value", n=20, threshold=3.0,
        min_history=5, tiebreak_cols=["event_id"],
    )
    return out.select(
        "event_id", "event_type", "value",
        F.round("zscore", 6).alias("zscore"), "is_anomaly",
    )


@query(
    "ns_ts_ewma", extended=True,
    oracle="""
    WITH f AS (
        SELECT event_id, event_type,
               list(value) OVER (PARTITION BY event_type
                                 ORDER BY CAST(ts AS TIMESTAMP), event_id
                                 ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
                   AS frame
        FROM events
    )
    SELECT event_id, event_type,
           round(
               list_sum(list_transform(frame,
                   (x, i) -> x * pow(0.7, CAST(len(frame) - i AS DOUBLE))))
               / list_sum(list_transform(frame,
                   (x, i) -> pow(0.7, CAST(len(frame) - i AS DOUBLE)))),
               6) AS ewma
    FROM f
    """,
)
def ns_ts_ewma(spark, sf_dir):
    """Bounded-lookback EWMA (operators/timeseries.rolling_ewma —
    pandas ewm(adjust=True) truncated to 16 rows, the feature-store
    decay window): per event type, weight (1-a)^lag with a=0.3,
    normalized over the rows present.  The 16-row frame is what makes
    it distributed-exact — state per key is constant, and DuckDB
    replays the same sequential fold over the same frame order."""
    from fluss_datafusion_spark.operators.timeseries import rolling_ewma

    ev = t(spark, sf_dir, "events")
    out = rolling_ewma(
        ev, ["event_type"], "ts", "value", alpha=0.3, lookback=16,
        tiebreak_cols=["event_id"],
    )
    return out.select("event_id", "event_type", F.round("ewma", 6).alias("ewma"))


@query(
    # r6 rotation: -> CORE (VERDICT r5 #7 — the second hard-signal graph
    # row next to pagerank; displaced ns_dedup_semantic stays green in
    # the extended registry)
    "ns_graph_components",
    oracle="""
    WITH RECURSIVE nodes AS (
        SELECT c_custkey AS n FROM customer
    ),
    e0 AS (
        SELECT n AS a, n + 1 AS b FROM nodes
        WHERE n % 10 < 9 AND n % 50 >= 10
        UNION ALL
        SELECT n AS a, n + 10 AS b FROM nodes WHERE n % 50 = 10
    ),
    edges AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
    reach(node, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
    )
    SELECT node AS node_id, CAST(min(r) AS BIGINT) AS component_id
    FROM reach GROUP BY node
    """,
)
def ns_graph_components(spark, sf_dir):
    """Connected components as a public graph operator
    (operators/graph.connected_components — Kiveris SoCC'14 star
    contraction, generalizing the dedup-cluster machinery to entity
    resolution / account linking): a deterministic graph over customer
    keys (per 50-block: chains of 10, one 20-node bridge-merged
    component, and 10 isolated keys) labeled with the min node id per
    component.  Isolated nodes come back as singleton components via
    the nodes-side anti-join.  The DuckDB oracle re-derives every label
    by recursive-CTE reachability."""
    from fluss_datafusion_spark.operators.graph import connected_components

    n = F.col("n")
    cust = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("n"))
    chain = cust.filter((n % 10 < 9) & (n % 50 >= 10)).select(
        n.alias("src"), (n + 1).alias("dst")
    )
    bridge = cust.filter(n % 50 == 10).select(n.alias("src"), (n + 10).alias("dst"))
    comps = connected_components(
        chain.unionByName(bridge), "src", "dst", nodes=cust, node_col="n"
    )
    return comps.select("node_id", F.col("component_id").cast("bigint").alias("component_id"))


@query(
    "ns_training_unigram_tokens", extended=True,
    oracle=r"""
    SELECT doc_id,
           replace(array_to_string(
               regexp_split_to_array(lower(trim(text)), '\s+'), ''
           ), ' ', '') AS detok,
           true AS ref_match
    FROM documents
    """,
)
def ns_training_unigram_tokens(spark, sf_dir):
    """Unigram-LM tokenizer end-to-end hash-checked (operators/
    unigram.py — Kudo 2018 hard-EM variant, the second trained
    tokenizer family next to BPE): train a 300-piece vocab on the
    corpus, Viterbi-tokenize every document, then pin the output two
    independent ways.  (1) ``detok``: concatenating each document's
    tokens in position order must reconstruct its lower-cased
    space-stripped text exactly — DuckDB recomputes that from
    documents.text, so one wrong/lost/reordered piece hash-mismatches.
    (2) ``ref_match``: a memoized top-down recursion (structurally
    different from the forward-DP kernel) re-segments every word under
    the same vocab and must agree piece-for-piece; the oracle asserts
    the boolean.  The TRAINER itself is pinned vocab-by-vocab against
    a pure-dict reference in tests/test_unigram.py."""
    import math

    import pandas as pd
    from functools import lru_cache

    from fluss_datafusion_spark.operators import unigram as U

    docs = t(spark, sf_dir, "documents")
    vocab = U.learn_unigram(
        docs, "text", vocab_size=300, max_piece_len=6, seed_size=800,
        em_iters=2,
    )
    toked = U.apply_unigram(docs, "doc_id", "text", vocab, max_piece_len=6)
    detok = (
        toked.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(
                    F.collect_list(F.struct("pos", "token"))
                ), lambda s: s["token"])
            ).alias("detok")
        )
    )

    logp = dict(vocab)
    unk = min(logp.values()) - U._UNK_PENALTY

    def _ref(batches):
        import re as _re

        def segment(word):
            @lru_cache(maxsize=None)
            def solve(i):
                if i == 0:
                    return (0.0, ())
                cands = []
                for j in range(max(0, i - 6), i):
                    piece = word[j:i]
                    lp = logp.get(piece)
                    if lp is None:
                        if len(piece) > 1:
                            continue
                        lp = unk
                    prev = solve(j)
                    cands.append((prev[0] + lp, -j, prev[1] + (piece,)))
                cands.sort(key=lambda c: (c[0], c[1]), reverse=True)
                return (cands[0][0], cands[0][2])

            return list(solve(len(word))[1])

        for pdf in batches:
            ids, detoks = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pieces = []
                for w in _re.split(r"\s+", str(text).lower().strip()):
                    if w:
                        pieces.extend(segment(w))
                ids.append(doc_id)
                detoks.append("".join(pieces))
            yield pd.DataFrame({"doc_id": ids, "ref_detok": detoks})

    ref = docs.select("doc_id", "text").mapInPandas(
        _ref, "doc_id long, ref_detok string"
    )
    return detok.join(ref, "doc_id").select(
        "doc_id",
        "detok",
        (F.col("detok") == F.col("ref_detok")).alias("ref_match"),
    )


@query(
    "ns_curation_pseudonymize", extended=True,
    oracle="""
    SELECT doc_id,
           CASE WHEN source IS NULL THEN NULL
                ELSE concat('src_', substr(md5('s4lt|source|' || source), 1, 16))
           END AS source,
           lang,
           n_chars
    FROM documents
    """,
)
def ns_curation_pseudonymize(spark, sf_dir):
    """Deterministic pseudonymization (operators/curation.pseudonymize):
    the documents' source column replaced by a salted, column-scoped
    md5 token — stable for joins/groupBys, irreversible without the
    salt, NULL-preserving.  Pure JVM md5/concat expressions (zero
    shuffles, zero UDFs); DuckDB replays every token bit-for-bit."""
    from fluss_datafusion_spark.operators.curation import pseudonymize

    docs = t(spark, sf_dir, "documents")
    return pseudonymize(
        docs.select("doc_id", "source", "lang", "n_chars"),
        ["source"], salt="s4lt", prefix_map={"source": "src"},
    )


@query(
    "ns_text_pmi_collocations", extended=True,
    oracle=r"""
    WITH toks AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents
        WHERE trim(text) <> ''
          AND len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 2
    ),
    bg AS (
        SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p FROM toks
    ),
    pairs AS (
        SELECT p[1] AS w1, p[2] AS w2, count(*) AS n_ab
        FROM bg GROUP BY 1, 2
    ),
    uni AS (
        SELECT w, count(*) AS n FROM (
            SELECT p[1] AS w FROM bg
            UNION ALL
            SELECT p[2] FROM bg
        ) GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_ab) AS DOUBLE) AS total_bg FROM pairs)
    SELECT w1, w2, CAST(n_ab AS BIGINT) AS pair_count,
           round(ln((n_ab / total_bg)
                    / ((a.n / (2 * total_bg)) * (b.n / (2 * total_bg)))), 6)
               AS pmi
    FROM pairs
    JOIN uni a ON a.w = pairs.w1
    JOIN uni b ON b.w = pairs.w2
    CROSS JOIN tot
    WHERE n_ab >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 100
    """,
)
def ns_text_pmi_collocations(spark, sf_dir):
    """PMI collocation extraction (operators/lm.pmi_collocations —
    Church & Hanks 1990): top-100 adjacent-pair pointwise mutual
    information over the corpus bigram/unigram mass, min_count=5
    guarding PMI's hapax bias — the multiword-unit detector tokenizer
    and stop-phrase pipelines consume.  One bigram explode + two
    map-side-combined counts + vocabulary-keyed joins; no UDFs, so
    DuckDB replays every statistic and the deterministic
    (pmi DESC, pair) ordering exactly."""
    from fluss_datafusion_spark.operators.lm import pmi_collocations

    docs = t(spark, sf_dir, "documents")
    return pmi_collocations(docs, "doc_id", "text", min_count=5, top_k=100)


@query(
    "ns_profile_histogram", extended=True,
    oracle="""
    WITH s AS (
        SELECT event_type, min(value) AS lo, max(value) AS hi
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    b AS (
        SELECT e.event_type,
               CASE WHEN s.hi = s.lo THEN 0
                    ELSE least(CAST(floor((e.value - s.lo)
                             / ((s.hi - s.lo) / 8)) AS INT), 7) END AS bin
        FROM events e JOIN s USING (event_type)
        WHERE e.value IS NOT NULL
    ),
    c AS (SELECT event_type, bin, count(*) AS n FROM b GROUP BY 1, 2),
    spine AS (
        SELECT s.event_type, s.lo, s.hi, g.bin
        FROM s, (SELECT unnest(range(8)) AS bin) g
    )
    SELECT spine.event_type, CAST(spine.bin AS INT) AS bin,
           round(lo + bin * (hi - lo) / 8, 6) AS lo,
           round(lo + (bin + 1) * (hi - lo) / 8, 6) AS hi,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n
    FROM spine LEFT JOIN c USING (event_type, bin)
    """,
)
def ns_profile_histogram(spark, sf_dir):
    """Equi-width histogram profiling (operators/timeseries.histogram):
    8-bin per-event-type value distributions with numpy-histogram edge
    semantics (max closes the last bin) and empty bins emitted — the
    distribution companion to ANALYZE's scalar column stats.  One
    min/max agg broadcast back + one bin-count agg + a sequence()
    spine; DuckDB replays every edge and count exactly."""
    from fluss_datafusion_spark.operators.timeseries import histogram

    ev = t(spark, sf_dir, "events")
    return histogram(ev, "value", bins=8, group_cols=["event_type"])


@query(
    "ns_retrieval_rm3", extended=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term <> '' GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks
           WHERE term <> '' GROUP BY 1),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    q AS (SELECT DISTINCT doc_id AS query_id, term FROM tf
          WHERE doc_id % 101 = 0),
    os AS (
        SELECT q.query_id, tf.doc_id,
               round(sum(
                   ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        FROM q
        JOIN tf USING (term)
        JOIN dft USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY 1, 2
    ),
    first AS (
        SELECT query_id, doc_id, score FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, doc_id) AS r
            FROM os
        ) WHERE r <= 5
    ),
    wts AS (
        SELECT f.query_id, tf.term,
               round(sum(CAST(tf.tf AS DOUBLE) / dl.dl * f.score), 6) AS w
        FROM first f
        JOIN tf ON tf.doc_id = f.doc_id
        JOIN dl ON dl.doc_id = f.doc_id
        GROUP BY 1, 2
    ),
    topw AS (
        SELECT query_id, term, w FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY w DESC, term) AS r
            FROM wts
        ) WHERE r <= 10
    ),
    wn AS (
        SELECT query_id, term,
               w / sum(w) OVER (PARTITION BY query_id) AS wn
        FROM topw
    ),
    es AS (
        SELECT wn.query_id, tf.doc_id,
               round(sum(wn.wn
                   * ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS es
        FROM wn
        JOIN tf USING (term)
        JOIN dft USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY 1, 2
    ),
    comb AS (
        SELECT coalesce(os.query_id, es.query_id) AS query_id,
               coalesce(os.doc_id, es.doc_id) AS doc_id,
               round(0.5 * coalesce(os.score, 0)
                     + 0.5 * coalesce(es.es, 0), 6) AS score
        FROM os FULL JOIN es
          ON os.query_id = es.query_id AND os.doc_id = es.doc_id
    )
    SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rank
        FROM comb
    ) WHERE rank <= 10
    """,
)
def ns_retrieval_rm3(spark, sf_dir):
    """RM3 pseudo-relevance-feedback query expansion
    (operators/retrieval.bm25_rm3_search — Lavrenko & Croft 2001 /
    Abdul-Jaleel 2004, the engine-replayable simplification): BM25
    top-5 feedback docs per query -> term weights
    sum(tf/dl * doc_score) rounded BEFORE the top-10 selection (term
    choice stays deterministic cross-engine) -> normalized expansion
    model -> final score 0.5*original + 0.5*expansion over the same
    inverted index.  DuckDB replays both retrieval passes, the term
    selection, and the interpolation exactly."""
    from fluss_datafusion_spark.operators.retrieval import bm25_rm3_search

    docs = t(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("qid"), F.col("text").alias("qtext")
    )
    return bm25_rm3_search(
        docs, "doc_id", "text", queries, "qid", "qtext",
        k=10, fb_docs=5, fb_terms=10, alpha=0.5,
    )


@query(
    "ns_retrieval_mmr", extended=True,
    oracle="""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS doc,
               list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x*x)))) AS rel
        FROM e q JOIN e c ON q.vec_id % 101 = 0 AND c.vec_id <> q.vec_id
    ),
    cand AS (
        SELECT qid, doc, rel FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                                         ORDER BY rel DESC, doc) AS r
            FROM scored
        ) WHERE r <= 20
    )
    SELECT qid AS query_id,
           CAST(8 AS INT) AS n_selected,
           min_by(doc, CAST(-rel AS DOUBLE)) AS first_doc,
           true AS all_in_candidates,
           true AS ref_match
    FROM cand GROUP BY qid
    """,
)
def ns_retrieval_mmr(spark, sf_dir):
    """MMR diversification (operators/retrieval.mmr_diversify —
    Carbonell & Goldstein 1998) invariant-checked cross-engine (the
    q45 pattern; the greedy argmax chain itself has no SQL form):
    cosine top-20 candidates per query, MMR k=8 lam=0.7, then a
    per-query summary DuckDB re-derives exactly — selection count, the
    FIRST pick (MMR's first selection must be the pure relevance
    argmax, which SQL computes), a candidates-subset boolean, and a
    ref_match boolean from an independent dict-based greedy kernel run
    on the same (driver-collected, model-sized) candidate lists."""
    import math

    from fluss_datafusion_spark.operators.retrieval import mmr_diversify
    from fluss_datafusion_spark.operators.similarity import cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    cand = (
        cosine_topk(emb, queries, "vec_id", "embedding", "vec_id", "embedding", k=21)
        .filter(F.col("neighbor_id") != F.col("vec_id"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    cand = (
        cand.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 20)
        .join(
            emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vec")),
            "neighbor_id",
        )
        .select(
            F.col("vec_id").alias("qid"),
            F.col("neighbor_id").alias("doc"),
            F.col("cos").alias("rel"),
            "vec",
        )
    )
    cand = cand.localCheckpoint(eager=True)
    picked = mmr_diversify(cand, "qid", "doc", "rel", "vec", k=8, lam=0.7)

    # independent reference kernel on the collected (model-sized) candidates
    rows = cand.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append((r.doc, float(r.rel), [float(x) for x in r.vec]))

    def ref_mmr(cands, k, lam):
        def cos(a, b):
            na = math.sqrt(sum(x * x for x in a)) or 1.0
            nb = math.sqrt(sum(x * x for x in b)) or 1.0
            return sum(x * y for x, y in zip(a, b)) / (na * nb)

        lookup = {d: (rel, v) for d, rel, v in cands}
        sel = []
        while len(sel) < k and len(sel) < len(lookup):
            best = None
            for d, (rel, v) in lookup.items():
                if d in sel:
                    continue
                pen = max((cos(v, lookup[s][1]) for s in sel), default=0.0)
                s = lam * rel - (1 - lam) * (pen if sel else 0.0)
                if best is None or s > best[1] or (s == best[1] and d < best[0]):
                    best = (d, s)
            sel.append(best[0])
        return sel

    expected = {q: ref_mmr(c, 8, 0.7) for q, c in by_q.items()}
    cand_sets = {q: {d for d, _, _ in c} for q, c in by_q.items()}
    got = {}
    for r in picked.collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc))
    out = []
    for q, pairs in got.items():
        order = [d for _, d in sorted(pairs)]
        out.append(
            (
                q,
                len(order),
                order[0],
                all(d in cand_sets[q] for d in order),
                order == expected[q],
            )
        )
    return spark.createDataFrame(
        out,
        "query_id bigint, n_selected int, first_doc bigint, "
        "all_in_candidates boolean, ref_match boolean",
    )


@query(
    "ns_profile_drift", extended=True,
    oracle="""
    WITH ref AS (
        SELECT l_quantity, l_extendedprice, l_discount FROM lineitem
    ),
    cur AS (
        SELECT l_quantity, l_extendedprice, l_discount FROM lineitem
        WHERE l_quantity <= 25
    ),
    refl AS (
        SELECT 'l_quantity' AS feature, CAST(l_quantity AS DOUBLE) AS x FROM ref
        UNION ALL
        SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM ref
        UNION ALL
        SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM ref
    ),
    curl AS (
        SELECT 'l_quantity' AS feature, CAST(l_quantity AS DOUBLE) AS x FROM cur
        UNION ALL
        SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM cur
        UNION ALL
        SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM cur
    ),
    edges AS (
        SELECT feature, min(x) AS mn, max(x) AS mx FROM refl GROUP BY 1
    ),
    hr AS (
        SELECT r.feature,
               CASE WHEN x IS NULL THEN -1
                    ELSE greatest(0, least(9,
                         CAST(floor((x - mn) / ((mx - mn) / 10)) AS INT)))
               END AS bin,
               count(*) AS n_ref
        FROM refl r JOIN edges USING (feature) GROUP BY 1, 2
    ),
    hc AS (
        SELECT c.feature,
               CASE WHEN x IS NULL THEN -1
                    ELSE greatest(0, least(9,
                         CAST(floor((x - mn) / ((mx - mn) / 10)) AS INT)))
               END AS bin,
               count(*) AS n_cur
        FROM curl c JOIN edges USING (feature) GROUP BY 1, 2
    ),
    j AS (
        SELECT coalesce(hr.feature, hc.feature) AS feature,
               coalesce(hr.bin, hc.bin) AS bin,
               coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        FROM hr FULL OUTER JOIN hc
          ON hr.feature = hc.feature AND hr.bin = hc.bin
    ),
    tot AS (
        SELECT feature, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur
        FROM j GROUP BY 1
    ),
    f AS (
        SELECT j.feature,
               greatest(n_ref / t_ref, 1e-6) AS r,
               greatest(n_cur / t_cur, 1e-6) AS c
        FROM j JOIN tot USING (feature)
    )
    SELECT feature,
           round(sum((c - r) * ln(c / r)), 6) AS psi,
           round(sum(c * ln(c / r)), 6) AS kl,
           round(sum(abs(c - r)) / 2, 6) AS tv,
           sum((c - r) * ln(c / r)) > 0.25 AS drifted
    FROM f GROUP BY feature
    """,
)
def ns_profile_drift(spark, sf_dir):
    """Distribution drift between two corpus snapshots
    (operators/drift.py — the pre-training data-quality gate): PSI / KL
    / total-variation per feature over fixed-width bins anchored to the
    REFERENCE snapshot's min/max (deterministic, unlike quantile
    sketches), NULLs as their own bin, ε-smoothed fractions.  The
    "current" snapshot here is a deliberately biased slice
    (l_quantity <= 25), so quantity must flag drifted and the price
    column shifts moderately; DuckDB replays the binning and all three
    statistics bit-for-bit.  ONE aggregation per snapshot on a
    (feature, bin) key space that is constant-sized at any corpus
    scale."""
    from fluss_datafusion_spark.operators.drift import distribution_drift

    li = t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ref = li.select(*cols)
    cur = li.filter(F.col("l_quantity") <= 25).select(*cols)
    return distribution_drift(ref, cur, cols, n_bins=10).withColumnRenamed(
        "column", "feature"
    )


@query(
    "ns_dedup_shared_spans", extended=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        FROM documents
    ),
    w AS (
        SELECT doc_id, i + 1 AS pos,
               array_to_string(tk[i + 1 : i + 8], ' ') AS win
        FROM toks, LATERAL (SELECT unnest(range(len(tk) - 7)) AS i) u
        WHERE len(tk) >= 8
    ),
    nd AS (
        SELECT win, count(DISTINCT doc_id) AS n_docs FROM w GROUP BY 1
    ),
    wf AS (
        SELECT w.* FROM w JOIN nd USING (win)
        WHERE nd.n_docs BETWEEN 2 AND 16
    ),
    p AS (
        SELECT a.doc_id AS id_a, a.pos AS pa, b.doc_id AS id_b, b.pos AS pb
        FROM wf a JOIN wf b USING (win)
        WHERE a.doc_id < b.doc_id
    ),
    isl AS (
        SELECT id_a, id_b, pa, pb, pa - pb AS diag,
               pa - row_number() OVER (
                   PARTITION BY id_a, id_b, pa - pb ORDER BY pa
               ) AS grp
        FROM p
    )
    SELECT id_a, id_b, min(pa) AS a_start, min(pb) AS b_start,
           count(*) + 7 AS n_tokens
    FROM isl GROUP BY id_a, id_b, diag, grp
    """,
)
def ns_dedup_shared_spans(spark, sf_dir):
    """Cross-document EXACT shared spans (operators/dedup.py
    shared_span_pairs — the ExactSubstr dedup family, Lee et al. ACL
    2022): maximal runs of >= 8 verbatim-shared tokens between document
    pairs, found with rolling-hash windows + one equality shuffle + a
    gaps-and-islands pass instead of the paper's suffix array.  The
    passage-level complement of MinHash document dedup: copied quotes /
    licenses / templated sections in otherwise-different documents.
    DuckDB replays the window join on the literal window STRINGS and
    every maximal run's offsets and length hash-check."""
    from fluss_datafusion_spark.operators import dedup

    docs = t(spark, sf_dir, "documents")
    return dedup.shared_span_pairs(
        docs, "doc_id", "text", k=8, max_df=16
    )


@query(
    "ns_training_splits", extended=True,
    oracle="""
    WITH fp AS (
        SELECT doc_id, md5(lower(trim(text))) AS grp FROM documents
    ),
    assigned AS (
        SELECT doc_id, grp,
               CASE
                   WHEN CAST(
                       CAST('0x' || substring(
                           md5('split-0' || '|' || grp), 1, 12
                       ) AS BIGINT) AS DOUBLE
                   ) / power(16, 12) < 0.8 THEN 'train'
                   WHEN CAST(
                       CAST('0x' || substring(
                           md5('split-0' || '|' || grp), 1, 12
                       ) AS BIGINT) AS DOUBLE
                   ) / power(16, 12) < 0.9 THEN 'val'
                   ELSE 'test'
               END AS split
        FROM fp
    )
    SELECT split, count(*) AS n,
           CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
           (SELECT count(*) FROM (
               SELECT grp FROM assigned
               GROUP BY grp HAVING count(DISTINCT split) > 1
           ) leaked) = 0 AS no_leakage
    FROM assigned GROUP BY split
    """,
)
def ns_training_splits(spark, sf_dir):
    """Leakage-guarded train/val/test assignment
    (training.assign_splits): every document with the same normalized
    content fingerprint (= exact-dup group) lands in ONE split — the
    contamination guard a row-level random split cannot give.
    Assignment is md5(seed|group) mapped to [0,1) against cumulative
    fraction thresholds, so DuckDB replays every assignment bit-for-bit
    and pins the no-leakage invariant as an oracle boolean."""
    from fluss_datafusion_spark.operators.training import assign_splits

    docs = t(spark, sf_dir, "documents").withColumn(
        "grp", F.md5(F.lower(F.trim(F.col("text"))))
    )
    assigned = assign_splits(
        docs, "doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        seed="split-0", group_col="grp",
    )
    leaked = (
        assigned.groupBy("grp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .limit(1)
        .count()
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("grp").alias("n_groups"),
        )
        .withColumn("no_leakage", F.lit(leaked == 0))
    )


@query(
    "ns_retrieval_eval_metrics", extended=True,
    oracle="""
    WITH queries AS (SELECT unnest(range(5)) AS qid),
    ranked AS (
        SELECT q.qid, d.doc_id,
               row_number() OVER (
                   PARTITION BY q.qid
                   ORDER BY md5(CAST(q.qid AS VARCHAR) || '|'
                                || CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS rank
        FROM queries q, documents d
    ),
    results AS (SELECT * FROM ranked WHERE rank <= 50),
    qrels AS (
        SELECT q.qid, d.doc_id FROM queries q, documents d
        WHERE d.doc_id % 13 = q.qid
    ),
    hits AS (
        SELECT r.qid, r.rank FROM results r JOIN qrels USING (qid, doc_id)
    ),
    per_q AS (
        SELECT qid, min(rank) AS first_rel,
               sum(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS nret,
               sum(CASE WHEN rank <= 10
                        THEN 1.0 / log2(rank + 1) ELSE 0 END) AS dcg
        FROM hits GROUP BY qid
    ),
    nrel AS (SELECT qid, count(*) AS n_rel FROM qrels GROUP BY qid),
    idcg AS (
        SELECT qid, sum(1.0 / log2(i + 1)) AS ideal
        FROM (SELECT qid, unnest(range(1, least(n_rel, 10) + 1)) AS i
              FROM nrel) u
        GROUP BY qid
    )
    SELECT n.qid,
           round(coalesce(1.0 / p.first_rel, 0), 6) AS rr,
           round(coalesce(CAST(p.nret AS DOUBLE) / n.n_rel, 0), 6)
               AS recall_at_k,
           round(coalesce(p.dcg / idcg.ideal, 0), 6) AS ndcg_at_k
    FROM nrel n
    LEFT JOIN per_q p USING (qid)
    JOIN idcg USING (qid)
    """,
)
def ns_retrieval_eval_metrics(spark, sf_dir):
    """Offline retrieval evaluation (retrieval.retrieval_metrics): MRR /
    recall@10 / nDCG@10 against a labeled qrels set.  The ranking under
    test is a deterministic md5 pseudo-scorer both engines reproduce
    (the fixture isolates the METRICS math — rank joins, first-hit
    reciprocal, closed-form ideal DCG — from any engine-specific
    scorer); qrels assign each query the documents with
    doc_id % 13 == qid.  One (query, doc) join + two query-keyed
    aggregations; every per-query metric hash-checks."""
    from pyspark.sql import Window

    from fluss_datafusion_spark.operators.retrieval import retrieval_metrics

    docs = t(spark, sf_dir, "documents").select("doc_id")
    queries = spark.range(5).select(F.col("id").alias("qid"))
    ranked = queries.crossJoin(docs).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("qid").cast("string"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                "doc_id",
            )
        ),
    )
    results = ranked.filter(F.col("rank") <= 50)
    qrels = queries.crossJoin(docs).filter(
        F.col("doc_id") % 13 == F.col("qid")
    ).select("qid", "doc_id")
    out = retrieval_metrics(results, qrels, k=10)
    return out.select(
        "qid",
        F.round("rr", 6).alias("rr"),
        F.round("recall_at_k", 6).alias("recall_at_k"),
        F.round("ndcg_at_k", 6).alias("ndcg_at_k"),
    )


@query(
    "ns_curation_url_canonical", extended=True,
    oracle="""
    WITH src AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 1500),
    keyed AS (SELECT k, k % 100 AS page, (k % 3 <> 2) AS hq FROM src)
    SELECT 'https://shop.com/item/' || page
           || CASE WHEN hq THEN '?a=1&b=2' ELSE '' END AS canon,
           count(*) AS n_dupes, CAST(min(k) AS BIGINT) AS rep_id
    FROM keyed GROUP BY page, hq
    """,
)
def ns_curation_url_canonical(spark, sf_dir):
    """URL canonicalization + URL-level dedup (r8 —
    curation.canonical_url / url_dedup_groups, the normalization web
    pipelines run before any content dedup): every order key becomes a
    cosmetically-distinct fetch URL of one of 100 pages — mixed scheme/
    host case, ``WWW.`` prefixes, explicit ``:443`` default ports,
    trailing slashes, shuffled query parameters, ``utm_source``
    tracking litter, fragments — and grouping by the canonical form
    must collapse them to exactly (page x has-query) groups with
    closed-form sizes and min-id representatives.  Any mishandled rule
    (a kept tracking param, an unsorted query, a surviving port or
    fragment) splits a group and hash-mismatches.  All JVM regexp/array
    expressions, one map-side-combined groupBy."""
    k = F.col("o_orderkey")
    url = F.concat(
        F.when(k % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(k % 3 == 0, F.lit("WWW.Shop.COM")).otherwise(F.lit("shop.com")),
        F.when(k % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/item/"),
        (k % 100).cast("string"),
        F.when(k % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(k % 3 == 0, F.lit("?b=2&utm_source=x&a=1"))
        .when(k % 3 == 1, F.lit("?a=1&b=2"))
        .otherwise(F.lit("")),
        F.when(k % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    fetches = (
        t(spark, sf_dir, "orders")
        .filter(k <= 1500)
        .select(k.alias("id"), url.alias("url"))
    )
    from fluss_datafusion_spark.operators.curation import url_dedup_groups

    return url_dedup_groups(fetches, "id", "url")


@query(
    "ns_sketch_kll", extended=True,
    oracle="""
    WITH src AS (SELECT o_totalprice FROM orders),
    qs AS (SELECT CAST(q AS DOUBLE) AS qtile
           FROM (VALUES (0.1), (0.5), (0.9)) v(q))
    SELECT qtile,
           CAST(floor(qtile * (SELECT count(*) FROM src)) AS BIGINT)
               AS target_rank,
           (SELECT count(*) FROM src) AS n,
           true AS ok
    FROM qs
    """,
)
def ns_sketch_kll(spark, sf_dir):
    """KLL-style quantile sketch with a hard in-query bound check (r8 —
    sketches.QuantileSketch/kll_build/kll_quantile_check; completes the
    mergeable-sketch family next to KMV distinct counts and CMS
    frequencies): per-partition multilevel compactors (deterministic
    md5-keyed compaction offsets) merge into one model-sized sketch,
    and each estimated quantile's EXACT rank — one conditional-sum agg
    over the corpus — must sit within eps*n of the target rank.  The
    q45 pattern: the approximate estimate stays out of the hash;
    integers + booleans ride it, DuckDB pins the bound booleans true
    and re-derives the target ranks.  Rank-error guarantees are
    measured (uniform/skewed/sorted/merged) in tests/test_kll.py."""
    from fluss_datafusion_spark.operators.sketches import kll_quantile_check

    prices = t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("price")
    )
    return kll_quantile_check(prices, "price", [0.1, 0.5, 0.9], k=200)


@query(
    "ns_multimodal_scene_cuts", extended=True,
    oracle="""
    SELECT doc_id AS media_id, CAST(doc_id % 3 + 3 AS INTEGER) AS cut_frame,
           CAST(40.0 AS DOUBLE) AS diff, CAST(8 AS INTEGER) AS n_frames
    FROM documents
    """,
)
def ns_multimodal_scene_cuts(spark, sf_dir):
    """Video scene-cut detection (r8 — multimodal.avi_scene_cuts, the
    shot-boundary-by-frame-differencing baseline that segments footage
    before per-scene sampling): every synthesized AVI carries two
    constant-color scenes with ONE cut at frame ``id % 3 + 3`` and a
    per-channel jump of exactly 40 gray levels, so the detector must
    emit exactly one boundary per video at the right frame with diff
    exactly 40.0 — a missed frame, an off-by-one boundary index, or a
    wrong difference all hash-mismatch.  Decode → frame-diff →
    boundary rows, Arrow-batched; output is boundary-sized, never
    frame-sized."""
    media = multimodal.synthesize_scene_avi_media(
        t(spark, sf_dir, "documents"), id_col="doc_id"
    )
    return multimodal.avi_scene_cuts(media, threshold=10.0)


@query(
    "ns_curation_compression_ratio", extended=True,
    oracle="""
    SELECT doc_id, CAST(strlen(coalesce(text, '')) AS BIGINT) AS raw_len,
           true AS ok_band, true AS ok_repeat
    FROM documents
    """,
)
def ns_curation_compression_ratio(spark, sf_dir):
    """zlib compression-ratio quality signal (r8 —
    curation.compression_ratio_stats; the Gopher/FineWeb-class feature
    heuristic counters miss — template junk compresses far below
    prose): the q45 bounds pattern — the ratio itself is
    implementation-defined (zlib level 6) so it stays out of the hash;
    what rides are the exact UTF-8 byte length (DuckDB recomputes it)
    and two invariants pinned true per document: the ratio sits in the
    sane text band (0.02, 1.15], and doubling a document never
    INCREASES its ratio (self-similarity must compress)."""
    from fluss_datafusion_spark.operators.curation import (
        compression_ratio_stats,
    )

    docs = t(spark, sf_dir, "documents")
    one = compression_ratio_stats(docs, "doc_id", "text")
    doubled = compression_ratio_stats(
        docs.select(
            "doc_id",
            F.concat_ws(" ", F.col("text"), F.col("text")).alias("text"),
        ),
        "doc_id",
        "text",
    ).select(F.col("doc_id"), F.col("ratio").alias("ratio2"))
    return one.join(doubled, "doc_id").select(
        "doc_id",
        "raw_len",
        ((F.col("ratio") > 0.02) & (F.col("ratio") <= 1.15)).alias("ok_band"),
        (F.col("ratio2") <= F.col("ratio") + 1e-6).alias("ok_repeat"),
    )


@query(
    "ns_dedup_image_incremental", extended=True,
    oracle="""
    WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(CASE WHEN (a.id < 100) = (b.id < 100) THEN 0 ELSE 1 END
                AS INTEGER) AS ham,
           (a.id >= 100) AS a_new, (b.id >= 100) AS b_new
    FROM ids a JOIN ids b ON a.id % 50 = b.id % 50 AND a.id < b.id
    WHERE a.id >= 100 OR b.id >= 100
    """,
)
def ns_dedup_image_incremental(spark, sf_dir):
    """Incremental image dedup against a persisted Hamming index (r8 —
    operators/incremental.write_hamming_index /
    incremental_hamming_pairs; the perceptual-hash twin of the MinHash
    incremental index): the unperturbed half of the gradient-BMP
    fixture is fingerprinted ONCE into a persisted (buckets + hashes)
    index, then the perturbed half arrives as an ingest batch and must
    pair batch-vs-index (Hamming exactly 1 by construction) and
    batch-vs-batch (exactly 0) WITHOUT re-emitting any index-internal
    pair — DuckDB derives the complete expected pair set, distances,
    and new-endpoint markers closed-form.  Probe cost is O(batch):
    the batch's band assignment broadcast-semi-joins the index bucket
    store down to touched buckets; verification loads index
    fingerprints for candidate ids only."""
    import shutil
    import tempfile

    from fluss_datafusion_spark.operators.incremental import (
        incremental_hamming_pairs,
        write_hamming_index,
    )

    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_himg_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    media = multimodal.synthesize_gradient_bmp_media(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        id_col="doc_id",
    )
    hashes = multimodal.image_dhash_stats(media).select("media_id", "dhash")
    write_hamming_index(
        hashes.filter(F.col("media_id") < 100), "media_id", "dhash", root
    )
    return incremental_hamming_pairs(
        hashes.filter(F.col("media_id") >= 100),
        root,
        "media_id",
        "dhash",
        max_hamming=2,
        keep_markers=True,
    )


@query(
    "ns_multimodal_ingest_e2e", extended=True,
    oracle="""
    WITH ids AS (SELECT doc_id AS id FROM documents
                 WHERE doc_id BETWEEN 125 AND 149),
    bits AS (
        SELECT id, list_sum(list_transform(range(64), k ->
            CASE WHEN
                (CASE WHEN id >= 100 AND ((k % 8) * 16) // 9 = 0
                           AND 2 * (k // 8) = 0
                      THEN 255
                      ELSE (5 * (((k % 8) * 16) // 9) * (((k % 8) * 16) // 9)
                              * (id % 50 + 1)
                            + (2 * (k // 8)) * (7 + 3 * (id % 50))
                            + 13 * (((k % 8) * 16) // 9)) % 251
                 END)
                <
                (5 * ((((k % 8) + 1) * 16) // 9) * ((((k % 8) + 1) * 16) // 9)
                   * (id % 50 + 1)
                 + (2 * (k // 8)) * (7 + 3 * (id % 50))
                 + 13 * ((((k % 8) + 1) * 16) // 9)) % 251
            THEN CAST(1 AS HUGEINT) << (63 - CAST(k AS INTEGER))
            ELSE CAST(0 AS HUGEINT) END)) AS raw
        FROM ids
    )
    SELECT id AS media_id,
           CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
           CAST(CASE WHEN raw >= CAST(1 AS HUGEINT) << 63
                     THEN raw - (CAST(1 AS HUGEINT) << 64)
                     ELSE raw END AS BIGINT) AS dhash
    FROM bits
    """,
)
def ns_multimodal_ingest_e2e(spark, sf_dir):
    """The COMPOSED continuous MEDIA-ingest pipeline, end to end (r8 —
    operators/incremental.media_ingest_sink, the image twin of
    ns_pipeline_ingest_e2e): ids 0..24 of the gradient-BMP fixture are
    fingerprinted once into a persisted Hamming index; ids 100..199
    (the perturbed copies) then arrive as TWO mtime-ordered micro-
    batches (100..149, then 150..199) — per batch: decode + dHash in
    one Arrow pass, probe the index (corpus-copy-wins drop rule),
    upsert the surviving fingerprint records into a PK engine table,
    append them to the index so the next batch dedups against them.

    The whole decision tree is closed-form: batch 0's clusters 0..24
    pair with the index at Hamming exactly 1 (one-bit perturbation,
    pinned by test) and drop; clusters 25..49 are unseen and survive;
    batch 1's clusters 0..24 drop against the original index rows and
    25..49 drop at Hamming 0 against batch 0's freshly-appended
    survivors.  Final table = ids 125..149 exactly, and DuckDB
    re-derives each survivor's dhash BIT FOR BIT from the pixel
    formula (the ns_multimodal_image_phash derivation)."""
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.operators.incremental import (
        media_ingest_sink,
        write_hamming_index,
    )

    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_mingest_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    replay = os.path.join(root, "replay")
    os.makedirs(replay)

    media = multimodal.synthesize_gradient_bmp_media(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        id_col="doc_id",
    )
    hashes = multimodal.image_dhash_stats(media).select("media_id", "dhash")
    index = os.path.join(root, "idx")
    write_hamming_index(
        hashes.filter(F.col("media_id") < 25), "media_id", "dhash", index
    )
    # two mtime-ordered replay chunks (fixture-sized: 50 tiny BMPs each)
    base = _time.time()
    for i, (lo, hi) in enumerate(((100, 150), (150, 200))):
        pdf = (
            media.filter(
                (F.col("media_id") >= lo) & (F.col("media_id") < hi)
            )
            .toPandas()
            .sort_values("media_id")
        )
        fp = os.path.join(replay, f"b{i:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), fp)
        os.utime(fp, (base + i, base + i))

    e = EngineSession(spark=spark, warehouse=os.path.join(root, "wh"))
    e.sql(
        "CREATE TABLE media_ingest (media_id BIGINT NOT NULL, width INT,"
        " height INT, dhash BIGINT, ahash BIGINT, PRIMARY KEY (media_id))"
    )
    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    media_ingest_sink(
        stream, e.catalog, "media_ingest", index, os.path.join(root, "ckpt")
    ).awaitTermination()
    return e.sql(
        "SELECT media_id, width, height, dhash FROM media_ingest"
    )


@query(
    "ns_curation_blocklist", extended=True,
    oracle="""
    WITH terms AS (
        SELECT * FROM (VALUES ('slow'), ('vector'), ('hash value'),
                              ('table window')) t(term)
    ),
    norm AS (
        SELECT doc_id,
               ' ' || array_to_string(
                   regexp_split_to_array(lower(trim(text)), '\\s+'), ' ')
               || ' ' AS norm_text
        FROM documents
    ),
    hits AS (
        SELECT n.doc_id, t.term
        FROM norm n JOIN terms t
          ON position(' ' || t.term || ' ' IN n.norm_text) > 0
    ),
    agg AS (
        SELECT doc_id, CAST(count(DISTINCT term) AS INTEGER) AS n_hits,
               list_sort(list(DISTINCT term)) AS hit_terms
        FROM hits GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_hits, 0) AS n_hits,
           COALESCE(a.hit_terms, []) AS hit_terms,
           COALESCE(a.n_hits, 0) > 0 AS blocked
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN agg a USING (doc_id)
    """,
)
def ns_curation_blocklist(spark, sf_dir):
    """C4-style bad-words filtering (r8 —
    operators/curation.blocklist_filter; Raffel et al. 2020 §2.2
    dropped any page containing a blocklisted word): flag documents
    containing any of four terms — two single words and two multi-word
    phrases (one deliberately mis-cased/mis-spaced to pin the term
    normalization).  The engine plans it as a token equi-JOIN (distinct
    doc tokens x term first-word) + word-boundary containment verify —
    never a giant regex alternation; DuckDB replays the same boundary
    rule by substring position over the space-normalized text."""
    from fluss_datafusion_spark.operators.curation import blocklist_filter

    docs = t(spark, sf_dir, "documents")
    bl = spark.createDataFrame(
        [("slow",), ("vector",), ("Hash   Value",), ("table window",)],
        ["term"],
    )
    return blocklist_filter(docs, bl, "doc_id", "text")


@query(
    "ns_sim_ann_binary", extended=True,
    oracle="""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    codes AS (
        SELECT vec_id, v,
               list_sum(list_transform(range(64), i ->
                   CASE WHEN v[CAST(i AS INTEGER) + 1] > 0
                        THEN CAST(1 AS HUGEINT) << (63 - CAST(i AS INTEGER))
                        ELSE CAST(0 AS HUGEINT) END)) AS raw
        FROM e
    ),
    signed AS (
        SELECT vec_id, v,
               CAST(CASE WHEN raw >= CAST(1 AS HUGEINT) << 63
                         THEN raw - (CAST(1 AS HUGEINT) << 64)
                         ELSE raw END AS BIGINT) AS code
        FROM codes
    ),
    ham AS (
        SELECT q.vec_id, c.vec_id AS neighbor_id,
               bit_count(xor(q.code, c.code)) AS ham, q.v AS qv, c.v AS cv
        FROM signed q JOIN signed c ON q.vec_id < 5
    ),
    shortlist AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY ham, neighbor_id) AS r
            FROM ham
        ) WHERE r <= 44
    ),
    rerank AS (
        SELECT vec_id, neighbor_id, CAST(ham AS INTEGER) AS ham,
               list_sum(list_transform(list_zip(qv, cv), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(qv, x -> x*x)))
                  * sqrt(list_sum(list_transform(cv, x -> x*x)))) AS cos
        FROM shortlist WHERE neighbor_id <> vec_id
    )
    SELECT vec_id, neighbor_id, ham, round(cos, 6) AS cos,
           CAST(rank AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, neighbor_id) AS rank
        FROM rerank
    ) WHERE rank <= 10
    """,
)
def ns_sim_ann_binary(spark, sf_dir):
    """Binary-quantization ANN, algorithm-replicated cross-engine (r8 —
    operators/embeddings.binarize_sign +
    operators/similarity.binary_ann_topk): sign-bit codes (32x smaller
    than float32), XOR+popcount Hamming shortlist of rerank*k = 44 per
    query (ties by neighbor id), exact-cosine re-rank of the shortlist
    only.  DuckDB re-packs every code BIT FOR BIT (MSB-first fold,
    signed conversion), replays the same (ham, id)-ordered shortlist
    and the same rerank — a single wrong bit, shortlist slot, or rank
    hash-mismatches.  The scan-side win is the point at 100 TB: phase 1
    reads two bigints per row, raw vectors cross the wire for
    shortlist ids only."""
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    res = similarity.binary_ann_topk(
        emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k=11, rerank=4,
    )
    res = res.filter(F.col("neighbor_id") != F.col("vec_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        res.drop("rank")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "vec_id", "neighbor_id", "ham",
            F.round("cos", 6).alias("cos"), "rank",
        )
    )


def _fs_em_oracle_sql(iters: int = 3) -> str:
    """Unrolled-EM DuckDB oracle for ns_linkage_fs_em: replicates
    fs_em_fit's E/M recurrences CTE by CTE (pattern-count table, w per
    pattern, clamped parameter updates), then the log2 scoring rule —
    every arithmetic step is the operator's, so a wrong update formula,
    clamp, or denominator hash-mismatches."""
    fields = ["a_nation", "a_seg", "a_bal"]

    def prod(side: str) -> str:
        return " * ".join(
            f"(CASE WHEN {f} = 1 THEN {side}{i} ELSE 1 - {side}{i} END)"
            for i, f in enumerate(fields, 1)
        )

    sql = """
    WITH pairs AS (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               CAST(a.c_nationkey = b.c_nationkey AS INTEGER) AS a_nation,
               CAST(a.c_mktsegment = b.c_mktsegment AS INTEGER) AS a_seg,
               CAST((a.c_acctbal > 0) = (b.c_acctbal > 0)
                    AS INTEGER) AS a_bal
        FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 25
    ),
    patt AS (
        SELECT a_nation, a_seg, a_bal, count(*) AS n
        FROM pairs GROUP BY 1, 2, 3
    ),
    it0 AS (SELECT 0.1 AS p, 0.9 AS m1, 0.9 AS m2, 0.9 AS m3,
                   0.1 AS u1, 0.1 AS u2, 0.1 AS u3)"""
    cur = "it0"
    for t in range(1, iters + 1):
        sql += f""",
    e{t} AS (
        SELECT patt.*,
               (p * {prod('m')})
               / ((p * {prod('m')}) + ((1 - p) * {prod('u')})) AS w
        FROM patt, {cur}
    ),
    it{t} AS (
        SELECT least(greatest(sum(n * w) / sum(n), 1e-6), 1 - 1e-6) AS p"""
        for i, f in enumerate(fields, 1):
            sql += f""",
               least(greatest(sum(n * w * {f}) / sum(n * w),
                              1e-6), 1 - 1e-6) AS m{i},
               least(greatest(sum(n * (1 - w) * {f})
                              / (sum(n) - sum(n * w)),
                              1e-6), 1 - 1e-6) AS u{i}"""
        sql += f"""
        FROM e{t}
    )"""
        cur = f"it{t}"
    weight = " + ".join(
        f"(CASE WHEN {f} = 1 THEN log2(m{i} / u{i})"
        f" ELSE log2((1 - m{i}) / (1 - u{i})) END)"
        for i, f in enumerate(fields, 1)
    )
    sql += f""",
    scored AS (
        SELECT pairs.*, {weight} AS match_weight, p
        FROM pairs, {cur}
    )
    SELECT id_a, id_b, a_nation, a_seg, a_bal,
           round(match_weight, 6) AS match_weight,
           round((p / (1 - p) * pow(2.0, match_weight))
                 / (1 + p / (1 - p) * pow(2.0, match_weight)), 6)
               AS match_prob
    FROM scored
    """
    return sql


@query("ns_linkage_fs_em", oracle=_fs_em_oracle_sql())  # r8 third-
# session rotation: INTO the core window (new operator family —
# probabilistic record linkage; OUT: ns_curation_span_scrub)
def ns_linkage_fs_em(spark, sf_dir):
    """Probabilistic record linkage, EM-replicated cross-engine (r8 —
    operators/linkage.fs_em_fit/fs_score; Fellegi–Sunter 1969 + Winkler
    1988, the Splink/fastLink shape): candidate pairs (customer k vs
    k+25) carry three binary agreement fields (nation, market segment,
    account-balance sign); 3 EM iterations fit (p, m_k, u_k) from
    the DISTINCT-pattern count table (<= 8 rows — the fit cost is
    corpus-independent), then every pair is scored with the log2
    likelihood ratio and posterior.  The oracle unrolls the SAME three
    E/M steps CTE by CTE in DuckDB — any wrong update formula, clamp,
    denominator, or scoring constant hash-mismatches at 6 decimals."""
    from fluss_datafusion_spark.operators.linkage import fs_em_fit, fs_score

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    a = cust.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("__na__"),
        F.col("c_mktsegment").alias("__sa__"),
        F.col("c_acctbal").alias("__pa__"),
    )
    b = cust.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("__nb__"),
        F.col("c_mktsegment").alias("__sb__"),
        F.col("c_acctbal").alias("__pb__"),
    )
    pairs = a.join(b, b["id_b"] == a["id_a"] + 25).select(
        "id_a",
        "id_b",
        (F.col("__na__") == F.col("__nb__")).cast("int").alias("a_nation"),
        (F.col("__sa__") == F.col("__sb__")).cast("int").alias("a_seg"),
        ((F.col("__pa__") > 0) == (F.col("__pb__") > 0))
        .cast("int")
        .alias("a_bal"),
    )
    cols = ["a_nation", "a_seg", "a_bal"]
    model = fs_em_fit(pairs, cols, iters=3)
    return fs_score(pairs, cols, model).select(
        "id_a", "id_b", *cols,
        F.round("match_weight", 6).alias("match_weight"),
        F.round("match_prob", 6).alias("match_prob"),
    )


@query(
    "ns_training_dsir", extended=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, u.g FROM toks,
        LATERAL unnest(list_concat(
            t,
            list_transform(range(1, greatest(len(t), 1)),
                           i -> t[i] || ' ' || t[i + 1])
        )) AS u(g)
    ),
    feats AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5('dsir-0|' || g), 1, 8))
                    AS BIGINT) % 10000 AS b
        FROM grams
    ),
    rc AS (SELECT b, count(*) AS n_raw FROM feats GROUP BY b),
    tc AS (SELECT b, count(*) AS n_tgt FROM feats
           WHERE doc_id % 7 = 0 GROUP BY b),
    tot AS (SELECT (SELECT sum(n_raw) FROM rc) AS nr,
                   (SELECT coalesce(sum(n_tgt), 0) FROM tc) AS nt),
    lr AS (
        SELECT coalesce(rc.b, tc.b) AS b,
               ln((coalesce(n_tgt, 0) + 1) / (nt + 10000))
               - ln((coalesce(n_raw, 0) + 1) / (nr + 10000)) AS lr
        FROM rc FULL OUTER JOIN tc ON rc.b = tc.b, tot
    ),
    per_doc AS (
        SELECT f.doc_id, sum(lr.lr) AS w, count(*) AS nf
        FROM feats f JOIN lr ON f.b = lr.b
        GROUP BY f.doc_id
    )
    SELECT d.doc_id,
           round(coalesce(w, 0.0), 6) AS log_weight,
           coalesce(nf, 0) AS n_feats
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN per_doc USING (doc_id)
    """,
)
def ns_training_dsir(spark, sf_dir):
    """DSIR data selection, replicated cross-engine (r8 —
    operators/training.dsir_log_weights; Xie et al. NeurIPS 2023): the
    raw corpus is every document, the target is the doc_id % 7 == 0
    domain sample; every document's importance log-weight sums
    ln p_target/p_raw over its hashed unigram+bigram OCCURRENCES
    (10k md5 buckets, Laplace-smoothed).  DuckDB re-derives the
    tokenization, the bucket hash, both smoothed distributions, and
    every per-doc sum — a wrong hash, smoothing constant, or a
    distinct-instead-of-multiplicity feature count hash-mismatches.
    Scale shape: two constant-key-space bucket counts + ONE broadcast
    join of the <= n_buckets log-ratio table; no corpus pair joins."""
    from fluss_datafusion_spark.operators.training import dsir_log_weights

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.filter(F.col("doc_id") % 7 == 0)
    out = dsir_log_weights(docs, target, "doc_id", "text", n_buckets=10000)
    return out.select(
        "doc_id",
        F.round("log_weight", 6).alias("log_weight"),
        "n_feats",
    )


@query(
    "ns_multimodal_audio_fp", extended=True,
    oracle="""
    WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200),
    fp AS (
        SELECT id, list_sum(list_transform(range(3), t ->
            CAST(1 AS HUGEINT)
            << (64 - (3 * CAST(id % 20 AS INTEGER) + 1
                      + CAST(t AS INTEGER))))) AS raw
        FROM ids
    )
    SELECT id AS media_id,
           CAST(CASE WHEN raw >= CAST(1 AS HUGEINT) << 63
                     THEN raw - (CAST(1 AS HUGEINT) << 64)
                     ELSE raw END AS BIGINT) AS afp,
           CAST(2 + id % 3 AS INTEGER) AS n_windows,
           true AS decoded_ok
    FROM fp
    """,
)
def ns_multimodal_audio_fp(spark, sf_dir):
    """Audio fingerprints hash-checked BIT FOR BIT cross-engine (r8 —
    functions/multimodal.audio_fingerprint): decode the float32 chord
    fixture (synthesize_chord_media — three bin-aligned sines at bins
    3c+1..3c+3, c = id % 20, id-dependent gain), run the REAL 128-point
    FFT per window, average spectra, pack the 64 mean-threshold bits.
    DuckDB re-derives every fingerprint from the bin triple alone —
    the mean threshold must fire on exactly those three bins (gain
    cancels; all other bins are float noise 1e-5 below threshold), and
    a wrong bit position, sign conversion, or window count
    hash-mismatches.  Clusters c = 0..6 make the packed value negative,
    pinning the signed conversion."""
    media = multimodal.synthesize_chord_media(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        id_col="doc_id",
    )
    return multimodal.audio_fingerprint(media)


@query(
    "ns_dedup_audio_fp", extended=True,
    oracle="""
    WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200)
    SELECT a.id AS id_a, b.id AS id_b, 0 AS ham
    FROM ids a JOIN ids b ON a.id % 20 = b.id % 20 AND a.id < b.id
    """,
)
def ns_dedup_audio_fp(spark, sf_dir):
    """AUDIO near-dup dedup — the triad completion (text MinHash ✓,
    image dHash ✓, audio ✓): fingerprint the chord fixture
    (audio_fingerprint), pair with the SAME banded Hamming LSH the
    image path uses (dedup.hamming_near_dup_pairs).  Gain-variant
    copies of one chord collide at Hamming exactly 0 (the mean
    threshold cancels volume); distinct chords sit at Hamming 6
    (disjoint bin triples), far above max_hamming=2, so the pair set is
    closed-form: all same-cluster pairs, nothing else."""
    from fluss_datafusion_spark.operators.dedup import hamming_near_dup_pairs

    media = multimodal.synthesize_chord_media(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        id_col="doc_id",
    )
    fp = multimodal.audio_fingerprint(media).select("media_id", "afp")
    return hamming_near_dup_pairs(fp, "media_id", "afp", max_hamming=2)


@query(
    "ns_curation_k_anonymity", extended=True,
    oracle="""
    WITH c AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band
        FROM customer
    )
    SELECT c_nationkey, c_mktsegment, count(*) AS n,
           CAST(count(DISTINCT bal_band) AS BIGINT) AS l,
           count(*) < 15 AS violates_k,
           count(DISTINCT bal_band) < 2 AS violates_l
    FROM c GROUP BY 1, 2
    """,
)
def ns_curation_k_anonymity(spark, sf_dir):
    """Privacy audit before a table release (r8 —
    operators/curation.k_anonymity_audit; Sweeney 2002 k-anonymity +
    Machanavajjhala 2007 l-diversity): equivalence classes over the
    (nation, market segment) quasi-identifiers with the account-balance
    band as the sensitive attribute — classes under k=15 rows are
    re-identifiable, classes with l < 2 disclose the sensitive value by
    membership alone.  ONE map-side-combined aggregation; DuckDB
    replays counts and both flags exactly."""
    from fluss_datafusion_spark.operators.curation import k_anonymity_audit

    cust = t(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 2000).cast("bigint")
    )
    out = k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment"], k=15,
        sensitive_col="bal_band",
    )
    return out.select(
        "c_nationkey", "c_mktsegment", "n",
        F.col("l").cast("long").alias("l"), "violates_k", "violates_l",
    )


@query(
    "ns_profile_mutual_info", extended=True,
    oracle="""
    WITH pair1 AS (
        SELECT CAST(l_returnflag AS VARCHAR) AS x,
               CAST(l_linestatus AS VARCHAR) AS y
        FROM lineitem
    ),
    pair2 AS (
        SELECT CAST(l_returnflag AS VARCHAR) AS x,
               CAST(l_linenumber AS VARCHAR) AS y
        FROM lineitem
    ),
    mi1 AS (
        SELECT 'l_returnflag' AS col_x, 'l_linestatus' AS col_y, mi, nmi,
               n_joint
        FROM (
            WITH j AS (SELECT x, y, count(*) AS n FROM pair1 GROUP BY 1, 2),
            tot AS (SELECT sum(n) AS t FROM j),
            mx AS (SELECT x, sum(n) AS nx FROM j GROUP BY 1),
            my AS (SELECT y, sum(n) AS ny FROM j GROUP BY 1),
            h AS (
                SELECT (SELECT sum(-(nx / t) * ln(nx / t)) FROM mx, tot)
                           AS hx,
                       (SELECT sum(-(ny / t) * ln(ny / t)) FROM my, tot)
                           AS hy
            ),
            m AS (
                SELECT sum((j.n / t) * ln((j.n / t)
                           / ((nx / t) * (ny / t)))) AS mi,
                       count(*) AS n_joint
                FROM j JOIN mx USING (x) JOIN my USING (y), tot
            )
            SELECT round(mi, 6) AS mi,
                   round(CASE WHEN least(hx, hy) > 0
                              THEN mi / least(hx, hy) ELSE 0.0 END, 6)
                       AS nmi,
                   n_joint
            FROM m, h
        )
    ),
    mi2 AS (
        SELECT 'l_returnflag' AS col_x, 'l_linenumber' AS col_y, mi, nmi,
               n_joint
        FROM (
            WITH j AS (SELECT x, y, count(*) AS n FROM pair2 GROUP BY 1, 2),
            tot AS (SELECT sum(n) AS t FROM j),
            mx AS (SELECT x, sum(n) AS nx FROM j GROUP BY 1),
            my AS (SELECT y, sum(n) AS ny FROM j GROUP BY 1),
            h AS (
                SELECT (SELECT sum(-(nx / t) * ln(nx / t)) FROM mx, tot)
                           AS hx,
                       (SELECT sum(-(ny / t) * ln(ny / t)) FROM my, tot)
                           AS hy
            ),
            m AS (
                SELECT sum((j.n / t) * ln((j.n / t)
                           / ((nx / t) * (ny / t)))) AS mi,
                       count(*) AS n_joint
                FROM j JOIN mx USING (x) JOIN my USING (y), tot
            )
            SELECT round(mi, 6) AS mi,
                   round(CASE WHEN least(hx, hy) > 0
                              THEN mi / least(hx, hy) ELSE 0.0 END, 6)
                       AS nmi,
                   n_joint
            FROM m, h
        )
    )
    SELECT * FROM mi1 UNION ALL SELECT * FROM mi2
    """,
)
def ns_profile_mutual_info(spark, sf_dir):
    """Pairwise mutual information between categorical columns (r8 —
    operators/curation.mutual_information): the profiling signal for
    redundant features and label leakage.  l_returnflag vs l_linestatus
    are strongly dependent (both functions of shipdate — high NMI);
    l_returnflag vs l_linenumber are independent (NMI ~ 0).  DuckDB
    re-derives joints, marginals, entropies, and both statistics from
    scratch.  Scale shape: one aggregation per pair on the |X|x|Y|
    joint key space, marginals derived from the joint — the corpus is
    scanned once per pair and nothing corpus-sized shuffles."""
    from fluss_datafusion_spark.operators.curation import mutual_information

    li = t(spark, sf_dir, "lineitem")
    return mutual_information(
        li,
        [("l_returnflag", "l_linestatus"), ("l_returnflag", "l_linenumber")],
    )


@query(
    "ns_quality_expectations", extended=True,
    oracle="""
    WITH n AS (SELECT count(*) AS n_rows FROM orders)
    SELECT 'not_null' AS rule, 'o_custkey' AS "column",
           (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
               AS n_violations,
           n_rows, (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
               = 0 AS passed
    FROM n
    UNION ALL
    SELECT 'unique', 'o_orderkey',
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders
            WHERE o_orderkey IS NOT NULL),
           n_rows,
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders
            WHERE o_orderkey IS NOT NULL) = 0
    FROM n
    UNION ALL
    SELECT 'unique', 'o_orderstatus',
           (SELECT count(*) - count(DISTINCT o_orderstatus) FROM orders
            WHERE o_orderstatus IS NOT NULL),
           n_rows,
           (SELECT count(*) - count(DISTINCT o_orderstatus) FROM orders
            WHERE o_orderstatus IS NOT NULL) = 0
    FROM n
    UNION ALL
    SELECT 'accepted_values', 'o_orderstatus',
           (SELECT count(*) FROM orders
            WHERE o_orderstatus IS NOT NULL
              AND o_orderstatus NOT IN ('O', 'F', 'P')),
           n_rows,
           (SELECT count(*) FROM orders
            WHERE o_orderstatus IS NOT NULL
              AND o_orderstatus NOT IN ('O', 'F', 'P')) = 0
    FROM n
    UNION ALL
    SELECT 'between', 'o_totalprice',
           (SELECT count(*) FROM orders
            WHERE o_totalprice IS NOT NULL
              AND (o_totalprice < 1000 OR o_totalprice > 300000)),
           n_rows,
           (SELECT count(*) FROM orders
            WHERE o_totalprice IS NOT NULL
              AND (o_totalprice < 1000 OR o_totalprice > 300000)) = 0
    FROM n
    UNION ALL
    SELECT 'matches', 'o_orderpriority',
           (SELECT count(*) FROM orders
            WHERE o_orderpriority IS NOT NULL
              AND NOT regexp_matches(o_orderpriority, '^[1-5]-')),
           n_rows,
           (SELECT count(*) FROM orders
            WHERE o_orderpriority IS NOT NULL
              AND NOT regexp_matches(o_orderpriority, '^[1-5]-')) = 0
    FROM n
    UNION ALL
    SELECT 'row_count', NULL,
           greatest(1000 - n_rows, 0), n_rows,
           greatest(1000 - n_rows, 0) = 0
    FROM n
    UNION ALL
    SELECT 'fk', 'o_custkey',
           (SELECT count(*) FROM orders
            WHERE o_custkey IS NOT NULL
              AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                    WHERE c_custkey < 100)),
           n_rows,
           (SELECT count(*) FROM orders
            WHERE o_custkey IS NOT NULL
              AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                    WHERE c_custkey < 100)) = 0
    FROM n
    """,
)
def ns_quality_expectations(spark, sf_dir):
    """Data-quality expectation suite (r8 —
    operators/expectations.expect / expect_fk; the dbt-test /
    Great-Expectations surface): seven rules over orders — not_null,
    two uniqueness rules (one passing on the PK, one failing hard on a
    3-value column, exercising the duplicate arithmetic), accepted
    values, a range rule with real violations, a regex rule, a
    row-count floor — plus a referential-integrity audit against a
    deliberately truncated parent (customers < 100, so most orders are
    orphans).  All set rules ride ONE shared conditional-sum
    aggregation; each uniqueness rule is its own count_distinct plan
    (never multiple distincts in one agg — the Expand trap).  DuckDB
    re-derives every count and flag."""
    from fluss_datafusion_spark.operators.expectations import (
        expect,
        expect_fk,
    )

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    report = expect(
        orders,
        [
            {"kind": "not_null", "column": "o_custkey"},
            {"kind": "unique", "columns": ["o_orderkey"]},
            {"kind": "unique", "columns": ["o_orderstatus"]},
            {
                "kind": "accepted_values",
                "column": "o_orderstatus",
                "values": ["O", "F", "P"],
            },
            {
                "kind": "between",
                "column": "o_totalprice",
                "lo": 1000,
                "hi": 300000,
            },
            {
                "kind": "matches",
                "column": "o_orderpriority",
                "pattern": "^[1-5]-",
            },
            {"kind": "row_count", "min": 1000},
        ],
    )
    fk = expect_fk(orders, "o_custkey", cust, "c_custkey").select(
        "rule",
        "column",
        F.col("n_orphans").alias("n_violations"),
        "n_rows",
        "passed",
    )
    return report.unionByName(fk)


@query(
    "ns_training_pit_join", extended=True,
    oracle="""
    WITH facts AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               round(value, 6) AS purchase_value
        FROM events WHERE event_type = 'purchase'
    ),
    f_signup AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS fts,
               round(max(value), 6) AS signup_score
        FROM events WHERE event_type = 'signup' GROUP BY 1, 2
    ),
    f_click AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS fts,
               round(max(value), 6) AS click_score
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    j1 AS (
        SELECT facts.*, f_signup.signup_score
        FROM facts ASOF LEFT JOIN f_signup
          ON facts.user_id = f_signup.user_id AND facts.ts >= f_signup.fts
    ),
    j2 AS (
        SELECT j1.*,
               CASE WHEN facts_ts - fts <= INTERVAL 2 DAY
                    THEN click_score END AS click_score
        FROM (SELECT j1.*, j1.ts AS facts_ts FROM j1) j1
        ASOF LEFT JOIN f_click
          ON j1.user_id = f_click.user_id AND j1.facts_ts >= f_click.fts
    )
    SELECT user_id, ts, purchase_value, signup_score, click_score
    FROM j2
    """,
)
def ns_training_pit_join(spark, sf_dir):
    """Feature-store point-in-time join (r8 —
    operators/asof.point_in_time_join; the Feast/Tecton
    get_historical_features construction): every purchase fact gets,
    from TWO feature tables derived from the same stream (per-user
    signup and click scores, deduped per (user, ts)), the latest value
    at or before the purchase's OWN event time — time-leakage-free
    training data by construction.  The click feature carries a 2-day
    staleness tolerance (older matches surface as NULL, not as stale
    values).  The oracle is DuckDB's NATIVE ASOF JOIN — two engines'
    independent as-of implementations must agree row for row.  Scale
    shape: one shuffle+sort per feature table, fact row count
    invariant, feature tables never joined to each other."""
    from fluss_datafusion_spark.operators.asof import point_in_time_join

    ev = t(spark, sf_dir, "events")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round("value", 6).alias("purchase_value")
    )
    f_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("signup_score"))
    )
    f_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("click_score"))
    )
    out = point_in_time_join(
        facts,
        [
            {
                "df": f_signup.withColumnRenamed("ts", "fts"),
                "on": ["user_id"],
                "ts": "fts",
                "values": ["signup_score"],
            },
            {
                "df": f_click.withColumnRenamed("ts", "fts"),
                "on": ["user_id"],
                "ts": "fts",
                "values": ["click_score"],
                "tolerance_seconds": 2 * 86400,
            },
        ],
        fact_ts="ts",
    )
    return out.select(
        "user_id", "ts", "purchase_value", "signup_score", "click_score"
    )


@query(
    "ns_curation_discretize", extended=True,
    oracle="""
    WITH q AS (
        SELECT round(quantile_cont(l_quantity, 0.25), 6) AS q1,
               round(quantile_cont(l_quantity, 0.5), 6) AS q2,
               round(quantile_cont(l_quantity, 0.75), 6) AS q3,
               round(quantile_cont(l_extendedprice, 0.25), 6) AS e1,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS e2,
               round(quantile_cont(l_extendedprice, 0.75), 6) AS e3
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CAST((l_quantity > q1)::INT + (l_quantity > q2)::INT
                + (l_quantity > q3)::INT AS INTEGER) AS l_quantity_bin,
           CAST((l_extendedprice > e1)::INT + (l_extendedprice > e2)::INT
                + (l_extendedprice > e3)::INT AS INTEGER)
               AS l_extendedprice_bin
    FROM lineitem, q
    """,
)
def ns_curation_discretize(spark, sf_dir):
    """Equal-frequency quantile binning (r8 —
    operators/curation.discretize_quantiles; the QuantileDiscretizer
    feature-engineering shape on plain SQL): quartile cutpoints over
    two lineitem measures, rounded to 6 decimals BEFORE assignment so
    cross-engine last-ulp quantile differences cannot flip a boundary
    value's bin; DuckDB re-derives the interpolated quantiles
    (quantile_cont == Spark's exact percentile) and every row's bin.
    The entry runs exact=True for oracle-grade reproducibility; the
    default approx_percentile sketch is the bounded-memory 100 TB
    path (one aggregation either way, then a narrow projection)."""
    from fluss_datafusion_spark.operators.curation import (
        discretize_quantiles,
    )

    li = t(spark, sf_dir, "lineitem")
    out = discretize_quantiles(
        li, ["l_quantity", "l_extendedprice"], n_bins=4, exact=True
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_quantity_bin",
        "l_extendedprice_bin",
    )


@query(
    "ns_quality_kn_lm", extended=True,
    oracle="""
    WITH tk AS (
        SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS t
        FROM documents
        WHERE length(trim(text)) > 0
          AND len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 2
    ),
    bg AS (
        SELECT doc_id, t[CAST(i AS INTEGER) + 1] AS w1,
               t[CAST(i AS INTEGER) + 2] AS w2
        FROM tk, LATERAL unnest(range(len(t) - 1)) u(i)
    ),
    c2 AS (
        SELECT w1, w2, count(*) AS c2 FROM bg
        WHERE doc_id % 4 = 0 GROUP BY 1, 2
    ),
    pref AS (
        SELECT w1, sum(c2) AS cp, count(*) AS n1l FROM c2 GROUP BY 1
    ),
    cont AS (SELECT w2, count(*) AS n1r FROM c2 GROUP BY 1),
    scal AS (
        SELECT (SELECT count(DISTINCT u.tok) FROM tk,
                LATERAL unnest(t) u(tok) WHERE doc_id % 4 = 0) AS V,
               (SELECT count(*) FROM c2) AS T
    ),
    scored AS (
        SELECT bg.doc_id,
               CASE WHEN pref.cp IS NOT NULL THEN
                   greatest(coalesce(c2.c2, 0) - 0.75, 0.0) / pref.cp
                   + 0.75 * pref.n1l / pref.cp
                     * ((coalesce(cont.n1r, 0) + 0.5)
                        / (T + 0.5 * (V + 1)))
               ELSE (coalesce(cont.n1r, 0) + 0.5) / (T + 0.5 * (V + 1))
               END AS p
        FROM bg
        LEFT JOIN c2 USING (w1, w2)
        LEFT JOIN pref USING (w1)
        LEFT JOIN cont USING (w2), scal
    )
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(ln(p)), 4) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def ns_quality_kn_lm(spark, sf_dir):
    """Interpolated Kneser–Ney bigram LM scoring (r8 —
    operators/lm.train_kn_lm / score_with_kn; Kneser & Ney 1995, the
    smoothing KenLM implements and CCNet's quality filter runs):
    trained on the doc_id % 4 == 0 quarter, every document scored by
    mean bigram log-probability — absolute discounting, continuation
    back-off weights, the novel-context N1+ counts, and the additive
    OOV floor all re-derived exactly in DuckDB.  Three count
    aggregations to train, three narrow shuffle joins to score; model
    state is DataFrames (corpus-shuffle-sized, never broadcast)."""
    from fluss_datafusion_spark.operators.lm import (
        score_with_kn,
        train_kn_lm,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 4 == 0)
    model = train_kn_lm(train, "doc_id", "text")
    return score_with_kn(docs, "doc_id", "text", *model)


@query(
    "ns_sim_semantic_join", extended=True,
    oracle="""
    WITH e AS (
        SELECT vec_id,
               list_transform(list_zip(embedding,
                                       range(len(embedding))), p ->
                   CAST(p[1] AS DOUBLE)
                   + CASE WHEN (CAST(p[2] AS INTEGER)) // 4
                               = vec_id % 16
                          THEN 1.0 ELSE 0.0 END) AS v
        FROM embeddings
    ),
    pairs AS (
        SELECT l.vec_id AS left_id, r.vec_id AS right_id,
               list_sum(list_transform(list_zip(l.v, r.v),
                                       p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(l.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(r.v, x -> x*x)))) AS cos
        FROM e l JOIN e r ON l.vec_id < 250 AND r.vec_id >= 250
    )
    SELECT left_id, right_id, round(cos, 6) AS cos, TRUE AS recall_ok
    FROM pairs WHERE cos >= 0.8
    """,
)
def ns_sim_semantic_join(spark, sf_dir):
    """Cross-table SEMANTIC JOIN (r8 — operators/similarity.
    semantic_join): the clustered-embedding fixture split into two
    disjoint "sources" (vec_id < 250 vs >= 250) joined by cosine >=
    0.8 — the fuzzy-join-on-meaning no equi-key expresses.  The entry
    emits the EXACT pair set (DuckDB reproduces the clustered vectors
    bit-for-bit and brute-forces the join) plus a recall_ok boolean:
    the LSH-candidate join (8 planes x 16 tables, exact-verified) must
    recover >= 0.9 of the exact pairs (measured 0.96; the sign-LSH
    bound gives 0.94).  Scale shape: bucket equi-join, never a cross
    join; exact verify on candidates only."""
    from fluss_datafusion_spark.operators.similarity import semantic_join
    from fluss_datafusion_spark.functions.vector import cosine_fast

    emb = clustered_embeddings(t(spark, sf_dir, "embeddings"))
    left = emb.select(F.col("vec_id").alias("left_id"), "embedding")
    right = emb.filter(F.col("vec_id") >= 250).select(
        F.col("vec_id").alias("right_id"), "embedding"
    )
    left = left.filter(F.col("left_id") < 250)
    found = semantic_join(
        left, right, "left_id", "embedding", "right_id", "embedding",
        threshold=0.8,
    ).select("left_id", "right_id")
    exact = (
        left.select("left_id", F.col("embedding").alias("__lv__"))
        .crossJoin(
            right.select("right_id", F.col("embedding").alias("__rv__"))
        )
        .withColumn("cos", cosine_fast(F.col("__lv__"), F.col("__rv__")))
        .filter(F.col("cos") >= 0.8)
        .select("left_id", "right_id", "cos")
    )
    n_exact = exact.count()
    n_hit = exact.join(found, ["left_id", "right_id"], "left_semi").count()
    return exact.select(
        "left_id",
        "right_id",
        F.round("cos", 6).alias("cos"),
        F.lit(n_hit / n_exact >= 0.9).alias("recall_ok"),
    )


@query(
    "ns_multimodal_video_fp", extended=True,
    oracle="""
    WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200),
    bits AS (
        SELECT id, list_sum(list_transform(range(64), k ->
            CASE WHEN
                (CASE WHEN id >= 100 AND ((k % 8) * 16) // 9 = 0
                           AND 2 * (k // 8) = 0
                      THEN 252
                      ELSE (5 * (((k % 8) * 16) // 9) * (((k % 8) * 16) // 9)
                              * (id % 50 + 1)
                            + (2 * (k // 8)) * (7 + 3 * (id % 50))
                            + 13 * (((k % 8) * 16) // 9)) % 251
                 END)
                <
                (5 * ((((k % 8) + 1) * 16) // 9) * ((((k % 8) + 1) * 16) // 9)
                   * (id % 50 + 1)
                 + (2 * (k // 8)) * (7 + 3 * (id % 50))
                 + 13 * ((((k % 8) + 1) * 16) // 9)) % 251
            THEN CAST(1 AS HUGEINT) << (63 - CAST(k AS INTEGER))
            ELSE CAST(0 AS HUGEINT) END)) AS raw
        FROM ids
    )
    SELECT id AS media_id,
           CAST(CASE WHEN raw >= CAST(1 AS HUGEINT) << 63
                     THEN raw - (CAST(1 AS HUGEINT) << 64)
                     ELSE raw END AS BIGINT) AS vfp,
           CAST(4 AS INTEGER) AS n_frames,
           true AS decoded_ok
    FROM bits
    """,
)
def ns_multimodal_video_fp(spark, sf_dir):
    """VIDEO fingerprints hash-checked BIT FOR BIT cross-engine (r8 —
    functions/multimodal.video_fingerprint, completing the
    image/audio/video fingerprint family): decode every frame of the
    gradient-AVI fixture (4 frames = the gradient image + per-frame
    brightness offsets, which gradient comparisons ignore), dHash each
    frame, majority-vote the 64 bits, pack signed.  DuckDB re-derives
    the fingerprint from the pixel formula — identical to the still-
    image derivation except the perturbed pixel is 252 (brightness
    headroom), which still dominates every base value.  Pairing and
    ingest ride the SAME banded-Hamming and media_ingest_sink paths as
    images and audio."""
    media = multimodal.synthesize_gradient_avi_media(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        id_col="doc_id",
    )
    return multimodal.video_fingerprint(media)


@query(
    "ns_dedup_video_fp", extended=True,
    oracle="""
    WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(CASE WHEN (a.id < 100) = (b.id < 100) THEN 0 ELSE 1 END
                AS INTEGER) AS ham
    FROM ids a JOIN ids b ON a.id % 50 = b.id % 50 AND a.id < b.id
    """,
)
def ns_dedup_video_fp(spark, sf_dir):
    """VIDEO near-dup dedup (r8 — the family's pairing entry, like
    ns_dedup_image_phash / ns_dedup_audio_fp): fingerprint the gradient
    AVI fixture (video_fingerprint — majority-vote frame dHash), pair
    with the banded Hamming LSH.  Same-cluster unperturbed-vs-perturbed
    copies sit at Hamming exactly 1, identical copies at 0, distinct
    clusters far above max_hamming — the complete pair set and every
    distance are closed-form in DuckDB."""
    from fluss_datafusion_spark.operators.dedup import hamming_near_dup_pairs

    media = multimodal.synthesize_gradient_avi_media(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        id_col="doc_id",
    )
    fp = multimodal.video_fingerprint(media).select("media_id", "vfp")
    return hamming_near_dup_pairs(fp, "media_id", "vfp", max_hamming=2)


@query(
    "ns_multimodal_scene_ingest",  # r8 4th: rotated INTO the core
    # window (out: ns_multimodal_resize) — streaming + perceptual index
    # + composite-uid dedup in one driver-checked row
    oracle="""
    WITH vids AS (SELECT doc_id AS i FROM documents
                  WHERE doc_id < 10 OR (doc_id >= 30 AND doc_id < 60)),
    scenes AS (
        SELECT i, CAST(s AS INTEGER) AS s, 64 * i + s AS uid,
               (i + 17 * s) % 50 AS c,
               CASE WHEN i < 10 THEN 0 WHEN i < 45 THEN 1 ELSE 2 END AS grp
        FROM vids, (SELECT unnest(range(3)) AS s) ss
        WHERE s < 2 + i % 2
    ),
    idx AS (SELECT DISTINCT c FROM scenes WHERE grp = 0),
    b1 AS (SELECT * FROM scenes WHERE grp = 1),
    b1_keep AS (
        SELECT * FROM b1
        WHERE c NOT IN (SELECT c FROM idx)
          AND uid = (SELECT min(uid) FROM b1 x WHERE x.c = b1.c)
    ),
    b2 AS (SELECT * FROM scenes WHERE grp = 2),
    b2_keep AS (
        SELECT * FROM b2
        WHERE c NOT IN (SELECT c FROM idx)
          AND c NOT IN (SELECT c FROM b1_keep)
          AND uid = (SELECT min(uid) FROM b2 x WHERE x.c = b2.c)
    ),
    survivors AS (
        SELECT * FROM b1_keep UNION ALL SELECT * FROM b2_keep
    ),
    bits AS (
        SELECT uid, i, s, list_sum(list_transform(range(64), k ->
            CASE WHEN
                (5 * (((k % 8) * 16) // 9) * (((k % 8) * 16) // 9) * (c + 1)
                 + (2 * (k // 8)) * (7 + 3 * c)
                 + 13 * (((k % 8) * 16) // 9)) % 251
                <
                (5 * ((((k % 8) + 1) * 16) // 9) * ((((k % 8) + 1) * 16) // 9)
                   * (c + 1)
                 + (2 * (k // 8)) * (7 + 3 * c)
                 + 13 * ((((k % 8) + 1) * 16) // 9)) % 251
            THEN CAST(1 AS HUGEINT) << (63 - CAST(k AS INTEGER))
            ELSE CAST(0 AS HUGEINT) END)) AS raw
        FROM survivors
    )
    SELECT uid AS media_id, i AS video_id, s AS scene_idx,
           CAST(3 * s AS INTEGER) AS start_frame,
           CAST(3 AS INTEGER) AS n_frames,
           CAST(CASE WHEN raw >= CAST(1 AS HUGEINT) << 63
                     THEN raw - (CAST(1 AS HUGEINT) << 64)
                     ELSE raw END AS BIGINT) AS sfp
    FROM bits
    """,
)
def ns_multimodal_scene_ingest(spark, sf_dir):
    """Streaming SCENE-CUT video ingest with clip-level dedup (r8 —
    functions/multimodal.video_scene_fingerprints riding
    operators/incremental.media_ingest_sink unchanged, the round-9
    candidate taken): videos 0..9 of the multiscene-AVI fixture are
    segmented and their per-scene majority-vote dHashes indexed once;
    videos 30..59 then arrive as TWO mtime-ordered micro-batches —
    each payload is decoded ONCE into per-scene fingerprint rows
    (packed uid = 64*video + scene), scenes probe the persisted
    Hamming index (corpus-clip-wins; batch-internal same-content
    scenes drop the greater uid), and surviving SCENE records upsert
    into a PK engine table, their fingerprints appended to the index
    so batch 2 dedups against batch 1's survivors.

    Everything is closed-form in DuckDB: scene content is the gradient
    cluster (i + 17*s) % 50, so the whole three-stage decision tree is
    id arithmetic and every survivor's fingerprint is the
    ns_multimodal_image_phash bit formula evaluated at its cluster."""
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.operators.incremental import (
        media_ingest_sink,
        write_hamming_index,
    )

    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_scene_ingest_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    replay = os.path.join(root, "replay")
    os.makedirs(replay)

    media = multimodal.synthesize_multiscene_avi_media(
        t(spark, sf_dir, "documents").filter(
            (F.col("doc_id") < 10)
            | ((F.col("doc_id") >= 30) & (F.col("doc_id") < 60))
        ),
        id_col="doc_id",
    )
    index = os.path.join(root, "idx")
    corpus_fps = multimodal.video_scene_fingerprints(
        media.filter(F.col("media_id") < 10)
    ).filter("decoded_ok")
    write_hamming_index(corpus_fps, "media_id", "sfp", index)
    base = _time.time()
    for i, (lo, hi) in enumerate(((30, 45), (45, 60))):
        pdf = (
            media.filter(
                (F.col("media_id") >= lo) & (F.col("media_id") < hi)
            )
            .toPandas()
            .sort_values("media_id")
        )
        fp = os.path.join(replay, f"b{i:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), fp)
        os.utime(fp, (base + i, base + i))

    e = EngineSession(spark=spark, warehouse=os.path.join(root, "wh"))
    e.sql(
        "CREATE TABLE scene_ingest (media_id BIGINT NOT NULL,"
        " video_id BIGINT, scene_idx INT, start_frame INT, n_frames INT,"
        " sfp BIGINT, PRIMARY KEY (media_id))"
    )
    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    media_ingest_sink(
        stream, e.catalog, "scene_ingest", index,
        os.path.join(root, "ckpt"),
        fingerprint=multimodal.video_scene_fingerprints,
        hash_col="sfp",
    ).awaitTermination()
    return e.sql(
        "SELECT media_id, video_id, scene_idx, start_frame, n_frames, sfp"
        " FROM scene_ingest"
    )


# Shared HTML-fixture expression — valid in BOTH Spark SQL and DuckDB
# (||-concat, CASE, CAST AS STRING), so the oracle rebuilds the exact
# same page per document and replays the extraction chain on it.
_HTML_FIXTURE_EXPR = (
    "'<!DOCTYPE html><html><head><title>Doc ' || CAST(doc_id AS STRING)"
    " || ' &amp; co</title>'"
    " || CASE WHEN doc_id % 7 = 0"
    "         THEN '<meta name=\"robots\" content=\"noindex, nofollow\">'"
    "         ELSE '' END"
    " || '<style>p { margin: 0; }</style>'"
    " || '<script>if (1 < 2) { alert(\"</p>\"); }</script></head><body>'"
    " || '<h1>Title &lt;' || CAST(doc_id AS STRING) || '&gt;</h1>'"
    " || '<p>' || text || '</p>'"
    " || '<!-- id ' || CAST(doc_id AS STRING) || ' -->'"
    " || '<div>tail&nbsp;words &amp;lt; kept</div>'"
    " || '<a href=\"https://ex.com/' || CAST(doc_id AS STRING)"
    " || '\">first</a>'"
    " || CASE WHEN doc_id % 3 = 0"
    "         THEN '<a id=\"b\" href=\"https://ex.com/'"
    "              || CAST(doc_id AS STRING) || '/b\">second</a>'"
    "         ELSE '' END"
    " || '</body></html>'"
)


@query(
    "ns_curation_html_extract", extended=True,
    oracle=f"""
    WITH pages AS (
        SELECT doc_id, {_HTML_FIXTURE_EXPR} AS html FROM documents
    ),
    stripped AS (
        SELECT doc_id, html,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(
                html,
                '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                '(?is)<head[^>]*>.*?</head>', ' ', 'g'),
                '(?s)<!--.*?-->', ' ', 'g'),
                '(?is)</?(p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|section|article|header|footer|blockquote)[^>]*>',
                e'\\n', 'g'),
                '(?s)<[^>]+>', ' ', 'g') AS body,
            regexp_extract(html, '(?is)<title[^>]*>([^<]*)</title>', 1)
                AS rawtitle
        FROM pages
    ),
    decoded AS (
        SELECT doc_id, html,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(
                body, '&lt;', '<', 'g'), '&gt;', '>', 'g'),
                '&quot;', '"', 'g'), '&#39;', e'\\x27', 'g'),
                '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS body,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(
                rawtitle, '&lt;', '<', 'g'), '&gt;', '>', 'g'),
                '&quot;', '"', 'g'), '&#39;', e'\\x27', 'g'),
                '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS title
        FROM stripped
    )
    SELECT doc_id, trim(title) AS title,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            body, '[ \\t\\r\\f]+', ' ', 'g'),
            ' ?\\n ?', e'\\n', 'g'),
            e'\\n+', e'\\n', 'g'),
            '^\\s+|\\s+$', '', 'g') AS text,
        regexp_extract_all(html,
            '(?is)<a[^>]*href\\s*=\\s*"([^"]*)"', 1) AS links,
        CAST(len(regexp_extract_all(html,
            '(?is)<a[^>]*href\\s*=\\s*"([^"]*)"', 1)) AS INTEGER)
            AS n_links,
        regexp_matches(html, '(?is)<meta[^>]*content\\s*=\\s*"[^"]*noindex')
            AS noindex
    FROM decoded
    """,
)
def ns_curation_html_extract(spark, sf_dir):
    """HTML -> text boilerplate extraction (r8 —
    operators/curation.html_extract, the WET-extraction stage every
    web-corpus pipeline starts from: C4 strips markup before any
    heuristic, CCNet/RefinedWeb consume pre-extracted WET text): each
    document is wrapped in a deterministic page — title with entities,
    conditional robots-noindex meta, a style block, a script whose body
    contains '<' and a fake closing tag, block/inline markup, an HTML
    comment, nbsp + double-escaped entities, and 1-2 links — then the
    engine strips scripts/styles/head/comments, breaks block tags to
    newlines, drops tags, decodes entities (&amp; LAST: '&amp;lt;' is
    the literal '&lt;'), and normalizes whitespace as ONE
    whole-stage-codegen projection of RE2-compatible regexps.  DuckDB
    rebuilds the identical page from the shared SQL expression and
    replays the chain verbatim — title, text, links, n_links, noindex
    all hash-checked."""
    from fluss_datafusion_spark.operators.curation import html_extract

    pages = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .selectExpr("doc_id", f"{_HTML_FIXTURE_EXPR} AS html")
    )
    return html_extract(pages)


@query(
    "ns_curation_temperature_mixture", extended=True,
    oracle="""
    WITH stats AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                        END) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM stats),
    sh AS (
        SELECT source, n_docs, n_tokens,
               n_tokens / CAST(total AS DOUBLE) AS share
        FROM stats CROSS JOIN tot
    )
    SELECT source, n_docs, n_tokens,
           round(share, 6) AS token_share,
           round((pow(share, 0.3) / sum(pow(share, 0.3)) OVER ()) / share,
                 6) AS weight
    FROM sh
    """,
)
def ns_curation_temperature_mixture(spark, sf_dir):
    """Temperature-based mixture sampling (r8 — the multilingual
    upsampling rule of Conneau et al. 2020 §5.1 / Raffel et al. 2020
    §3.4.3): per-source targets derived from the data itself as
    share^α / Σ share^α at α = 0.3, so low-resource sources upsample
    without hand-written shares.  One map-side-combined corpus pass;
    the exponentiated-share normalizer is a window sum over the
    O(domains) table.  DuckDB replays the algebra exactly."""
    from fluss_datafusion_spark.operators import curation

    return curation.domain_mixture_weights(
        t(spark, sf_dir, "documents"), "source", "text", temperature=0.3
    )


@query(
    "ns_text_readability", extended=True,
    oracle="""
    WITH pages AS (
        SELECT doc_id,
               'Intro words here. ' || text || '! Final tail ok?' AS s
        FROM documents
    ),
    tk AS (
        SELECT doc_id, s,
               list_filter(regexp_split_to_array(lower(trim(s)), '\\s+'),
                           w -> w <> '') AS toks
        FROM pages
    ),
    counts AS (
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_words,
               CAST(greatest(len(regexp_extract_all(s, '[.!?]+')), 1)
                    AS INTEGER) AS n_sentences,
               CAST(list_sum(list_transform(toks, w ->
                    greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)))
                    AS INTEGER) AS n_syllables
        FROM tk
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835 - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                        - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)),
                 6) AS flesch,
           round(0.39 * (n_words / CAST(n_sentences AS DOUBLE))
                 + 11.8 * (n_syllables / CAST(n_words AS DOUBLE)) - 15.59,
                 6) AS fk_grade
    FROM counts
    """,
)
def ns_text_readability(spark, sf_dir):
    """Flesch / Flesch-Kincaid readability scoring (r8 —
    functions/text.readability_stats, the classic document-quality
    signal — Kincaid et al. 1975): the fixture wraps each document in
    a three-sentence frame (testdata documents carry no punctuation),
    then words, sentence-terminator runs and per-word vowel-group
    syllables feed the two formulas as ONE codegen projection of JVM
    array folds.  DuckDB replays tokenization, the syllable fold and
    the exact float algebra (round at 6 — the 4-decimal grid is where
    engine tie rules diverge)."""
    from fluss_datafusion_spark.functions.text import readability_stats

    pages = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("Intro words here. "),
            F.col("text"),
            F.lit("! Final tail ok?"),
        ).alias("text"),
    )
    return readability_stats(pages, "doc_id", "text")


@query(
    "ns_curation_dp_release", extended=True,
    oracle="""
    WITH stats AS (
        SELECT source, count(*) AS n,
               sum(greatest(0.0, least(100.0,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END))) AS s
        FROM documents WHERE source IS NOT NULL GROUP BY source
    ),
    noised AS (
        SELECT source, n, s,
            (CAST(concat('0x', substr(md5('dp-r8|count|' || source), 1, 13))
                  AS BIGINT) + 0.5) / 4503599627370496.0 AS uc,
            (CAST(concat('0x', substr(md5('dp-r8|sum|' || source), 1, 13))
                  AS BIGINT) + 0.5) / 4503599627370496.0 AS us
        FROM stats
    )
    SELECT source,
        round(n + (-(1.0/0.5)) * sign(uc - 0.5)
                  * ln(1.0 - 2.0 * abs(uc - 0.5)), 6) AS dp_count,
        round(s + (-(100.0/0.5)) * sign(us - 0.5)
                  * ln(1.0 - 2.0 * abs(us - 0.5)), 6) AS dp_sum
    FROM noised
    """,
)
def ns_curation_dp_release(spark, sf_dir):
    """ε-differentially-private statistics release (r8 —
    operators/curation.dp_aggregate, the Laplace mechanism of Dwork et
    al. 2006): per-source document counts and token sums (clipped to
    [0, 100] per document — clipping bounds the sensitivity) released
    at ε = 0.5 with inverse-CDF Laplace noise drawn from a seeded md5
    uniform.  One map-side-combined aggregation; noise is a per-GROUP
    expression.  DuckDB replays the md5 chain, the clipping and the
    exact inverse-CDF float algebra."""
    from fluss_datafusion_spark.functions.text import token_count
    from fluss_datafusion_spark.operators.curation import dp_aggregate

    docs = t(spark, sf_dir, "documents").select(
        "source", token_count(F.col("text")).alias("n_tokens")
    )
    return dp_aggregate(
        docs, ["source"], epsilon=0.5, seed="dp-r8",
        sum_col="n_tokens", bounds=(0, 100),
    )


@query(
    "ns_ts_lttb_downsample", extended=True,
    oracle="""
    WITH base AS (
        SELECT user_id AS k, ts, round(CAST(value AS DOUBLE), 0) AS v,
               CAST(epoch_us(ts)
                    - min(epoch_us(ts)) OVER (PARTITION BY user_id)
                    AS DOUBLE) AS x,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts, round(CAST(value AS DOUBLE), 0)) AS rn,
               count(*) OVER (PARTITION BY user_id) AS cnt
        FROM events
    ),
    small AS (
        SELECT k, ts, v, CAST(NULL AS INTEGER) AS bucket
        FROM base WHERE cnt <= 12
    ),
    big AS (SELECT * FROM base WHERE cnt > 12),
    ends AS (
        SELECT k,
               min(CASE WHEN rn = 1 THEN x END) AS fx,
               min(CASE WHEN rn = 1 THEN v END) AS fy,
               min(CASE WHEN rn = cnt THEN x END) AS lx,
               min(CASE WHEN rn = cnt THEN v END) AS ly
        FROM big GROUP BY k
    ),
    interior AS (
        SELECT *, CAST(floor((rn - 2) * 10 / (cnt - 2.0)) AS INTEGER) AS b
        FROM big WHERE rn > 1 AND rn < cnt
    ),
    avgs AS (
        SELECT k, b, avg(x) AS ax, avg(v) AS ay
        FROM interior GROUP BY k, b
    ),
    anch AS (
        SELECT i.*, coalesce(l.ax, e.fx) AS xl, coalesce(l.ay, e.fy) AS yl,
               coalesce(r.ax, e.lx) AS xr, coalesce(r.ay, e.ly) AS yr
        FROM interior i
        LEFT JOIN avgs l ON l.k = i.k AND l.b = i.b - 1
        LEFT JOIN avgs r ON r.k = i.k AND r.b = i.b + 1
        JOIN ends e ON e.k = i.k
    ),
    ranked AS (
        SELECT k, ts, v, b,
               row_number() OVER (
                   PARTITION BY k, b
                   ORDER BY abs((xl - xr) * (v - yl)
                                - (xl - x) * (yr - yl)) DESC, rn ASC
               ) AS rk
        FROM anch
    ),
    picked AS (SELECT k, ts, v, b AS bucket FROM ranked WHERE rk = 1),
    endpoints AS (
        SELECT k, ts, v, CAST(-1 AS INTEGER) AS bucket
        FROM big WHERE rn = 1
        UNION ALL
        SELECT k, ts, v, CAST(10 AS INTEGER) AS bucket
        FROM big WHERE rn = cnt
    )
    SELECT k AS user_id, ts, v AS value, bucket FROM small
    UNION ALL SELECT k, ts, v, bucket FROM endpoints
    UNION ALL SELECT k, ts, v, bucket FROM picked
    """,
)
def ns_ts_lttb_downsample(spark, sf_dir):
    """LTTB downsampling (r8 — operators/timeseries.lttb_downsample;
    Steinarsson 2013, TimescaleDB's lttb() in the bucket-average-anchor
    parallel form): every user's event series decimates to 12 points —
    endpoints plus the largest-triangle pick from each of 10
    equal-count buckets anchored on neighbor-bucket averages; short
    series pass through whole.  Values round to integers first (exact
    float sums in any order) and x rebases to the series minimum
    (triangle areas are affine-invariant; raw epoch-µs bucket sums
    would exceed 2^53) — so DuckDB replays the entire float algebra,
    rank ties included, bit-for-bit."""
    from fluss_datafusion_spark.operators.timeseries import lttb_downsample

    ev = t(spark, sf_dir, "events").select(
        "user_id", "ts", F.round(F.col("value"), 0).alias("value")
    )
    return lttb_downsample(ev, "user_id", "ts", "value", 12)


@query(
    "ns_multimodal_audio_seg_ingest", extended=True,
    oracle="""
    WITH clips AS (SELECT doc_id AS i FROM documents
                   WHERE doc_id < 10 OR (doc_id >= 30 AND doc_id < 60)),
    segs AS (
        SELECT i, CAST(s AS INTEGER) AS s, 64 * i + s AS uid,
               (i + 17 * s) % 20 AS c,
               CASE WHEN i < 10 THEN 0 WHEN i < 45 THEN 1 ELSE 2 END AS grp
        FROM clips, (SELECT unnest(range(3)) AS s) ss
        WHERE s < 2 + i % 2
    ),
    idx AS (SELECT DISTINCT c FROM segs WHERE grp = 0),
    b1 AS (SELECT * FROM segs WHERE grp = 1),
    b1_keep AS (
        SELECT * FROM b1
        WHERE c NOT IN (SELECT c FROM idx)
          AND uid = (SELECT min(uid) FROM b1 x WHERE x.c = b1.c)
    ),
    b2 AS (SELECT * FROM segs WHERE grp = 2),
    b2_keep AS (
        SELECT * FROM b2
        WHERE c NOT IN (SELECT c FROM idx)
          AND c NOT IN (SELECT c FROM b1_keep)
          AND uid = (SELECT min(uid) FROM b2 x WHERE x.c = b2.c)
    ),
    survivors AS (
        SELECT * FROM b1_keep UNION ALL SELECT * FROM b2_keep
    )
    SELECT uid AS media_id, i AS audio_id, s AS seg_idx,
           CAST(4 * s AS INTEGER) AS start_window,
           CAST(4 AS INTEGER) AS n_windows,
           CAST(CASE WHEN 3 * c = 0 THEN
                     (CAST(1 AS HUGEINT) << 63) - (CAST(1 AS HUGEINT) << 64)
                     + (CAST(1 AS HUGEINT) << 62)
                     + (CAST(1 AS HUGEINT) << 61)
                ELSE (CAST(1 AS HUGEINT) << (63 - 3 * c))
                     + (CAST(1 AS HUGEINT) << (63 - 3 * c - 1))
                     + (CAST(1 AS HUGEINT) << (63 - 3 * c - 2))
                END AS BIGINT) AS afp
    FROM survivors
    """,
)
def ns_multimodal_audio_seg_ingest(spark, sf_dir):
    """Streaming AUDIO-segment ingest with clip-reuse dedup (r8 —
    functions/multimodal.audio_segment_fingerprints riding
    operators/incremental.media_ingest_sink unchanged; the acoustic
    twin of ns_multimodal_scene_ingest): clips 0..9 of the
    segment-chord fixture are cut into fixed 4-window granules and
    their gain-invariant spectral fingerprints indexed; clips 30..59
    arrive as TWO micro-batches, each decoded ONCE into per-segment
    rows (uid = 64·clip + segment) that probe the persisted Hamming
    index (corpus-copy-wins, batch-internal greater-uid drops), with
    survivors upserted and appended for batch 2.

    Closed form throughout: segment (i, s) plays cluster
    (i + 17·s) % 20, whose fingerprint is exactly the 3 bits at
    positions 3c..3c+2 (bin-aligned chord, mean-threshold bits) — the
    drop tree AND every surviving fingerprint are id arithmetic in
    DuckDB (cluster 0's bit 0 is the sign bit: the signed form is
    assembled explicitly)."""
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.operators.incremental import (
        media_ingest_sink,
        write_hamming_index,
    )

    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_aseg_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    replay = os.path.join(root, "replay")
    os.makedirs(replay)

    media = multimodal.synthesize_segment_chord_media(
        t(spark, sf_dir, "documents").filter(
            (F.col("doc_id") < 10)
            | ((F.col("doc_id") >= 30) & (F.col("doc_id") < 60))
        ),
        id_col="doc_id",
    )
    index = os.path.join(root, "idx")
    corpus_fps = multimodal.audio_segment_fingerprints(
        media.filter(F.col("media_id") < 10)
    ).filter("decoded_ok")
    write_hamming_index(corpus_fps, "media_id", "afp", index)
    base = _time.time()
    for i, (lo, hi) in enumerate(((30, 45), (45, 60))):
        pdf = (
            media.filter(
                (F.col("media_id") >= lo) & (F.col("media_id") < hi)
            )
            .toPandas()
            .sort_values("media_id")
        )
        fp = os.path.join(replay, f"b{i:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), fp)
        os.utime(fp, (base + i, base + i))

    e = EngineSession(spark=spark, warehouse=os.path.join(root, "wh"))
    e.sql(
        "CREATE TABLE audio_seg_ingest (media_id BIGINT NOT NULL,"
        " audio_id BIGINT, seg_idx INT, start_window INT, n_windows INT,"
        " afp BIGINT, PRIMARY KEY (media_id))"
    )
    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    media_ingest_sink(
        stream, e.catalog, "audio_seg_ingest", index,
        os.path.join(root, "ckpt"),
        fingerprint=multimodal.audio_segment_fingerprints,
        hash_col="afp",
    ).awaitTermination()
    return e.sql(
        "SELECT media_id, audio_id, seg_idx, start_window, n_windows, afp"
        " FROM audio_seg_ingest"
    )


@query(
    "ns_quality_wap_publish", extended=True,
    oracle="""
    WITH staged AS (
        SELECT p_partkey,
               CASE WHEN p_partkey % 10 = 1 THEN -5
                    ELSE p_size END AS p_size,
               CASE WHEN p_partkey % 10 = 2 THEN NULL
                    ELSE p_name END AS p_name
        FROM part WHERE p_partkey % 4 IN (1, 2)
    ),
    clean AS (
        SELECT p_partkey, p_name, p_size FROM staged
        WHERE p_size >= 1 AND p_name IS NOT NULL
    ),
    final AS (
        SELECT p_partkey, p_name, p_size FROM part WHERE p_partkey % 4 = 0
        UNION ALL SELECT p_partkey, p_name, p_size FROM clean
    ),
    audit AS (
        SELECT count(*) AS n_quarantined FROM staged
        WHERE NOT (p_size >= 1 AND p_name IS NOT NULL)
    )
    SELECT f.p_partkey, f.p_name, f.p_size, a.n_quarantined
    FROM final f CROSS JOIN audit a
    """,
)
def ns_quality_wap_publish(spark, sf_dir):
    """Write-Audit-Publish (r8 cont.) — the canonical Iceberg branch
    workflow, composed from the engine's own primitives: WRITE an
    untrusted batch to a staging BRANCH (main readers never see it),
    AUDIT the branch overlay with an expectation predicate and
    quarantine the violating rows via branch-scoped DELETE (row-level
    gating, not batch-level all-or-nothing), then PUBLISH with FAST
    FORWARD — the surviving rows MOVE into the main log under their
    original seq stamps, zero rewrite.  The batch injects two
    deterministic defect classes (negative sizes, NULL names); DuckDB
    re-derives the quarantine count and the exact published state.

    100 TB shape: the audit is one scan of the branch overlay; the
    quarantine is one tombstone append; publication is O(branch files)
    metadata — main is never rewritten, and a failed audit leaves main
    untouched (drop the branch to abort)."""
    import shutil
    import tempfile

    from fluss_datafusion_spark import EngineSession
    from fluss_datafusion_spark.corpus import v

    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_wap_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    e = EngineSession(spark=spark, warehouse=os.path.join(root, "wh"))
    v(spark, sf_dir, "part")
    e.sql(
        "CREATE TABLE wap (p_partkey BIGINT NOT NULL, p_name STRING,"
        " p_size INT, PRIMARY KEY (p_partkey))"
    )
    # seed main with the trusted slice
    e.sql(
        "INSERT INTO wap SELECT p_partkey, p_name, p_size FROM part"
        " WHERE p_partkey % 4 = 0"
    )
    e.sql("ALTER TABLE wap CREATE BRANCH staging")
    # WRITE: the incoming batch (with injected defects) lands on the
    # branch only
    e.sql(
        "INSERT INTO wap$branch('staging')"
        " SELECT p_partkey,"
        "        CASE WHEN p_partkey % 10 = 2 THEN NULL ELSE p_name END,"
        "        CASE WHEN p_partkey % 10 = 1 THEN -5 ELSE p_size END"
        " FROM part WHERE p_partkey % 4 IN (1, 2)"
    )
    # AUDIT: quarantine expectation violations on the branch (seeded
    # rows can't match — real part rows have 1<=size and a name)
    quarantined = e.sql(
        "DELETE FROM wap$branch('staging')"
        " WHERE NOT (p_size >= 1 AND p_name IS NOT NULL)"
    ).collect()[0][0]
    # PUBLISH: zero-rewrite fast-forward
    e.sql("ALTER TABLE wap FAST FORWARD BRANCH staging")
    # single-partition literal (the q71 lesson: createDataFrame spreads
    # one row over defaultParallelism empty slices)
    audit = spark.range(0, 1, 1, 1).select(
        F.lit(int(quarantined)).cast("long").alias("n_quarantined")
    )
    return e.sql(
        "SELECT p_partkey, p_name, p_size FROM wap"
    ).crossJoin(audit)
