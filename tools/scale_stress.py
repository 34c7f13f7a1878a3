"""Scale-stress harness (VERDICT r5 #9): tile the sf0.1 documents /
embeddings tables 10x and 100x and measure the dedup / ANN / retrieval
headliners at every scale — direct wall-clock evidence for the
"survives a scale-up" claim the per-round bench at one SF can only
argue by plan shape.

Tiling keeps each operator's OUTPUT linear in the input so the timing
ratios are interpretable:

- documents: copy k suffixes every token with the copy ordinal, so
  cross-copy texts share NO shingles (near-dup structure = k disjoint
  copies of the base corpus; pair outputs scale linearly, not
  quadratically in the copy count);
- embeddings: vec_ids offset per copy; queries stay a FIXED small set,
  so ANN output is constant and runtime tracks corpus size.

Usage:
    python tools/scale_stress.py [--scales 1,10,100] [--out SCALE.md]

Writes a markdown table: per op, wall seconds at each scale plus the
step ratios; a ratio beyond the scale step means superlinear — the
thing this harness exists to catch.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


# per-op in-row annotations (e.g. files-kept/files-total per probe);
# run_ops fills it, main() snapshots per scale and renders in-cell
ANNOTATIONS: dict = {}


def build_media(spark, docs_path: str, root: str, scale: int) -> str:
    """Per-doc synthesized BMPs with cluster structure that stays LINEAR
    under tiling: cluster = doc_id // 10 (always exactly 10 members at
    any scale), image content = the md5(cluster) bit plane rendered as
    a 16x16 two-level BMP.  The library's gradient fixture
    (synthesize_gradient_bmp_media) is NOT reusable here: its pixel
    formula is periodic in cluster mod 251, so past 251 clusters
    distinct clusters alias to identical images and the pair output
    goes quadratic — an artifact of the fixture, not the operator.
    md5 gives ~uniform 64-bit dHashes, so cross-cluster Hamming <= 2
    collisions are ~1e-16 per pair and the output is 45 pairs/cluster,
    exactly linear in the corpus."""
    import hashlib
    import struct
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    out = os.path.join(root, f"media_x{scale}")

    def _bmp(cluster: int) -> bytes:
        bits = hashlib.md5(str(cluster).encode()).digest()
        w = h = 16
        stride = (w * 3 + 3) & ~3
        pad = b"\x00" * (stride - 3 * w)
        rows = []
        for y_store in range(h):
            y = h - 1 - y_store
            row = bytearray()
            for x in range(w):
                k = (x + 16 * y) % 128
                g = 200 if (bits[k // 8] >> (k % 8)) & 1 else 10
                row += bytes([g, g, g])
            rows.append(bytes(row) + pad)
        data = b"".join(rows)
        header = (
            b"BM" + struct.pack("<I", 54 + len(data)) + b"\x00" * 4
            + struct.pack("<I", 54)
        )
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
        )
        return header + info + data

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache = {}
        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                c = int(i) // 10
                if c not in cache:
                    cache[c] = _bmp(c)
                payloads.append(cache[c])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    (
        spark.read.parquet(docs_path)
        .select(F.col("doc_id").alias("media_id"))
        .mapInPandas(_map, "media_id long, payload binary")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def build_scene_media(spark, docs_path: str, root: str, scale: int) -> str:
    """Multiscene AVIs with LINEAR scene-dup structure under tiling
    (the build_media discipline, lifted to video): video i has two
    2-frame scenes whose content keys are ``2*(i // 10) + s`` — every
    scene cluster has exactly 10 members at any scale, adjacent scenes
    of one video always differ (2b vs 2b+1), and content is the
    md5(cluster) bit plane (uniform 64-bit scene dHashes: cross-cluster
    collisions ~1e-16/pair), so pair output is 45/cluster — exactly
    linear.  The library's gradient multiscene fixture is NOT reusable
    here for the same mod-251 aliasing reason as the BMP one."""
    import hashlib
    import struct
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    out = os.path.join(root, f"scene_media_x{scale}")
    w = h = 16
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - 3 * w)

    def _dib(cluster: int) -> bytes:
        bits = hashlib.md5(str(cluster).encode()).digest()
        rows = []
        for y_store in range(h):
            y = h - 1 - y_store
            row = bytearray()
            for x in range(w):
                k = (x + 16 * y) % 128
                g = 200 if (bits[k // 8] >> (k % 8)) & 1 else 10
                row += bytes([g, g, g])
            rows.append(bytes(row) + pad)
        return b"".join(rows)

    def _avi(i: int, dib_cache: dict) -> bytes:
        frames = bytearray()
        n_frames = 4  # 2 scenes x 2 identical frames
        for s in range(2):
            c = 2 * (i // 10) + s
            if c not in dib_cache:
                dib_cache[c] = _dib(c)
            dib = dib_cache[c]
            for _f in range(2):
                frames += b"00db" + struct.pack("<I", len(dib)) + dib
        avih = struct.pack(
            "<10I", 40000, 0, 0, 0, n_frames, 0, 1, 0, w, h
        ) + b"\x00" * 16
        strh = (
            b"vids" + b"DIB "
            + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, 25, 0,
                          n_frames, 0, 0, 0, 0)
            + struct.pack("<4h", 0, 0, w, h)
        )
        strf = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835,
            0, 0,
        )
        strl = (
            b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
            + b"strl"
            + b"strh" + struct.pack("<I", len(strh)) + strh
            + b"strf" + struct.pack("<I", len(strf)) + strf
        )
        hdrl = (
            b"LIST" + struct.pack("<I", 4 + 8 + 56 + len(strl)) + b"hdrl"
            + b"avih" + struct.pack("<I", 56) + avih + strl
        )
        movi = (
            b"LIST" + struct.pack("<I", 4 + len(frames)) + b"movi"
            + bytes(frames)
        )
        body = b"AVI " + hdrl + movi
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dib_cache = {}
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        _avi(int(i), dib_cache) for i in pdf["media_id"]
                    ],
                }
            )

    (
        spark.read.parquet(docs_path)
        .select(F.col("doc_id").alias("media_id"))
        .mapInPandas(_map, "media_id long, payload binary")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def build_audio_media(spark, docs_path: str, root: str, scale: int) -> str:
    """Segmented float32 WAVs with LINEAR clip-reuse structure under
    tiling (the build_media discipline on PCM): clip i has two
    4x128-frame segments whose samples are seeded pseudo-noise keyed
    by cluster ``2*(i // 10) + s`` — 10 members per cluster at any
    scale, mean-threshold spectral fingerprints ~uniform 64-bit, pair
    output 45/cluster, exactly linear.  (The library's chord fixture
    caps at 20 clusters — bin-aligned triples only fit 64 bins — so it
    would alias under tiling, same lesson as the gradient fixtures.)"""
    import struct
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    out = os.path.join(root, f"audio_media_x{scale}")
    seg_len = 4 * 128

    def _wav(i: int, cache: dict) -> bytes:
        samples = bytearray()
        for s in range(2):
            c = 2 * (i // 10) + s
            if c not in cache:
                rng = np.random.RandomState(c % (2**31))
                cache[c] = rng.uniform(-1, 1, seg_len).astype("<f4").tobytes()
            samples += cache[c]
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(samples)) + bytes(samples)
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache = {}
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [_wav(int(i), cache) for i in pdf["media_id"]],
                }
            )

    (
        spark.read.parquet(docs_path)
        .select(F.col("doc_id").alias("media_id"))
        .mapInPandas(_map, "media_id long, payload binary")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def build_tiled(spark, sf_dir: str, scale: int, root: str):
    """(documents_path, embeddings_path) tiled ``scale``x."""
    from pyspark.sql import functions as F

    from fluss_datafusion_spark.session import read_table

    out_docs = os.path.join(root, f"docs_x{scale}")
    out_emb = os.path.join(root, f"emb_x{scale}")
    docs = read_table(spark, os.path.join(sf_dir, "documents.parquet"))
    emb = read_table(spark, os.path.join(sf_dir, "embeddings.parquet"))
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    copies = spark.range(scale).select(F.col("id").alias("__k__"))
    # per-copy token suffix — every token of copy k carries "§k", so
    # copy k's shingle space is disjoint from every other copy's (a
    # token-array transform: regexp replacements can't reference __k__)
    tiled_docs = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("__k__") * n_doc).alias("doc_id"),
            F.when(F.col("__k__") == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda w: F.concat(
                            w, F.lit("§"), F.col("__k__").cast("string")
                        ),
                    ),
                    " ",
                )
            )
            .alias("text"),
        )
    )
    tiled_docs.write.mode("overwrite").parquet(out_docs)
    # per-copy circular shift (+ negation past one full rotation): a
    # shifted iid random vector is near-orthogonal to the original, so
    # cross-copy cosine ~ 0 and near-dup pair output stays LINEAR in
    # the copy count (identical copies would make it quadratic — an
    # artifact of the tiling, not the operator)
    dim = len(emb.select("embedding").first()[0])
    shift = F.col("__k__") % dim
    shifted = F.concat(
        F.slice(F.col("embedding"), shift + 1, F.lit(dim) - shift),
        F.slice(F.col("embedding"), 1, shift),
    )
    signed = F.when(F.col("__k__") < dim, shifted).otherwise(
        F.transform(shifted, lambda x: -x)
    )
    tiled_emb = (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("__k__") * n_vec).alias("vec_id"),
            F.when(F.col("__k__") == 0, F.col("embedding"))
            .otherwise(signed)
            .alias("embedding"),
        )
    )
    tiled_emb.write.mode("overwrite").parquet(out_emb)
    return out_docs, out_emb


def run_ops(
    spark, docs_path: str, emb_path: str, media_path: str,
    scene_media_path: str, audio_media_path: str, scale: int = 1,
) -> dict:
    from pyspark.sql import functions as F

    from fluss_datafusion_spark.functions import multimodal
    from fluss_datafusion_spark.operators import curation, dedup, retrieval, similarity

    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path)
    media = spark.read.parquet(media_path)
    queries_vec = emb.filter(F.col("vec_id") % 211 == 0).limit(5)
    queries_txt = spark.createDataFrame(
        [(0, "hash join fast"), (1, "table scan slow")], ["qid", "qtext"]
    )
    timings = {}

    def bench(name, thunk):
        t0 = time.time()
        _noop(thunk())
        timings[name] = round(time.time() - t0, 2)
        spark.catalog.clearCache()

    bench("dedup_exact", lambda: dedup.exact_dedup(docs, "doc_id", "text"))
    bench(
        "dedup_minhash_lsh",
        lambda: dedup.minhash_lsh_pairs(
            docs, "doc_id", "text",
            k=3, num_perm=128, rows_per_band=2, threshold=0.4,
        ),
    )
    bench(
        "dedup_shared_spans",
        lambda: dedup.shared_span_pairs(
            docs, "doc_id", "text", k=8, max_df=16
        ),
    )
    bench(
        "dedup_embedding_lsh",
        lambda: dedup.embedding_cosine_pairs_lsh(
            emb, "vec_id", "embedding", threshold=0.9
        ),
    )
    bench(
        "ann_ivf_topk",
        lambda: similarity.ivf_ann_topk(
            emb, queries_vec, "vec_id", "embedding", "vec_id", "embedding",
            k=11, n_centroids=16, n_probe=4, n_iters=2,
        ),
    )
    bench(
        "retrieval_bm25",
        lambda: retrieval.bm25_search(
            docs, "doc_id", "text", queries_txt, "qid", "qtext", k=10
        ),
    )
    # full perceptual-dedup path: Arrow-batched BMP decode + dHash, then
    # banded Hamming LSH pairs (r8 operators).  Two key regimes on the
    # SAME input: 16-bit keys (key_blocks=1, the default) saturate past
    # ~2^16 distinct fingerprints and collision candidates grow
    # quadratically — the _k16 row EXISTS to show that knee; 32-bit
    # block-combination keys (key_blocks=2, Manku 2007) are the scale
    # path and stay pigeonhole-exact for Hamming <= 2.
    bench(
        "dedup_image_phash_k16",
        lambda: dedup.hamming_near_dup_pairs(
            multimodal.image_dhash_stats(media).select("media_id", "dhash"),
            "media_id",
            "dhash",
            max_hamming=2,
        ),
    )
    bench(
        "dedup_image_phash_k32",
        lambda: dedup.hamming_near_dup_pairs(
            multimodal.image_dhash_stats(media).select("media_id", "dhash"),
            "media_id",
            "dhash",
            max_hamming=2,
            key_blocks=2,
        ),
    )
    # scene-level video dedup (r8 4th): decode + per-scene majority-vote
    # dHash in one Arrow pass, then the wide-key banded Hamming path —
    # the clip-reuse detector at corpus scale (decode-dominated, like
    # the image rows; key_blocks=2 is the past-2^16 regime).
    scene_media = spark.read.parquet(scene_media_path)
    bench(
        "dedup_video_scene_fp",
        lambda: dedup.hamming_near_dup_pairs(
            multimodal.video_scene_fingerprints(scene_media)
            .filter("decoded_ok")
            .select("media_id", "sfp"),
            "media_id",
            "sfp",
            max_hamming=2,
            key_blocks=2,
        ),
    )
    # segment-level audio dedup (r8 4th): WAV decode + per-segment FFT
    # mean-threshold bits in one Arrow pass, then the wide-key Hamming
    # path — completes the image/video/audio modality scale evidence.
    audio_media = spark.read.parquet(audio_media_path)
    bench(
        "dedup_audio_seg_fp",
        lambda: dedup.hamming_near_dup_pairs(
            multimodal.audio_segment_fingerprints(audio_media)
            .filter("decoded_ok")
            .select("media_id", "afp"),
            "media_id",
            "afp",
            max_hamming=2,
            key_blocks=2,
        ),
    )
    # WET-stage HTML extraction (r8 4th): one whole-stage-codegen
    # projection of RE2-safe regexps — the row exists to prove the
    # chain stays linear in corpus bytes (no backtracking blowup).
    bench(
        "curation_html_extract",
        lambda: curation.html_extract(
            docs.selectExpr(
                "doc_id",
                "'<html><head><title>t</title><style>p{}</style>'"
                " || '<script>var x=1;</script></head><body><p>'"
                " || text || '</p><a href=\"https://e.com/x\">l</a>'"
                " || '</body></html>' AS html",
            )
        ),
    )
    # r12: concat-and-chunk packing — the global token cumsum must scale
    # as range-partition local cumsums + an O(partitions) offsets
    # broadcast (operators/curation.chunk_token_windows), never a
    # single-partition window.  Linear wall under 100x docs is the
    # evidence the two-pass shape holds.
    bench(
        "token_windows_chunk",
        lambda: curation.chunk_token_windows(
            docs, "doc_id", "text", window=512,
            num_partitions=16 * scale,
        ),
    )

    # r12 (VERDICT r11 item 7): html_extract marginal-step evidence.
    # curation_html_extract above scales ROWS with the tile, so its
    # step ratio mixes regex work with task fan-out and per-row
    # overhead.  This probe holds rows FIXED (2000) and scales only the
    # BYTES per document with the tile factor: if the regex projection
    # is linear in corpus bytes, this row's step ratio reads ~10x per
    # 10x — and curation_html_extract's excess over that is tiling
    # fan-out, not a superlinear pattern.
    probe_rows = 2000
    unit = (
        "word alpha &amp;x <b>bead</b> y z "
        "<a href=\"https://e.com/p\">l</a> tail "
    )
    html_probe = spark.range(probe_rows).selectExpr(
        "id AS doc_id",
        "concat('<html><head><title>t</title><style>p{}</style>'"
        " , '<script>var x=1;</script></head><body><p>'"
        f" , repeat('{unit}', {8 * scale})"
        " , '</p></body></html>') AS html",
    )
    ANNOTATIONS["html_extract_bytes_fixed_rows"] = (
        f"{probe_rows} rows x ~{len(unit) * 8 * scale}B"
    )
    bench(
        "html_extract_bytes_fixed_rows",
        lambda: curation.html_extract(html_probe),
    )
    bench(
        "ann_ivfpq_topk",
        lambda: similarity.pq_ann_topk(
            emb, queries_vec, "vec_id", "embedding", "vec_id", "embedding",
            k=11, n_centroids=16, n_probe=4, m=8, ks=16, n_iters=2,
        ),
    )
    # PageRank regime switch (r11): ~4 deterministic out-edges per doc
    # into a 10k-host id space — x1/x10 sit under the 1M-edge cap and
    # take the driver-local numpy iteration; x100 (~2M edges) crosses
    # it and runs the distributed rounds.  The row exists to show BOTH
    # regimes and that the distributed path holds at the 100x point
    # (the forced-cap pytest pins their equivalence).
    from fluss_datafusion_spark.operators import graph

    pr_edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64("text", F.lit(i)), F.lit(10000))
                    for i in range(4)
                ]
            )
        ).alias("dst"),
    ).distinct()
    bench(
        "graph_pagerank3",
        lambda: graph.pagerank(pr_edges, "src", "dst", n_iters=3),
    )
    # index-store probe-prune regime at its DESIGN scale (r12, VERDICT
    # r11 item 1): a hamming bucket store built with 64*scale range
    # partitions — constant file size, linearly MORE files, the 100 TB
    # geometry — probed with FIXED 4-fingerprint batches whose hashes
    # duplicate corpus entries (the realistic ingest-dup case, so the
    # verify store prune engages too).  Store build is untimed setup;
    # the timed probes must stay FLAT while the store grows 100x, and
    # the per-probe buckets+hashes kept/total file counts ride the row.
    import tempfile as _tfp

    from fluss_datafusion_spark.operators import incremental as inc
    from fluss_datafusion_spark.operators.dedup import (
        release_candidate_cache,
    )

    prune_root = _tfp.mkdtemp(prefix="scale_probe_")
    try:
        n_docs_probe = docs.count()
        fp_df = docs.select(
            F.col("doc_id").alias("media_id"),
            F.xxhash64("doc_id").alias("fp"),
        ).repartitionByRange(16 * scale, "media_id")
        store = os.path.join(prune_root, "hidx")
        coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        prev_coal = spark.conf.get(coalesce_key, "true")
        spark.conf.set("spark.sql.shuffle.partitions", str(64 * scale))
        spark.conf.set(coalesce_key, "false")
        try:
            inc.write_hamming_index(
                fp_df, "media_id", "fp", store, key_blocks=2
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            spark.conf.set(coalesce_key, prev_coal)
        # 12 corpus fingerprints spread across the id range (and thus
        # across the hashes store's range-clustered files)
        stride = max(1, n_docs_probe // 13)
        sample_ids = [i * stride for i in range(1, 13)]
        samples = (
            fp_df.filter(F.col("media_id").isin(sample_ids))
            .limit(12)
            .collect()
        )
        assert len(samples) == 12, "sample ids must exist in the corpus"
        inc.prune_stats_log.clear()
        kept_notes = []
        t0 = time.time()
        for b in range(3):
            batch = spark.createDataFrame(
                [
                    (10**12 + 10 * b + j, samples[4 * b + j].fp)
                    for j in range(4)
                ],
                "media_id long, fp long",
            )
            pairs = inc.incremental_hamming_pairs(
                batch, store, "media_id", "fp",
                max_hamming=2, key_blocks=2,
            )
            n_pairs = pairs.count()
            release_candidate_cache(pairs)
            assert n_pairs >= 4, "each batch fingerprint must pair"
            probe_recs = list(inc.prune_stats_log)[-2:]
            inc.prune_stats_log.clear()
            kept_notes.append(
                "+".join(
                    f"{r['kept']}/{r['files']}" for r in probe_recs
                )
            )
        timings["probe_prune_fixed_batches"] = round(time.time() - t0, 2)
        ANNOTATIONS["probe_prune_fixed_batches"] = (
            "kept/total buckets+hashes: " + " ".join(kept_notes)
        )
    finally:
        shutil.rmtree(prune_root, ignore_errors=True)

    # branch publication (r8 5th): seed a PK table with the FULL tiled
    # corpus (setup, untimed), then time CREATE BRANCH + a FIXED
    # 1000-row branch write + FAST FORWARD.  The row exists to prove
    # the publish path is O(branch delta) metadata: main grows 100x
    # underneath it, the timed work must not.
    import tempfile as _tf

    from fluss_datafusion_spark import EngineSession

    wap_root = _tf.mkdtemp(prefix="scale_branch_")
    try:
        eng = EngineSession(
            spark=spark, warehouse=os.path.join(wap_root, "wh")
        )
        eng.sql(
            "CREATE TABLE br_docs (doc_id BIGINT NOT NULL, text STRING,"
            " PRIMARY KEY (doc_id))"
        )
        eng.catalog.insert(
            "br_docs", docs.select("doc_id", "text")
        )  # untimed seed
        batch = docs.select("doc_id", "text").limit(1000).localCheckpoint()
        t0 = time.time()
        eng.sql("ALTER TABLE br_docs CREATE BRANCH pub")
        eng.catalog.insert("br_docs", batch, branch="pub")
        eng.sql("ALTER TABLE br_docs FAST FORWARD BRANCH pub")
        timings["branch_publish_fixed_batch"] = round(time.time() - t0, 2)
        eng.sql("DROP TABLE br_docs")
        # branch metadata aggregate through TOUCHED fork keys (r11):
        # seed a numeric PK table with the full tiled corpus, compact
        # (fork base live-only — setup, untimed), branch, upsert 10
        # EXISTING keys to a mid-range value (old values attain neither
        # manifest bound), then time count/min/max on the branch.  The
        # row exists to prove the statement is O(delta) metadata — it
        # must stay flat while the table under it grows 100x — and the
        # plan is asserted fast-path so a silent fall-through to the
        # scan cannot masquerade as a timing.
        eng.sql(
            "CREATE TABLE br_meta (doc_id BIGINT NOT NULL, x BIGINT,"
            " PRIMARY KEY (doc_id))"
        )
        eng.catalog.insert(
            "br_meta",
            docs.select("doc_id", F.length("text").cast("long").alias("x")),
        )  # untimed seed
        eng.catalog.compact("br_meta")  # untimed: fork base live-only
        lo, hi = eng.sql(
            "SELECT min(x) AS lo, max(x) AS hi FROM br_meta"
        ).collect()[0]
        mid = (lo + hi) // 2
        # touched keys whose OLD value attains neither bound: the
        # non-retraction proof then serves min/max from the manifest
        keys = [
            r.doc_id
            for r in eng.sql(
                f"SELECT doc_id FROM br_meta WHERE x > {lo} AND x < {hi}"
                " ORDER BY doc_id LIMIT 10"
            ).collect()
        ]
        assert keys, "tiled corpus must have interior-valued keys"
        vals = ", ".join(f"({k}, {mid})" for k in keys)
        t0 = time.time()
        eng.sql("ALTER TABLE br_meta CREATE BRANCH meta")
        eng.sql(f"INSERT INTO br_meta$branch('meta') VALUES {vals}")
        q = (
            "SELECT count(*) AS n, min(x) AS mn, max(x) AS mx"
            " FROM br_meta$branch('meta')"
        )
        row = eng.sql(q).collect()[0]
        timings["branch_meta_minmax_touched"] = round(time.time() - t0, 2)
        assert "metadata-only aggregate fast path" in (
            eng.sql(f"EXPLAIN {q}").collect()[0][0]
        ), "branch metadata row must be the fast path, not the scan"
        assert row.mn <= mid <= row.mx
        eng.sql("DROP TABLE br_meta")
    finally:
        shutil.rmtree(wap_root, ignore_errors=True)
    return timings


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scales", default="1,10,100")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    parser.add_argument("--out", default="SCALE.md")
    parser.add_argument(
        "--note",
        default="",
        help="round-specific caveat paragraph appended under the protocol",
    )
    args = parser.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from fluss_datafusion_spark.session import build_spark

    spark = build_spark(app_name="fluss-datafusion-spark-scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="scale_stress_")
    results = {}
    try:
        # warm the UDF/codegen paths once, uncharged
        _noop(spark.range(1000).selectExpr("sum(id) AS s"))
        for scale in scales:
            docs_path, emb_path = build_tiled(
                spark, args.sf_dir, scale, root
            )
            media_path = build_media(spark, docs_path, root, scale)
            scene_media_path = build_scene_media(
                spark, docs_path, root, scale
            )
            audio_media_path = build_audio_media(
                spark, docs_path, root, scale
            )
            n_docs = spark.read.parquet(docs_path).count()
            # in-row host-state probes (r10, VERDICT r9 item 2): the
            # bench probes ride each scale's row so a degraded host no
            # longer blocks regeneration — normalize by the contention
            # ratio instead of waiting for a clean VM
            from bench import probe_cpu_contention, probe_job_floor

            host = {
                "floor_ms": probe_job_floor(spark),
                "contention_before": probe_cpu_contention()["ratio"],
            }
            timings = run_ops(
                spark, docs_path, emb_path, media_path,
                scene_media_path, audio_media_path, scale=scale,
            )
            host["contention_after"] = probe_cpu_contention()["ratio"]
            notes = dict(ANNOTATIONS)
            ANNOTATIONS.clear()
            results[scale] = (n_docs, timings, host, notes)
            print(
                f"scale x{scale} ({n_docs} docs, host {host}): {timings}"
                + (f" notes={notes}" if notes else "")
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()

    ops = list(results[scales[0]][1])
    lines = [
        "# SCALE — tiled scale-stress evidence (tools/scale_stress.py)",
        "",
        "Protocol (r8, the single source of truth for scale numbers):",
        "this table is regenerated by `python tools/scale_stress.py` on a",
        "quiet VM, fresh session, at the end of any round that touches a",
        "measured op; any scale number quoted in ROADMAP/README must cite",
        "this table's round.  PySpark's per-call error-context capture is",
        "disabled by build_spark (~4 py4j round-trips per DataFrame call",
        "otherwise).",
    ]
    if args.note:
        lines += ["", args.note]
    lines += [
        "",
        f"Base: {args.sf_dir} documents/embeddings, tiled with disjoint",
        "shingle spaces per copy (outputs stay linear in the input).",
        "Wall seconds per op; `r(a->b)` = time ratio across a KxK input",
        "step — sublinear ratios mean fixed overhead still dominates,",
        "ratios beyond the step mean superlinear scaling (the failure",
        "this harness exists to catch).",
        "",
    ]
    header = "| op | " + " | ".join(
        f"x{s} ({results[s][0]} docs)" for s in scales
    )
    for a, b in zip(scales, scales[1:]):
        header += f" | r(x{a}->x{b}) vs {b // a}x"
    header += " |"
    lines.append(header)
    lines.append("|" + "---|" * (len(scales) + len(scales)))
    # host-state row: 1-task job floor + CPU contention ratio measured
    # around each scale's op set — the normalization context for every
    # wall above it (clean host: floor <= ~70 ms, ratio <= ~1.15)
    host_row = ["host floor/contention"] + [
        f"{results[s][2]['floor_ms']:.0f}ms"
        f" {results[s][2]['contention_before']:.2f}->"
        f"{results[s][2]['contention_after']:.2f}"
        for s in scales
    ] + ["" for _ in scales[1:]]
    lines.append("| " + " | ".join(host_row) + " |")
    for op in ops:
        row = [op] + [
            f"{results[s][1][op]:.2f}s"
            + (
                f" ({results[s][3][op]})"
                if op in results[s][3]
                else ""
            )
            for s in scales
        ]
        for a, b in zip(scales, scales[1:]):
            ta, tb = results[a][1][op], results[b][1][op]
            row.append(f"{tb / ta:.2f}x" if ta else "n/a")
        lines.append("| " + " | ".join(row) + " |")
    lines.append("")
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
