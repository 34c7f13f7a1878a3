"""Multimodal column handling: image/audio/video as opaque ``binary``
payloads plus a typed metadata struct.

The Spark-side plumbing (schema, partition-parallel mapInPandas, Arrow
batch shape) is real and tested; the actual media decoding is stubbed —
the decode libraries (PIL/ffmpeg/librosa) are not in this environment,
so ``decode_*`` raise NotImplementedError unless ``fake=True``, in which
case a deterministic fake derived from the payload bytes is produced
(stable for tests and oracles).

Design for 100 TB: payloads never leave the executors, batches flow
through Arrow (mapInPandas), and metadata-only queries never touch the
binary column at all (parquet column pruning).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a fake media payload so the
    binary-column plumbing is exercised end-to-end on the test corpus."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("application/octet-stream").alias("content_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Metadata-only pass: size + content hash, no decode.  Stays fully
    JVM-side (length/sha2 are built-ins) — this is the query shape that
    should never pay for decoding."""
    return media.select(
        "media_id",
        "content_type",
        F.octet_length("payload").alias("payload_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decoded_ok", T.BooleanType()),
    ]
)


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    With fake=True a deterministic per-payload feature is computed from
    the raw bytes (byte histogram moments) — the real decoder would slot
    into `_decode` unchanged.  Batch shape, schema, and partitioning are
    the production ones.
    """

    def _decode(payload: bytes) -> list:
        if not fake:
            raise NotImplementedError(
                "media decoding requires PIL/ffmpeg, not available in this build"
            )
        if payload is None:
            return None
        # Deterministic fake: moments of the byte distribution, fixed dim.
        n = len(payload) or 1
        out = []
        for i in range(dim):
            s = sum(payload[j] for j in range(i, len(payload), dim)) if payload else 0
            out.append(float(s % 1000) / 1000.0 + float(n % 97) / 97.0)
        return out

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decoded_ok": feats.notna(),
                }
            )

    return media.select("media_id", "payload").mapInPandas(_map, _FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    using the metadata duration — demonstrates explode-based fan-out
    without decoding.  Real frame extraction would replace the payload
    passthrough inside mapInPandas."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
