"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; the Spark-side plumbing (schema, partition-friendly
layout, Arrow batch shape, mapInPandas signatures) is real and tested.
The actual codec decode (JPEG/PNG/audio frames) is STUBBED — the sandbox
has no imaging/audio libraries — behind ``NotImplementedError`` with a
deterministic byte-level featurizer standing in, so downstream stages
(dedup by content hash, feature tables, batch shapes) exercise end-to-end.

Layout guidance at scale: binary payloads dominate bytes — keep them in
their own parquet files (one row group per few hundred MB), metadata +
features in separate narrow tables joined by content hash, so analytic
scans never read the blobs (column pruning does the rest).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lucene_spark.pipeline.hashes import h60

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

_MAGIC = {
    b"\xff\xd8\xff": "image/jpeg",
    b"\x89PNG": "image/png",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
    b"OggS": "audio/ogg",
    b"\x1aE\xdf\xa3": "video/webm",
}


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real deployments plug Pillow/libjpeg here (pixels as HxWxC
    uint8).  The sandbox ships no imaging libraries."""
    raise NotImplementedError(
        "image decode requires an imaging library; use byte_features() for "
        "the deterministic stand-in feature path"
    )


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """STUB: real deployments plug soundfile/ffmpeg here (PCM frames)."""
    raise NotImplementedError("audio decode requires an audio library")


def sniff_mime(payload: bytes) -> str:
    """Magic-byte MIME sniffing (real, deterministic)."""
    for magic, mime in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


def binary_stats(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(media_id, n_bytes, payload_hash) — pure JVM expressions; the content
    hash is the exact-dedup key for blobs."""
    p = F.col(payload_col)
    return media.select(
        "media_id",
        F.length(p).cast("long").alias("n_bytes"),
        h60(p).alias("payload_hash"),
    )


def binary_stats_sql(media_rel: str) -> str:
    # DuckDB's md5() takes VARCHAR only; the oracle derivation's payloads
    # are utf-8 text bytes, so decode() recovers the identical byte string
    from lucene_spark.pipeline.hashes import h60_sql

    return f"""
SELECT media_id, CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       {h60_sql("decode(payload)")} AS payload_hash
FROM {media_rel}"""


N_BYTE_FEATURES = 16


def byte_features(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(media_id, features: array<double>) — deterministic 16-dim byte-level
    features (16-bin byte histogram, L1-normalized) via Arrow-batched
    mapInPandas.  This is the stand-in for the decode->featurize stage: the
    batch shape, schema, and partitioning are exactly what a real
    image/audio featurizer uses; swap the numpy body for a codec + model."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * N_BYTE_FEATURES)
                    continue
                hist = np.bincount(arr >> 4, minlength=N_BYTE_FEATURES).astype(
                    np.float64
                )
                feats.append((hist / arr.size).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.select("media_id", payload_col).mapInPandas(
        featurize, schema="media_id long, features array<double>"
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents corpus (utf-8
    text bytes as the opaque payload) — exercises the binary plumbing
    without external data; same derivation is expressible in SQL."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
