"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with struct metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` kernels with the same
partitioning/batch-shape discipline as the text pipeline.  The actual codec step is
STUBBED (no image/audio libraries in this environment): ``decode_stub`` raises
NotImplementedError unless the deterministic fake is requested, while everything
Spark-side (schema, batching, UDF signature) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

from ocr_engine_spark.operators.relational import load

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("media_type", StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("first_byte", IntegerType()),
    StructField("checksum", LongType()),
])


def decode_stub(payload: bytes, media_type: str, fake: bool = True):
    """Codec boundary.  Real decode (PIL/ffmpeg/soundfile) is unavailable here; the
    deterministic fake exposes (n_bytes, first_byte, checksum) so the distributed
    plumbing is exercised end-to-end with verifiable values."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libs not present in this environment")
    n = len(payload)
    first = payload[0] if n else -1
    checksum = 0
    for b in payload[:64]:
        checksum = (checksum * 31 + b) % 1_000_000_007
    return n, first, checksum


def extract_media_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "media_type": [], "n_bytes": [],
                   "first_byte": [], "checksum": []}
            for mid, payload, mtype in zip(
                    pdf["media_id"], pdf["payload"], pdf["media_type"]):
                n, first, ck = decode_stub(bytes(payload or b""), mtype, fake=True)
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["n_bytes"].append(n)
                out["first_byte"].append(first)
                out["checksum"].append(ck)
            pdf_out = pd.DataFrame(out)
            pdf_out["first_byte"] = pdf_out["first_byte"].astype("int32")
            yield pdf_out

    return df.select("media_id", "payload", "media_type").mapInPandas(
        kernel, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("checksum", LongType()),
])


def sample_frames(df: DataFrame, frame_bytes: int = 256,
                  stride: int = 2) -> DataFrame:
    """Frame sampling over binary payloads: one output row per sampled frame
    (every ``stride``-th ``frame_bytes``-sized chunk) — the video frame-sample /
    audio-window plumbing, as a 1:N Arrow-batched flat map.  The decode step
    stays behind the same stub boundary as ``extract_media_features``; the
    deterministic chunk arithmetic makes the plumbing oracle-checkable."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "n_bytes": [], "checksum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                for idx in range(0, (len(raw) + frame_bytes - 1) // frame_bytes,
                                 stride):
                    chunk = raw[idx * frame_bytes:(idx + 1) * frame_bytes]
                    ck = 0
                    for b in chunk[:64]:
                        ck = (ck * 31 + b) % 1_000_000_007
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["n_bytes"].append(len(chunk))
                    out["checksum"].append(ck)
            pdf_out = pd.DataFrame(out)
            if len(pdf_out):
                pdf_out["frame_idx"] = pdf_out["frame_idx"].astype("int32")
            yield pdf_out

    return df.select("media_id", "payload").mapInPandas(
        kernel, schema=FRAME_SCHEMA)


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return sample_frames(media, frame_bytes=256, stride=2)


def q_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract query: documents.text encoded as UTF-8 binary payloads, pushed
    through the multimodal feature kernel.  Oracle-checkable because the fake features
    are pure byte arithmetic (octet_length / ascii / rolling checksum)."""
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )
    return extract_media_features(media).select(
        "media_id", "n_bytes", "first_byte", "checksum")
