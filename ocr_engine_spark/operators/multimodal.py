"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with struct metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` kernels with the same
partitioning/batch-shape discipline as the text pipeline.

The codec boundary is REAL (pure stdlib): ``decode_media`` parses BMP headers
(width/height/bpp/pixel bytes) and walks RIFF/WAVE chunks (sample rate, channels,
bit depth, data bytes); anything else degrades to the generic byte features.
``make_bmp``/``make_wav`` synthesize valid containers so the decode path is
exercised end-to-end with verifiable values (q_media_decode's oracle recomputes
the construction parameters from the source columns — a true encode/decode
roundtrip check).  Heavyweight codecs (JPEG/PNG/MP4) remain out of scope for
this environment and would slot in behind the same ``decode_media`` boundary.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
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

_P = 1_000_000_007
# 31^j mod p for j < 64: the rolling checksum acc after bytes b0..b{k-1} equals
# sum(b_i * 31^(k-1-i)) mod p, so a 64-term numpy dot replaces the per-byte loop;
# terms stay < 255 * p and the 64-term sum < 2^54, well inside int64.
_POW31 = np.empty(64, dtype=np.int64)
_acc = 1
for _j in range(64):
    _POW31[_j] = _acc
    _acc = (_acc * 31) % _P


def checksum64(payload: bytes) -> int:
    """Rolling (base-31 mod 1e9+7) checksum of the first 64 bytes, numpy-folded."""
    b = np.frombuffer(payload[:64], dtype=np.uint8).astype(np.int64)
    k = len(b)
    if k == 0:
        return 0
    return int((b * _POW31[k - 1::-1]).sum() % _P)


# ---------------------------------------------------------------------------
# codec: pure-stdlib container synthesis + parse


def make_bmp(width: int, height: int, fill: bytes = b"") -> bytes:
    """A valid 24-bit BITMAPINFOHEADER BMP; pixel rows are 4-byte aligned and
    filled from ``fill`` cycled (content is irrelevant to the metadata path)."""
    row = (width * 3 + 3) // 4 * 4
    n_px = row * height
    if fill:
        reps = -(-n_px // len(fill))
        px = (fill * reps)[:n_px]
    else:
        px = bytes(n_px)
    header = b"BM" + struct.pack("<IHHI", 54 + n_px, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, n_px,
                       2835, 2835, 0, 0)
    return header + info + px


def make_wav(sample_rate: int, channels: int, data: bytes,
             bits: int = 16) -> bytes:
    """A valid RIFF/WAVE PCM file; ``data`` is zero-padded up to the block align
    (channels * bits/8) like a real encoder would."""
    block = channels * bits // 8
    pad = (-len(data)) % block
    data = data + bytes(pad)
    byterate = sample_rate * block
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byterate, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_media(payload: bytes) -> dict:
    """Parse a binary container's typed metadata (BMP / WAV; else 'opaque').

    The graft of the reference's image-decode entry (PIL open + EXIF transpose,
    /root/reference/src/utils.py:118-131) re-expressed as header/chunk parsing —
    no third-party codec libraries, real format validation."""
    n = len(payload)
    meta = {
        "kind": "opaque", "n_bytes": n,
        "first_byte": payload[0] if n else -1,
        "checksum": checksum64(payload),
        "width": None, "height": None, "bpp": None,
        "sample_rate": None, "channels": None, "bits": None,
        "n_data_bytes": None,
    }
    if n >= 54 and payload[:2] == b"BM":
        _size, _r1, _r2, offset = struct.unpack_from("<IHHI", payload, 2)
        hdr_size, width, height, planes, bpp = struct.unpack_from(
            "<IiiHH", payload, 14)
        if hdr_size >= 40 and planes == 1 and 0 < offset <= n:
            meta.update(kind="bmp", width=width, height=abs(height), bpp=bpp,
                        n_data_bytes=n - offset)
    elif n >= 44 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos = 12
        rate = ch = bits = data_len = None
        while pos + 8 <= n:  # RIFF chunk walk (chunks are word-aligned)
            cid, clen = struct.unpack_from("<4sI", payload, pos)
            if cid == b"fmt " and pos + 24 <= n:
                _fmt, ch, rate, _br, _ba, bits = struct.unpack_from(
                    "<HHIIHH", payload, pos + 8)
            elif cid == b"data":
                data_len = clen
            pos += 8 + clen + (clen & 1)
        if rate and data_len is not None:
            meta.update(kind="wav", sample_rate=rate, channels=ch, bits=bits,
                        n_data_bytes=data_len)
    return meta


def extract_media_features(df: DataFrame) -> DataFrame:
    """Arrow-batched generic feature extraction over binary payloads."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "media_type": [], "n_bytes": [],
                   "first_byte": [], "checksum": []}
            for mid, payload, mtype in zip(
                    pdf["media_id"], pdf["payload"], pdf["media_type"]):
                raw = bytes(payload or b"")
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["n_bytes"].append(len(raw))
                out["first_byte"].append(raw[0] if raw else -1)
                out["checksum"].append(checksum64(raw))
            pdf_out = pd.DataFrame(out)
            pdf_out["first_byte"] = pdf_out["first_byte"].astype("int32")
            yield pdf_out

    return df.select("media_id", "payload", "media_type").mapInPandas(
        kernel, schema=FEATURE_SCHEMA)


DECODE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("bpp", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("bits", IntegerType()),
    StructField("n_data_bytes", LongType()),
])


def decode_media_table(df: DataFrame) -> DataFrame:
    """Typed-metadata decode over a binary media table (mapInPandas)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DECODE_SCHEMA.fields]
        for pdf in batches:
            out = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                m = decode_media(bytes(payload or b""))
                out["media_id"].append(mid)
                for c in cols[1:]:
                    out[c].append(m.get(c))
            o = pd.DataFrame(out)
            for c in ("width", "height", "bpp", "sample_rate", "channels", "bits"):
                o[c] = o[c].astype("Int32")
            o["n_data_bytes"] = o["n_data_bytes"].astype("Int64")
            yield o

    return df.select("media_id", "payload").mapInPandas(
        kernel, schema=DECODE_SCHEMA)


def synthesize_containers(docs: DataFrame) -> DataFrame:
    """Deterministic media corpus from (doc_id, text): even ids become 24-bit
    BMPs sized by the id, odd ids become PCM WAVs whose data is the text bytes —
    the encode side of the roundtrip the decode oracle checks."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "media_type": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                raw = (text or "").encode("utf-8")
                if did % 2 == 0:
                    payload = make_bmp(1 + did % 37, 1 + did % 23, fill=raw)
                    mtype = "image/bmp"
                else:
                    payload = make_wav(8000 + 1000 * (did % 5), 1 + did % 2, raw)
                    mtype = "audio/wav"
                out["media_id"].append(did)
                out["payload"].append(payload)
                out["media_type"].append(mtype)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(kernel, schema=MEDIA_SCHEMA)


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode -> decode roundtrip over real containers: synthesize a BMP/WAV per
    document, parse it back with the stdlib codec, and emit the typed metadata.
    The oracle recomputes every field from (doc_id, text) via the construction
    formulas — a wrong header layout, chunk walk, or padding rule breaks the
    value hash."""
    docs = load(spark, sf_dir, "documents")
    return decode_media_table(synthesize_containers(docs))


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
    audio-window plumbing, as a 1:N Arrow-batched flat map with deterministic,
    oracle-checkable chunk arithmetic."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "n_bytes": [], "checksum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                for idx in range(0, (len(raw) + frame_bytes - 1) // frame_bytes,
                                 stride):
                    chunk = raw[idx * frame_bytes:(idx + 1) * frame_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["n_bytes"].append(len(chunk))
                    out["checksum"].append(checksum64(chunk))
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
    through the multimodal feature kernel.  Oracle-checkable because the generic
    features are pure byte arithmetic (octet_length / ascii / rolling checksum)."""
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )
    return extract_media_features(media).select(
        "media_id", "n_bytes", "first_byte", "checksum")
