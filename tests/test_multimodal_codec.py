"""Pure-stdlib media codec: synthesis <-> parse roundtrip and checksum fold."""

import random

import pytest

from ocr_engine_spark.operators.multimodal import (
    checksum64, decode_media, make_bmp, make_wav,
)


def _loop_checksum(p: bytes) -> int:
    ck = 0
    for b in p[:64]:
        ck = (ck * 31 + b) % 1_000_000_007
    return ck


def test_checksum64_matches_reference_loop():
    rng = random.Random(3)
    for _ in range(300):
        p = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
        assert checksum64(p) == _loop_checksum(p)


@pytest.mark.parametrize("w,h", [(1, 1), (5, 3), (37, 23), (4, 7)])
def test_bmp_roundtrip(w, h):
    m = decode_media(make_bmp(w, h, fill=b"xyz"))
    assert (m["kind"], m["width"], m["height"], m["bpp"]) == ("bmp", w, h, 24)
    assert m["n_data_bytes"] == (w * 3 + 3) // 4 * 4 * h
    assert m["sample_rate"] is None


@pytest.mark.parametrize("rate,ch,n", [(8000, 1, 0), (11000, 2, 5), (12000, 2, 8)])
def test_wav_roundtrip(rate, ch, n):
    m = decode_media(make_wav(rate, ch, b"a" * n))
    block = ch * 2
    assert (m["kind"], m["sample_rate"], m["channels"], m["bits"]) == \
        ("wav", rate, ch, 16)
    assert m["n_data_bytes"] == -(-n // block) * block if n else m["n_data_bytes"] == 0
    assert m["width"] is None


def test_non_container_is_opaque():
    for p in (b"", b"BM", b"RIFFxxxx", b"hello world this is not a container!" * 3):
        m = decode_media(p)
        assert m["kind"] == "opaque"
        assert m["n_bytes"] == len(p)
        assert m["checksum"] == _loop_checksum(p)


def test_truncated_bmp_header_is_opaque():
    full = make_bmp(5, 5)
    assert decode_media(full[:53])["kind"] == "opaque"  # below header size


def test_spark_decode_table_roundtrip(spark):
    """The Spark mapInPandas decode stage parses the synthesized corpus."""
    import pandas as pd

    from ocr_engine_spark.operators.multimodal import (
        decode_media_table, synthesize_containers,
    )

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3], "text": ["alpha", "beta", "", "gamma delta"],
    }))
    got = {r["media_id"]: r.asDict()
           for r in decode_media_table(synthesize_containers(docs)).collect()}
    assert got[0]["kind"] == "bmp" and got[0]["width"] == 1
    assert got[2]["kind"] == "bmp" and got[2]["width"] == 3
    assert got[1]["kind"] == "wav" and got[1]["sample_rate"] == 9000
    assert got[3]["kind"] == "wav" and got[3]["channels"] == 2
