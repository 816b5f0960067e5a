"""Permissive JSONL ingestion: bad rows quarantine, the job never fails (S2/S4)."""

import json

import pytest

from ocr_engine_spark.sources.jsonl import read_transcripts_jsonl, split_quarantine

GOOD = [
    {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello world",
     "tool": None, "ts": "2026-01-01T00:00:00.000Z"},
    {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "",
     "tool": None, "ts": "2026-01-01T00:00:30.000Z"},  # blank text stays good (F5)
    {"conv_id": "c2", "turn_idx": 0, "role": "tool", "text": "{\"a\": 1}",
     "tool": "search", "ts": "2026-01-01T01:00:00.000Z"},
]
BAD_MALFORMED = '{"conv_id": "c3", "turn_idx": 0, "text": "trunca'
BAD_MISSING_KEY = {"role": "user", "text": "no ids here"}


@pytest.fixture(scope="module")
def jsonl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "tx.jsonl"
    lines = [json.dumps(r) for r in GOOD[:2]] + [BAD_MALFORMED] \
        + [json.dumps(GOOD[2]), json.dumps(BAD_MISSING_KEY)]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_split_quarantine(spark, jsonl_path):
    df = read_transcripts_jsonl(spark, jsonl_path)
    good, quarantined = split_quarantine(df)
    assert good.count() == 3
    q = {r["reason"] for r in quarantined.collect()}
    assert quarantined.count() == 2 and q == {"malformed", "missing_key"}
    # the malformed raw line is preserved as evidence
    raws = [r["_corrupt_record"] for r in quarantined.collect()
            if r["reason"] == "malformed"]
    assert raws == [BAD_MALFORMED]


def test_good_rows_extract(spark, jsonl_path):
    from ocr_engine_spark.operators.extract import extract_transcripts

    good, _ = split_quarantine(read_transcripts_jsonl(spark, jsonl_path))
    out = extract_transcripts(good).orderBy("conv_id", "turn_idx").collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in out] == \
        [("c1", 0), ("c1", 1), ("c2", 0)]
    assert out[0]["extracted_text"] == "hello world"
    assert out[1]["is_blank"] is True and out[1]["n_spans"] == 0
