"""End-to-end kernel pipeline tests: golden byte-equality + edge-case checklist
(FIXTURES.md §5)."""

import json

import pandas as pd
import pytest

from ocr_engine_spark.config import DEFAULT_CONFIG
from ocr_engine_spark.kernel.pipeline import extract_frame, extract_turn
from ocr_engine_spark.kernel.tsv import spans_to_tsv, tsv_to_spans
from ocr_engine_spark.sources.transcripts import generate_transcripts


def test_golden_byte_equality(golden_turns):
    """The oracle kernel reproduces the frozen fixtures byte-for-byte under stable
    (conv_id, turn_idx) ordering — the north_rule invariant."""
    df = generate_transcripts(40, seed=13, whale_factor=4)
    assert len(df) == len(golden_turns)
    for row, want in zip(df.itertuples(index=False), golden_turns):
        assert (row.conv_id, int(row.turn_idx)) == (want["conv_id"], want["turn_idx"])
        got = extract_turn(row.text)
        assert got["extracted_text"] == want["extracted_text"], (row.conv_id, row.turn_idx)
        assert got["n_spans"] == want["n_spans"]
        assert got["spans"] == want["spans"]
        assert got["strip_ratio"] == pytest.approx(want["strip_ratio"])


def test_empty_and_blank_turns():
    for payload in ["", "   ", "\n\n", "\t \n"]:
        r = extract_turn(payload)
        assert r["extracted_text"] == ""
        assert r["spans"] == [] and r["n_spans"] == 0
        assert r["strip_ratio"] == 0.0
    assert extract_turn("\n\n")["is_blank"] is True


def test_zero_span_turn():
    r = extract_turn("@@@@ #### $$$$")  # every candidate fails the score threshold
    assert r["n_spans"] == 0 and r["extracted_text"] == ""


def test_truncation_cap_applies():
    cfg = DEFAULT_CONFIG.override(max_chars=10)
    r = extract_turn("0123456789 this tail is cut off", cfg)
    assert all(s["end"] <= 10 for s in r["spans"])


def test_unknown_config_key_raises():
    with pytest.raises(ValueError):
        DEFAULT_CONFIG.override(no_such_setting=1)


def test_margin_extension_clamps_at_bounds():
    # spans that extend past payload bounds after margin extension (E6-E8, F4)
    cfg = DEFAULT_CONFIG.override(extend_span_start=0.5, extend_span_end=0.5)
    text = "only words"
    r = extract_turn(text, cfg)
    assert r["n_spans"] == 1
    assert r["spans"][0]["start"] == 0 and r["spans"][0]["end"] == len(text)


def test_spans_within_bounds_and_reading_order():
    text = "# title\n- second item\n- third item"
    r = extract_turn(text)
    spans = r["spans"]
    assert all(0 <= s["start"] < s["end"] <= len(text) for s in spans)
    assert spans == sorted(spans, key=lambda s: s["start"])
    assert r["extracted_text"] == "title\nsecond item\nthird item"


def test_crlf_and_unicode():
    r = extract_turn("Nguyễn xin chào\r\nphở ✪ngon✪ 🚀")
    assert "Nguyễn xin chào" in r["extracted_text"]
    assert "✪" not in r["extracted_text"]  # placeholder remapped to space
    assert "🚀" in r["extracted_text"]


def test_strip_ratio_definition():
    text = "<p>abc</p>"
    r = extract_turn(text)
    assert r["extracted_text"] == "abc"
    assert r["strip_ratio"] == pytest.approx(1 - 3 / len(text))


def test_extract_frame_empty_batch():
    out = extract_frame(pd.DataFrame({"conv_id": [], "turn_idx": [], "text": []}))
    assert len(out) == 0
    assert list(out.columns)[:4] == ["conv_id", "turn_idx", "extracted_text", "spans"]


def test_tsv_roundtrip(golden_turns):
    for rec in golden_turns[:50]:
        if not rec["spans"]:
            continue
        payload = spans_to_tsv(rec["spans"])
        back = tsv_to_spans(payload)
        want = [
            {k: s[k] for k in ("start", "end", "kind", "text")}
            for s in rec["spans"] if s["text"] and s["text"] != " "
        ]
        assert back == want


def test_fixture_mix_covers_all_formats(golden_turns):
    fmts = {r["fmt"] for r in golden_turns}
    assert {"html", "markdown", "json", "plain"} <= fmts
