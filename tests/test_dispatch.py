"""S1 payload-kind dispatch (declared tool-JSON payloads skip content sniffing
and the E4 vote — the ImageReader.read declared-kind analogue,
/root/reference/src/utils.py:179-188; permissive fallback per S4)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ocr_engine_spark.config import DEFAULT_CONFIG
from ocr_engine_spark.kernel.pipeline import extract_frame, extract_turn

PAYLOADS = [
    '{"result": "hello world"}',            # valid tool-JSON (the contract case)
    '{"a": "<p>one two</p>", "b": "<p>three four</p>"}',  # vote != dispatch
    '[1, 2]\nwords here\nmore words',       # invalid JSON -> plain fallback
    '{"a": 1}',                             # numeric-only JSON
    "plain words only",                     # declared json but not JSON at all
    '{"md": "- item [x](y) **b**"}',        # markdown triggers inside values
    '{"esc": "line\\nbreak tab\\there"}',   # escape decode on the declared path
    "",                                     # empty payload
    '{"ws": "   "}',                        # whitespace-only value drops (F7)
]


def test_declared_json_wins_without_vote():
    """A valid JSON payload whose content the E4 vote would give to the HTML
    parser must stay on the JSON path when the kind is declared."""
    p = '{"a": "<p>one two</p>", "b": "<p>three four</p>"}'
    assert extract_turn(p)["fmt"] == "html"  # the content vote's pick
    r = extract_turn(p, declared_kind="json")
    assert r["fmt"] == "json"
    assert r["extracted_text"] == "<p>one two</p> <p>three four</p>"


def test_declared_json_invalid_falls_back_to_plain():
    """Declared parser rejecting the payload -> permissive plain fallback
    (S4 skip-bad), not a failure."""
    r = extract_turn("[1, 2]\nwords here\nmore words", declared_kind="json")
    assert r["fmt"] == "plain"
    assert r["extracted_text"] == "[1, 2]\nwords here\nmore words"


def _frame(texts, declared):
    return pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(len(texts))],
        "turn_idx": np.arange(len(texts), dtype="int32"),
        "text": texts,
        "payload_kind": ["json" if d else None for d in declared],
    })


def _assert_batch_matches_per_turn(cfg):
    texts = PAYLOADS * 2
    declared = [True] * len(PAYLOADS) + [False] * len(PAYLOADS)
    out = extract_frame(_frame(texts, declared), cfg)
    for i, (t, d) in enumerate(zip(texts, declared)):
        want = extract_turn(t, cfg, "json" if d else None)
        row = out.iloc[i]
        assert row["extracted_text"] == want["extracted_text"], (i, t)
        assert row["fmt"] == want["fmt"], (i, t)
        assert list(row["spans"]) == want["spans"], (i, t)
        assert float(row["strip_ratio"]) == want["strip_ratio"], (i, t)


def test_batch_dispatch_matches_per_turn_default_config():
    _assert_batch_matches_per_turn(DEFAULT_CONFIG)


def test_batch_dispatch_matches_per_turn_non_vectorized_config():
    # nonzero margins disable every closed form -> the per-turn loop must
    # still honor the declared kind
    _assert_batch_matches_per_turn(
        DEFAULT_CONFIG.override(extend_span_start=0.1, extend_span_end=0.05))


def test_missing_payload_kind_column_means_no_dispatch():
    pdf = _frame(PAYLOADS, [False] * len(PAYLOADS)).drop(columns=["payload_kind"])
    out = extract_frame(pdf)
    for i, t in enumerate(PAYLOADS):
        assert out.iloc[i]["fmt"] == extract_turn(t)["fmt"]


def test_unknown_declared_kind_falls_back_to_content_vote():
    """An UNKNOWN declared kind (future payload enum, upstream typo) is a bad
    declaration, not a bad row: S4 permissive semantics say fall through to
    the content vote, never raise and kill the batch."""
    p = '{"a": "<p>one two</p>", "b": "<p>three four</p>"}'
    r = extract_turn(p, declared_kind="tool_json")
    assert r["fmt"] == extract_turn(p)["fmt"]  # same as the undeclared vote
    assert r["extracted_text"] == extract_turn(p)["extracted_text"]


# ---------------------------------------------------------------------------
# declared kinds beyond JSON (html / markdown / plain) — full S1 polymorphism


KIND_CASES = [
    # (payload, declared_kind) — chosen so several rows' dispatch result
    # DIFFERS from the content vote (the bypass is observable, not vacuous)
    ("- item one\n- item two", "plain"),          # vote: markdown; forced plain
    ("# head\nplain body line", "markdown"),      # tie case, forced anyway
    ("- a\n```\nfenced body line\n```", "markdown"),  # vote: plain (2>1); forced md
    ("<p>one two</p><p>three four</p>", "html"),  # vote would also pick html
    ('{"a": "<p>one</p>", "b": "x y", "c": "y z", "d": "z w"}', "html"),
    #                                          ^ vote: json (4>3); forced html
    ("no markers at all here", "markdown"),       # parser rejects -> plain fallback
    ("no tags at all here", "html"),              # parser rejects -> plain fallback
    ("plain stays plain", "plain"),
    ('{"result": "hello"}', "plain"),             # vote: json; forced plain
    ("<p>tagged</p> content", "plain"),           # tag penalty path (slow-path safe gate)
    ("- md [x](y) **bold**", "yamlish"),          # unknown kind -> content vote
    ("", "markdown"),                             # empty payload
]


def _kind_frame(cases):
    return pd.DataFrame({
        "conv_id": [f"k{i}" for i in range(len(cases))],
        "turn_idx": np.arange(len(cases), dtype="int32"),
        "text": [c[0] for c in cases],
        "payload_kind": [c[1] for c in cases],
    })


def _assert_kind_batch_matches(cfg):
    out = extract_frame(_kind_frame(KIND_CASES), cfg)
    for i, (t, d) in enumerate(KIND_CASES):
        want = extract_turn(t, cfg, d)
        row = out.iloc[i]
        assert row["fmt"] == want["fmt"], (i, t, d, row["fmt"], want["fmt"])
        assert row["extracted_text"] == want["extracted_text"], (i, t, d)
        assert list(row["spans"]) == want["spans"], (i, t, d)
        assert float(row["strip_ratio"]) == want["strip_ratio"], (i, t, d)


def test_declared_kind_batch_matches_per_turn_default_config():
    _assert_kind_batch_matches(DEFAULT_CONFIG)


def test_declared_kind_batch_matches_per_turn_non_vectorized_config():
    _assert_kind_batch_matches(
        DEFAULT_CONFIG.override(extend_span_start=0.1, extend_span_end=0.05))


def test_declared_plain_keeps_markers_declared_md_drops_them():
    """The observable bypass: identical payload, three declared kinds, three
    different parses — marker kept (plain), marker stripped (markdown),
    content vote (undeclared -> markdown wins on the marker)."""
    p = "- item one"
    assert extract_turn(p, declared_kind="plain")["extracted_text"] == "- item one"
    assert extract_turn(p, declared_kind="markdown")["extracted_text"] == "item one"
    assert extract_turn(p)["fmt"] == "markdown"


def test_declared_md_overrides_plain_vote_win():
    """Fenced payload: plain finds 2 passing spans, markdown only 1 — the
    vote picks plain, but the declaration must force markdown."""
    p = "- a\n```\nfenced body line\n```"
    assert extract_turn(p)["fmt"] == "plain"
    r = extract_turn(p, declared_kind="markdown")
    assert r["fmt"] == "markdown"
    assert r["extracted_text"] == "a"


def test_declared_html_on_json_payload():
    """A '{'-starting payload the vote gives to JSON (4 value spans > 3 html
    runs) declared html must run the HTML parser instead — the tag inside the
    JSON string is real markup to it."""
    p = '{"a": "<p>one</p>", "b": "x y", "c": "y z", "d": "z w"}'
    assert extract_turn(p)["fmt"] == "json"
    r = extract_turn(p, declared_kind="html")
    assert r["fmt"] == "html"
    assert "one" in r["extracted_text"]
