"""Property-based invariants (SURVEY.md §5.2 item 3)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_engine_spark.kernel.canonicalize import canonicalize
from ocr_engine_spark.kernel.detect import nms_spans
from ocr_engine_spark.kernel.pipeline import extract_turn
from ocr_engine_spark.kernel.spans import interval_iou

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=60, deadline=None)
@given(texts)
def test_extract_total_function(t):
    """The pipeline never raises and always returns a well-formed row."""
    r = extract_turn(t)
    canon_len = len(canonicalize(t, 0).replace("\r\n", "\n"))
    assert isinstance(r["extracted_text"], str)
    assert r["n_spans"] == len(r["spans"])
    for s in r["spans"]:
        assert 0 <= s["start"] < s["end"]
        assert s["end"] <= canon_len + 1
    assert 0.0 <= r["strip_ratio"] <= 1.0 or r["strip_ratio"] < 0  # can be <0 when
    # normalization expands entities; never NaN
    assert r["strip_ratio"] == r["strip_ratio"]


@settings(max_examples=60, deadline=None)
@given(texts)
def test_canonicalize_idempotent(t):
    once = canonicalize(t, 1000)
    assert canonicalize(once, 1000) == once


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 300), st.integers(1, 40), st.floats(0.3, 1.0)),
        max_size=25,
    )
)
def test_nms_survivors_nonoverlapping(items):
    spans = [(s, s + ln, "text", conf) for s, ln, conf in items]
    kept = nms_spans(spans, 0.1)
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            a, b = kept[i], kept[j]
            assert interval_iou(a[0], a[1], b[0], b[1]) <= 0.1
    # survivors are position-sorted
    assert kept == sorted(kept, key=lambda s: (s[0], s[1]))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.sampled_from("abc def ghi jkl mno".split()), min_size=1, max_size=30))
def test_plain_prose_extraction_is_ws_collapse(words):
    """For single-line plain prose the whole pipeline reduces to trim+collapse."""
    t = " ".join(words)
    r = extract_turn(t)
    assert r["extracted_text"] == t
    assert r["fmt"] == "plain"
    assert r["n_spans"] == 1
