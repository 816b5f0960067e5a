"""Recognition-analogue unit tests (E9-E11, F7)."""

from ocr_engine_spark.kernel.normalize import recognize_batch, recognize_one


def test_placeholder_remap():
    # utils.py:17-19 — single-pass ✪ -> space
    text, _, _ = recognize_one("a✪b", "text", "✪", 0)
    assert text == "a b"


def test_entity_decode_html():
    text, _, _ = recognize_one("Tom &amp; Jerry&#x27;s", "html", "✪", 0)
    assert text == "Tom & Jerry's"


def test_markdown_inline_cleanup():
    text, _, _ = recognize_one("See [docs](http://x) and **bold** `code`", "markdown", "✪", 0)
    assert text == "See docs and bold code"


def test_json_unescape():
    text, _, _ = recognize_one('line\\u0041 and \\"quoted\\"', "json", "✪", 0)
    assert text == 'lineA and "quoted"'


def test_control_strip_and_ws_collapse():
    text, _, _ = recognize_one("a\x00b\x07  c\t\nd", "text", "✪", 0)
    assert text == "ab c d"


def test_token_cap_max_seq_len():
    # converter.py:127-152 — truncation at max_seq_len steps
    text, _, _ = recognize_one("one two three four five", "text", "✪", 3)
    assert text == "one two three"


def test_min_confidence_aggregation():
    # E10: conf = MIN over kept steps — one garbage token floors the span conf
    _, good, _ = recognize_one("clean words", "text", "✪", 0)
    _, bad, _ = recognize_one("clean @@@@", "text", "✪", 0)
    assert good == 1.0
    assert bad == 0.0


def test_numeric_rekind():
    assert recognize_one("$1,234.56", "text", "✪", 0)[2] == "num"
    assert recognize_one("2026-08-16", "text", "✪", 0)[2] == "num"
    assert recognize_one("12/31/2026", "text", "✪", 0)[2] == "num"
    assert recognize_one("8.25%", "text", "✪", 0)[2] == "num"
    assert recognize_one("word 42", "text", "✪", 0)[2] == "text"


def test_empty_batch_short_circuit():
    # ocr.py:120-121
    assert recognize_batch([], [], "✪", 0) == []


def test_blank_result():
    text, conf, _ = recognize_one("  \x00 ", "text", "✪", 0)
    assert text == "" and conf == 0.0
