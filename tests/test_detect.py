"""Detection / format-vote / NMS unit tests (E3/E4, F2/F3, O3)."""

from ocr_engine_spark.kernel.detect import (
    detect_spans, nms_spans, parse_html, parse_json, parse_markdown, parse_plain,
)


def test_html_strips_boilerplate_blocks():
    text = ("<html><script>var x=1;</script><style>.a{}</style>"
            "<nav>Home | About</nav><p>real content here</p>"
            "<footer>copyright</footer></html>")
    spans = parse_html(text)
    got = [text[s:e] for s, e, _, _ in spans]
    assert got == ["real content here"]


def test_html_link_zone_penalty():
    text = '<p>body text</p><a href="/x">click me now please ok</a>'
    spans = parse_html(text)
    by_text = {text[s:e]: conf for s, e, _, conf in spans}
    assert by_text["body text"] > by_text["click me now please ok"]


def test_html_not_applicable_without_tags():
    assert parse_html("no tags at all") is None


def test_markdown_marker_stripping_and_fences():
    text = "# Title here\n- item one\n```\ncode noise\n```\nplain tail"
    spans = parse_markdown(text)
    got = [text[s:e] for s, e, _, _ in spans]
    assert got == ["Title here", "item one", "plain tail"]


def test_json_value_spans_not_keys():
    text = '{"key": "the value", "n": 42, "arr": ["elem"]}'
    spans = parse_json(text)
    got = [(text[s:e], kind) for s, e, kind, _ in spans]
    assert ("the value", "json") in got
    assert ("42", "num") in got
    assert ("elem", "json") in got
    assert all(t != "key" for t, _ in got)


def test_json_numbers_inside_strings_not_doublecounted():
    text = '{"a": "has 42 inside"}'
    spans = parse_json(text)
    assert [(s, e) for s, e, k, _ in spans if k == "num"] == []


def test_plain_spans_per_line_trimmed():
    text = "  first line  \n\n second "
    spans = parse_plain(text)
    got = [text[s:e] for s, e, _, _ in spans]
    assert got == ["first line", "second"]


def test_format_vote_picks_right_parser():
    html = "<div><p>alpha beta</p><p>gamma delta</p><p>eps zeta</p></div>"
    md = "# head\n- one two three\n- four five six"
    js = '{"a": "x y z", "b": "p q r"}'
    plain = "just a line\nand another"
    assert detect_spans(html, 0.3, 0.1)[0] == "html"
    assert detect_spans(md, 0.3, 0.1)[0] == "markdown"
    assert detect_spans(js, 0.3, 0.1)[0] == "json"
    assert detect_spans(plain, 0.3, 0.1)[0] == "plain"


def test_vote_tie_keeps_first_parser():
    # markdown and plain both yield exactly one span -> markdown (earlier in the
    # fixed order) must win, mirroring the reference's first-best rotation
    # (externals/sdsvtd/sdsvtd/model.py:136-150)
    fmt, _ = detect_spans("# only a heading", 0.3, 0.1)
    assert fmt == "markdown"


def test_score_threshold_filters():
    # F2: a pure-symbol line scores 0 texty confidence and is dropped at score_thr
    fmt, spans = detect_spans("good words here\n@@@@####$$$$", 0.3, 0.1)
    assert fmt == "plain"
    assert len(spans) == 1
    assert spans[0][:2] == (0, 15)


def test_nms_keeps_highest_then_first_on_tie():
    spans = [(0, 10, "a", 0.5), (2, 10, "b", 0.9), (100, 110, "c", 0.5)]
    kept = nms_spans(spans, 0.1)
    assert [k[2] for k in kept] == ["b", "c"]
    # exact tie on disjoint spans: both kept, position-sorted
    spans = [(0, 10, "a", 0.5), (0, 10, "b", 0.5)]
    kept = nms_spans(spans, 0.1)
    assert [k[2] for k in kept] == ["a"]  # first-come wins the tie


def test_nms_empty():
    assert nms_spans([], 0.1) == []
