"""Pin every `_R2_*` RE2 translation in kernel/pipeline.py to its CPython-`re`
original, pattern by pattern.

The end-to-end suites (goldens + test_fastpath_equiv) already compare whole
kernels; this module compares each translated pattern's *operation* (contains /
count / match / sub) directly against its `re` spelling on a corpus built to
poke the known divergence classes: non-ASCII perl classes (`\\w`/`\\d`/`\\s`
tables), multiline anchors, empty-match GlobalReplace semantics, unmatched
optional groups in rewrites, and the lookahead-free `_UNSAFE_AMP` count trick.
"""

from __future__ import annotations

import re

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_engine_spark.kernel import astr
from ocr_engine_spark.kernel import pipeline as P

# corpus: every structural edge the batch kernel routes on, plus the Unicode
# classes where RE2's own tables would diverge from CPython's
CORPUS = [
    "",
    "\n",
    "\n\n\n",
    "hello world",
    "hello\nworld\n",
    "  leading and trailing  \n\ttabbed\t\n",
    "> quoted line\n>> deeper\n> > spaced\nplain",
    ">\n> \n>>\n",
    "# heading\n- item\n1. numbered\n```\nfenced\n```",
    "[label](http://x) **bold** __u__ `code`",
    "<p>tag</p> text <a href='x'>link</a>",
    "&amp; &lt; &gt; &quot; &apos; &#39; &#x27; &unknown; & alone &&amp;",
    '{"k": "v", "n": 1}',
    "   \t  {\"json\": 1}",
    "  [starts with unicode space then bracket",
    "123,456.78 $1,234 2024-01-15 10:30:45 1/2/99 12%",
    "١٢٣ ٠١ ４５６ Ⅻ",  # Arabic-Indic, fullwidth digits: \d and \w edges
    "Ẽ́ combining, café, ＡＢＣ, ｶﾀｶﾅ, 漢字",
    "\x00ctrl\x08 \x0bvt\x1f \x7fdel\x9c",
    "word​zero-width (not \\s)",
    " ogham space line sep para sep　ideographic",
    "✪ placeholder ✪✪ runs",
    "ends with newline\n",
    "ends without",
    "> only quotes\n> every\n> line",
    "mixed \r\n was normalized upstream",
    "a" * 500 + "\n" + "b" * 10,
]

LINES = [ln for s in CORPUS for ln in s.split("\n")]


def _re_count(pat, xs):
    return np.array([len(pat.findall(s)) for s in xs], dtype=np.int64)


def _re_contains(pat, xs):
    return np.array([bool(pat.search(s)) for s in xs], dtype=bool)


def _re_match(pat, xs):
    return np.array([bool(pat.match(s)) for s in xs], dtype=bool)


def _re_sub(pat, rep, xs):
    return [pat.sub(rep, s) for s in xs]


CONTAINS_CASES = [
    (P._QUOTE_GATE, P._R2_QUOTE_GATE),
    (P._MD_GATE, P._R2_MD_GATE),
    (P._HTML_TAG, P._R2_HTML_TAG),
    (P._CTRL, P._R2_CTRL),
]

COUNT_CASES = [
    (P._NONBLANK_LINE, P._R2_NONBLANK_LINE),
    (P._NON_TEXTY, P._R2_NON_TEXTY),
]

SUB_CASES = [
    (P._QUOTE_ML, "", P._R2_QUOTE_ML, ""),
    (P._PREFIX_ONLY, r"\1", P._R2_PREFIX_ONLY, r"\1"),
    (P._CRLF, "\n", P._R2_CRLF, "\n"),
    (P._WS_RUN, " ", P._R2_WS_RUN, " "),
    (P._MD_LINK, r"\1", P._R2_MD_LINK, r"\1"),
    (P._MD_EMPH, "", P._R2_MD_EMPH, ""),
]

# `^`-anchored single-line patterns (run on exploded lines only)
LINE_SUB_CASES = [
    (P._MD_LEAD_STRIP, "", P._R2_MD_LEAD, ""),
]
LINE_MATCH_CASES = [
    (P._MD_FENCE_LINE, P._R2_MD_FENCE),
]


@pytest.mark.parametrize("rx,r2", CONTAINS_CASES)
def test_contains_translations(rx, r2):
    np.testing.assert_array_equal(
        astr.contains_re(CORPUS, r2), _re_contains(rx, CORPUS))


@pytest.mark.parametrize("rx,r2", COUNT_CASES)
def test_count_translations(rx, r2):
    np.testing.assert_array_equal(
        astr.count_re(CORPUS, r2), _re_count(rx, CORPUS))


@pytest.mark.parametrize("rx,rep,r2,rep2", SUB_CASES)
def test_sub_translations(rx, rep, r2, rep2):
    got = astr.npy(astr.replace_re(CORPUS, r2, rep2)).tolist()
    assert got == _re_sub(rx, rep, CORPUS)


@pytest.mark.parametrize("rx,rep,r2,rep2", LINE_SUB_CASES)
def test_line_sub_translations(rx, rep, r2, rep2):
    got = astr.npy(astr.replace_re(LINES, r2, rep2)).tolist()
    assert got == _re_sub(rx, rep, LINES)


@pytest.mark.parametrize("rx,r2", LINE_MATCH_CASES)
def test_line_match_translations(rx, r2):
    np.testing.assert_array_equal(
        astr.match_re(LINES, r2), _re_match(rx, LINES))


def test_numeric_match_on_collapsed_segments():
    # _R2_NUMERIC runs only on collapsed (newline-free) segments
    segs = [s for s in LINES if s] + [
        "123", "1,234.56", "$ 1,000", "€9", "-42%", "2024-01-15",
        "2024-01-15T10:30:45", "1/2/99", "12/31/2024", "1.2.3", "x123",
        "١٢٣", "１２３",  # non-ASCII \d: CPython says digit
    ]
    np.testing.assert_array_equal(
        astr.match_re(segs, P._R2_NUMERIC), _re_match(P._NUMERIC, segs))


def test_json_start_gate():
    want = np.array(
        [s.lstrip()[:1] in ("{", "[") for s in CORPUS], dtype=bool)
    np.testing.assert_array_equal(
        astr.contains_re(CORPUS, P._R2_JSON_START), want)


def test_unsafe_amp_count_trick():
    segs = [s for s in LINES if s] + [
        "&amp;", "&", "&&amp;", "&amp;&", "&lt;&gt;&quot;&apos;&#39;&#x27;",
        "&ampamp;", "&#390;", "a&b", "&amp;amp;",
    ]
    trick = astr.count_lit(segs, "&") > astr.count_re(segs, P._R2_SAFE_REF)
    want = np.array([bool(P._UNSAFE_AMP.search(s)) for s in segs], dtype=bool)
    np.testing.assert_array_equal(trick, want)


_TEXT = st.text(
    alphabet=st.characters(codec="utf-8"),
    max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_fuzz_multiline_subs(xs):
    for rx, rep, r2, rep2 in SUB_CASES:
        got = astr.npy(astr.replace_re(xs, r2, rep2)).tolist()
        assert got == _re_sub(rx, rep, xs), (rx.pattern,)
    for rx, r2 in CONTAINS_CASES:
        np.testing.assert_array_equal(
            astr.contains_re(xs, r2), _re_contains(rx, xs), err_msg=rx.pattern)
    for rx, r2 in COUNT_CASES:
        np.testing.assert_array_equal(
            astr.count_re(xs, r2), _re_count(rx, xs), err_msg=rx.pattern)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\n"),
    max_size=60), min_size=1, max_size=8))
def test_fuzz_line_level(xs):
    for rx, rep, r2, rep2 in LINE_SUB_CASES:
        got = astr.npy(astr.replace_re(xs, r2, rep2)).tolist()
        assert got == _re_sub(rx, rep, xs), (rx.pattern,)
    for rx, r2 in LINE_MATCH_CASES:
        np.testing.assert_array_equal(
            astr.match_re(xs, r2), _re_match(rx, xs), err_msg=rx.pattern)
    np.testing.assert_array_equal(
        astr.match_re(xs, P._R2_NUMERIC), _re_match(P._NUMERIC, xs))
