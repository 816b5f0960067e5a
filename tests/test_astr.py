"""astr (Arrow string ops) == pandas/re semantics, exhaustively and by fuzz.

The batch kernel's byte-equality contract rides on these helpers, so the
class-translation claims are re-proven here on every run:

- the generated ``_uniclasses`` bodies equal the RUNNING interpreter's
  ``\\w``/``\\d``/``\\s`` over every codepoint (catches Python-upgrade drift);
- each helper equals its pandas ``.str`` spelling on hostile inputs
  (astral plane, combining marks, all Unicode whitespace, empties).
"""

import re

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_engine_spark.kernel import astr
from ocr_engine_spark.kernel._uniclasses import (
    D_BODY, S_BODY, SPACE_CHARS, W_BODY,
)

ALL_CP = [chr(c) for c in range(0x110000) if not (0xD800 <= c < 0xE000)]


@pytest.mark.parametrize("body,pat", [
    (W_BODY, r"\w"), (D_BODY, r"\d"), (S_BODY, r"\s"),
])
def test_class_bodies_exhaustive(body, pat):
    rx = re.compile(pat)
    got = astr.count_re(ALL_CP, f"[{body}]") > 0
    want = np.fromiter((bool(rx.match(c)) for c in ALL_CP), dtype=bool,
                       count=len(ALL_CP))
    assert (got == want).all()


def test_space_chars_is_isspace_set():
    want = {c for c in ALL_CP if c.isspace()}
    # re \s == str.isspace for every codepoint (the kernel's documented
    # invariant); SPACE_CHARS must be exactly that set
    assert set(SPACE_CHARS) == want == {c for c in ALL_CP
                                        if re.match(r"\s", c)}


def test_strip_lstrip_exhaustive_single_char():
    got = astr.npy(astr.strip(ALL_CP))
    want = np.array([c.strip() for c in ALL_CP], dtype=object)
    assert (got == want).all()
    got = astr.npy(astr.lstrip(["\xa0a ", " 　b\t", "c"]))
    assert list(got) == ["a ", "b\t", "c"]


HOSTILE = [
    "", " ", "\xa0　", "a b", "  x  ", "é́",  # combining
    "\U0001F600 emoji \U0001D11E", "tab\there", "\x1c\x1d\x1e\x1f",
    "mixed  line seps", "½²³ №42", "ＡＢＣ１２３", "ẞß", "'’-",
]


def test_length_and_slice_match_python():
    assert list(astr.length(HOSTILE)) == [len(t) for t in HOSTILE]
    got = list(astr.npy(astr.slice_cp(HOSTILE, 0, 3)))
    assert got == [t[0:3] for t in HOSTILE]


def test_arrow_utf8_normalize_still_broken():
    """Documents WHY astr has no nfc(): pyarrow 16.1's utf8_normalize ignores
    its form option (NFC returns decomposed text).  If a pyarrow upgrade fixes
    it, this test fails, signalling the kernel may adopt the Arrow pass."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = pc.utf8_normalize(
        pa.array(["\xc0"], type=pa.large_string()), form="NFC").to_pylist()
    assert out == ["\u0041\u0300"], "pyarrow NFC fixed - consider astr.nfc()"


def test_split_explode_matches_pandas():
    cases = ["a\nb\n", "", "\n", "x", "a\n\nb", "\n\n"]
    s = pd.Series(cases, dtype=object)
    prow, pflat = s.str.split("\n").explode().index, \
        s.str.split("\n").explode().to_numpy()
    grow, gflat = astr.split_explode(s, "\n")
    assert list(grow) == list(prow)
    assert list(astr.npy(gflat)) == list(pflat)


def test_take_bool_and_int():
    a = astr.arr(["a", "b", "c", "d"])
    assert list(astr.npy(astr.take(a, np.array([True, False, True, False])))) \
        == ["a", "c"]
    assert list(astr.npy(astr.take(a, np.array([3, 0])))) == ["d", "a"]


text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60)


@settings(max_examples=300, deadline=None)
@given(st.lists(text_st, max_size=20))
def test_fuzz_count_contains_vs_re(texts):
    pat_py = re.compile(r"[^\w .,;:!?'’\-]")
    pat_re2 = f"[^ .,;:!?'’\\-{W_BODY}]"
    got = astr.count_re(texts, pat_re2)
    want = [len(pat_py.findall(t)) for t in texts]
    assert list(got) == want
    gotc = astr.contains_re(texts, pat_re2)
    assert list(gotc) == [bool(pat_py.search(t)) for t in texts]


@settings(max_examples=300, deadline=None)
@given(st.lists(text_st, max_size=20))
def test_fuzz_ws_collapse_and_strip(texts):
    got = astr.npy(astr.strip(astr.replace_re(texts, f"[{S_BODY}]+", " ")))
    want = [re.sub(r"\s+", " ", t).strip() for t in texts]
    assert list(got) == want


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="> aq\n", max_size=40), max_size=10))
def test_fuzz_multiline_quote_patterns(texts):
    """The deskew translations: quote strip, prefix-only keep, nonblank count."""
    got = astr.npy(astr.replace_re(texts, r"(?m)^(?:> ?)+", ""))
    want = [re.sub(r"(?m)^(?:> ?)+", "", t) for t in texts]
    assert list(got) == want
    got = astr.npy(astr.replace_re(texts, r"(?m)^((?:> ?)+)?[^\n]*", r"\1"))
    want = [re.sub(r"(?m)^((?:> ?)+)?[^\n]*", r"\1", t) for t in texts]
    assert list(got) == want
    got = astr.count_re(texts, f"(?m)^.*[^{S_BODY}]")
    want = [len(re.findall(r"(?m)^.*\S", t)) for t in texts]
    assert list(got) == want
