"""Canonicalization / deskew unit tests (E1/E2/S7, F5)."""

import unicodedata

from ocr_engine_spark.kernel.canonicalize import canonicalize, deskew


def test_nfc_normalization():
    decomposed = "Nguyễn"  # e + circumflex + tilde combining
    out = canonicalize(decomposed, 0)
    assert out == unicodedata.normalize("NFC", decomposed)
    assert "ễ" in out


def test_newline_normalization():
    assert canonicalize("a\r\nb\rc\nd", 0) == "a\nb\nc\nd"


def test_truncation_cap():
    assert canonicalize("x" * 100, 10) == "x" * 10
    assert canonicalize("short", 10) == "short"
    assert canonicalize(None, 10) == ""


def test_deskew_strips_quote_prefixes():
    text = "> quoted once\n> > nested twice\nplain"
    out, is_blank, angle = deskew(text)
    assert out == "quoted once\nnested twice\nplain"
    assert not is_blank
    assert angle == (1 + 2 + 0) / 3  # mean quote depth over non-blank lines


def test_blank_detect_warn_not_drop():
    out, is_blank, angle = deskew("   \n\t ")
    assert is_blank  # flagged (F5) ...
    assert out == "   \n\t "  # ... but the row still flows through untouched
    assert angle == 0.0
