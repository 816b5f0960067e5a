"""Input canonicalization + layout normalization (stages E1/S7/E2 of SURVEY.md §2.4).

Graft of the reference's preprocess step (/root/reference/src/ocr.py:81-99):

- canonicalize  <-> EXIF-transpose + RGB convert + imrescale-to-cap: Unicode NFC, newline
  normalization, truncation to ``max_chars`` (the 1920x1920 cap analogue, settings.yml:2).
- deskew        <-> AlignImage deskew (/root/reference/src/ocr.py:92-95): strips `> `
  reply-quoting indentation and reports the per-turn skew metric ("angle") plus the blank
  flag.  Blank turns are flagged but still flow through (warn-not-drop,
  /root/reference/src/ocr.py:211-214).
"""

from __future__ import annotations

import re
import unicodedata

_QUOTE_PREFIX = re.compile(r"^((?:> ?)+)")


def canonicalize(text: str, max_chars: int) -> str:
    """NFC + newline normalization + hard cap at ``max_chars`` characters."""
    if text is None:
        text = ""
    t = unicodedata.normalize("NFC", text)
    t = t.replace("\r\n", "\n").replace("\r", "\n")
    if max_chars and len(t) > max_chars:
        t = t[:max_chars]
    return t


def deskew(text: str):
    """Strip reply-quote prefixes; return (deskewed_text, is_blank, angle).

    ``angle`` = mean quote depth over non-blank lines — the scalar skew metric the
    reference's deskewer returns (/root/reference/src/ocr.py:94).  ``is_blank`` mirrors the
    blank-page detect (F5): the turn is flagged, never dropped.
    """
    is_blank = len(text.strip()) == 0
    lines = text.split("\n")
    out = []
    depths = []
    for ln in lines:
        m = _QUOTE_PREFIX.match(ln)
        if m:
            depth = m.group(1).count(">")
            out.append(ln[m.end():])
        else:
            depth = 0
            out.append(ln)
        if ln.strip():
            depths.append(depth)
    angle = float(sum(depths) / len(depths)) if depths else 0.0
    return "\n".join(out), is_blank, angle
