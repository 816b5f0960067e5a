"""Batched span normalization — the graft of batched text recognition (E9–E11).

Reference behavior being re-expressed:

- E9 batched recognition (externals/sdsvtr/sdsvtr/transform.py:18-33, api.py:73-88): ALL
  crops of a page go through the model in ONE call.  Here ``recognize_batch`` normalizes
  every sliced span of a turn (and, at the Spark layer, of an Arrow batch) in one pass.
- E10 greedy decode (externals/sdsvtr/sdsvtr/converter.py:127-152): per-step argmax until
  EOS, sequence truncated at max_seq_len, confidence = MIN over kept steps.  Here tokens
  stand in for decode steps: truncate at ``max_seq_len`` tokens, conf = min of per-token
  scores.
- E11 post-process (/root/reference/src/utils.py:17-19): single-pass placeholder->space
  remap (the ✪ model-space token).
"""

from __future__ import annotations

import html as _htmllib
import json
import re

from ocr_engine_spark.kernel.detect import _NON_TEXTY, content_conf

_WS = re.compile(r"\s+")
# fast-path probe: _WS.sub(" ", s) changes s ONLY when s has two adjacent
# whitespace chars or a whitespace char that isn't a plain space
_WS_DIRTY = re.compile(r"\s\s|[^ \S]")
_MD_LINK = re.compile(r"\[([^\]]*)\]\(([^)]*)\)")
_MD_EMPH = re.compile(r"(\*\*|__|`)")

# numeric-span recognition (graft-added scalar layer, SURVEY.md §2.8): a span whose whole
# text is a number / date / currency amount is re-kinded to "num"
_NUMERIC = re.compile(
    r"^(?:[-+$€£]?\s?\d{1,3}(?:[,.]\d{3})*(?:[.,]\d+)?%?"
    r"|\d{4}-\d{2}-\d{2}(?:[ T]\d{2}:\d{2}(?::\d{2})?)?"
    r"|\d{1,2}/\d{1,2}/\d{2,4})$"
)


# category Cc is exactly U+0000-U+001F, U+007F-U+009F; keep tab (09) and newline (0A)
_CC_EXCEPT_TAB_NL = re.compile("[\x00-\x08\x0b-\x1f\x7f-\x9f]")


def _strip_controls(s: str) -> str:
    """Drop control characters (category Cc) except tab/newline (single C-level pass;
    the char class enumerates Cc so this matches the unicodedata.category filter)."""
    if _CC_EXCEPT_TAB_NL.search(s) is None:  # common case: no allocation
        return s
    return _CC_EXCEPT_TAB_NL.sub("", s)


def _token_score(tok: str) -> float:
    """Per-token recognition score: texty-character fraction (the per-step softmax-score
    analogue feeding E10's min-aggregation)."""
    return content_conf(tok)


def recognize_one(raw: str, kind: str, placeholder: str, max_seq_len: int):
    """Normalize one sliced span -> (text, conf, kind).

    Pipeline: format-specific decode (entity / markdown-inline / JSON-escape) ->
    control strip -> placeholder remap -> whitespace collapse -> token cap -> min-conf.
    """
    s = raw
    if kind == "html":
        s = _htmllib.unescape(s)
    elif kind == "markdown":
        s = _MD_LINK.sub(r"\1", s)
        s = _MD_EMPH.sub("", s)
    elif kind == "json":
        # escape sequences only exist behind a backslash: a backslash-free
        # literal decodes to itself (and a stray quote would fail loads and
        # fall through unchanged anyway), so the parse can be skipped
        if "\\" in s:
            try:
                s = json.loads('"' + s + '"')
            except ValueError:
                pass
    s = _strip_controls(s)
    if placeholder and placeholder in s:
        s = s.replace(placeholder, " ")  # E11, utils.py:17-19
    if _WS_DIRTY.search(s) is not None:
        s = _WS.sub(" ", s)
    s = s.strip()
    if not s:
        return "", 0.0, kind

    tokens = s.split(" ")
    if max_seq_len and len(tokens) > max_seq_len:  # E10 truncation
        tokens = tokens[:max_seq_len]
        s = " ".join(tokens)
    # E10 min over kept steps.  A token without non-texty characters scores
    # exactly 1.0, so when the whole span is clean (one C-level search) the min is
    # 1.0; otherwise only tokens containing a non-texty character can undercut
    # 1.0 (their score is strictly < 1), so the min runs over those alone —
    # identical value to min(content_conf(t) for t in tokens), a fraction of the
    # regex work.
    if _NON_TEXTY.search(s) is None:
        conf = 1.0
    else:
        conf = min((_token_score(t) for t in tokens
                    if _NON_TEXTY.search(t) is not None), default=1.0)

    if kind != "num" and _NUMERIC.match(s):
        kind = "num"
    return s, conf, kind


def recognize_batch(raws, kinds, placeholder: str, max_seq_len: int):
    """One batched call over all spans (E9); returns list[(text, conf, kind)].

    Empty input short-circuits to [] exactly like run_recog
    (/root/reference/src/ocr.py:120-121).
    """
    if len(raws) == 0:
        return []
    return [
        recognize_one(r, k, placeholder, max_seq_len) for r, k in zip(raws, kinds)
    ]
