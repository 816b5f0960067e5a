"""Content-span detection: the graft of text-box detection + auto-rotate + NMS.

Reference behavior being re-expressed (SURVEY.md §2.4 E3/E4, §2.2 F2/F3):

- E3 detection (YOLOX forward + decode, externals/sdsvtd/sdsvtd/model.py:37-90,
  bbox_head.py:243-254): here a set of format-specific *parsers* that scan one turn's noisy
  payload and emit candidate content spans with confidence scores (tag/link-density
  heuristics standing in for objectness*cls scores).
- E4 auto-rotate (externals/sdsvtd/sdsvtd/model.py:125-151): run every candidate parser,
  keep the parse with the max number of threshold-passing spans; ties -> first parser in the
  fixed order PARSERS (the reference keeps the first best rotation).
- F2 score threshold (bbox_head.py:256-261, score_thr): drop spans with conf < score_thr.
- F3 NMS (bbox_head.py:262-267, iou 0.1): confidence-descending greedy suppression of
  overlapping spans, stable order on ties.

All offsets index the deskewed canonicalized text of the turn.  Every parser is a pure
function text -> list[(start, end, kind, conf)].
"""

from __future__ import annotations

import json
import re

import numpy as np

# ---------------------------------------------------------------------------
# scoring

# characters a content span is "supposed" to contain; everything else lowers the
# detection confidence (the tag/link-density analogue of detection scores).
# \w is Unicode-aware: Latin, Cyrillic, Arabic, Hebrew, CJK, kana, hangul all count.
_TEXTY = re.compile(r"[\w .,;:!?'’\-]")
_NON_TEXTY = re.compile(r"[^\w .,;:!?'’\-]")
_TAGLIKE = re.compile(r"<[A-Za-z!/][^>]*>")
_NEWLINE_RE = re.compile("\n")


def content_conf(s: str) -> float:
    """Fraction of 'texty' characters — the detection confidence of a span.

    Fast path: a single C-level ``search`` proves the span fully texty (the
    overwhelmingly common case) and returns exactly 1.0 without allocating;
    otherwise one regex pass deletes the complement class and counts survivors —
    equivalent to the per-char ``_TEXTY.match`` count, ~100x faster.
    """
    if not s:
        return 0.0
    if _NON_TEXTY.search(s) is None:
        return 1.0
    return len(_NON_TEXTY.sub("", s)) / len(s)


def _trim_span(text: str, start: int, end: int):
    """Shrink a candidate interval to its non-whitespace core (empty -> None)."""
    while start < end and text[start].isspace():
        start += 1
    while end > start and text[end - 1].isspace():
        end -= 1
    if end <= start:
        return None
    return start, end


# ---------------------------------------------------------------------------
# HTML parser — boilerplate strip (DOM-heuristic block filtering)

_HTML_DROP = re.compile(
    r"<(script|style|nav|footer|header|aside)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_HTML_TAG = re.compile(r"<[A-Za-z!/][^>]*>")
_HTML_A_ZONE = re.compile(r"<a\b[^>]*>.*?</a\s*>", re.IGNORECASE | re.DOTALL)
_LINK_PENALTY = 0.5


def parse_html(text: str):
    """Content spans = maximal text runs outside tags and outside boilerplate blocks.

    <script>/<style>/nav/footer/header/aside subtrees and comments are dropped wholesale
    (the layout-block filter); runs inside <a> zones get a link-density confidence penalty.
    Runs never cross newlines (line geometry feeds the stitcher).
    """
    if not _HTML_TAG.search(text):
        return None  # parser not applicable -> "rotation" yields no detections

    blocked = np.zeros(len(text), dtype=bool)
    for m in _HTML_DROP.finditer(text):
        blocked[m.start():m.end()] = True
    for m in _HTML_TAG.finditer(text):
        blocked[m.start():m.end()] = True
    linky = np.zeros(len(text), dtype=bool)
    for m in _HTML_A_ZONE.finditer(text):
        linky[m.start():m.end()] = True
    for m in _NEWLINE_RE.finditer(text):  # C-level scan, not per-char Python
        blocked[m.start()] = True

    # maximal unblocked runs via boundary transitions (C-level, not a
    # per-character Python walk): pad with True so every run has both edges
    ext = np.empty(len(text) + 2, dtype=bool)
    ext[0] = ext[-1] = True
    ext[1:-1] = blocked
    d = np.diff(ext.astype(np.int8))
    run_starts = np.flatnonzero(d == -1)      # True -> False
    run_ends = np.flatnonzero(d == 1)         # False -> True
    spans = []
    for i, j in zip(run_starts.tolist(), run_ends.tolist()):
        t = _trim_span(text, i, j)
        if t is not None:
            s, e = t
            conf = content_conf(text[s:e])
            if linky[s:e].any():
                conf *= _LINK_PENALTY
            spans.append((s, e, "html", conf))
    return spans


# ---------------------------------------------------------------------------
# Markdown parser

_MD_MARKER = re.compile(
    r"(^|\n)\s{0,3}(#{1,6}\s|[-*+]\s|\d+\.\s|```)|\[[^\]]+\]\([^)]*\)|\*\*"
)
_MD_LEAD = re.compile(r"^\s{0,3}(#{1,6}\s+|[-*+]\s+|\d+\.\s+)")
_MD_FENCE = re.compile(r"^\s{0,3}```")


def parse_markdown(text: str):
    """One span per content line; leading heading/list markers excluded from the span;
    fenced-code lines dropped (boilerplate).  Inline markup stays inside the span — the
    recognition stage cleans it (detection boxes are coarse; recognition reads the crop)."""
    if not _MD_MARKER.search(text):
        return None

    spans = []
    pos = 0
    in_fence = False
    for ln in text.split("\n"):
        start, end = pos, pos + len(ln)
        pos = end + 1
        if _MD_FENCE.match(ln):
            in_fence = not in_fence
            continue
        if in_fence or not ln.strip():
            continue
        m = _MD_LEAD.match(ln)
        s = start + (m.end() if m else 0)
        t = _trim_span(text, s, end)
        if t is None:
            continue
        s, e = t
        seg = text[s:e]
        conf = content_conf(seg)
        if _TAGLIKE.search(seg):  # markup noise penalty (same as plain parser)
            conf *= 0.2
        spans.append((s, e, "markdown", conf))
    return spans


# ---------------------------------------------------------------------------
# JSON parser (tool payloads)

# sequential string-literal tokenizer; a literal is a KEY iff the next non-space char
# after it is ':' — everything else is a value span
_JSON_STRING = re.compile(r'"((?:[^"\\\n]|\\.)*)"')
_JSON_NUMBER = re.compile(r"(?<![\w.\"])-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?(?![\w.\"])")


def parse_json(text: str):
    """Value-string and numeric-literal spans of a JSON tool payload."""
    stripped = text.strip()
    if not stripped or stripped[0] not in "{[":
        return None
    try:
        json.loads(stripped)
    except (ValueError, RecursionError):
        return None

    spans = []
    in_string = np.zeros(len(text), dtype=bool)
    for m in _JSON_STRING.finditer(text):
        in_string[m.start():m.end()] = True
        tail = text[m.end():m.end() + 8].lstrip()
        if tail.startswith(":"):
            continue  # key, not content
        if m.start(1) < m.end(1):
            spans.append((m.start(1), m.end(1), "json", content_conf(m.group(1))))
    for m in _JSON_NUMBER.finditer(text):
        if not in_string[m.start()]:
            spans.append((m.start(), m.end(), "num", 0.95))
    spans.sort(key=lambda s: (s[0], s[1]))
    return spans


# ---------------------------------------------------------------------------
# Plain parser (always applicable — the identity "rotation")


def parse_plain(text: str):
    """One span per non-blank line; tag-looking lines get a heavy noise penalty so the
    format vote prefers the HTML parse on markup-heavy payloads."""
    spans = []
    pos = 0
    for ln in text.split("\n"):
        start, end = pos, pos + len(ln)
        pos = end + 1
        t = _trim_span(text, start, end)
        if t is None:
            continue
        s, e = t
        seg = text[s:e]
        conf = content_conf(seg)
        if _TAGLIKE.search(seg):
            conf *= 0.2
        spans.append((s, e, "text", conf))
    return spans


# fixed parser order = the reference's fixed rotation order [0, 90, 180, 270]
# (externals/sdsvtd/sdsvtd/model.py:136-150; ties keep the FIRST best)
PARSERS = (
    ("html", parse_html),
    ("markdown", parse_markdown),
    ("json", parse_json),
    ("plain", parse_plain),
)
_PARSER_BY_KIND = dict(PARSERS)


def detect_spans(text: str, score_thr: float, iou_thr: float,
                 declared_kind: str | None = None):
    """Full detection stage: parser vote (E4) -> score filter (F2) -> NMS (F3).

    Returns (fmt, spans) with spans = list[(start, end, kind, conf)] in
    confidence-suppressed, position-sorted order.

    ``declared_kind`` is the S1 payload-kind dispatch (the ImageReader.read
    analogue, /root/reference/src/utils.py:179-188: the reader trusts the
    DECLARED input kind — extension/type — before parsing, it never sniffs
    content): when a transcript's ``tool`` column declares the payload kind,
    ONLY that parser runs and it wins outright — no E4 vote.  A declared
    parser that rejects the payload (returns None, e.g. invalid tool-JSON)
    falls back to the plain parser instead of failing the row (the permissive
    skip-bad semantics of S4, utils.py:218-229).
    """
    parser = _PARSER_BY_KIND.get(declared_kind) if declared_kind else None
    if parser is not None:
        cand = parser(text)
        fmt = declared_kind
        if cand is None:  # declared parser rejects: permissive plain fallback
            cand, fmt = parse_plain(text), "plain"
        passing = [s for s in cand if s[3] >= score_thr]
        return fmt, nms_spans(passing, iou_thr)
    # an UNKNOWN declared kind (future payload enum, upstream typo) is a bad
    # declaration, not a bad row: fall through to the content vote (S4
    # permissive semantics) instead of raising and killing the Arrow batch
    best_fmt, best_spans, best_count = "plain", [], -1
    for name, parser in PARSERS:
        cand = parser(text)
        if cand is None:
            continue
        passing = [s for s in cand if s[3] >= score_thr]
        if len(passing) > best_count:  # strict > : ties keep the first parser
            best_fmt, best_spans, best_count = name, passing, len(passing)
    return best_fmt, nms_spans(best_spans, iou_thr)


def nms_spans(spans, iou_thr: float):
    """Greedy confidence-descending interval suppression (F3/O3).

    Stable sort on equal confidences (first-come wins on ties, like torch batched_nms
    over the already score-filtered candidates, bbox_head.py:262-267); survivors are
    returned re-sorted by position for downstream slicing.
    """
    from ocr_engine_spark.kernel.spans import interval_iou

    if not spans:
        return []
    # exact shortcut for the dominant case: every parser emits position-sorted
    # spans, and when consecutive spans don't overlap, ALL pairs are disjoint
    # (IoU 0 <= thr) — greedy suppression keeps everything and the final
    # position sort returns the input unchanged
    if iou_thr >= 0 and all(
            spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1)):
        return list(spans)
    order = sorted(range(len(spans)), key=lambda i: -spans[i][3])  # stable on ties
    kept = []
    for i in order:
        s = spans[i]
        if all(interval_iou(s[0], s[1], k[0], k[1]) <= iou_thr for k in kept):
            kept.append(s)
    kept.sort(key=lambda s: (s[0], s[1]))
    return kept
