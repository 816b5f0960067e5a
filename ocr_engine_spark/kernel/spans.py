"""Span (1-D interval) operations — the graft of the reference's Box geometry.

A span is a half-open character interval [start, end) into a turn's canonicalized text.
Each operation mirrors one Box method from /root/reference/src/dto.py with the same edge
semantics (sentinels, sequential-update quirk, truncation casts, clamp bounds):

- EMPTY_SPAN sentinel (-1, -1)   <-> empty Box [-1,-1,-1,-1]      (dto.py:85-89)
- extend_span                     <-> Box.extend_bbox              (dto.py:71-79)
- clamp_span                      <-> Box.clamp_bbox_by_img_wh     (dto.py:57-64)
- span_to_int                     <-> Box.normalize_bbox/to_int    (dto.py:49-55)
- span_is_valid                   <-> Box.bbox_is_valid            (dto.py:85-90)
- slice_text                      <-> Box.crop_img_by_bbox         (dto.py:95-98)
- span_length                     <-> Box.width/height floor at -1 (dto.py:29-35)
"""

from __future__ import annotations

EMPTY_SPAN = (-1, -1)


def span_length(start: float, end: float) -> float:
    """Length with the reference's floor at -1 (dto.py:29-35: max(x2-x1, -1))."""
    return max(end - start, -1)


def extend_span(start: float, end: float, margin_start: float, margin_end: float):
    """Margin extension with the reference's sequential-update quirk.

    Box.extend_bbox (dto.py:71-79) computes ``t = t - (b-t)*margin_t`` and then
    ``b = b + (b-t)*margin_b`` where the second line reuses the ALREADY-SHIFTED ``t``.
    That quirk is load-bearing for golden-fixture equality and is reproduced verbatim.
    """
    start = start - (end - start) * margin_start
    end = end + (end - start) * margin_end  # note: uses shifted `start`
    return start, end


def clamp_span(start: float, end: float, length: int):
    """Clamp both offsets into [0, length] (dto.py:57-64 min/max composition)."""
    start = min(max(0, start), length)
    end = min(max(0, end), length)
    return start, end


def span_to_int(start: float, end: float):
    """int() truncation-toward-zero, not rounding (dto.py:49-55)."""
    return int(start), int(end)


def span_is_valid(start: int, end: int) -> bool:
    """Positive length test; raises on the all-(-1) sentinel (dto.py:85-90)."""
    if (start, end) == EMPTY_SPAN:
        raise ValueError("Empty span found")
    return (end - start) > 0


def slice_text(text: str, start: int, end: int) -> str:
    """Crop analogue (dto.py:95-98: img[t:b, l:r])."""
    return text[start:end]


def prepare_spans(raw_spans, length: int, margin_start: float, margin_end: float):
    """extend -> clamp -> to_int -> validity mask, preserving positions.

    Mirrors OcrEngine.get_cropped_imgs (/root/reference/src/ocr.py:131-152): invalid spans
    contribute ``mask=False`` and are excluded from downstream recognition, while the mask
    keeps positional alignment with the original list for reconciliation
    (/root/reference/src/ocr.py:164-179).

    Returns (prepared, mask) where prepared[i] is the (start, end) int pair for mask-True
    entries and None otherwise.
    """
    prepared = []
    mask = []
    zero_margin = margin_start == 0 and margin_end == 0
    for s, e in raw_spans:
        if zero_margin:
            # extend is the identity; clamp/int only round-trip the ints
            s2, e2 = int(min(max(0, s), length)), int(min(max(0, e), length))
        else:
            s2, e2 = extend_span(s, e, margin_start, margin_end)
            s2, e2 = clamp_span(s2, e2, length)
            s2, e2 = span_to_int(s2, e2)
        if not span_is_valid(s2, e2):
            prepared.append(None)
            mask.append(False)
            continue
        prepared.append((s2, e2))
        mask.append(True)
    return prepared, mask


def interval_iou(a_start: int, a_end: int, b_start: int, b_end: int) -> float:
    """1-D IoU used by span NMS (graft of 2-D box IoU in batched_nms,
    externals/sdsvtd/sdsvtd/bbox_head.py:262-267)."""
    inter = min(a_end, b_end) - max(a_start, b_start)
    if inter <= 0:
        return 0.0
    union = (a_end - a_start) + (b_end - b_start) - inter
    return inter / union if union > 0 else 0.0
