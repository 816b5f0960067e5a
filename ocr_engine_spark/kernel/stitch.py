"""Reading-order normalization: merge fragment spans into word-groups and lines.

This is a from-scratch re-expression of the reference's live word-formation algorithm
(words_formation_mmocr_tesseract, /root/reference/src/word_formation.py:524-538) over
pseudo-geometry derived from character offsets:

    span -> box [x1, y1, x2, y2] with
        x1 = column of span start (chars since last newline)
        x2 = x1 + span length
        y1 = line_number * line_height,  y2 = y1 + line_height

so the SAME greedy, stateful stitch the reference applies to OCR word boxes produces the
reading order of text fragments.  Stage-by-stage mapping (file:line into /root/reference):

- x-sort of words                      src/word_formation.py:421 (stable)
- IQR-robust max row size seed/update  src/utils.py:22-42, word_formation.py:424,428 (A3/E13)
- greedy most-overlapping-row argmax   word_formation.py:359-393 (J2)
- merge of drifting overlapping rows   word_formation.py:331-356 (reverse-delete +
                                       reversed-extend quirks preserved)
- running y-shift EMA, clamped         word_formation.py:406-415 (A4; gradient 0.6,
                                       clamp = page_width * tan(10 deg), :529)
- row sort by top-y                    word_formation.py:446-447 (stable, O2)
- group merge text/box/conf            word_formation.py:283-297 (A1: ' '.join, min/max box
                                       with int() casts, arithmetic-mean confidences)
- groups -> lines by y-overlap ratio   word_formation.py:462-521 (mode "line")
- page skew = mean running shift       word_formation.py:456-457 (A5)
- empty input -> ([], 0)               word_formation.py:527-528 (F6)

The greedy assignment is order-dependent and inherently sequential per turn; it must never
be parallelized across one turn's spans (SURVEY.md §7 hard parts) — per-turn cost is
O(n^2) on a small n, exactly like the reference per page.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

_DEG2RAD = math.pi / 180.0
_BIG = int(2e10 + 9)  # word_formation.py:14-15 MAX_INT/MIN_INT


@dataclass
class SpanWord:
    """A recognized fragment with pseudo-geometry (the Word DTO analogue,
    /root/reference/src/dto.py:104-162)."""

    x1: float
    y1: float
    x2: float
    y2: float
    text: str
    conf_det: float = -1.0
    conf_cls: float = -1.0
    start: int = -1
    end: int = -1
    kind: str = "text"

    @property
    def height(self) -> float:
        return max(self.y2 - self.y1, -1)


@dataclass
class SpanGroup:
    """Merged word-group / line (WordGroup/Line analogue, dto.py:165-353)."""

    words: list
    text: str
    x1: int
    y1: int
    x2: int
    y2: int
    conf_det: float
    conf_cls: float
    members: list = field(default_factory=list)  # groups inside a line


def robust_max(values, threshold: float = 1.0):
    """IQR-filtered max (find_maximum_without_outliers, src/utils.py:22-42).

    numpy linear-interpolation percentiles, bounds q1 - t*IQR / q3 + t*IQR, max over
    the in-range values — identical arithmetic to the reference.
    """
    q1 = np.percentile(values, 25)
    q3 = np.percentile(values, 75)
    iqr = q3 - q1
    lo, hi = q1 - threshold * iqr, q3 + threshold * iqr
    return max(v for v in values if lo <= v <= hi)


def merge_group(words) -> SpanGroup:
    """Order-sensitive merge of a word list (group_bbox_and_text,
    word_formation.py:283-297): text = ' '.join in member order; box = min/max with int()
    casts applied per-step; confidences = arithmetic means, det and cls separately."""
    x_min = y_min = _BIG
    x_max = y_max = -_BIG
    conf_det = 0.0
    conf_cls = 0.0
    for w in words:
        x_max = int(max(w.x2, x_max))
        x_min = int(min(w.x1, x_min))
        y_max = int(max(w.y2, y_max))
        y_min = int(min(w.y1, y_min))
        conf_det += w.conf_det
        conf_cls += w.conf_cls
    n = len(words)
    return SpanGroup(
        words=list(words),
        text=" ".join(w.text for w in words),
        x1=x_min, y1=y_min, x2=x_max, y2=y_max,
        conf_det=conf_det / n, conf_cls=conf_cls / n,
    )


def _merge_drifting_rows(rows, row_words, hits, max_row_size) -> bool:
    """Merge rows whose y-intervals drifted into overlap
    (merge_overlapping_word_groups, word_formation.py:331-356).  Preserves both quirks:
    iteration over hits[:0:-1] (reverse, excluding the first) for deletion, and the
    survivor extended with merged_words[::-1]."""
    m_top = max(rows[i][1] for i in hits)
    m_bottom = min(rows[i][3] for i in hits)
    m_left = min(rows[i][0] for i in hits)
    m_right = max(rows[i][2] for i in hits)
    if m_top - m_bottom > max_row_size:
        return False
    gathered = []
    for idx in hits[:0:-1]:
        gathered.extend(row_words[idx])
        del rows[idx]
        del row_words[idx]
    rows[hits[0]] = [m_left, m_top, m_right, m_bottom]
    row_words[hits[0]].extend(gathered[::-1])
    return True


def _best_row(rows, row_words, box, y_shift, max_row_size, y_overlap_threshold,
              max_x_dist):
    """Greedy argmax row assignment (most_overlapping_word_groups,
    word_formation.py:359-393), including the multi-overlap merge path and the
    too-big/too-small rejection returning -1."""
    best = -1.0
    best_idx = -1
    hits = []
    left, top, right, bottom = box
    for i, row in enumerate(rows):
        r_left, r_top, r_right, r_bottom = row
        top_s = top - y_shift[i]
        bottom_s = bottom - y_shift[i]
        overlap = min(bottom_s, r_bottom) - max(top_s, r_top)
        if overlap > best and min(right - r_left, left - r_right) < max_x_dist:
            best = overlap
            best_idx = i
        if (r_top <= bottom_s and r_bottom >= top_s) \
                and min(right - r_left, left - r_right) < max_x_dist \
                and not (bottom - top - overlap > max_row_size * y_overlap_threshold) \
                and not (overlap < max_row_size * y_overlap_threshold):
            hits.append(i)
    if len(hits) > 1 and _merge_drifting_rows(rows, row_words, hits, max_row_size):
        best_idx = hits[0]
    if bottom - top - best > max_row_size * y_overlap_threshold \
            and best < max_row_size * y_overlap_threshold:
        best_idx = -1
    return best_idx


def stitch_word_groups(words, max_running_y_shift, gradient, y_overlap_threshold,
                       max_x_dist):
    """Greedy stitch of x-sorted words into word-group rows with running y-shift EMA
    (stitch_boxes_into_word_groups_tesseract, word_formation.py:418-459).

    Returns (groups, page_skew) with groups sorted by top-y (stable).
    """
    ordered = sorted(words, key=lambda w: w.x1)  # stable, :421
    rows = []
    row_words = []
    shifts = []
    max_row_size = ordered[0].height  # seed, :424
    for w in ordered:
        box = [w.x1, w.y1, w.x2, w.y2]
        max_row_size = max(max_row_size, w.y2 - w.y1)  # A3, :428
        idx = _best_row(rows, row_words, box, shifts, max_row_size,
                        y_overlap_threshold, max_x_dist)
        if idx == -1:
            rows.append(box)
            row_words.append([w])
            shifts.append(0)
        else:
            r = rows[idx]
            rows[idx] = [min(r[0], w.x1), min(r[1], w.y1),
                         max(r[2], w.x2), max(r[3], w.y2)]  # :396-403
            row_words[idx].append(w)
            new_shift = (w.y1 + w.y2) / 2 - (rows[idx][1] + rows[idx][3]) / 2
            shifts[idx] = min(gradient * shifts[idx] + (1 - gradient) * new_shift,
                              max_running_y_shift)  # A4, :406-415
    order = sorted(range(len(rows)), key=lambda i: rows[i][1])  # stable, :446
    groups = [merge_group(row_words[i]) for i in order]
    page_skew = sum(shifts) / len(shifts)  # A5, :457
    return groups, page_skew


def _same_line(a: SpanGroup, b: SpanGroup, min_y_overlap_ratio: float) -> bool:
    """y-interval overlap test (is_on_same_line_mmocr_tesseract,
    word_formation.py:462-483)."""
    a_min, a_max = a.y1, a.y2
    b_min, b_max = b.y1, b.y2
    if a_min > b_min:
        a_min, b_min = b_min, a_min
        a_max, b_max = b_max, a_max
    if b_min > a_max:
        return False
    if min_y_overlap_ratio is None:
        return True
    mid = sorted([b_min, b_max, a_max])
    overlap = mid[1] - mid[0]
    return (overlap >= (a_max - a_min) * min_y_overlap_ratio
            or overlap >= (b_max - b_min) * min_y_overlap_ratio)


def stitch_lines(groups, min_y_overlap_ratio):
    """Greedy left-to-right chaining of word-groups into lines
    (stitch_word_groups_into_lines_mmocr_tesseract, word_formation.py:486-521),
    final stable sort by top-y (:520)."""
    ordered = sorted(groups, key=lambda g: g.x1)  # stable, :493
    taken = set()
    lines = []
    for i in range(len(ordered)):
        if i in taken:
            continue
        chain = [i]
        rightmost = i
        for j in range(i + 1, len(ordered)):
            if j in taken:
                continue
            if _same_line(ordered[rightmost], ordered[j], min_y_overlap_ratio):
                chain.append(j)
                taken.add(j)
                rightmost = j
        members = [ordered[k] for k in chain]
        line = merge_group(members)
        line.members = members
        lines.append(line)
    lines.sort(key=lambda ln: ln.y1)  # stable, :520
    return lines


# --- alternate algorithm 1: tesseract-style (words_to_lines_tesseract, -------
# /root/reference/src/word_formation.py:300-326) -------------------------------


def _most_overlapping_row_tess(rows, row_words, bottom, top, y_shift,
                               max_row_size, y_overlap_threshold):
    """most_overlapping_row (word_formation.py:181-221).  Differs from the live
    `_best_row`: rows are pure y-intervals (bottom, top) with NO x-distance
    criterion, the row-hit test compares against the RUNNING max_overlap (not the
    row's own overlap), and the interval test `row_top <= bottom` is unshifted."""
    max_overlap = -1
    max_overlap_idx = -1
    hits = []
    for i, row in enumerate(rows):
        row_bottom, row_top = row
        overlap = min(bottom - y_shift[i], row_bottom) - max(top - y_shift[i], row_top)
        if overlap > max_overlap:
            max_overlap = overlap
            max_overlap_idx = i
        if (row_top <= bottom and row_bottom >= top) \
                and not (bottom - top - max_overlap
                         > max_row_size * y_overlap_threshold) \
                and not (max_overlap < max_row_size * y_overlap_threshold):
            hits.append(i)
    if len(hits) > 1:
        merge_bottom = max(rows[i][0] for i in hits)
        merge_top = min(rows[i][1] for i in hits)
        if merge_bottom - merge_top <= max_row_size:
            merged_words = []
            for idx in hits[:0:-1]:  # reverse-delete quirk, :209-212
                merged_words.extend(row_words[idx])
                del rows[idx]
                del row_words[idx]
            rows[hits[0]] = (merge_bottom, merge_top)
            row_words[hits[0]].extend(merged_words[::-1])  # reversed-extend, :215
            max_overlap_idx = hits[0]
    if bottom - top - max_overlap > max_row_size * y_overlap_threshold \
            and max_overlap < max_row_size * y_overlap_threshold:
        max_overlap_idx = -1
    return max_overlap_idx


def _stitch_rows_tesseract(words, max_running_y_shift, gradient,
                           y_overlap_threshold):
    """stitch_boxes_into_lines_tesseract (word_formation.py:224-258): x-sort,
    IQR-robust max seeded over ALL word heights (not the first word's), greedy
    y-interval row assignment, running y-shift EMA, final stable top-y sort."""
    ordered = sorted(words, key=lambda w: w.x1)  # stable, :226
    rows = []
    row_words = []
    shifts = []
    max_row_size = robust_max([w.height for w in ordered])  # :229
    for w in ordered:
        bottom, top = w.y2, w.y1
        max_row_size = max(max_row_size, bottom - top)
        idx = _most_overlapping_row_tess(rows, row_words, bottom, top, shifts,
                                         max_row_size, y_overlap_threshold)
        if idx == -1:
            rows.append((bottom, top))
            row_words.append([w])
            shifts.append(0)
        else:
            row_bottom, row_top = rows[idx]
            rows[idx] = (max(row_bottom, bottom), min(row_top, top))
            row_words[idx].append(w)
            new_shift = (top + bottom) / 2 - (row_top + row_bottom) / 2
            shifts[idx] = min(gradient * shifts[idx] + (1 - gradient) * new_shift,
                              max_running_y_shift)
    order = sorted(range(len(rows)), key=lambda i: rows[i][1])  # by top, :255
    page_skew = sum(shifts) / len(shifts)
    return [row_words[i] for i in order], page_skew


def words_to_lines_tesseract(words, page_width, max_running_y_shift_degree,
                             gradient, max_x_dist, y_overlap_threshold):
    """words_to_lines_tesseract (word_formation.py:300-326): rows split into
    word-groups wherever the x-gap exceeds max_x_dist corrected by the measured
    page skew (|cos|, :264-265); one Line per row holding its groups."""
    max_shift = page_width * math.tan(max_running_y_shift_degree * _DEG2RAD)
    sorted_row_words, page_skew = _stitch_rows_tesseract(
        words, max_shift, gradient, y_overlap_threshold)
    corrected_max_x_dist = max_x_dist * abs(math.cos(page_skew * _DEG2RAD))
    lines = []
    for row in sorted_row_words:
        group_runs = [[row[0]]]
        for k in range(1, len(row)):
            if row[k].x1 - row[k - 1].x2 > corrected_max_x_dist:  # :269-273
                group_runs.append([])
            group_runs[-1].append(row[k])
        members = [merge_group(g) for g in group_runs]
        line = merge_group(row)  # group_bbox_and_text over the row's words, :320
        line.members = members
        lines.append(line)
    return lines, page_skew


# --- alternate algorithm 2: mmocr-style (words_to_lines_mmocr, ----------------
# /root/reference/src/word_formation.py:154-167) -------------------------------


def words_to_lines_mmocr(words, min_y_overlap_ratio: float = 0.3):
    """words_to_lines_mmocr: greedy left-to-right same-line chaining
    (stitch_boxes_into_lines, word_formation.py:79-146; ratio default 0.3), each
    chain merged into one line = one word-group; final stable sort by top-y.
    The reference returns page skew None — normalized to 0.0 here so the output
    schema stays total."""
    ordered = sorted(words, key=lambda w: w.x1)  # :104
    taken = set()
    lines = []
    for i in range(len(ordered)):
        if i in taken:
            continue
        chain = [i]
        rightmost = i
        for j in range(i + 1, len(ordered)):
            if j in taken:
                continue
            if _word_same_line(ordered[rightmost], ordered[j],
                               min_y_overlap_ratio):
                chain.append(j)
                taken.add(j)
                rightmost = j
        grp = merge_group([ordered[k] for k in chain])
        line = merge_group([ordered[k] for k in chain])
        line.members = [grp]  # one word-group per line, :159-165
        lines.append(line)
    lines.sort(key=lambda ln: ln.y1)  # stable, :145
    return lines, 0.0


def _word_same_line(a, b, min_y_overlap_ratio):
    """is_on_same_line (word_formation.py:18-53) on axis-aligned word geometry."""
    a_min, a_max = a.y1, a.y2
    b_min, b_max = b.y1, b.y2
    if a_min > b_min:
        a_min, b_min = b_min, a_min
        a_max, b_max = b_max, a_max
    if b_min > a_max:
        return False
    if min_y_overlap_ratio is None:
        return True
    mid = sorted([b_min, b_max, a_max])
    overlap = mid[1] - mid[0]
    return (overlap >= (a_max - a_min) * min_y_overlap_ratio
            or overlap >= (b_max - b_min) * min_y_overlap_ratio)


def lines_closed_form(words):
    """Closed form of the live 'line' stitch for the engine's pseudo-geometry.

    Every parser emits spans that never cross a newline, so every word's box is
    exactly [col, li*h, col+len, li*h+h] — same-line words share one y-interval,
    different-line boxes touch with overlap 0, strictly below the
    max_row_size * y_overlap_threshold hit bound (h vs h/2).  Under that
    invariant the greedy stitch provably reduces to:

    - rows never span two lines and never merge (zero overlap < threshold);
    - the running y-shift EMA is identically 0 (same-y words keep row centers
      fixed), so page_skew == 0.0 and the shift-corrected tests equal the
      uncorrected ones;
    - within a line, x-gap grouping only affects INTERMEDIATE word-groups;
      stitch_lines chains all same-line groups back into one line whose merged
      text is ' '.join over all words in x order — the grouping cancels out;
    - the final stable top-y sorts restore line order.

    So the 'line'-mode output is: per line, words in x order joined by ' ';
    lines joined by '\\n'; flattened word order = (line, x).  Verified
    word-for-word against words_formation by tests/test_stitch.py (random
    grid-geometry fuzz) and byte-for-byte by the frozen goldens.

    Returns (line_texts, flat_words, page_skew) — O(n) versus the O(n^2)
    greedy, which matters because this runs per turn at the 10^12-turn design
    point.  Detection output is already (line, x)-sorted, so no sort happens.
    """
    texts = []
    flat = []
    cur_y = None
    cur = []
    for w in words:  # words arrive sorted by (start) == (line, x)
        if w.y1 != cur_y:
            if cur:
                texts.append(" ".join(t.text for t in cur))
            cur_y = w.y1
            cur = []
        cur.append(w)
        flat.append(w)
    if cur:
        texts.append(" ".join(t.text for t in cur))
    return texts, flat, 0.0


def words_formation(words, page_width, mode, max_running_y_shift_degree, gradient,
                    max_x_dist, y_overlap_threshold):
    """Entry point matching words_formation_mmocr_tesseract
    (word_formation.py:524-538): empty -> ([], 0); modes 'word_group'/'line' run
    the live algorithm, 'tesseract'/'mmocr' the alternate pluggable algorithms
    (selected by import in the reference, /root/reference/src/ocr.py:19-21);
    unknown mode -> NotImplementedError."""
    if len(words) == 0:
        return [], 0
    if mode == "tesseract":
        return words_to_lines_tesseract(
            words, page_width, max_running_y_shift_degree, gradient,
            max_x_dist, y_overlap_threshold)
    if mode == "mmocr":
        return words_to_lines_mmocr(words)
    max_shift = page_width * math.tan(max_running_y_shift_degree * _DEG2RAD)
    groups, page_skew = stitch_word_groups(
        words, max_shift, gradient, y_overlap_threshold, max_x_dist)
    if mode == "word_group":
        return groups, page_skew
    if mode == "line":
        return stitch_lines(groups, y_overlap_threshold), page_skew
    raise NotImplementedError(f"Word formation mode not supported: {mode}")
