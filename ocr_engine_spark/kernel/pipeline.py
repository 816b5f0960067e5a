"""The fused per-turn extraction pipeline (the OcrEngine.__call__ analogue).

Stage order mirrors /root/reference/src/ocr.py:195-233 (EP2 in SURVEY.md §3):

    canonicalize (E1) -> deskew (E2, blank warn-not-drop F5) -> detect + format vote +
    NMS (E3/E4/F2/F3) -> span prepare: extend/clamp/int/validity mask (E5-E8, F4) ->
    batched recognition (E9-E11) with positional mask reconciliation
    (/root/reference/src/ocr.py:164-179) -> reading-order stitch (kernel/stitch.py) ->
    per-turn output row.

Output span offsets are the ORIGINAL detected offsets (the reference constructs Word with
the original detection box, ocr.py:170, while the extended/clamped span only selects the
crop) — preserved here.

``extract_turn`` is the single-turn oracle; ``extract_frame`` the vectorized batch used by
the Spark layer (one call per Arrow batch — zero per-row Python at the Spark boundary).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ocr_engine_spark.config import DEFAULT_CONFIG, EngineConfig
from ocr_engine_spark.kernel.canonicalize import canonicalize, deskew
from ocr_engine_spark.kernel.detect import detect_spans
from ocr_engine_spark.kernel.normalize import recognize_batch
from ocr_engine_spark.kernel.spans import prepare_spans, slice_text
from ocr_engine_spark.kernel.stitch import (
    SpanWord, lines_closed_form, words_formation,
)


_NEWLINE = re.compile("\n")


def _line_geometry(text: str):
    """Start offsets of every line (for offset -> (line, column) mapping) and the page
    width = longest line length in characters (the img.shape[1] analogue).

    C-level newline scan (re.finditer) instead of a per-character Python loop — this
    runs over the full payload of every turn, so it must not be O(len) in Python.
    """
    starts = [0] + [m.end() for m in _NEWLINE.finditer(text)]
    arr = np.asarray(starts, dtype=np.int64)
    if len(starts) == 1:
        width = len(text)
    else:
        ends = np.empty(len(starts), dtype=np.int64)
        ends[:-1] = arr[1:] - 1
        ends[-1] = len(text)
        width = int((ends - arr).max())
    return arr, max(width, 1)


def extract_turn(text: str, cfg: EngineConfig = DEFAULT_CONFIG):
    """Run the full pipeline on one turn's payload.

    Returns a dict with extracted_text, spans (list of dicts in reading order), n_spans,
    strip_ratio, fmt, is_blank, angle — the per-turn slice of the output table
    (FIXTURES.md §2).
    """
    raw_len = len(text) if text else 0
    canon = canonicalize(text, cfg.max_chars)
    canon, is_blank, angle = deskew(canon)
    return _extract_prepared(canon, is_blank, angle, raw_len, cfg)


def _extract_prepared(canon: str, is_blank: bool, angle: float, raw_len: int,
                      cfg: EngineConfig):
    """Pipeline tail after canonicalize+deskew — lets the batch layer hand in the
    vectorized pre-pass results instead of recomputing them per row."""
    fmt, detected = detect_spans(canon, cfg.score_thr, cfg.iou_thr)
    empty = {
        "extracted_text": "", "spans": [], "n_spans": 0,
        "strip_ratio": 0.0, "fmt": fmt, "is_blank": is_blank, "angle": angle,
        "page_skew": 0.0,
    }
    if not detected:  # F6 empty short-circuit (ocr.py:157-158)
        return empty

    prepared, mask = prepare_spans(
        [(s, e) for s, e, _, _ in detected], len(canon),
        cfg.extend_span_start, cfg.extend_span_end)
    valid_idx = [i for i, ok in enumerate(mask) if ok]
    raws = [slice_text(canon, *prepared[i]) for i in valid_idx]
    kinds = [detected[i][2] for i in valid_idx]
    recs = recognize_batch(raws, kinds, cfg.placeholder_char, cfg.max_seq_len)

    line_starts, page_width = _line_geometry(canon)
    h = cfg.line_height
    words = []
    for i, (rtext, rconf, rkind) in zip(valid_idx, recs):
        if not rtext:  # blank-after-recognition filter (F7, utils.py:293-295)
            continue
        s, e, _, dconf = detected[i]
        li = int(np.searchsorted(line_starts, s, side="right") - 1)
        col = s - int(line_starts[li])
        words.append(SpanWord(
            x1=col, y1=li * h, x2=col + (e - s), y2=li * h + h,
            text=rtext, conf_det=dconf, conf_cls=rconf, start=s, end=e, kind=rkind,
        ))
    if not words:
        return empty

    if cfg.word_formation_mode == "line":
        # the engine's pseudo-geometry provably collapses the live stitch to a
        # per-line closed form (see stitch.lines_closed_form) — O(n) per turn
        line_texts, out_words, page_skew = lines_closed_form(words)
        extracted = "\n".join(line_texts)
    else:
        segments, page_skew = words_formation(
            words, page_width, cfg.word_formation_mode,
            cfg.max_running_y_shift_degree, cfg.gradient,
            cfg.max_x_dist, cfg.y_overlap_threshold)
        out_words = []
        for seg in segments:
            if seg.members:  # a Line: flatten word-groups (dto.py:271-273)
                for grp in seg.members:
                    out_words.extend(grp.words)
            else:
                out_words.extend(seg.words)
        extracted = "\n".join(seg.text for seg in segments)
    spans = [
        {"start": w.start, "end": w.end, "kind": w.kind,
         "conf": float(w.conf_cls), "text": w.text}
        for w in out_words
    ]
    strip_ratio = 1.0 - len(extracted) / raw_len if raw_len > 0 else 0.0
    return {
        "extracted_text": extracted, "spans": spans, "n_spans": len(spans),
        "strip_ratio": strip_ratio, "fmt": fmt, "is_blank": is_blank,
        "angle": angle, "page_skew": float(page_skew),
    }


OUTPUT_COLUMNS = [
    "conv_id", "turn_idx", "extracted_text", "spans", "n_spans",
    "strip_ratio", "fmt", "is_blank", "angle", "page_skew",
]


# ---------------------------------------------------------------------------
# Vectorized batch fast path
#
# For a turn whose deskewed payload is PLAIN format (no HTML tag, no markdown
# marker, no leading '{'/'[', no control chars, no placeholder char) the full
# pipeline reduces to a closed form that is exact line by line:
#
#   - only the plain parser applies, emitting one span per non-blank line with
#     conf = texty-char fraction of the trimmed line (detect.parse_plain);
#   - NMS keeps every span (line spans are disjoint, IoU 0);
#   - with zero span margins, prepare_spans is the identity on the trimmed ints;
#   - recognition is whitespace-collapse + token-min conf + numeric re-kind
#     (controls/placeholder routed away by the predicate);
#   - in the stitcher every line's pseudo-box [col, li*h, col+len, li*h+h] lands
#     in its OWN row: adjacent line boxes touch with overlap exactly 0, which is
#     below the max_row_size*y_overlap_threshold hit bound, so no assignment,
#     no merge, shifts all 0 (page_skew 0.0) and the final stable top-y sorts
#     restore line order in every word-formation mode.
#
# Everything above is computed with pandas .str / numpy C loops over the whole
# Arrow batch; any row the predicate cannot PROVE reduces (html/markdown/json
# formats, exotic payloads) falls through to the unchanged per-turn oracle
# `extract_turn`.  Byte-equality vs the oracle is pinned by the golden suite and
# tests/test_fastpath_equiv.py.
# ---------------------------------------------------------------------------

from ocr_engine_spark.kernel.detect import _HTML_TAG, _NON_TEXTY  # noqa: E402
from ocr_engine_spark.kernel.normalize import _NUMERIC  # noqa: E402

_QUOTE_ML = re.compile(r"(?m)^(?:> ?)+")
# _MD_MARKER with non-capturing groups: identical as a boolean gate, and pandas
# str.contains stays quiet about unused capture groups
_MD_GATE = re.compile(
    r"(?:^|\n)\s{0,3}(?:#{1,6}\s|[-*+]\s|\d+\.\s|```)|\[[^\]]+\]\([^)]*\)|\*\*")
_PREFIX_ONLY = re.compile(r"(?m)^((?:> ?)+)?[^\n]*")
_NONBLANK_LINE = re.compile(r"(?m)^.*\S")
_CTRL = re.compile("[\x00-\x08\x0b-\x1f\x7f-\x9f]")
_WS_RUN = re.compile(r"\s+")


def _deskew_columns(canon: pd.Series):
    """Vectorized deskew over the batch: (deskewed, is_blank, angle).

    Exact restatement of canonicalize.deskew: the multiline quote-prefix strip
    equals the per-line strip (only '\\n' newlines remain after canonicalize);
    sum of per-line quote depths == total '>' characters across all prefix
    matches (every quoted line is non-blank, unquoted lines contribute 0);
    the non-blank-line count is the match count of `(?m)^.*\\S` (a line strips
    to '' iff it has no non-whitespace char; `\\s` equals str.isspace for every
    codepoint — verified exhaustively).
    """
    desk = canon.str.replace(_QUOTE_ML, "", regex=True)
    gt_total = canon.str.replace(_PREFIX_ONLY, r"\1", regex=True).str.count(">")
    nonblank = canon.str.count(_NONBLANK_LINE)
    nb = nonblank.to_numpy()
    angle = np.where(nb > 0, gt_total.to_numpy() / np.maximum(nb, 1), 0.0)
    return desk, nb == 0, angle


def _fast_mask(desk: pd.Series, cfg: EngineConfig) -> np.ndarray:
    """True where the closed-form plain path is PROVEN exact (conservative)."""
    ok = (
        ~desk.str.contains(_HTML_TAG, regex=True)   # html parser inapplicable
        & ~desk.str.contains(_MD_GATE, regex=True)  # markdown inapplicable
        & ~desk.str.lstrip().str.slice(0, 1).isin(("{", "["))  # json inapplicable
        & ~desk.str.contains(_CTRL, regex=True)     # control-strip never fires
        # each token+separator is >=2 chars, so this line-length bound proves no
        # line can hit the E10 token-truncation path
        & (desk.str.len() <= 2 * cfg.max_seq_len - 1)
    )
    if cfg.placeholder_char:
        ok &= ~desk.str.contains(cfg.placeholder_char, regex=False)
    return ok.to_numpy()


def _fast_outputs(desk: pd.Series, raw_len: np.ndarray, cfg: EngineConfig):
    """Closed-form outputs for fast rows (positional index 0..k-1).

    Returns (extracted, spans, n_spans, strip_ratio) as aligned arrays/lists.
    """
    k = len(desk)
    lines = desk.str.split("\n").explode()
    row = lines.index.to_numpy()  # repeated row position, non-decreasing
    lines = lines.reset_index(drop=True)

    ll = lines.str.len()
    seg = lines.str.strip()
    slen = seg.str.len().to_numpy()
    # absolute trim offsets: line start = running sum of (len+1) within the row
    lead = (ll - lines.str.lstrip().str.len()).to_numpy()
    ll1 = ll.to_numpy() + 1
    cum = np.cumsum(ll1) - ll1
    if len(row):
        # per-line base = cum at the row's first line (cum is increasing, so a
        # forward running max over first-line markers propagates it)
        is_first = np.r_[True, row[1:] != row[:-1]]
        row_base = np.maximum.accumulate(np.where(is_first, cum, 0))
    else:
        row_base = cum
    abs_s = lead + cum - row_base
    abs_e = abs_s + slen

    nbad = seg.str.count(_NON_TEXTY).to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        conf_det = np.where(slen > 0, (slen - nbad) / np.maximum(slen, 1), 0.0)
    keep = (slen > 0) & (conf_det >= cfg.score_thr)

    kseg = seg[keep].reset_index(drop=True)
    krow = row[keep]
    kbad = nbad[keep]
    # recognition: whitespace collapse (interior runs only; ends are trimmed)
    collapsed = kseg.str.replace(_WS_RUN, " ", regex=True)
    ctext = collapsed.to_numpy()
    # token-min confidence; clean lines are exactly 1.0, dirty lines take the
    # min over their tokens that contain a non-texty char (normalize.recognize_one)
    conf_cls = np.ones(len(kseg))
    dirty = np.flatnonzero(kbad > 0)
    if len(dirty):
        toks = collapsed.iloc[dirty].str.split(" ").explode()
        tl = toks.str.len().to_numpy().astype(np.float64)
        tb = toks.str.count(_NON_TEXTY).to_numpy()
        tconf = np.where(tb > 0, (tl - tb) / np.maximum(tl, 1.0), 1.0)
        tmin = pd.Series(tconf, index=toks.index).groupby(level=0).min()
        conf_cls[tmin.index.to_numpy()] = tmin.to_numpy()
    is_num = collapsed.str.match(_NUMERIC).to_numpy()

    ks = abs_s[keep]
    ke = abs_e[keep]
    # assemble per-row span lists / extracted text in line order
    spans_out = [[] for _ in range(k)]
    text_parts = [[] for _ in range(k)]
    for i in range(len(krow)):
        r = krow[i]
        t = ctext[i]
        spans_out[r].append({
            "start": int(ks[i]), "end": int(ke[i]),
            "kind": "num" if is_num[i] else "text",
            "conf": float(conf_cls[i]), "text": t,
        })
        text_parts[r].append(t)
    extracted = ["\n".join(p) for p in text_parts]
    n_spans = np.array([len(s) for s in spans_out], dtype=np.int64)
    elen = np.array([len(t) for t in extracted], dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        strip_ratio = np.where(
            (n_spans > 0) & (raw_len > 0),
            1.0 - elen / np.maximum(raw_len, 1), 0.0)
    return extracted, spans_out, n_spans, strip_ratio


def extract_frame(pdf: pd.DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Batch kernel: one pandas frame of turns in, one frame of extractions out.

    Total function on the empty batch (F6).  Called once per Arrow batch from the Spark
    layer.  Plain-format rows take the vectorized closed form (pandas .str /
    numpy across the whole batch); every other row runs the per-turn oracle —
    outputs are byte-identical either way (golden + equivalence suites).
    """
    n = len(pdf)
    if n == 0:
        out = pd.DataFrame({c: [] for c in OUTPUT_COLUMNS}, columns=OUTPUT_COLUMNS)
        return out

    conv = pdf["conv_id"].to_numpy()
    tidx = pdf["turn_idx"].to_numpy()
    raw = pdf["text"].fillna("").astype(str).reset_index(drop=True)
    raw_len = raw.str.len().to_numpy()

    vec_ok = cfg.extend_span_start == 0.0 and cfg.extend_span_end == 0.0
    if vec_ok:
        canon = (raw.str.normalize("NFC")
                 .str.replace("\r\n", "\n", regex=False)
                 .str.replace("\r", "\n", regex=False))
        if cfg.max_chars:
            canon = canon.str.slice(0, cfg.max_chars)
        desk, is_blank_v, angle_v = _deskew_columns(canon)
        fast = _fast_mask(desk, cfg)
    else:  # nonzero margins: closed form not proven — everything per-turn
        fast = np.zeros(n, dtype=bool)

    extracted = np.empty(n, dtype=object)
    spans = np.empty(n, dtype=object)
    n_spans = np.zeros(n, dtype=np.int64)
    strip_ratio = np.zeros(n, dtype=np.float64)
    fmt = np.empty(n, dtype=object)
    is_blank = np.zeros(n, dtype=bool)
    angle = np.zeros(n, dtype=np.float64)
    page_skew = np.zeros(n, dtype=np.float64)

    fpos = np.flatnonzero(fast)
    if len(fpos):
        f_ext, f_spans, f_n, f_ratio = _fast_outputs(
            desk.iloc[fpos].reset_index(drop=True), raw_len[fpos], cfg)
        extracted[fpos] = f_ext
        for j, p in enumerate(fpos):
            spans[p] = f_spans[j]
        n_spans[fpos] = f_n
        strip_ratio[fpos] = f_ratio
        fmt[fpos] = "plain"
        is_blank[fpos] = is_blank_v[fpos]
        angle[fpos] = angle_v[fpos]
        # page_skew stays 0.0: no word is ever assigned to an existing row

    texts = raw.to_numpy()
    if vec_ok:
        dsk = desk.to_numpy()

        def _slow(i):  # reuse the vectorized (exact) canonicalize+deskew
            return _extract_prepared(dsk[i], bool(is_blank_v[i]),
                                     float(angle_v[i]), int(raw_len[i]), cfg)
    else:
        def _slow(i):
            return extract_turn(texts[i], cfg)

    for i in np.flatnonzero(~fast):
        r = _slow(i)
        extracted[i] = r["extracted_text"]
        spans[i] = r["spans"]
        n_spans[i] = r["n_spans"]
        strip_ratio[i] = r["strip_ratio"]
        fmt[i] = r["fmt"]
        is_blank[i] = r["is_blank"]
        angle[i] = r["angle"]
        page_skew[i] = r["page_skew"]

    out = pd.DataFrame({
        "conv_id": conv, "turn_idx": tidx, "extracted_text": extracted,
        "spans": spans, "n_spans": n_spans, "strip_ratio": strip_ratio,
        "fmt": fmt, "is_blank": is_blank, "angle": angle,
        "page_skew": page_skew,
    }, columns=OUTPUT_COLUMNS)
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out
