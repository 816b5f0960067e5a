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
from ocr_engine_spark.kernel.stitch import SpanWord, words_formation


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

    segments, page_skew = words_formation(
        words, page_width, cfg.word_formation_mode,
        cfg.max_running_y_shift_degree, cfg.gradient,
        cfg.max_x_dist, cfg.y_overlap_threshold)

    out_words = []
    for seg in segments:
        if seg.members:  # a Line: flatten its word-groups (dto.py:271-273 list_words)
            for grp in seg.members:
                out_words.extend(grp.words)
        else:
            out_words.extend(seg.words)
    spans = [
        {"start": w.start, "end": w.end, "kind": w.kind,
         "conf": float(w.conf_cls), "text": w.text}
        for w in out_words
    ]
    extracted = "\n".join(seg.text for seg in segments)
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


def extract_frame(pdf: pd.DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Batch kernel: one pandas frame of turns in, one frame of extractions out.

    Total function on the empty batch (F6).  Called once per Arrow batch from the Spark
    layer; all per-row work happens here, behind the Arrow boundary.
    """
    n = len(pdf)
    cols = {c: [] for c in OUTPUT_COLUMNS}
    if n:
        conv = pdf["conv_id"].to_numpy()
        tidx = pdf["turn_idx"].to_numpy()
        texts = pdf["text"].to_numpy()
        for i in range(n):
            r = extract_turn(texts[i] if texts[i] is not None else "", cfg)
            cols["conv_id"].append(conv[i])
            cols["turn_idx"].append(tidx[i])
            for k in OUTPUT_COLUMNS[2:]:
                cols[k].append(r[k])
    out = pd.DataFrame(cols, columns=OUTPUT_COLUMNS)
    out["turn_idx"] = out["turn_idx"].astype("int32") if n else out["turn_idx"]
    return out
