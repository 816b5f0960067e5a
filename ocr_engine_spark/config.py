"""Engine configuration.

Mirrors the reference engine's settings surface (/root/reference/settings.yml:1-29) and its
override-with-validation semantics (/root/reference/src/ocr.py:32-38: unknown keyword ->
ValueError).  The geometry parameters (gradient, max_x_dist, max_running_y_shift_degree,
y_overlap_threshold, word_formation_mode) keep the reference's names and defaults so the
reading-order stitch (kernel/stitch.py) is parameterized identically.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # E1 — input size cap (analogue of img_size [1920,1920], settings.yml:2)
    max_chars: int = 1 << 20

    # E6 — span context-margin extension (analogue of extend_bbox [0,0.03,0.02,0.05],
    # settings.yml:3).  The reference's nonzero margins are top/bottom: they protect
    # CROSS-axis context (Vietnamese accent marks above/below the glyph line).  A 1-D
    # character span has no cross axis, so the defaults are 0; the operator (with the
    # reference's sequential-update quirk) stays config-driven and unit-tested.
    extend_span_start: float = 0.0
    extend_span_end: float = 0.0

    # F2/F3 — detection thresholds (reference: score_thr 0.3 / NMS iou 0.1,
    # externals/sdsvtd/sdsvtd/bbox_head.py:68-69,256-267)
    score_thr: float = 0.3
    iou_thr: float = 0.1

    # E10 — recognition sequence cap (analogue of max_seq_len_overwrite: 24,
    # settings.yml:13; spans hold lines not single words, so default is large)
    max_seq_len: int = 10_000

    # words_to_lines block (settings.yml:24-29) — same names & defaults
    gradient: float = 0.6
    max_x_dist: int = 20
    max_running_y_shift_degree: int = 10
    y_overlap_threshold: float = 0.5
    # "word_group"/"line": the live mmocr_tesseract algorithm (word_formation.py:524-538);
    # "tesseract"/"mmocr": the alternate pluggable algorithms the reference selects by
    # import (/root/reference/src/ocr.py:19-21; word_formation.py:300-326, :154-167)
    word_formation_mode: str = "line"

    # E11 — model-space placeholder remapped to space (/root/reference/src/utils.py:17-19)
    placeholder_char: str = "✪"  # ✪

    # pseudo-geometry: height of one text line in box units (kernel/stitch.py)
    line_height: int = 10

    def override(self, **kwargs) -> "EngineConfig":
        """Overwrite defaults by keyword, rejecting unknown keys.

        Same contract as OcrEngine.__init__ (/root/reference/src/ocr.py:35-38).
        """
        names = {f.name for f in dataclasses.fields(self)}
        for k in kwargs:
            if k not in names:
                raise ValueError("Invalid setting found in EngineConfig: ", k)
        return dataclasses.replace(self, **kwargs)


DEFAULT_CONFIG = EngineConfig()
