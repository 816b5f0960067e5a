"""Span-op unit tests pinning the reference Box edge semantics (SURVEY.md §5.2 item 2)."""

import pytest

from ocr_engine_spark.kernel.spans import (
    clamp_span, extend_span, interval_iou, prepare_spans, span_is_valid,
    span_length, span_to_int,
)


def test_extend_sequential_update_quirk():
    # dto.py:71-79 — the end shift uses the ALREADY-shifted start:
    # start = 10 - (20-10)*0.1 = 9 ; end = 20 + (20-9)*0.1 = 21.1 (not 21.0)
    assert extend_span(10, 20, 0.1, 0.1) == (9.0, 21.1)
    # zero margins are the identity
    assert extend_span(3, 7, 0.0, 0.0) == (3, 7)


def test_clamp_bounds():
    assert clamp_span(-5, 3, 10) == (0, 3)
    assert clamp_span(4, 99, 10) == (4, 10)
    assert clamp_span(-5, 99, 10) == (0, 10)
    assert clamp_span(12, 15, 10) == (10, 10)  # fully out -> degenerate


def test_int_truncation_not_rounding():
    # dto.py:49-55 normalize_bbox uses int() truncation
    assert span_to_int(1.9, 7.99) == (1, 7)


def test_sentinel_raises():
    # dto.py:85-89 — the all-(-1) sentinel raises
    with pytest.raises(ValueError):
        span_is_valid(-1, -1)
    assert span_is_valid(0, 1) is True
    assert span_is_valid(5, 5) is False


def test_length_floor():
    # dto.py:29-35 — width/height floored at -1
    assert span_length(10, 2) == -1
    assert span_length(2, 10) == 8


def test_prepare_spans_mask_positions():
    # invalid spans keep their position in the mask (ocr.py:131-152, 164-179)
    prepared, mask = prepare_spans([(0, 4), (8, 8), (5, 7)], 10, 0.0, 0.0)
    assert mask == [True, False, True]
    assert prepared[0] == (0, 4) and prepared[1] is None and prepared[2] == (5, 7)


def test_prepare_spans_clamps_past_end():
    prepared, mask = prepare_spans([(5, 50)], 10, 0.0, 0.5)
    assert mask == [True]
    assert prepared[0] == (5, 10)


def test_interval_iou():
    assert interval_iou(0, 10, 10, 20) == 0.0
    assert interval_iou(0, 10, 5, 15) == pytest.approx(5 / 15)
    assert interval_iou(0, 10, 0, 10) == 1.0
