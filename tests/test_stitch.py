"""Reading-order stitch unit tests (J2, O1/O2, A1, A3-A5, E13)."""

import pytest

from ocr_engine_spark.kernel.stitch import (
    SpanWord, merge_group, robust_max, stitch_lines, stitch_word_groups,
    words_formation,
)


def W(x1, y1, x2, y2, text, cd=0.9, cc=0.8):
    return SpanWord(x1=x1, y1=y1, x2=x2, y2=y2, text=text, conf_det=cd, conf_cls=cc)


def test_robust_max_iqr_filters_outliers():
    # utils.py:22-42 with threshold 1.0: q1=10, q3=10 -> iqr 0 -> only 10s survive
    assert robust_max([10, 10, 10, 10, 500]) == 10
    assert robust_max([5]) == 5
    assert robust_max([1, 2, 3, 4]) == 4


def test_merge_group_semantics():
    # word_formation.py:283-297 — ' '.join in member order, min/max box, mean confs
    g = merge_group([W(0, 0, 5, 10, "hello", cd=0.8, cc=0.6),
                     W(7, 1, 12, 9, "world", cd=0.4, cc=1.0)])
    assert g.text == "hello world"
    assert (g.x1, g.y1, g.x2, g.y2) == (0, 0, 12, 10)
    assert g.conf_det == pytest.approx(0.6)
    assert g.conf_cls == pytest.approx(0.8)


def test_stitch_row_assignment_and_order():
    # two lines of two words each, given out of order -> reading order restored
    words = [
        W(50, 0, 60, 10, "B1"), W(0, 12, 10, 22, "A2"),
        W(0, 0, 10, 10, "A1"), W(50, 12, 60, 22, "B2"),
    ]
    groups, skew = stitch_word_groups(words, 100.0, 0.6, 0.5, 1000)
    assert [g.text for g in groups] == ["A1 B1", "A2 B2"]
    assert skew == 0.0  # perfectly level rows -> zero running shift


def test_max_x_dist_splits_groups():
    # words on the same row but far apart horizontally form separate word-groups
    words = [W(0, 0, 10, 10, "left"), W(500, 0, 510, 10, "right")]
    groups, _ = stitch_word_groups(words, 100.0, 0.6, 0.5, 20)
    assert [g.text for g in groups] == ["left", "right"]
    # ... but mode "line" re-joins them into one visual line
    lines = stitch_lines(groups, 0.5)
    assert [ln.text for ln in lines] == ["left right"]


def test_running_y_shift_ema_clamp():
    # A4 (word_formation.py:406-415): shift = min(g*prev + (1-g)*new, max_shift)
    # word 2 drifts down by 4 px; row box extends to union so new_shift is computed
    # against the UPDATED row box (word_formation.py:439-443 order)
    words = [W(0, 0, 10, 10, "a"), W(12, 4, 22, 14, "b")]
    _, skew = stitch_word_groups(words, 100.0, 0.6, 0.5, 1000)
    # union row = y[0,14]; word b center 9, row center 7 -> new_shift 2; EMA: .6*0+.4*2=.8
    assert skew == pytest.approx(0.8)
    # clamp: same drift with a tiny max_running_y_shift
    _, skew_clamped = stitch_word_groups(words, 0.5, 0.6, 0.5, 1000)
    assert skew_clamped == pytest.approx(0.5)


def test_stable_sort_tiebreaks():
    # O1/O2 — equal x then equal top-y: original relative order preserved (Python
    # sorted is stable; word_formation.py:421,446)
    words = [W(0, 0, 10, 10, "first"), W(0, 20, 10, 30, "second"),
             W(0, 40, 10, 50, "third")]
    groups, _ = stitch_word_groups(words, 100.0, 0.6, 0.5, 1000)
    assert [g.text for g in groups] == ["first", "second", "third"]


def test_words_formation_empty_and_bad_mode():
    # F6 (word_formation.py:527-528) and the NotImplementedError mode guard (:538)
    assert words_formation([], 100, "line", 10, 0.6, 20, 0.5) == ([], 0)
    with pytest.raises(NotImplementedError):
        words_formation([W(0, 0, 1, 1, "x")], 100, "nope", 10, 0.6, 20, 0.5)


def test_line_mode_flattens_and_sorts_by_top():
    words = [W(0, 100, 10, 110, "low"), W(0, 0, 10, 10, "high")]
    lines, _ = words_formation(words, 100, "line", 10, 0.6, 20, 0.5)
    assert [ln.text for ln in lines] == ["high", "low"]


def test_drifting_row_merge_reverse_delete():
    # §2.7 — rows that drift into overlap merge with reverse-delete + reversed-extend
    # (word_formation.py:331-356).  Construct three rows then a word overlapping all.
    words = [
        W(0, 0, 10, 10, "r1"),
        W(0, 7, 10, 17, "r2"),   # separate row (overlap below threshold at creation)
        W(12, 3, 22, 13, "bridge"),  # overlaps both rows enough to trigger the merge
    ]
    groups, _ = stitch_word_groups(words, 100.0, 0.6, 0.3, 1000)
    # all words end in one merged group; survivor keeps its words then the merged tail
    assert sum(len(g.words) for g in groups) == 3


# --- alternate pluggable algorithms (SURVEY.md §2.10; reference selects by ---
# import at /root/reference/src/ocr.py:19-21) ---------------------------------


def test_tesseract_mode_rows_groups_and_line_text():
    from ocr_engine_spark.kernel.stitch import words_to_lines_tesseract

    words = [
        W(0, 0, 5, 10, "alpha"),
        W(50, 0, 55, 10, "beta"),    # same row, x-gap 45 > max_x_dist 20
        W(0, 20, 5, 30, "gamma"),    # second row
    ]
    lines, skew = words_to_lines_tesseract(
        words, page_width=100, max_running_y_shift_degree=10,
        gradient=0.6, max_x_dist=20, y_overlap_threshold=0.5)
    assert [ln.text for ln in lines] == ["alpha beta", "gamma"]
    # the x-gap splits the first row into two word-groups; the line keeps both
    assert [g.text for g in lines[0].members] == ["alpha", "beta"]
    assert [g.text for g in lines[1].members] == ["gamma"]
    assert isinstance(skew, float) or skew == 0


def test_tesseract_mode_seeds_row_size_with_iqr_max():
    """The tesseract variant seeds max_row_size from the IQR-robust max over ALL
    heights (word_formation.py:229), so one 100x-tall outlier word does not widen
    the row-capture band for everything after it."""
    from ocr_engine_spark.kernel.stitch import words_to_lines_tesseract

    words = [W(0, 0, 5, 10, "a"), W(10, 0, 15, 10, "b"),
             W(20, 0, 25, 10, "c"), W(30, 0, 35, 10, "d"),
             W(6, 0, 8, 1000, "tall"),  # height outlier
             W(0, 40, 5, 50, "next")]
    lines, _ = words_to_lines_tesseract(
        words, page_width=100, max_running_y_shift_degree=10,
        gradient=0.6, max_x_dist=20, y_overlap_threshold=0.5)
    texts = [ln.text for ln in lines]
    # 'next' (y 40..50) must stay its own line: with a first-word seed the tall
    # outlier would have inflated max_row_size before 'next' arrived either way,
    # but the IQR seed keeps the pre-outlier band at ~10
    assert any("next" == t for t in texts)


def test_mmocr_mode_chains_and_sorts():
    from ocr_engine_spark.kernel.stitch import words_to_lines_mmocr

    words = [
        W(0, 20, 5, 30, "below"),
        W(0, 0, 5, 10, "left"),
        W(8, 0, 13, 10, "right"),
    ]
    lines, skew = words_to_lines_mmocr(words)
    assert skew == 0.0
    assert [ln.text for ln in lines] == ["left right", "below"]
    # one word-group per mmocr line (reference wraps the merged chain in a single
    # WordGroup, word_formation.py:159-165)
    assert all(len(ln.members) == 1 for ln in lines)


def test_words_formation_dispatches_alternates():
    lines_t, _ = words_formation(
        [W(0, 0, 5, 10, "x"), W(8, 0, 13, 10, "y")], 100, "tesseract",
        10, 0.6, 20, 0.5)
    assert [ln.text for ln in lines_t] == ["x y"]
    lines_m, skew_m = words_formation(
        [W(0, 0, 5, 10, "x")], 100, "mmocr", 10, 0.6, 20, 0.5)
    assert [ln.text for ln in lines_m] == ["x"] and skew_m == 0.0


def test_lines_closed_form_matches_live_stitch_fuzz():
    """The O(n) closed form must reproduce the O(n^2) live 'line' stitch
    word-for-word on random grid pseudo-geometry (the invariant every parser
    guarantees: spans never cross lines, constant line height)."""
    import random

    from ocr_engine_spark.kernel.stitch import (
        SpanWord, lines_closed_form, words_formation,
    )

    rng = random.Random(99)
    h = 10
    for trial in range(300):
        words = []
        n_lines = rng.randint(1, 6)
        for li in range(n_lines):
            if rng.random() < 0.25:
                continue  # blank line
            x = rng.randint(0, 4)
            for _ in range(rng.randint(1, 5)):
                ln = rng.randint(1, 9)
                words.append(SpanWord(
                    x1=x, y1=li * h, x2=x + ln, y2=li * h + h,
                    text=f"w{li}_{x}", conf_det=1.0, conf_cls=1.0,
                    start=li * 1000 + x, end=li * 1000 + x + ln, kind="text"))
                # next word's gap: sometimes < max_x_dist, sometimes >
                x += ln + rng.choice([1, 3, 25, 40])
        if not words:
            continue
        texts, flat, skew = lines_closed_form(words)
        segments, live_skew = words_formation(
            words, page_width=200, mode="line",
            max_running_y_shift_degree=10, gradient=0.6,
            max_x_dist=20, y_overlap_threshold=0.5)
        live_words = []
        for seg in segments:
            for grp in seg.members:
                live_words.extend(grp.words)
        assert [w.text for w in flat] == [w.text for w in live_words], trial
        assert texts == [seg.text for seg in segments], trial
        assert skew == live_skew == 0.0, trial
