"""S10 visualization sink: span bbox + label rendering as SVG (no image libs).

Reference semantics: ``Page.visualize_bbox_and_label``/``Page.save_img``
(/root/reference/src/dto.py:448-462) draw one rectangle plus a text label per
word on the page image via ``visualize_bbox_and_label``
(/root/reference/src/utils.py:322-369) and write it with ``cv2.imwrite``.

The graft's pseudo-geometry is 1-D character offsets, so the debug rendering is
re-expressed as deterministic SVG markup — pure string assembly, which keeps the
whole sink a JVM-side column expression (no Python, no image libraries) and makes
the output value-checkable cross-engine: each span becomes one
``<g><rect .../><text ...>label</text></g>`` element at

    x = CHAR_W * start,  y = ROW_H * span_index (reading order = row order),
    width = CHAR_W * (end - start), height = BOX_H

mirroring the reference's per-word rect + label-above-box layout.  Labels are
XML-escaped; the ``kind`` column rides along as the rect's CSS class (the
reference colors boxes by label class).

At 100 TB the sink stays distributed: ``render_span_svg`` emits one
``(doc key, svg)`` row per document and ``save_svg`` writes them as parquet —
an object-store uploader fans rows out to individual ``.svg`` objects; writing
10^9 individual files from the driver (the reference's ``save_path`` loop) is
exactly the anti-pattern a cluster sink must avoid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CHAR_W = 8   # px per character cell
ROW_H = 18   # px per reading-order row
BOX_H = 16   # rect height (ROW_H minus 2px leading)
TEXT_DX = 2  # label inset, reference's label-offset-inside-box analogue
TEXT_DY = 12  # label baseline within the row

SVG_OPEN = '<svg xmlns="http://www.w3.org/2000/svg" width="%d" height="%d">'
SVG_ELEM = (
    '<g><rect x="%d" y="%d" width="%d" height="%d" class="%s"/>'
    '<text x="%d" y="%d">%s</text></g>'
)


def xml_escape(col: Column) -> Column:
    """Minimal XML text escape (&, <, > — order matters: & first)."""
    return F.replace(
        F.replace(F.replace(col, F.lit("&"), F.lit("&amp;")),
                  F.lit("<"), F.lit("&lt;")),
        F.lit(">"), F.lit("&gt;"))


def svg_from_spans(spans: Column) -> Column:
    """Column expression: ordered span-struct array -> complete SVG document.

    Width covers the widest span end, height one row per span (reading order
    is the row order the stitcher emitted — the page layout the reference
    draws).  Empty span arrays render an empty 0x0 canvas.
    """
    elems = F.array_join(
        F.transform(
            spans,
            lambda sp, i: F.format_string(
                SVG_ELEM,
                (sp["start"] * CHAR_W).cast("int"),
                (i * ROW_H).cast("int"),
                ((sp["end"] - sp["start"]) * CHAR_W).cast("int"),
                F.lit(BOX_H),
                sp["kind"],
                (sp["start"] * CHAR_W + TEXT_DX).cast("int"),
                (i * ROW_H + TEXT_DY).cast("int"),
                xml_escape(sp["text"]),
            ),
        ),
        "",
    )
    width = F.coalesce(
        F.array_max(F.transform(spans, lambda sp: sp["end"])), F.lit(0)
    ) * CHAR_W
    height = F.size(spans) * ROW_H
    return F.concat(
        F.format_string(SVG_OPEN, width.cast("int"), height.cast("int")),
        elems,
        F.lit("</svg>"),
    )


def render_span_svg(extracted: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """(keys..., spans, ...) -> (keys..., svg): one SVG document per row."""
    keys = key_cols or ["conv_id", "turn_idx"]
    return extracted.select(*keys, svg_from_spans(F.col("spans")).alias("svg"))


def save_svg(rendered: DataFrame, out_dir: str) -> None:
    """Distributed sink for the rendered documents (parquet rows, not
    driver-side per-file writes — see module docstring for the scale rationale)."""
    rendered.write.mode("overwrite").parquet(out_dir)


def q_span_svg(spark, sf_dir: str) -> DataFrame:
    """S10 contract query: full kernel over the markdown payload
    ('# ' || source || newline || '- ' || text — the q_markdown_extract
    two-row layout), then the SVG renderer over the resulting span geometry.
    The oracle rebuilds the byte-exact SVG string from the markdown closed
    forms, so rect positions, row order, CSS classes, and label escaping are
    all value-checked cross-engine."""
    from ocr_engine_spark.operators.documents import load
    from ocr_engine_spark.operators.extract import extract_transcripts

    docs = load(spark, sf_dir, "documents")
    as_turns = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.concat(F.lit("# "), F.col("source"), F.lit("\n"),
                 F.lit("- "), F.col("text")).alias("text"),
    )
    out = extract_transcripts(
        as_turns, num_partitions=spark.sparkContext.defaultParallelism * 2)
    return render_span_svg(out, key_cols=["conv_id"]).select(
        F.col("conv_id").cast("bigint").alias("doc_id"), "svg")
