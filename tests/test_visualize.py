"""S10 visualization sink tests (reference: Page.visualize_bbox_and_label /
save_img, /root/reference/src/dto.py:448-462): SVG well-formedness, geometry,
escaping, empty-canvas edge, and the distributed save/read roundtrip."""

import xml.etree.ElementTree as ET

from pyspark.sql import Row, functions as F

from ocr_engine_spark.operators.visualize import (
    BOX_H, CHAR_W, ROW_H, render_span_svg, save_svg, svg_from_spans,
)


def _span(start, end, kind, text, conf=1.0):
    return Row(start=start, end=end, kind=kind, conf=conf, text=text)


def _render_one(spark, spans):
    df = spark.createDataFrame(
        [Row(conv_id="c", turn_idx=0, spans=spans)],
        "conv_id string, turn_idx int, "
        "spans array<struct<start:int,end:int,kind:string,conf:double,text:string>>",
    )
    return df.select(svg_from_spans(F.col("spans")).alias("svg")).first().svg


def test_svg_geometry_and_order(spark):
    svg = _render_one(spark, [_span(2, 7, "text", "hello"), _span(0, 3, "html", "xy")])
    root = ET.fromstring(svg)  # well-formed XML
    ns = "{http://www.w3.org/2000/svg}"
    assert root.tag == f"{ns}svg"
    # width covers the widest span end (7), height one row per span
    assert root.attrib["width"] == str(7 * CHAR_W)
    assert root.attrib["height"] == str(2 * ROW_H)
    rects = root.findall(f"{ns}g/{ns}rect")
    texts = root.findall(f"{ns}g/{ns}text")
    assert len(rects) == 2 and len(texts) == 2
    # reading order = row order: first span on row 0, second on row 1
    assert rects[0].attrib == {
        "x": str(2 * CHAR_W), "y": "0", "width": str(5 * CHAR_W),
        "height": str(BOX_H), "class": "text"}
    assert rects[1].attrib["y"] == str(ROW_H)
    assert rects[1].attrib["class"] == "html"
    assert texts[0].text == "hello" and texts[1].text == "xy"


def test_svg_label_escaping(spark):
    svg = _render_one(spark, [_span(0, 5, "text", 'a<b>&"c')])
    assert "&lt;b&gt;&amp;" in svg
    root = ET.fromstring(svg)
    # the parser round-trips the escaped label back to the raw text
    assert root.find("{http://www.w3.org/2000/svg}g/"
                     "{http://www.w3.org/2000/svg}text").text == 'a<b>&"c'


def test_svg_empty_spans(spark):
    svg = _render_one(spark, [])
    root = ET.fromstring(svg)
    assert root.attrib["width"] == "0" and root.attrib["height"] == "0"
    assert len(root) == 0


def test_save_svg_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(conv_id="a", turn_idx=0, spans=[_span(0, 4, "text", "word")]),
         Row(conv_id="b", turn_idx=1, spans=[])],
        "conv_id string, turn_idx int, "
        "spans array<struct<start:int,end:int,kind:string,conf:double,text:string>>",
    )
    rendered = render_span_svg(df)
    out = str(tmp_path / "svg_sink")
    save_svg(rendered, out)
    back = {r.conv_id: r.svg for r in spark.read.parquet(out).collect()}
    assert set(back) == {"a", "b"}
    assert ET.fromstring(back["a"]).attrib["width"] == str(4 * CHAR_W)
    assert "<rect" not in back["b"]
