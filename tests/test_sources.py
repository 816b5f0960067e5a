"""Permissive JSONL ingestion: bad rows quarantine, the job never fails (S2/S4)."""

import json

import pytest

from ocr_engine_spark.sources.jsonl import read_transcripts_jsonl, split_quarantine

GOOD = [
    {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello world",
     "tool": None, "ts": "2026-01-01T00:00:00.000Z"},
    {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "",
     "tool": None, "ts": "2026-01-01T00:00:30.000Z"},  # blank text stays good (F5)
    {"conv_id": "c2", "turn_idx": 0, "role": "tool", "text": "{\"a\": 1}",
     "tool": "search", "ts": "2026-01-01T01:00:00.000Z"},
]
BAD_MALFORMED = '{"conv_id": "c3", "turn_idx": 0, "text": "trunca'
BAD_MISSING_KEY = {"role": "user", "text": "no ids here"}


@pytest.fixture(scope="module")
def jsonl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "tx.jsonl"
    lines = [json.dumps(r) for r in GOOD[:2]] + [BAD_MALFORMED] \
        + [json.dumps(GOOD[2]), json.dumps(BAD_MISSING_KEY)]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_split_quarantine(spark, jsonl_path):
    df = read_transcripts_jsonl(spark, jsonl_path)
    good, quarantined = split_quarantine(df)
    assert good.count() == 3
    q = {r["reason"] for r in quarantined.collect()}
    assert quarantined.count() == 2 and q == {"malformed", "missing_key"}
    # the malformed raw line is preserved as evidence
    raws = [r["_corrupt_record"] for r in quarantined.collect()
            if r["reason"] == "malformed"]
    assert raws == [BAD_MALFORMED]


def test_manifest_csv_reads_and_quarantines(spark, tmp_path):
    from ocr_engine_spark.sources.manifest import (
        read_manifest_csv, write_demo_manifest,
    )

    path = write_demo_manifest(str(tmp_path / "m" / "manifest.csv"), [3, 23, 43])
    good, quarantined = read_manifest_csv(spark, path)
    assert [r["doc_id"] for r in good.orderBy("doc_id").collect()] == [3, 23, 43]
    assert good.schema["doc_id"].dataType.typeName() == "long"
    q = quarantined.collect()
    assert len(q) == 1 and q[0]["reason"] == "bad_doc_id"
    assert q[0]["out_path"] == "out/bad.tsv"  # evidence columns preserved


def test_manifest_csv_missing_header_raises(spark, tmp_path):
    from ocr_engine_spark.sources.manifest import read_manifest_csv

    p = tmp_path / "broken.csv"
    p.write_text("id,path\n1,x\n")  # wrong header: no doc_id/out_path
    with pytest.raises(ValueError, match="missing required column"):
        read_manifest_csv(spark, str(p))


def test_good_rows_extract(spark, jsonl_path):
    from ocr_engine_spark.operators.extract import extract_transcripts

    good, _ = split_quarantine(read_transcripts_jsonl(spark, jsonl_path))
    out = extract_transcripts(good).orderBy("conv_id", "turn_idx").collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in out] == \
        [("c1", 0), ("c1", 1), ("c2", 0)]
    assert out[0]["extracted_text"] == "hello world"
    assert out[1]["is_blank"] is True and out[1]["n_spans"] == 0


def test_explode_parts_range_clamps_like_from_pdf(spark):
    """Mirrors /root/reference/src/utils.py:231-237: pages[start : min(len, end+1)],
    absolute part numbering, empty result when start is past the end."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ocr_engine_spark.operators.documents import explode_parts_range

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a table bb table ccc table dddd", "single"],
    }))

    def run(**kw):
        rows = explode_parts_range(docs, **kw).orderBy("doc_id", "part_idx").collect()
        return [(r["doc_id"], r["part_idx"], r["part_len"]) for r in rows]

    # reference default end_page=0 -> first part only
    assert run(start=0, end=0) == [(1, 0, 1), (2, 0, 6)]
    # end clamped to the part count (doc 2 has 1 part -> only its part 0 w/ start=0)
    assert run(start=1, end=99) == [(1, 1, 2), (1, 2, 3), (1, 3, 4)]
    # end=None reads to the end
    assert run(start=2, end=None) == [(1, 2, 3), (1, 3, 4)]
    # start past the end -> no rows for that doc
    assert run(start=1, end=1) == [(1, 1, 2)]


def test_union_sources_by_name(spark):
    import pandas as pd

    from ocr_engine_spark.sources.transcripts import union_sources

    a = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "x": ["ax"]}))
    b = spark.createDataFrame(pd.DataFrame({"y": [2.5], "doc_id": [2]}))  # reordered
    u = union_sources([a, b]).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in u] == [1, 2]
    assert u[0]["x"] == "ax" and u[0]["y"] is None  # null-filled, name-mapped
    assert u[1]["x"] is None and u[1]["y"] == 2.5

    import pytest as _pytest
    with _pytest.raises(ValueError):
        union_sources([])


def test_resolve_flavor_rules(tmp_path):
    from ocr_engine_spark.sources.io import resolve_flavor

    assert resolve_flavor("/x/y", "auto") == "parquet"          # separator
    assert resolve_flavor("data.parquet", "auto") == "parquet"  # suffix
    assert resolve_flavor(str(tmp_path), "auto") == "parquet"   # exists
    assert resolve_flavor("warehouse_tbl", "auto") == "table"   # bare name
    # explicit flavor always wins over shape inference
    assert resolve_flavor("out", "parquet") == "parquet"        # the ADVICE case
    assert resolve_flavor("/x/y", "table") == "table"
    with pytest.raises(ValueError):
        resolve_flavor("x", "iceberg")


def test_overwrite_partitions_leaves_session_conf_alone(spark, tmp_path):
    """The dynamic overwrite mode must be a per-write option, never a session-wide
    mutation that silently changes unrelated writes."""
    import pandas as pd

    from ocr_engine_spark.sources.io import overwrite_partitions

    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key)
    df = spark.createDataFrame(pd.DataFrame({"v": [1, 2], "p": [0, 1]}))
    target = str(tmp_path / "ow.parquet")
    overwrite_partitions(df, target, "p")
    assert spark.conf.get(key) == before
    # and the write itself WAS dynamic: rewriting one partition keeps the other
    df2 = spark.createDataFrame(pd.DataFrame({"v": [9], "p": [1]}))
    overwrite_partitions(df2, target, "p")
    rows = sorted((r["p"], r["v"]) for r in spark.read.parquet(target).collect())
    assert rows == [(0, 1), (1, 9)]


def test_bucketed_tables_join_with_zero_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key/count must sort-merge join with NO
    Exchange node — the co-located layout the 100 TB design relies on."""
    import pandas as pd

    from ocr_engine_spark.sources.io import write_bucketed

    left = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(200), "payload": [f"p{i}" for i in range(200)]}))
    right = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(0, 200, 2), "meta": [f"m{i}" for i in range(0, 200, 2)]}))
    write_bucketed(left, "bkt_left", "doc_id", 8)
    write_bucketed(right, "bkt_right", "doc_id", 8)
    try:
        # hint forces sort-merge (the tiny test tables would auto-broadcast,
        # which hides the layout; at real scale neither side broadcasts)
        joined = spark.table("bkt_left").hint("merge").join(
            spark.table("bkt_right").hint("merge"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
        assert joined.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
