"""Unit tests for conversation-level assembly (operators/conversations.py).

The contract queries (conv_assemble / conv_dedup) value-check the end-to-end
path against DuckDB; these tests pin the assembly semantics in isolation:
turn ordering, role prefixes, tool counting, ts span, and determinism under
repartitioning (the A1 collect_list-nondeterminism rule).
"""

import datetime
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from ocr_engine_spark.operators.conversations import assemble_conversations  # noqa: E402

SCHEMA = ("conv_id string, turn_idx int, extracted_text string, "
          "role string, tool string, ts timestamp")


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2026, 1, 1, 0, 0, s)


def _rows():
    # turns deliberately OUT of turn_idx order in the input
    return [
        ("c1", 2, "done", "assistant", None, _ts(9)),
        ("c1", 0, "hi", "user", None, _ts(1)),
        ("c1", 1, "result", "tool", "search", _ts(4)),
        ("c2", 0, "solo", "user", None, _ts(0)),
    ]


def test_assembly_order_roles_and_counts(spark):
    out = assemble_conversations(
        spark.createDataFrame(_rows(), SCHEMA)).orderBy("conv_id").collect()
    c1, c2 = out
    assert c1["doc_text"] == "user: hi\ntool: result\nassistant: done"
    assert (c1["n_turns"], c1["n_tool_turns"]) == (3, 1)
    assert c1["span_seconds"] == 8
    assert c1["doc_chars"] == len(c1["doc_text"])
    assert c2["doc_text"] == "user: solo"
    assert (c2["n_turns"], c2["n_tool_turns"], c2["span_seconds"]) == (1, 0, 0)


def test_assembly_deterministic_under_repartition(spark):
    df = spark.createDataFrame(
        [(f"c{i % 7}", t, f"t{t}", "user", None, _ts(t))
         for i in range(7) for t in range(40)], SCHEMA)
    a = assemble_conversations(df.repartition(1)).orderBy("conv_id").collect()
    b = assemble_conversations(df.repartition(13)).orderBy("conv_id").collect()
    assert a == b
    assert all(r["doc_text"].count("\n") == r["n_turns"] - 1 for r in a)
