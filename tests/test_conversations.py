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

from ocr_engine_spark.operators.conversations import (  # noqa: E402
    assemble_conversations, truncate_to_budget,
)

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


def test_truncate_to_budget_prefix_semantics(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    # c1 turns assemble to 'user: hi\ntool: result\nassistant: done';
    # prefix lengths: 'user: hi'=8, +'\ntool: result'=21, +…=37
    full = assemble_conversations(truncate_to_budget(df, 10_000))
    assert full.where("conv_id='c1'").first()["n_turns"] == 3
    capped = assemble_conversations(truncate_to_budget(df, 21))
    r = capped.where("conv_id='c1'").first()
    assert r["n_turns"] == 2 and r["doc_text"] == "user: hi\ntool: result"
    # exact boundary: budget 20 excludes the second turn (prefix_len 21 > 20)
    tight = assemble_conversations(truncate_to_budget(df, 20))
    assert tight.where("conv_id='c1'").first()["n_turns"] == 1
    # a conversation whose FIRST turn exceeds the budget disappears entirely
    gone = assemble_conversations(truncate_to_budget(df, 5))
    assert gone.where("conv_id='c1'").count() == 0


def test_conv_neardup_canonical_drop_invariants(spark):
    """Only PLANTS can ever be dropped (cluster canonical = min doc_id, and
    every plant id sits at base + CONV_NEAR_OFFSET, above every base id), and
    the survivor set is exactly all-docs minus the dropped plants."""
    from ocr_engine_spark.operators.conversations import (
        CONV_NEAR_OFFSET, _neardup_assembled, q_conv_neardup,
        q_conv_neardup_canonical,
    )

    sf_dir = "/root/testdata/sf0.001"
    surv = {r["doc_id"] for r in q_conv_neardup_canonical(spark, sf_dir)
            .select("doc_id").collect()}
    alldocs = {r["doc_id"] for r in _neardup_assembled(spark, sf_dir)
               .select("doc_id").collect()}
    dropped = alldocs - surv
    assert surv <= alldocs
    assert all(d >= CONV_NEAR_OFFSET for d in dropped)
    # the dropped set is exactly the plants that LSH paired with their base
    paired_plants = {r["doc_id_b"] for r in q_conv_neardup(spark, sf_dir)
                     .select("doc_id_b").collect()
                     if r["doc_id_b"] >= CONV_NEAR_OFFSET}
    assert dropped == paired_plants
    assert len(dropped) > 0  # non-vacuous: plants exist and pair at sf0.001


def test_conv_neardup_keep_longest_inverts_min_id(spark):
    """The discriminating invariant: every extended plant carries the HIGHER
    doc_id yet survives (it is the longer document), and its base is dropped —
    the exact opposite of what the min-id rule would do on the same pairs."""
    from ocr_engine_spark.operators.conversations import (
        CONV_EXT_RESIDUE, CONV_NEAR_MOD, CONV_NEAR_OFFSET,
        _neardup_extended_assembled, q_conv_neardup_keep_longest,
    )

    sf_dir = "/root/testdata/sf0.001"
    surv = {r["doc_id"] for r in q_conv_neardup_keep_longest(spark, sf_dir)
            .select("doc_id").collect()}
    alldocs = {r["doc_id"] for r in _neardup_extended_assembled(spark, sf_dir)
               .select("doc_id").collect()}
    plants = {d for d in alldocs if d >= CONV_NEAR_OFFSET}
    assert plants and all(
        (p - CONV_NEAR_OFFSET) % CONV_NEAR_MOD == CONV_EXT_RESIDUE
        for p in plants)
    dropped = alldocs - surv
    assert dropped, "vacuous: no cluster formed at sf0.001"
    # dropped docs are exactly the BASES of plants that paired; their longer
    # plant twin survived
    assert all(d < CONV_NEAR_OFFSET for d in dropped)
    assert all(d + CONV_NEAR_OFFSET in surv for d in dropped)


def test_assembly_deterministic_under_repartition(spark):
    df = spark.createDataFrame(
        [(f"c{i % 7}", t, f"t{t}", "user", None, _ts(t))
         for i in range(7) for t in range(40)], SCHEMA)
    a = assemble_conversations(df.repartition(1)).orderBy("conv_id").collect()
    b = assemble_conversations(df.repartition(13)).orderBy("conv_id").collect()
    assert a == b
    assert all(r["doc_text"].count("\n") == r["n_turns"] - 1 for r in a)
