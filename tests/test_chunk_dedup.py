"""Sub-document (chunk/paragraph) dedup operators: edge-case semantics.

Pins the contracts of operators/dedup.chunk_documents / paragraph_dedup /
boilerplate_strip that the DuckDB contract oracle exercises only statistically:
trailing-partial-chunk keep, blank-document drop, corpus-order keep-first,
distinct-document (not occurrence) boilerplate counting, and the survival shape
of documents whose every chunk is removed.
"""

import pandas as pd


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_chunk_documents_windows_and_trailing_partial(spark):
    from ocr_engine_spark.operators.dedup import chunk_documents

    df = _docs(spark, [
        (1, "a b c d e f g h"),          # exactly one full width-8 chunk
        (2, "a b c d e f g h i j"),      # full chunk + 2-word trailing partial
        (3, "  x   y  "),                # multi-space runs collapse
        (4, ""),                          # blank doc -> zero chunks
        (5, "   "),                       # whitespace-only -> zero chunks
    ])
    got = {(r["doc_id"], r["cidx"]): r["chunk"]
           for r in chunk_documents(df).collect()}
    assert got == {
        (1, 0): "a b c d e f g h",
        (2, 0): "a b c d e f g h",
        (2, 1): "i j",
        (3, 0): "x y",
    }


def test_chunk_documents_custom_width(spark):
    from ocr_engine_spark.operators.dedup import chunk_documents

    df = _docs(spark, [(1, "a b c d e")])
    got = sorted((r["cidx"], r["chunk"])
                 for r in chunk_documents(df, width=2).collect())
    assert got == [(0, "a b"), (1, "c d"), (2, "e")]


def test_paragraph_dedup_keep_first_corpus_order(spark):
    from ocr_engine_spark.operators.dedup import paragraph_dedup

    # width=2 chunks; "a b" appears in docs 1, 2 and twice in doc 3 — only the
    # doc-1 occurrence survives (corpus-order min on (doc_id, cidx)).
    df = _docs(spark, [
        (1, "a b c d"),
        (2, "a b x y"),
        (3, "a b a b"),
        (4, ""),  # blank doc: zero chunks -> zero totals row (dropped upstream)
    ])
    got = {r["doc_id"]: (r["n_chunks"], r["n_kept"], r["dedup_text"])
           for r in paragraph_dedup(df, width=2).collect()}
    assert got == {
        1: (2, 2, "a b c d"),
        2: (2, 1, "x y"),
        3: (2, 0, ""),      # every chunk lost to doc 1 -> empty survivor
    }


def test_paragraph_dedup_within_doc_duplicate(spark):
    from ocr_engine_spark.operators.dedup import paragraph_dedup

    # duplicate chunks INSIDE one document also dedup (corpus-wide keep-first
    # is granular to occurrences, not documents): lowest cidx wins.
    df = _docs(spark, [(7, "p q p q r s")])
    [row] = paragraph_dedup(df, width=2).collect()
    assert (row["n_chunks"], row["n_kept"]) == (3, 2)
    assert row["dedup_text"] == "p q r s"


def test_boilerplate_strip_distinct_doc_threshold(spark):
    from ocr_engine_spark.operators.dedup import boilerplate_strip

    # "a b" spans docs 1+2 -> boilerplate, removed from BOTH (including the
    # first occurrence — unlike keep-first dedup).  "p q" repeats twice inside
    # doc 3 only -> 1 distinct doc, NOT boilerplate.
    df = _docs(spark, [
        (1, "a b c d"),
        (2, "a b x y"),
        (3, "p q p q"),
    ])
    got = {r["doc_id"]: (r["n_chunks"], r["n_removed"], r["clean_text"])
           for r in boilerplate_strip(df, width=2, min_docs=2).collect()}
    assert got == {
        1: (2, 1, "c d"),
        2: (2, 1, "x y"),
        3: (2, 0, "p q p q"),
    }


def test_boilerplate_strip_full_removal_keeps_doc_row(spark):
    from ocr_engine_spark.operators.dedup import boilerplate_strip

    df = _docs(spark, [(1, "a b"), (2, "a b")])
    got = {r["doc_id"]: (r["n_chunks"], r["n_removed"], r["clean_text"])
           for r in boilerplate_strip(df, width=2, min_docs=2).collect()}
    assert got == {1: (1, 1, ""), 2: (1, 1, "")}
