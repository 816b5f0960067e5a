"""Driver-contract regression: every queries() entry runs and matches its DuckDB oracle
at sf0.001 (the full sf0.01 sweep lives in tools/check_contract.py)."""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as m

    return m


@pytest.fixture(scope="module")
def duck(entrymod):
    from tools.check_contract import duck_connect

    return duck_connect(SF_DIR)


def test_entry_smoke(spark, entrymod):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "extracted_text", "n_spans", "strip_ratio"]


def test_oracle_keys_subset_of_queries(entrymod):
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


@pytest.mark.parametrize("name", [
    "extract_documents", "strip_ratio_by_source", "pricing_summary",
    "top_revenue_orders", "region_revenue", "parts_with_lineitems",
    "customers_without_orders", "event_windows", "hourly_event_rollup",
    "asof_last_order", "event_range_page", "token_stats", "lang_id",
    "quality_score", "shingle_count", "fingerprint", "exact_dedup",
    "ngram_jaccard_pairs", "embedding_topk", "ivf_assign", "ivf_topk",
    "embedding_neardup", "binary_features", "manifest_extract", "explode_parts",
    "html_extract", "markdown_extract", "kmeans_centroids", "media_decode",
    "event_sessions", "event_rolling", "tfidf", "dedup_canonical",
    "tool_dispatch_extract", "stream_dedup_parity",
    "conv_assemble", "conv_dedup", "span_svg", "embedding_neardup_ivf",
    "source_mix", "conv_assemble_capped",
])
def test_query_matches_oracle(spark, entrymod, duck, name):
    from tools.check_contract import compare

    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    want = duck.execute(entrymod.oracle_sql()[name]).df()
    problems = compare(name, got, want)
    assert not problems, problems


@pytest.mark.parametrize("name", ["minhash_lsh_pairs", "simhash"])
def test_rows_only_queries_run(spark, entrymod, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


def test_lsh_pairs_artifact_written_once(spark, entrymod):
    """materialized_lsh_pairs is a write-once checkpoint: repeated consumers in
    one process read the SAME parquet artifact instead of rebuilding the
    signature -> band -> verify pipeline."""
    from ocr_engine_spark.operators import dedup

    dedup.materialized_lsh_pairs(spark, SF_DIR, jaccard_threshold=0.5,
                                 family="md5")
    paths_before = dict(dedup._PAIRS_ARTIFACT)
    df = dedup.materialized_lsh_pairs(spark, SF_DIR, jaccard_threshold=0.5,
                                      family="md5")
    assert dict(dedup._PAIRS_ARTIFACT) == paths_before  # no rebuild
    # the artifact IS the pairs table the direct builder would produce
    docs = dedup.spread(
        dedup.load(spark, SF_DIR, "documents").select("doc_id", "text"))
    direct = dedup.minhash_lsh_pairs(
        docs, jaccard_threshold=0.5, family="md5", persist=False)
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want


def test_every_query_has_a_value_oracle():
    """The correctness gate is only as wide as oracle coverage: every queries()
    entry must carry DuckDB oracle SQL (no rows-only checks), and no oracle may
    point at a nonexistent query."""
    import __spark_entry__ as entrymod

    q, o = set(entrymod.queries()), set(entrymod.oracle_sql())
    assert q == o, f"missing oracles: {q - o}; orphaned oracles: {o - q}"
