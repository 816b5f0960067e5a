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


def test_every_query_has_a_value_oracle():
    """The correctness gate is only as wide as oracle coverage: every queries()
    entry must carry DuckDB oracle SQL (no rows-only checks), and no oracle may
    point at a nonexistent query."""
    import __spark_entry__ as entrymod

    q, o = set(entrymod.queries()), set(entrymod.oracle_sql())
    assert q == o, f"missing oracles: {q - o}; orphaned oracles: {o - q}"
