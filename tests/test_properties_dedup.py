"""Property-based checks for the dedup operators against independent
pure-Python oracles (hypothesis; few examples, each runs real Spark jobs).

- prefix-filtered n-gram Jaccard == brute-force all-pairs on random corpora
  (the exactness claim of the ppjoin argument, fuzzed rather than constructed);
- duplicate_clusters == union-find connected components on random pair graphs.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

WORDS = [f"w{i}" for i in range(12)] + ["the", "of"]  # small vocab -> dense overlap


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(min_value=2, max_value=10))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(min_value=1, max_value=8))
        toks = [draw(st.sampled_from(WORDS)) for _ in range(n_tok)]
        docs.append((i, "s", " ".join(toks)))
    return docs


def _brute_pairs(docs):
    def wset(t):
        return set(t.strip().split())

    out = set()
    for i, (a, _, ta) in enumerate(docs):
        for b, _, tb in docs[i + 1:]:
            sa, sb = wset(ta), wset(tb)
            inter = len(sa & sb)
            j = inter / (len(sa) + len(sb) - inter)
            if round(j, 6) >= 0.6:
                out.add((a, b))
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=corpora())
def test_prefix_filter_exact_on_random_corpora(spark, docs):
    from ocr_engine_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "source", "text"]))
    got = {(r["doc_id_a"], r["doc_id_b"])
           for r in ngram_jaccard_pairs(df, 3, 5).collect()}
    assert got == _brute_pairs(docs)


def _union_find_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in list(parent)}


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=20))
def test_clusters_match_union_find(spark, edges):
    from ocr_engine_spark.operators.dedup import duplicate_clusters

    norm = [(min(a, b), max(a, b)) for a, b in edges]
    pairs = spark.createDataFrame(pd.DataFrame(
        {"doc_id_a": [a for a, _ in norm], "doc_id_b": [b for _, b in norm],
         "jaccard": [0.9] * len(norm)}))
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == _union_find_components(norm)
