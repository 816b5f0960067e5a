"""Similarity operators on planted data: non-empty, value-checked results.

The contract queries run against the driver's random embeddings where no pair
clears the 0.9 near-dup threshold (0 rows — a trivially-green oracle).  These
tests plant real near-duplicates so candidate generation + verification are
exercised with data, and the bucketed IVF path is compared against the exact
brute force it approximates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _planted_embeddings(dim: int = 16, n_base: int = 20, seed: int = 5):
    """n_base well-separated base vectors + a >=0.99-cosine twin for each of the
    first 10, all labeled into 2 label blocks.  vec_id < 8 are the centroids."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v, f"l{i % 2}"))
    for i in range(10):  # twins: tiny perturbation -> cosine ~0.999
        tw = base[i] + 0.01 * rng.normal(size=dim)
        rows.append((100 + i, tw / np.linalg.norm(tw), f"l{i % 2}"))
    return pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1].astype("float32").tolist() for r in rows],
         "label": [r[2] for r in rows]})


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(_planted_embeddings())


def _brute_pairs(spark, planted):
    from pyspark.sql import functions as F

    from ocr_engine_spark.operators.similarity import _as_double, _cosine

    emb = _as_double(planted)
    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("emb_a"), F.col("label").alias("lbl"))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("emb_b"), F.col("label").alias("lbl"))
    return (
        a.join(b, "lbl").where(F.col("id_a") < F.col("id_b"))
        .withColumn("score", F.round(_cosine("emb_a", "emb_b"), 6))
        .where(F.col("score") >= 0.9)
        .select("id_a", "id_b", "score")
    )


def test_ivf_neardup_finds_planted_twins(spark, planted):
    from pyspark.sql import functions as F

    from ocr_engine_spark.operators.similarity import embedding_neardup_ivf

    centroids = planted.where(F.col("vec_id") < 8)
    got = sorted(map(tuple, embedding_neardup_ivf(
        planted, centroids, probes=2).collect()))
    want = sorted(map(tuple, _brute_pairs(spark, planted).collect()))
    # every planted twin pair is a true near-dup; a twin sits ~0.999-cosine from its
    # base, so both assign to the same top-1 centroid -> bucketed recall is exact here
    assert len(want) >= 10
    assert got == want


def test_ivf_multiprobe_dedups_pairs(spark, planted):
    # a pair colliding in BOTH probe buckets must appear once, not twice
    from pyspark.sql import functions as F

    from ocr_engine_spark.operators.similarity import embedding_neardup_ivf

    centroids = planted.where(F.col("vec_id") < 8)
    out = embedding_neardup_ivf(planted, centroids, probes=2).collect()
    keys = [(r["id_a"], r["id_b"]) for r in out]
    assert len(keys) == len(set(keys))


def test_ivf_assign_multiprobe_rows(spark, planted):
    from pyspark.sql import functions as F

    from ocr_engine_spark.operators.similarity import ivf_assign

    centroids = planted.where(F.col("vec_id") < 8)
    n_vecs = planted.count()
    assigned = ivf_assign(planted, centroids, probes=2)
    assert assigned.count() == 2 * n_vecs
    # rank-1 rows alone reproduce the single-probe assignment
    single = ivf_assign(planted, centroids, probes=1)
    assert single.count() == n_vecs


def test_sample_frames_stride_and_edges(spark):
    """Frame sampling: every stride-th fixed-size chunk, absolute frame_idx,
    empty payloads produce no rows (1:N flat-map shape)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ocr_engine_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(pd.DataFrame({
        "media_id": [1, 2, 3],
        "payload": [b"a" * 700, b"xy", b""],
    }))
    rows = sorted(
        (r["media_id"], r["frame_idx"], r["n_bytes"])
        for r in sample_frames(df, frame_bytes=256, stride=2).collect())
    # media 1: chunks 0,1,2 (700 bytes) -> sampled 0 and 2 (stride 2)
    # media 2: one 2-byte chunk -> frame 0; media 3: empty -> nothing
    assert rows == [(1, 0, 256), (1, 2, 188), (2, 0, 2)]


def test_blas_topk_matches_expression_topk(spark, planted):
    """The vectorized (matmul) brute-force path returns the identical top-k rows
    as the expression (sequential-fold) path under the shared total order."""
    from pyspark.sql import functions as F

    from ocr_engine_spark.operators.similarity import (
        brute_force_topk, brute_force_topk_blas,
    )

    queries = planted.where(F.col("vec_id") < 5)
    a = sorted(map(tuple, brute_force_topk(planted, queries, k=4)
                   .select("query_id", "neighbor_id", "rank").collect()))
    b = sorted(map(tuple, brute_force_topk_blas(planted, queries, k=4)
                   .select("query_id", "neighbor_id", "rank").collect()))
    assert a == b


def test_blas_topk_tie_heavy_exact(spark):
    """Adversarial mass-tie input: many corpus vectors share the identical raw
    score, so the winners are decided purely by the neighbor-id tie-break.  The
    rounding-tie-safe local cut must surface the same rows as the expression
    path (the old fixed +8 buffer could drop a low-id winner)."""
    from pyspark.sql import functions as F

    from ocr_engine_spark.operators.similarity import (
        brute_force_topk, brute_force_topk_blas,
    )

    rng = np.random.default_rng(11)
    v = rng.normal(size=8)
    v /= np.linalg.norm(v)
    w = rng.normal(size=8)
    w -= (w @ v) * v
    w /= np.linalg.norm(w)
    rows = [(0, v.tolist(), "q")]
    # 40 vectors at the SAME cosine to v (same v/w mix) -> 40-way raw-score tie,
    # ids descending in insertion order to stress the ordering
    mix = (0.8 * v + 0.6 * w)
    for i in range(40, 0, -1):
        rows.append((i, mix.tolist(), "c"))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows],
                      "label": [r[2] for r in rows]}))
    queries = df.where(F.col("vec_id") == 0)
    a = sorted(map(tuple, brute_force_topk(df, queries, k=5)
                   .select("query_id", "neighbor_id", "rank").collect()))
    b = sorted(map(tuple, brute_force_topk_blas(df, queries, k=5)
                   .select("query_id", "neighbor_id", "rank").collect()))
    assert a == b
    assert [t[1] for t in b] == [1, 2, 3, 4, 5]  # id-ascending tie-break won


def test_kmeans_improves_assignment_objective(spark, planted):
    """Lloyd's guarantee: the mean cosine of vectors to their assigned centroid
    must not decrease across iterations — trained centroids are load-bearing,
    not the accidental seed vectors."""
    from pyspark.sql import functions as F

    from ocr_engine_spark.operators.similarity import ivf_assign, train_centroids

    def objective(centroids):
        return (ivf_assign(planted, centroids, probes=1)
                .agg(F.avg("centroid_score")).collect()[0][0])

    seeds = planted.where(F.col("vec_id") < 8).select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("embedding"))
    trained1 = train_centroids(planted, k=8, iterations=1).withColumnRenamed(
        "centroid_id", "vec_id")
    trained3 = train_centroids(planted, k=8, iterations=3).withColumnRenamed(
        "centroid_id", "vec_id")
    o_seed, o_1, o_3 = objective(seeds), objective(trained1), objective(trained3)
    assert o_1 > o_seed  # one mean-update strictly improves on raw seed vectors
    assert o_3 >= o_1 - 1e-9  # Lloyd's is monotone (up to rounding)


def test_kmeans_deterministic_across_partitionings(spark, planted):
    """Quantized-integer means are order-independent: training on a reshuffled
    input yields bit-identical centroids."""
    from ocr_engine_spark.operators.similarity import train_centroids

    a = {r["centroid_id"]: list(r["embedding"])
         for r in train_centroids(planted, k=8, iterations=3).collect()}
    b = {r["centroid_id"]: list(r["embedding"])
         for r in train_centroids(planted.repartition(7), k=8,
                                  iterations=3).collect()}
    assert a == b


def test_kmeans_twin_recall_not_worse_than_seeds(spark, planted):
    """Planted twins (cosine ~0.999) must co-bucket at least as often under
    trained centroids as under pseudo-seed centroids."""
    from pyspark.sql import functions as F

    from ocr_engine_spark.operators.similarity import ivf_assign, train_centroids

    def recall(centroids):
        assign = {r["vec_id"]: r["centroid_id"]
                  for r in ivf_assign(planted, centroids, probes=1).collect()}
        hits = sum(1 for i in range(10) if assign[i] == assign[100 + i])
        return hits / 10

    seeds = planted.where(F.col("vec_id") < 8).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    trained = train_centroids(planted, k=8, iterations=3).withColumnRenamed(
        "centroid_id", "vec_id")
    assert recall(trained) >= recall(seeds)
    assert recall(trained) >= 0.9  # near-identical twins almost always co-bucket
