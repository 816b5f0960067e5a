"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline (broadcast the query set, one pass over
  the corpus, per-partition top-k via window rank) — correct at any scale, O(N*Q);
  two interchangeable scorers: the F.aggregate/F.zip_with expression path (JVM-side,
  oracle-identical fold order) and the BLAS path (`brute_force_topk_blas`: one numpy
  matmul per Arrow batch, local top-k per batch so the shuffle never carries the full
  score matrix);
- IVF-style bucketed ANN: assign every vector to its nearest ``probes`` centroids
  (broadcast centroid table), probe only matching buckets at query time — the scale
  path that turns O(N*Q) into O(N/C * Q) per probe;
- embedding near-dup: exact within label blocks (no forced broadcast), or bucketed by
  (label, IVF cell) for corpora whose label blocks are themselves huge.

Scores are rounded before ranking with total-order tie-breaks for cross-engine
determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from ocr_engine_spark.operators.relational import load


def _cosine(a: str, b: str):
    """Sequential-fold cosine similarity between two array<double> columns (the same
    left-to-right accumulation order in Spark and the DuckDB oracle)."""
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (s, v) -> s + v)")
    na = F.sqrt(F.expr(f"aggregate({a}, 0.0D, (s, v) -> s + v * v)"))
    nb = F.sqrt(F.expr(f"aggregate({b}, 0.0D, (s, v) -> s + v * v)"))
    return dot / (na * nb)


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k: broadcast queries x corpus, rank with rounded-score +
    id tie-break (total order -> deterministic across engines and runs)."""
    from pyspark.sql.window import Window

    c = _as_double(corpus).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("emb_c"))
    q = _as_double(queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("emb_q"))
    scored = (
        c.crossJoin(broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(_cosine("emb_q", "emb_c"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=5)


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               probes: int = 1) -> DataFrame:
    """IVF coarse quantization: nearest ``probes`` centroids per vector (broadcast
    centroids — a genuinely bounded side — argmax by rounded cosine with centroid-id
    tie-break).  ``probes > 1`` is the multi-probe assignment used for bucketed
    near-dup blocking (a vector belongs to its top-k buckets, so near neighbors that
    straddle a Voronoi boundary still share a bucket)."""
    from pyspark.sql.window import Window

    c = _as_double(corpus).select("vec_id", F.col("embedding").alias("emb"))
    cent = _as_double(centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cemb"))
    scored = c.crossJoin(broadcast(cent)).withColumn(
        "score", F.round(_cosine("emb", "cemb"), 6))
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= probes)
        .select("vec_id", "centroid_id", F.col("score").alias("centroid_score"))
    )


def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-centroids: the 8 lowest vec_ids (a k-means seed stand-in;
    the assignment/probe plumbing is what scales, not the seeding)."""
    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8)
    return ivf_assign(emb, centroids)


def ivf_topk(corpus_assigned: DataFrame, queries_assigned: DataFrame,
             k: int = 5) -> DataFrame:
    """ANN probe: top-k restricted to the query's centroid bucket (1-probe IVF)."""
    from pyspark.sql.window import Window

    c = corpus_assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("emb_c"), "centroid_id")
    q = queries_assigned.select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("emb_q"),
        F.col("centroid_id").alias("q_centroid"))
    scored = (
        c.join(broadcast(q), c.centroid_id == q.q_centroid)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(_cosine("emb_q", "emb_c"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-probe IVF ANN search: queries (vec_id < 5) search only their own centroid
    bucket — the O(N/C) scale path next to q_embedding_topk's exact O(N) baseline."""
    emb = _as_double(load(spark, sf_dir, "embeddings"))
    vecs = emb.select("vec_id", F.col("embedding").alias("emb"))
    centroids = emb.where(F.col("vec_id") < 8)
    assigned = (
        ivf_assign(emb, centroids)
        .join(vecs, "vec_id")
        .select("vec_id", "emb", "centroid_id")
    )
    queries = assigned.where(F.col("vec_id") < 5)
    return ivf_topk(assigned, queries, k=5)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label (the coarse bucket).

    Exact within label blocks.  NO broadcast hint: the corpus side is unbounded, and
    a forced broadcast of the full embedding table OOMs the driver at any realistic
    corpus size — ``autoBroadcastJoinThreshold``/AQE pick the strategy from actual
    size stats instead (sort-merge at scale, broadcast only when genuinely tiny).
    For corpora where label blocks themselves are huge, use the bucketed
    ``q_embedding_neardup_ivf`` scale path.
    """
    emb = _as_double(load(spark, sf_dir, "embeddings"))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"),
                   F.col("label").alias("lbl"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"),
                   F.col("label").alias("lbl"))
    return (
        a.join(b, "lbl")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("score", F.round(_cosine("emb_a", "emb_b"), 6))
        .where(F.col("score") >= 0.9)
        .select("id_a", "id_b", "score")
    )


def embedding_neardup_ivf(emb: DataFrame, centroids: DataFrame,
                          probes: int = 2, threshold: float = 0.9) -> DataFrame:
    """Bucketed near-dup: candidates must share a (label, IVF-bucket) block.

    The 100 TB path: each vector is assigned to its top-``probes`` centroid buckets
    (multi-probe, so boundary-straddling neighbors still collide), pairs are
    generated ONLY within (label, bucket) — never across the full label block — and
    every candidate is verified with the exact cosine.  Pair-generation cost drops
    from sum over labels of N_label^2 to sum over (label, bucket) cells of
    N_cell^2 ~ N_label^2 * probes^2 / C, tunable by centroid count C.  The bucketing
    is deterministic (rounded-score argmax, centroid-id tie-break), so the whole
    pipeline — including candidate generation — replays exactly in the SQL oracle.
    """
    vecs = _as_double(emb).select(
        "vec_id", F.col("embedding").alias("emb"), "label")
    assigned = (
        ivf_assign(vecs.select("vec_id", F.col("emb").alias("embedding")),
                   centroids, probes=probes)
        .join(vecs, "vec_id")
        .select("vec_id", "emb", "label", "centroid_id")
    )
    a = assigned.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"),
                        F.col("label").alias("lbl"), "centroid_id")
    b = assigned.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"),
                        F.col("label").alias("lbl"), "centroid_id")
    cand = (
        a.join(b, ["lbl", "centroid_id"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "emb_a", "id_b", "emb_b")
        .dropDuplicates(["id_a", "id_b"])  # multi-probe can collide in >1 bucket
    )
    return (
        cand.withColumn("score", F.round(_cosine("emb_a", "emb_b"), 6))
        .where(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def q_embedding_neardup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8)
    return embedding_neardup_ivf(emb, centroids, probes=2, threshold=0.9)


def brute_force_topk_blas(corpus: DataFrame, queries: DataFrame,
                          k: int = 5) -> DataFrame:
    """Vectorized exact top-k: the Pandas-UDF/BLAS scale path for brute-force
    scoring.  The bounded query set is collected into one numpy matrix and closed
    over (the broadcast side); each Arrow batch of the corpus scores against it
    with a single float64 matmul and emits only its local top-(k+8) rows per
    query, so the shuffle carries O(batches * q * k) rows — never the full
    O(N * Q) score matrix.  A final window keeps the global top-k under the same
    total order as ``brute_force_topk`` (rounded score desc, neighbor id asc);
    the per-query local buffer of 8 extra rows absorbs any rounding-boundary
    reordering between raw and rounded scores.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.window import Window

    q_rows = (_as_double(queries).select("vec_id", "embedding")
              .orderBy("vec_id").collect())
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    qmat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    local_k = k + 8

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf["embedding"]), dtype=np.float64)
            cnorm = np.sqrt((cmat * cmat).sum(axis=1))
            scores = (cmat @ qmat.T) / (cnorm[:, None] * qnorm[None, :])
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(qids):
                col = scores[:, j]
                keep = ids != qid
                order = np.lexsort((ids[keep], -col[keep]))[:local_k]
                sel_ids = ids[keep][order]
                sel_scores = col[keep][order]
                out_q.extend([qid] * len(sel_ids))
                out_n.extend(sel_ids.tolist())
                out_s.extend(sel_scores.tolist())
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                "score_raw": out_s})

    cand = _as_double(corpus).select("vec_id", "embedding").mapInPandas(
        kernel, schema="query_id long, neighbor_id long, score_raw double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("neighbor_id"))
    return (
        cand.withColumn("score", F.round("score_raw", 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def q_embedding_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return brute_force_topk_blas(emb, queries, k=5)


def q_ivf_topk_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN search: each query probes its top-2 centroid buckets
    (the standard recall lever when the nearest neighbor straddles a Voronoi
    boundary), corpus vectors keep single-bucket assignment, duplicate
    (query, neighbor) hits across probes collapse before ranking."""
    from pyspark.sql.window import Window

    emb = _as_double(load(spark, sf_dir, "embeddings"))
    vecs = emb.select("vec_id", F.col("embedding").alias("emb"))
    centroids = emb.where(F.col("vec_id") < 8)
    corpus = (
        ivf_assign(emb, centroids, probes=1)
        .join(vecs, "vec_id")
        .select(F.col("vec_id").alias("neighbor_id"),
                F.col("emb").alias("emb_c"), "centroid_id")
    )
    queries = (
        ivf_assign(emb.where(F.col("vec_id") < 5), centroids, probes=2)
        .join(vecs, "vec_id")
        .select(F.col("vec_id").alias("query_id"),
                F.col("emb").alias("emb_q"),
                F.col("centroid_id").alias("q_centroid"))
    )
    scored = (
        corpus.join(broadcast(queries), corpus.centroid_id == queries.q_centroid)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(_cosine("emb_q", "emb_c"), 6).alias("score"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", "score")
    )
