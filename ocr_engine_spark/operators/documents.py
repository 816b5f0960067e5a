"""Flagship extraction over the driver's ``documents`` table.

Adapts documents(doc_id, text, ...) to the transcript shape (one single-turn
conversation per document) and runs the full fused extraction kernel.  On this corpus
(plain single-line prose) the pipeline provably reduces to trim+whitespace-collapse,
which is what makes the full kernel path oracle-checkable against plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_engine_spark.operators.extract import extract_transcripts
from ocr_engine_spark.operators.relational import load


def extract_documents(spark: SparkSession, sf_dir: str,
                      num_partitions: int | None = None) -> DataFrame:
    if num_partitions is None:
        # the documents table is one small parquet file locally -> one scan split;
        # spread the kernel across cores (at scale the scan itself is split-bounded
        # and extract_transcripts' no-shuffle default applies)
        num_partitions = spark.sparkContext.defaultParallelism * 2
    docs = load(spark, sf_dir, "documents")
    as_turns = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = extract_transcripts(as_turns, num_partitions=num_partitions)
    return out.select(
        F.col("conv_id").cast("bigint").alias("doc_id"),
        "extracted_text", "n_spans", "strip_ratio",
    )


def q_extract_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_documents(spark, sf_dir)


def q_manifest_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-driven extraction (J3/S6, /root/reference/run.py:123-128): a small
    include-list broadcast-semi-joined against the corpus BEFORE the kernel runs, so
    only selected payloads cross the Python boundary."""
    docs = load(spark, sf_dir, "documents")
    manifest = spark.range(3, 100_000, 20).select(F.col("id").alias("doc_id"))
    picked = docs.join(F.broadcast(manifest), "doc_id", "left_semi")
    as_turns = picked.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = extract_transcripts(
        as_turns, num_partitions=spark.sparkContext.defaultParallelism)
    return out.select(
        F.col("conv_id").cast("bigint").alias("doc_id"), "extracted_text", "n_spans")


def q_explode_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 multi-part payload explode (the PDF->pages analogue,
    /root/reference/src/utils.py:231-237): one row per sentence part, keeping
    (doc_id, part_idx) exactly like (conv_id, page_idx)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        # ' table ' occurs ~1.7x/doc in the synthetic corpus -> real multi-part rows
        F.posexplode(F.split("text", " table ")).alias("part_idx", "part_text"),
    ).select(
        "doc_id",
        F.col("part_idx").cast("int").alias("part_idx"),
        F.length("part_text").cast("bigint").alias("part_len"),
    )


def q_strip_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 strip-ratio aggregation: corpus-level extraction metrics per source, with the
    order-independent exact formula 1 - sum(extracted chars)/sum(raw chars)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    ext = extract_documents(spark, sf_dir).select("doc_id", "extracted_text")
    return (
        docs.join(ext, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("extracted_text")).cast("bigint").alias("extracted_chars"),
            F.sum(F.length("text")).cast("bigint").alias("raw_chars"),
        )
        .withColumn(
            "strip_ratio",
            F.lit(1.0) - F.col("extracted_chars").cast("double")
            / F.col("raw_chars").cast("double"),
        )
    )
