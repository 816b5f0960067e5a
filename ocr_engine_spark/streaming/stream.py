"""Structured Streaming wrapper (SURVEY.md §2.9 — thin v1 surface).

The extraction kernel is stateless per turn, so the SAME fused ``mapInPandas`` stage runs
unchanged on a streaming DataFrame; no custom stateful operator is needed.  The metrics
window is a watermarked tumbling aggregation; late data beyond the watermark drops
(default semantics).  The reference engine is strictly batch (batch_size=1,
/root/reference/src/ocr.py:201-233), so streaming is engine-added surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_engine_spark.config import DEFAULT_CONFIG, EngineConfig
from ocr_engine_spark.operators.extract import (
    EXTRACTED_SCHEMA, _extract_batches, passthrough_wrapper,
)

TRANSCRIPTS_DDL = ("conv_id string, turn_idx int, role string, text string, "
                   "tool string, ts timestamp")


def read_transcript_stream(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 8) -> DataFrame:
    """Incremental parquet-directory source (the Iceberg-incremental stand-in)."""
    return (
        spark.readStream.schema(TRANSCRIPTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(stream: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Same kernel, streaming plan; keeps ts for downstream watermarks."""
    pruned = stream.select("conv_id", "turn_idx", "text")
    return pruned.mapInPandas(_extract_batches(cfg), schema=EXTRACTED_SCHEMA)


def metrics_window_stream(stream: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG,
                          watermark: str = "1 hour",
                          window: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling metrics (turns, spans, strip ratio) over event time."""
    from pyspark.sql.types import StructField, StructType, TimestampType

    # fresh StructType — .add() would mutate the shared EXTRACTED_SCHEMA
    schema = StructType(
        list(EXTRACTED_SCHEMA.fields) + [StructField("ts", TimestampType())])
    extracted = stream.select("conv_id", "turn_idx", "text", "ts").mapInPandas(
        passthrough_wrapper(_extract_batches(cfg), ["ts"]), schema=schema)
    return (
        extracted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum("n_spans").cast("long").alias("spans"),
            F.avg("strip_ratio").alias("strip_ratio"),
        )
    )


