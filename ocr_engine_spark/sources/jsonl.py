"""Permissive JSON-lines transcript source with a quarantine split (S2/S4).

The reference's list scan catches per-file read errors, logs, and skips
(ImageReader.from_list, /root/reference/src/utils.py:218-229) and its path validation
raises on unsupported input (/root/reference/src/utils.py:158-165).  At table scale a
raise is a job killer, so the graft's spelling is: PERMISSIVE read + corrupt-record
column, then route bad rows to a quarantine sink instead of failing — never lose the
job (or the evidence) to one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType, TimestampType,
)

CORRUPT_COL = "_corrupt_record"

READ_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("role", StringType()),
    StructField("text", StringType()),
    StructField("tool", StringType()),
    StructField("ts", TimestampType()),
    StructField(CORRUPT_COL, StringType()),
])


def read_transcripts_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced permissive scan: malformed lines survive as rows whose
    ``_corrupt_record`` holds the raw line (all data columns null)."""
    return (
        spark.read.schema(READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined).  A row quarantines if it failed to parse or misses a key
    field (conv_id/turn_idx — the output key).  Null/blank ``text`` is NOT quarantined:
    blank turns flow through with a warning flag, exactly like the reference's blank
    pages (F5 warn-not-drop, /root/reference/src/ocr.py:91-95)."""
    bad = F.col(CORRUPT_COL).isNotNull() \
        | F.col("conv_id").isNull() | F.col("turn_idx").isNull()
    good = df.where(~bad).drop(CORRUPT_COL)
    quarantined = df.where(bad).withColumn(
        "reason",
        F.when(F.col(CORRUPT_COL).isNotNull(), F.lit("malformed"))
        .otherwise(F.lit("missing_key")),
    )
    return good, quarantined
