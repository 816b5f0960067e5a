"""Thin pluggable table layer (SURVEY.md §7: Parquet now, Iceberg when a catalog is
wired) so engine code and jobs never hard-code a storage flavor.

Resolution rule: a source string containing a path separator or pointing at an
existing file/dir is a Parquet location; anything else is a catalog table name
(`spark.read.table` / `DataFrame.writeTo` — the Iceberg path on a real cluster;
this sandbox has no Iceberg jars, which is why the seam exists).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def is_path(source: str) -> bool:
    return os.path.exists(source) or "/" in source or source.endswith(".parquet")


def read_table(spark: SparkSession, source: str) -> DataFrame:
    """Parquet path or catalog table -> DataFrame."""
    if is_path(source):
        return spark.read.parquet(source)
    return spark.read.table(source)


def append_table(df: DataFrame, target: str) -> None:
    """Append rows (Iceberg `writeTo(...).append()` / Parquet append)."""
    if is_path(target):
        df.write.mode("append").parquet(target)
    else:
        df.writeTo(target).append()


def overwrite_partitions(df: DataFrame, target: str, partition_col: str) -> None:
    """Idempotent per-partition overwrite — the checkpoint protocol's commit
    primitive (Iceberg `overwritePartitions`; Parquet dynamic partition overwrite)."""
    if is_path(target):
        df.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.mode("overwrite").partitionBy(partition_col).parquet(target)
    else:
        df.writeTo(target).overwritePartitions()
