"""Thin pluggable table layer (SURVEY.md §7: Parquet now, Iceberg when a catalog is
wired) so engine code and jobs never hard-code a storage flavor.

The storage flavor is an EXPLICIT parameter (``flavor``): "parquet" for a filesystem
location, "table" for a catalog table (`spark.read.table` / `DataFrame.writeTo` — the
Iceberg path on a real cluster; this sandbox has no Iceberg jars, which is why the
seam exists).  ``flavor="auto"`` keeps the old heuristic for convenience call sites,
but auto-resolution REQUIRES a path marker (separator, ``.parquet`` suffix, or an
existing target) before it will treat the string as a location — and jobs always pass
the flavor explicitly, so a slash-free not-yet-existing output like ``--output out``
is never silently misrouted to the catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FLAVORS = ("parquet", "table", "auto")


def resolve_flavor(source: str, flavor: str = "auto") -> str:
    if flavor not in FLAVORS:
        raise ValueError(f"flavor must be one of {FLAVORS}, got {flavor!r}")
    if flavor != "auto":
        return flavor
    looks_like_path = (
        os.path.exists(source) or os.sep in source or "/" in source
        or source.endswith(".parquet")
    )
    return "parquet" if looks_like_path else "table"


def scan_file_sizes(df: DataFrame) -> tuple[str, list[int] | None]:
    """Byte sizes of a plain file scan's input files, from METADATA only.

    Returns a discriminated ``(kind, sizes)`` so callers can tell the
    unavailable cases apart (they demand OPPOSITE policies — a remote scan is
    the by-design no-op, a failed local stat is "don't know"):

    - ``("ok", sizes)`` — local files, one ``os.path.getsize`` each;
    - ``("none", None)`` — not a plain file scan (createDataFrame /
      post-shuffle inputs raise or list nothing);
    - ``("remote", None)`` — hdfs/s3/…: stat'ing needs the Hadoop FS
      round-trip this helper exists to avoid;
    - ``("error", None)`` — a listed local file could not be stat'ed
      (deleted/unreadable between listing and stat).

    One ``inputFiles()`` JVM round-trip total.  Used by the layout probes
    (``operators.dedup.spread``, ``operators.extract`` auto-salting) that size
    or skew-check an exchange without a physical-plan/RDD conversion.
    """
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:  # non-scan plan
        return ("none", None)
    if not files:
        return ("none", None)
    sizes = []
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return ("remote", None)
        try:
            sizes.append(os.path.getsize(unquote(u.path)))
        except OSError:
            return ("error", None)
    return ("ok", sizes)


def read_table(spark: SparkSession, source: str, flavor: str = "auto") -> DataFrame:
    """Parquet path or catalog table -> DataFrame."""
    if resolve_flavor(source, flavor) == "parquet":
        return spark.read.parquet(source)
    return spark.read.table(source)


def create_table(df: DataFrame, target: str, flavor: str = "auto",
                 partition_col: str | None = None) -> None:
    """Create the target table from ``df`` (Iceberg/catalog `writeTo(...).create()`;
    Parquet initial write).  Errors if the target already exists — creation is the
    one write that must NOT be idempotent, so a mis-pointed job fails loudly instead
    of silently absorbing into an unrelated table.

    ``partition_col`` maps to the catalog partition transform (Iceberg
    ``partitionedBy``) / the Parquet directory layout.  Catalogs that manage their
    own layout (e.g. the JDBC V2 catalog the seam test runs against) take the
    unpartitioned create.
    """
    if resolve_flavor(target, flavor) == "parquet":
        writer = df.write.mode("errorifexists")
        if partition_col is not None:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target)
    else:
        writer = df.writeTo(target)
        if partition_col is not None:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(F.col(partition_col))
        writer.create()


def append_table(df: DataFrame, target: str, flavor: str = "auto") -> None:
    """Append rows (Iceberg `writeTo(...).append()` / Parquet append)."""
    if resolve_flavor(target, flavor) == "parquet":
        df.write.mode("append").parquet(target)
    else:
        df.writeTo(target).append()


def overwrite_partitions(df: DataFrame, target: str, partition_col: str,
                         flavor: str = "auto") -> None:
    """Idempotent per-partition overwrite — the checkpoint protocol's commit
    primitive (Iceberg `overwritePartitions`; Parquet dynamic partition overwrite).

    The overwrite mode is a per-write ``.option`` — NOT a session-conf mutation —
    so unrelated ``mode("overwrite").partitionBy`` writes in the same session keep
    their configured semantics.
    """
    if resolve_flavor(target, flavor) == "parquet":
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(target)
        )
    else:
        df.writeTo(target).overwritePartitions()


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int, sort: bool = True) -> None:
    """Hash-bucketed catalog table (the co-located-join layout, SURVEY.md §4.2).

    Two tables bucketed on the same key with the same bucket count join with
    ZERO shuffle: each side's scan already delivers hash(bucket_col)-clustered
    splits, so the sort-merge join reads bucket i against bucket i.  At 100 TB
    this turns the recurring fact-fact join (e.g. extracted turns vs manifest
    metadata, both keyed by conv_id/doc_id) from a full-corpus exchange per
    query into a one-time layout cost at write time — the Parquet analogue of
    Iceberg's `bucket(N, col)` partition transform.
    """
    writer = df.write.bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)
