"""The catalog ("table") flavor of sources.io, exercised against a REAL V2 catalog.

The sandbox has no Iceberg runtime jar and no network to fetch one (the vendoring
attempt is recorded in BENCH/ICEBERG.md), but the seam io.py keeps for Iceberg —
``DataFrame.writeTo`` + ``spark.read.table`` through a ``spark.sql.catalog.*``
plugin — is NOT parquet-shaped: it needs a TableCatalog implementation.  Spark's
own distribution ships one (the JDBC V2 catalog,
``org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog``) plus an
embedded Derby driver, so the exact code path an Iceberg catalog would take —
catalog plugin resolution, `writeTo(...).create()`, `writeTo(...).append()`,
`read.table` with filter pushdown into the V2 scan — runs for real here.

Reference stake: pluggable storage polymorphism is the reference's reader seam
(/root/reference/src/utils.py:152-248); these tests pin the engine-side analogue.
"""

import pytest

from ocr_engine_spark.sources import io


@pytest.fixture(scope="module")
def seam_catalog(spark, tmp_path_factory):
    """Register a JDBC V2 catalog named ``seam`` backed by a temp embedded Derby.

    ``spark.sql.catalog.*`` confs are runtime-settable (catalog plugins resolve
    lazily on first reference), so the shared session is reused.  Derby's system
    home is pinned to the temp dir so its ``derby.log`` stays out of the repo.
    """
    dbdir = tmp_path_factory.mktemp("seam_derby")
    spark._jvm.System.setProperty("derby.system.home", str(dbdir))
    spark.conf.set(
        "spark.sql.catalog.seam",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.seam.url",
                   f"jdbc:derby:{dbdir}/seamdb;create=true")
    spark.conf.set("spark.sql.catalog.seam.driver",
                   "org.apache.derby.jdbc.EmbeddedDriver")
    return "seam"


def test_flavor_table_create_append_read(spark, seam_catalog):
    from pyspark.sql import functions as F

    df = spark.range(20).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("int").alias("shard"))
    io.create_table(df, f"{seam_catalog}.turns", flavor="table")
    assert io.read_table(spark, f"{seam_catalog}.turns", flavor="table").count() == 20

    extra = spark.range(20, 25).select(
        F.col("id").alias("doc_id"), F.lit(9).cast("int").alias("shard"))
    io.append_table(extra, f"{seam_catalog}.turns", flavor="table")
    tbl = io.read_table(spark, f"{seam_catalog}.turns", flavor="table")
    assert tbl.count() == 25
    # the filter reaches the V2 scan (JDBC pushdown), not a post-scan Filter
    assert tbl.filter("shard = 9").count() == 5


def test_create_table_is_not_idempotent(spark, seam_catalog):
    from pyspark.sql import functions as F

    df = spark.range(3).select(F.col("id").alias("doc_id"))
    io.create_table(df, f"{seam_catalog}.once", flavor="table")
    with pytest.raises(Exception, match="(?i)already exists"):
        io.create_table(df, f"{seam_catalog}.once", flavor="table")


def test_overwrite_partitions_needs_dynamic_overwrite_support(spark, seam_catalog):
    """The checkpoint commit primitive maps to `overwritePartitions`, which a
    catalog must declare support for (Iceberg does; the JDBC catalog does not).
    Pin the honest failure mode so the seam's Iceberg requirement is explicit —
    the parquet flavor of the same primitive is covered by test_resume."""
    from pyspark.sql import functions as F

    df = spark.range(6).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2).cast("int").alias("p"))
    io.create_table(df, f"{seam_catalog}.ckpt", flavor="table")
    with pytest.raises(Exception, match="dynamic overwrite"):
        io.overwrite_partitions(df, f"{seam_catalog}.ckpt", "p", flavor="table")


def test_create_table_parquet_flavor(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(12).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("int").alias("p"))
    target = str(tmp_path / "out.parquet")
    io.create_table(df, target, flavor="parquet", partition_col="p")
    back = io.read_table(spark, target, flavor="parquet")
    assert back.count() == 12
    assert sorted(back.filter("p = 1").select("doc_id").toPandas()["doc_id"]) == [1, 4, 7, 10]
    with pytest.raises(Exception):
        io.create_table(df, target, flavor="parquet")
