"""Probe-based auto-salting (VERDICT r4 #6): extract_transcripts(AUTO) must
salt a whale-file layout, keep zero-shuffle on a balanced layout, and leave
results byte-identical either way (the BENCH/SKEW.md mechanism, now
self-deciding)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from ocr_engine_spark.operators.extract import (
    AUTO, extract_transcripts, probe_layout_skew,
)
from ocr_engine_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def whale_dir(spark, tmp_path_factory):
    """bucket(conv_id)-style layout: one file per conversation hash bucket, so
    the 100x whale conversation concentrates in one oversized file."""
    pdf = generate_transcripts(n_convs=40, seed=21, whale_factor=400)
    d = str(tmp_path_factory.mktemp("whale") / "t.parquet")
    (spark.createDataFrame(pdf).repartition(8, "conv_id")
     .write.mode("overwrite").parquet(d))
    return d


@pytest.fixture(scope="module")
def flat_dir(spark, tmp_path_factory):
    """Balanced layout: round-robin into even files."""
    pdf = generate_transcripts(n_convs=40, seed=21, whale_factor=1)
    d = str(tmp_path_factory.mktemp("flat") / "t.parquet")
    (spark.createDataFrame(pdf).repartition(8)
     .write.mode("overwrite").parquet(d))
    return d


def _sizes(d):
    return sorted(os.path.getsize(os.path.join(d, f))
                  for f in os.listdir(d) if f.endswith(".parquet"))


def test_whale_layout_is_actually_skewed(whale_dir):
    s = _sizes(whale_dir)
    assert s[-1] > 4 * s[len(s) // 2]  # the fixture must model the hazard


def test_probe_salts_whale_keeps_flat(spark, whale_dir, flat_dir):
    whale = spark.read.parquet(whale_dir)
    flat = spark.read.parquet(flat_dir)
    # whale file exceeds 4x median: salt, sized >= default parallelism
    assert (probe_layout_skew(whale, target_bytes=64 << 10)
            >= spark.sparkContext.defaultParallelism)
    # balanced files: zero-shuffle
    assert probe_layout_skew(flat, target_bytes=64 << 10) is None


def test_probe_salts_non_scan_input(spark):
    pdf = generate_transcripts(n_convs=5, seed=3)
    df = spark.createDataFrame(pdf)
    # createDataFrame input: no scan metadata -> conservative salt
    assert probe_layout_skew(df) == 2 * spark.sparkContext.defaultParallelism


@pytest.fixture()
def small_target(monkeypatch):
    """The test whale is ~200 KiB; scale the 64 MiB production target down so
    the 'big enough to matter' gate fires at fixture scale."""
    import ocr_engine_spark.operators.extract as ex

    monkeypatch.setattr(ex, "TARGET_PARTITION_BYTES", 64 << 10)


def test_auto_output_byte_equal_to_no_shuffle(spark, whale_dir, small_target):
    whale = spark.read.parquet(whale_dir)
    cols = ["conv_id", "turn_idx", "extracted_text", "n_spans", "fmt"]
    a = (extract_transcripts(whale, num_partitions=AUTO)
         .select(*cols).orderBy("conv_id", "turn_idx").toPandas())
    b = (extract_transcripts(whale, num_partitions=None)
         .select(*cols).orderBy("conv_id", "turn_idx").toPandas())
    assert a.equals(b)


def test_auto_plan_has_exchange_only_for_whale(spark, whale_dir, flat_dir, small_target):
    whale = extract_transcripts(spark.read.parquet(whale_dir),
                                num_partitions=AUTO)
    flat = extract_transcripts(spark.read.parquet(flat_dir),
                               num_partitions=AUTO)

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return sum("Exchange" in line and "Reused" not in line
                   for line in plan.splitlines())

    assert n_exchanges(whale) == 1
    assert n_exchanges(flat) == 0


def test_auto_respects_remote_scheme(spark, flat_dir, monkeypatch):
    """Remote storage short-circuits to zero-shuffle (scanner byte-bounds its
    own splits) — simulated by making the size helper see s3 URIs."""
    import ocr_engine_spark.sources.io as io_mod

    df = spark.read.parquet(flat_dir)
    real = df.inputFiles

    class Remote:
        def __init__(self, inner):
            self._inner = inner

        def inputFiles(self):
            return [f.replace("file:", "s3:") for f in real()]

        @property
        def sparkSession(self):
            return self._inner.sparkSession

    assert io_mod.scan_file_sizes(Remote(df)) == ("remote", None)
    assert probe_layout_skew(Remote(df)) is None


def test_stat_failure_salts_not_remote(spark, flat_dir):
    """A listed local file that fails to stat is 'don't know', NOT 'remote':
    the probe must salt conservatively (no whale bound) and spread's split
    estimate must return None instead of the remote always-enough sentinel."""
    import ocr_engine_spark.sources.io as io_mod
    from ocr_engine_spark.operators.dedup import _estimated_scan_splits

    df = spark.read.parquet(flat_dir)
    real = df.inputFiles

    class StatFails:
        def inputFiles(self):
            return [f + ".GONE" for f in real()]

        @property
        def sparkSession(self):
            return df.sparkSession

    assert io_mod.scan_file_sizes(StatFails()) == ("error", None)
    par = spark.sparkContext.defaultParallelism
    assert probe_layout_skew(StatFails()) == par * 2
    assert _estimated_scan_splits(StatFails()) is None
