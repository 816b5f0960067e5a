"""CSV manifest source (S6): a real file with header validation + row quarantine.

The reference reads a CSV manifest, asserts the required header columns, and
processes each row (/root/reference/run.py:123-128).  The graft spelling:

- a MISSING required header column is a job-configuration error -> raise
  immediately (the reference's assert), before any executor work is scheduled;
- a MALFORMED row (e.g. non-numeric doc_id) is data, not configuration -> it is
  routed to a quarantine DataFrame instead of failing the job, consistent with the
  permissive JSONL source (sources/jsonl.py).

The manifest is read with Spark's distributed CSV reader, so a cluster-sized
manifest (billions of include rows) works the same as a 10-line local file; the
downstream join should broadcast only when the manifest is genuinely small
(operators/documents.q_manifest_extract lets the optimizer decide from size stats).
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

REQUIRED_COLS = ("doc_id", "out_path")


def read_manifest_csv(spark: SparkSession, path: str,
                      required_cols: tuple[str, ...] = REQUIRED_COLS,
                      ) -> tuple[DataFrame, DataFrame]:
    """-> (good, quarantined).  Raises ValueError if the header misses a required
    column; quarantines rows whose doc_id does not parse as an integer."""
    raw = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    missing = [c for c in required_cols if c not in raw.columns]
    if missing:  # header contract, checked on the driver before any job runs
        raise ValueError(
            f"manifest {path} is missing required column(s) {missing}; "
            f"header has {raw.columns}")
    # try_cast: ANSI mode is on, a plain cast would fail the JOB on one bad row
    parsed = raw.withColumn("doc_id_long", F.col("doc_id").try_cast("long"))
    bad = F.col("doc_id_long").isNull()
    good = (
        parsed.where(~bad)
        .drop("doc_id")
        .withColumnRenamed("doc_id_long", "doc_id")
        .select("doc_id", *[c for c in raw.columns if c != "doc_id"])
    )
    quarantined = (
        parsed.where(bad).drop("doc_id_long")
        .withColumn("reason", F.lit("bad_doc_id"))
    )
    return good, quarantined


def write_manifest_distributed(docs: DataFrame, out_dir: str,
                               include_bad_row: bool = True) -> str:
    """Materialize a manifest CSV DIRECTORY with ``df.write.csv`` — no driver-side
    collect, so an O(corpus)-sized id set never lands on the driver.  ``docs`` must
    carry ``doc_id``; each part file gets its own header and Spark's header-aware
    reader (read_manifest_csv) handles the multi-file layout transparently.

    The planted malformed row (quarantine exerciser) is unioned in as data, the
    same way a real upstream would hand us a dirty manifest."""
    man = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("out/"), F.col("doc_id").cast("string"),
                 F.lit(".tsv")).alias("out_path"),
    )
    if include_bad_row:
        bad = docs.sparkSession.createDataFrame(
            [("not_a_number", "out/bad.tsv")], "doc_id string, out_path string")
        man = man.unionByName(bad)
    man.write.mode("overwrite").option("header", "true").csv(out_dir)
    return out_dir


def write_demo_manifest(path: str, doc_ids, include_bad_row: bool = True) -> str:
    """Materialize a small driver-side manifest CSV (the reference's input shape).
    ``include_bad_row`` plants one malformed row so the quarantine path runs in
    every demo/contract execution."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "out_path"])
        for d in doc_ids:
            w.writerow([d, f"out/{d}.tsv"])
        if include_bad_row:
            w.writerow(["not_a_number", "out/bad.tsv"])
    os.replace(tmp, path)  # atomic: concurrent readers never see a torn file
    return path
