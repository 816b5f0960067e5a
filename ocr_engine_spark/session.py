"""Shared SparkSession construction for the jobs/ entry points.

One place for the launch conventions all jobs share (AQE on, Arrow batch
sizing, WARN logs), so a config fix cannot drift between entry points.  On a
cluster the session comes from spark-submit and ``cpus=0`` leaves master and
sizing to the submit conf; ``cpus=N`` is the local[N] smoke-run path.
"""

from __future__ import annotations

import os


def build_session(app_name: str, cpus: int = 0,
                  shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName(app_name)
    if cpus:
        # Local smoke runs can be launched from ANY cwd: the job scripts put
        # the repo on the DRIVER's sys.path, but the forked Python WORKERS
        # build their import path from PYTHONPATH + the JVM cwd only — a
        # worker-side closure referencing the engine would die with
        # ModuleNotFoundError unless the engine's parent dir is exported
        # before the JVM launches.  (Cluster runs don't need this: the
        # engine ships via spark-submit --py-files, which reaches workers
        # through the spark-files include mechanism.)
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        existing = os.environ.get("PYTHONPATH", "")
        if pkg_root not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                pkg_root + (os.pathsep + existing if existing else ""))
        builder = (
            builder.master(f"local[{cpus}]")
            .config("spark.sql.shuffle.partitions",
                    str(shuffle_partitions or cpus))
        )
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # event-time semantics are timezone-dependent in two DIFFERENT ways:
        # timestamp literals/date_trunc follow the session timezone, while
        # F.window tumbling boundaries align to the UTC epoch — on a host
        # with a fractional-hour offset (e.g. +05:30) the two disagree.
        # Pinning UTC makes every engine-owned session's event-time math
        # host-independent (the streaming window rollups rely on this).
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark
