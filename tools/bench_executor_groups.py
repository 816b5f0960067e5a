"""Executor-analogue scaling evidence (VERDICT r03 'next round' #5).

The north_rule criterion is ">=0.8 throughput scaling efficiency from N to 4N
*executors*".  A single ``local[C]`` JVM models executor count poorly: going
8 -> 32 cores in ONE process saturates the socket's memory bus, which no
4N-executor cluster does (every node brings its own bus).  This harness models
executors directly:

- an "executor" = one Spark JVM at ``local[E]`` pinned with ``taskset`` to its
  own DISJOINT set of E physical cores (no thread migration between groups);
- the corpus is hash-partitioned into G disjoint parquet slices (the same
  bucket(conv) layout a cluster scan would give each executor);
- levels G=1 vs G=4 run the SAME total corpus: 1 executor processes all of it,
  4 executors each process their quarter CONCURRENTLY (strong scaling, like a
  real cluster fan-out);
- a file barrier synchronizes the timed regions: every JVM builds its session
  and warms its Python workers first, the parent releases them together, and
  the level's wall time is max(end) - min(start) across the group;
- efficiency(1 -> 4 executors) = (corpus / span_4) / (corpus / span_1) / 4.

Two executor sizes are reported: E=4 (4 -> 16 busy cores — bus headroom at
both levels, the closest single-socket analogue of multi-node scaling) and
E=8 (8 -> 32 busy cores — the full-socket stress case whose single-JVM variant
missed the gate in r03).

    python tools/bench_executor_groups.py            # orchestrate + report
    python tools/bench_executor_groups.py --worker E CORES SLICE_PATHS BARRIER_DIR IDX
"""

from __future__ import annotations

import glob
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

EXECUTOR_SIZES = (4, 8)
GROUPS = (1, 4)
N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "120000"))
MAX_PARTITION_BYTES = 512 << 10
ROW_GROUP_ROWS = 8192
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
TINY_ROWS = 2000


def worker(exec_cores: int, slice_paths: list[str], barrier_dir: str,
           idx: int) -> None:
    from pyspark.sql import SparkSession

    from ocr_engine_spark.operators.extract import extract_transcripts

    spark = (
        SparkSession.builder.master(f"local[{exec_cores}]")
        .appName(f"exec-group-{idx}")
        .config("spark.sql.files.maxPartitionBytes", str(MAX_PARTITION_BYTES))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(*slice_paths)
    n_turns = df.count()
    # warm the Python workers OUTSIDE the timed region
    extract_transcripts(df.limit(TINY_ROWS)) \
        .write.format("noop").mode("overwrite").save()
    # barrier: announce readiness, wait for the parent's go signal so every
    # group's timed region overlaps (concurrent executors, like a cluster)
    pathlib.Path(barrier_dir, f"ready_{idx}").touch()
    go = pathlib.Path(barrier_dir, "go")
    while not go.exists():
        time.sleep(0.05)
    t0 = time.time()
    extract_transcripts(df).write.format("noop").mode("overwrite").save()
    t1 = time.time()
    print(json.dumps({"idx": idx, "turns": n_turns,
                      "t0": t0, "t1": t1, "sec": round(t1 - t0, 3)}))
    spark.stop()


def _split_corpus(parquet: str, out_dir: pathlib.Path, groups: int) -> list[str]:
    """Hash-partition the corpus into ``groups`` disjoint slices (executor
    scan shares).  Deterministic: pmod(xxhash64(conv_id, turn_idx), G)."""
    from pyspark.sql import SparkSession, functions as F

    done = out_dir / "_DONE"
    slice_dirs = [str(out_dir / f"slice_{i}") for i in range(groups)]
    if done.exists():
        return slice_dirs
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("slice-writer").config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(parquet).withColumn(
        "grp", F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(groups)))
    for i in range(groups):
        (df.where(F.col("grp") == i).drop("grp")
         .write.mode("overwrite")
         .option("parquet.block.size", str(ROW_GROUP_ROWS * 256))
         .parquet(slice_dirs[i]))
    spark.stop()
    done.touch()
    return slice_dirs


def _run_level(exec_cores: int, groups: int, slice_dirs: list[str],
               tmp: pathlib.Path) -> dict:
    """One timed level: ``groups`` pinned JVMs over disjoint cores + slices."""
    import shutil
    import tempfile

    barrier = pathlib.Path(tempfile.mkdtemp(prefix="exec_barrier_", dir=tmp))
    procs = []
    for i in range(groups):
        cores = ",".join(str(c) for c in
                         range(i * exec_cores, (i + 1) * exec_cores))
        if groups == 1:
            paths = slice_dirs  # one executor scans every slice
        else:
            paths = [slice_dirs[i]]
        cmd = ["taskset", "-c", cores, sys.executable, __file__, "--worker",
               str(exec_cores), cores, json.dumps(paths), str(barrier), str(i)]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, cwd=REPO))
    # wait until every group is warmed and parked at the barrier, then release
    while len(glob.glob(str(barrier / "ready_*"))) < groups:
        time.sleep(0.1)
        if any(p.poll() is not None and p.poll() != 0 for p in procs):
            raise RuntimeError("executor-group worker died before the barrier")
    (barrier / "go").touch()
    outs = []
    for p in procs:
        stdout, _ = p.communicate()
        if p.returncode != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}")
        line = [l for l in stdout.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))
    shutil.rmtree(barrier, ignore_errors=True)
    span = max(o["t1"] for o in outs) - min(o["t0"] for o in outs)
    turns = sum(o["turns"] for o in outs)
    return {"exec_cores": exec_cores, "groups": groups, "turns": turns,
            "span_sec": round(span, 3),
            "turns_per_sec": round(turns / span, 1),
            "per_group_sec": [o["sec"] for o in outs]}


def orchestrate() -> None:
    from ocr_engine_spark.sources.transcripts import write_transcripts_parquet

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    parquet = bench_dir / "transcripts_bench.parquet"
    if not parquet.exists():
        write_transcripts_parquet(str(parquet), n_convs=N_CONVS, seed=7,
                                  whale_factor=100,
                                  row_group_size=ROW_GROUP_ROWS)
    slices_dir = bench_dir / "exec_slices"
    slices_dir.mkdir(exist_ok=True)
    slice_dirs = _split_corpus(str(parquet), slices_dir, max(GROUPS))

    best: dict[tuple[int, int], dict] = {}
    for _pass in range(REPS):  # interleaved passes (drift-robust best-of-N)
        for e in EXECUTOR_SIZES:
            for g in GROUPS:
                r = _run_level(e, g, slice_dirs, slices_dir)
                key = (e, g)
                if key not in best or r["span_sec"] < best[key]["span_sec"]:
                    best[key] = r
                print(json.dumps(r), flush=True)

    pairs = {}
    rows = []
    for e in EXECUTOR_SIZES:
        r1, r4 = best[(e, 1)], best[(e, 4)]
        eff = (r4["turns_per_sec"] / r1["turns_per_sec"]) / 4
        pairs[f"E{e}:1->4"] = {
            "throughput_1": r1["turns_per_sec"], "throughput_4": r4["turns_per_sec"],
            "efficiency": round(eff, 3)}
        rows.append(
            f"| {e} | 1 -> 4 ({e} -> {4 * e} busy cores) "
            f"| {r1['turns_per_sec']:,.0f} -> {r4['turns_per_sec']:,.0f} "
            f"| {eff:.3f} |")

    report = f"""# Executor-analogue scaling (N -> 4N executors, pinned process groups)

An "executor" here is one Spark JVM at ``local[E]`` pinned by ``taskset`` to
its own disjoint E physical cores, scanning its own hash-partitioned corpus
slice — the closest single-machine model of adding cluster executors (each
with private cores; the shared memory bus remains the one unavoidable
difference, mitigated at E=4 by leaving the socket half idle).  The corpus is
the standard scaling corpus ({best[(EXECUTOR_SIZES[0], 1)]['turns']:,} turns,
Zipfian + 100x whale); the timed regions of all groups in a level overlap via
a file barrier (sessions built and Python workers warmed beforehand); best of
{REPS} interleaved passes.  Efficiency = (throughput@4 executors /
throughput@1 executor) / 4.

| executor cores E | executors | turns/sec | scaling efficiency |
| --- | --- | --- | --- |
{chr(10).join(rows)}

Protocol notes:
- strong scaling: level G=1 processes the FULL corpus on one executor, level
  G=4 processes the same corpus split across 4 concurrent executors;
- slices are disjoint by pmod(xxhash64(conv_id, turn_idx), 4) — the
  bucket-layout share a cluster scan would hand each executor;
- JVM startup, scan metadata, and Python-worker warmup are excluded by the
  barrier (measured region = kernel execution only, same as BASELINE.md).

Generated by tools/bench_executor_groups.py.
"""
    (bench_dir / "EXECUTOR_GROUPS.md").write_text(report)
    print(json.dumps({"pairs": pairs}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), json.loads(sys.argv[4]),
               sys.argv[5], int(sys.argv[6]))
    else:
        orchestrate()
