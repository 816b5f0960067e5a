"""Two-parallelism-level scaling evidence for the north_rule criterion.

BASELINE.json requires ">=0.8 throughput scaling efficiency from N to 4N executors".
The sandbox has no multi-executor cluster, so (per BASELINE.md protocol) we run the
IDENTICAL job on the IDENTICAL input at local[8] (N) and local[32] (4N) — each in a
fresh JVM subprocess so JIT/page-cache state cannot leak between levels — and report

    efficiency = (turns_per_sec@4N / turns_per_sec@N) / 4

into ``BENCH/BASELINE.md``.  The job is the flagship fused-kernel extraction over a
seeded synthetic transcript corpus (schema from BASELINE.json input_hint) with the
skew whale included, pre-partitioned identically (strong scaling: fixed 128 salted
partitions, ~16 tasks/core at N=8, ~4 at 4N=32).

    python tools/bench_scaling.py            # orchestrate both levels, write the report
    python tools/bench_scaling.py --worker C P  # internal: one timed run at local[C]
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_CORES = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
N4_CORES = int(os.environ.get("SPARK_GRAFT_SCALE_4N", "32"))
# larger than bench.py's probe so kernel compute dominates constant overheads
# (~570k turns: the sf0.1-tier row count from BASELINE.md's protocol)
N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "60000"))
PARTITIONS = 128  # fixed across levels: strong scaling over identical task set


def worker(cpus: int, parquet: str) -> None:
    from pyspark.sql import SparkSession

    from ocr_engine_spark.operators.extract import extract_transcripts

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(parquet)
    n_turns = df.count()
    # warmup: spin up Python workers / JIT on a slice, outside the timed region
    extract_transcripts(df.limit(2000), num_partitions=cpus) \
        .write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    extract_transcripts(df, num_partitions=PARTITIONS) \
        .write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    print(json.dumps({"cpus": cpus, "turns": n_turns, "sec": round(sec, 3),
                      "turns_per_sec": round(n_turns / sec, 1)}))
    spark.stop()


def orchestrate() -> None:
    from ocr_engine_spark.sources.transcripts import write_transcripts_parquet

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    parquet = bench_dir / "transcripts_bench.parquet"
    n_rows = write_transcripts_parquet(str(parquet), n_convs=N_CONVS, seed=7,
                                       whale_factor=100)
    results = {}
    for cpus in (N_CORES, N4_CORES):
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cpus), str(parquet)],
            capture_output=True, text=True, check=True, cwd=REPO)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)

    tn, t4n = results[N_CORES]["turns_per_sec"], results[N4_CORES]["turns_per_sec"]
    eff = (t4n / tn) / (N4_CORES / N_CORES)
    report = f"""# BENCH — scaling measurement (sandbox protocol, BASELINE.md)

Job: fused-kernel transcript extraction (`ocr_engine_spark.operators.extract
.extract_transcripts`) over a seeded synthetic corpus ({n_rows:,} turns,
{N_CONVS:,} conversations, Zipfian turn counts + 100x whale conversation),
salted into {PARTITIONS} fixed partitions (strong scaling: identical task set
at both levels; ~{PARTITIONS // N_CORES} tasks/core at N, ~{PARTITIONS // N4_CORES} at 4N).
Each level runs in a fresh JVM; warmup pass excluded from timing.

| level | cores | turns/sec | wall sec |
| --- | --- | --- | --- |
| N  | local[{N_CORES}] | {tn:,.1f} | {results[N_CORES]['sec']} |
| 4N | local[{N4_CORES}] | {t4n:,.1f} | {results[N4_CORES]['sec']} |

**Scaling efficiency (N -> 4N) = ({t4n:,.1f} / {tn:,.1f}) / {N4_CORES // N_CORES} =
{eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
"""
    (bench_dir / "BASELINE.md").write_text(report)
    print(json.dumps({"efficiency": round(eff, 3), "pass": eff >= 0.8}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        orchestrate()
