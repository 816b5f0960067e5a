"""REAL multi-executor cluster scaling: N vs 4N executors via spark-submit.

The north_rule criterion is ">=0.8 throughput scaling efficiency from N to 4N
executors, run via spark-submit --py-files on a multi-executor cluster".  This
harness runs it literally inside the sandbox:

- a standalone master on 127.0.0.1:7077;
- each executor = one standalone WORKER process pinned by ``taskset`` to its
  own disjoint ``E`` physical cores (standalone gives one executor per worker
  per app, so worker count == executor count); executors and their forked
  Python workers inherit the pinning (verified via /proc Cpus_allowed_list);
- levels: 1 worker vs 4 workers, SAME total corpus (strong scaling, the
  cluster-fan-out shape) — separate JVM heaps per executor, real
  inter-executor shuffle over loopback TCP, the engine shipped via
  ``--py-files dist/engine.zip`` and imported from the zip (submit cwd is
  outside the repo);
- two jobs per level: the map-only extraction kernel AND the shuffle-bearing
  MinHash-LSH pipeline (tools/cluster_job.py), warmup excluded, best of
  ``REPS`` interleaved passes (shared-VM drift hits all levels equally).

E=4 (4 -> 16 busy cores) is the headline pair: both levels leave the socket
half idle, so each added executor gets what a cluster executor gets — private
cores, private heap/GC, approximately private bandwidth.  The shared memory
bus remains the one unavoidable single-machine difference.

    python tools/bench_cluster.py          # orchestrate + write BENCH/CLUSTER_SCALING.md
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
EXEC_CORES = int(os.environ.get("SPARK_GRAFT_CLUSTER_EXEC_CORES", "4"))
LEVELS = (1, 4)
REPS = int(os.environ.get("SPARK_GRAFT_CLUSTER_REPS", "3"))
N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "120000"))
DOC_REPLICAS = int(os.environ.get("SPARK_GRAFT_LSH_REPLICAS", "64"))
ROW_GROUP_ROWS = 8192
JOBS = ("extract", "lsh")


def _spark_class(*args: str, pin: str | None = None,
                 log: pathlib.Path | None = None) -> subprocess.Popen:
    cmd = ["taskset", "-c", pin] if pin else []
    cmd += [f"{SPARK_HOME}/bin/spark-class", *args]
    out = open(log, "w") if log else subprocess.DEVNULL
    return subprocess.Popen(cmd, stdout=out, stderr=subprocess.STDOUT)


def start_master(tmp: pathlib.Path) -> subprocess.Popen:
    proc = _spark_class(
        "org.apache.spark.deploy.master.Master", "--host", "127.0.0.1",
        "--port", "7077", "--webui-port", "8089", log=tmp / "master.log")
    _wait_for(tmp / "master.log", "I have been elected leader")
    return proc


def start_workers(groups: int, tmp: pathlib.Path) -> list[subprocess.Popen]:
    procs = []
    for i in range(groups):
        pin = ",".join(str(c) for c in
                       range(i * EXEC_CORES, (i + 1) * EXEC_CORES))
        log = tmp / f"worker_{i}.log"
        work_dir = tmp / f"work_{i}"
        procs.append(_spark_class(
            "org.apache.spark.deploy.worker.Worker", MASTER_URL,
            "--host", "127.0.0.1", "--port", str(7178 + i),
            "--webui-port", str(8190 + i), "--cores", str(EXEC_CORES),
            "--memory", "10g", "--work-dir", str(work_dir),
            pin=pin, log=log))
    for i in range(groups):
        _wait_for(tmp / f"worker_{i}.log", "Successfully registered")
    return procs


def _wait_for(log: pathlib.Path, needle: str, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        if log.exists() and needle in log.read_text(errors="replace"):
            return
        time.sleep(0.3)
    raise RuntimeError(f"'{needle}' not seen in {log} within {timeout}s")


def _stop(procs: list[subprocess.Popen]) -> None:
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            p.kill()


def submit(job: str, input_path: str, total_cores: int,
           zip_path: pathlib.Path, tmp: pathlib.Path) -> dict:
    cmd = [
        f"{SPARK_HOME}/bin/spark-submit", "--master", MASTER_URL,
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.executor.memory=8g",
        "--conf", "spark.locality.wait=0",
        "--conf", f"spark.sql.shuffle.partitions={2 * total_cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.coalescePartitions.enabled=true",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=4096",
        "--conf", "spark.sql.files.maxPartitionBytes=524288",
        "--py-files", str(zip_path),
        str(REPO / "tools" / "cluster_job.py"),
        "--job", job, "--input", input_path,
        "--expect-executors", str(total_cores // EXEC_CORES),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                         cwd=tmp)  # cwd OUTSIDE the repo: engine import = zip
    if out.returncode != 0:
        raise RuntimeError(f"submit failed:\n{out.stderr[-3000:]}")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def ensure_corpora(bench_dir: pathlib.Path) -> dict[str, str]:
    from ocr_engine_spark.sources.transcripts import write_transcripts_parquet

    transcripts = bench_dir / "transcripts_bench.parquet"
    if not transcripts.exists():
        write_transcripts_parquet(str(transcripts), n_convs=N_CONVS, seed=7,
                                  whale_factor=100,
                                  row_group_size=ROW_GROUP_ROWS)
    docs = bench_dir / f"documents_shuffle_bench_x{DOC_REPLICAS}.parquet"
    if not docs.exists():
        # DOC_REPLICAS disjoint doc_id shards of the sf0.1 corpus; every word
        # gets a shard prefix, so shingles differ across shards and the
        # near-dup pair load stays organic/LINEAR in replicas.  ROW_GROUP_SIZE
        # matters: duckdb's default (~122k rows) would leave the whole corpus in
        # ~3 row groups, capping the expression-heavy scan stage at 3 tasks no
        # matter how many byte-range splits Spark cuts — a well-laid-out table
        # (like our own sinks' {ROW_GROUP_ROWS}-row groups) is what a 100 TB
        # deployment actually reads.
        import duckdb

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        union = " UNION ALL ".join(
            f"SELECT doc_id + {i} * 10000000 AS doc_id, "
            f"'s{i}_' || replace(text, ' ', ' s{i}_') AS text "
            f"FROM '{sf_dir}/documents.parquet'" for i in range(DOC_REPLICAS))
        duckdb.connect().execute(
            f"COPY ({union}) TO '{docs}' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP_ROWS})")
    return {"extract": str(transcripts), "lsh": str(docs)}


def orchestrate() -> None:
    from tools.make_pyfiles import build

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    inputs = ensure_corpora(bench_dir)
    tmp = pathlib.Path("/tmp/spark_cluster_bench")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    zip_path = tmp / "engine.zip"
    zip_sha = build(zip_path)

    subprocess.run(["pkill", "-f", "java.*deploy.master.Master"],
                   capture_output=True)
    subprocess.run(["pkill", "-f", "java.*deploy.worker.Worker"],
                   capture_output=True)
    time.sleep(2)
    master = start_master(tmp)
    best: dict[tuple[str, int], dict] = {}
    try:
        for _pass in range(REPS):
            for groups in LEVELS:
                workers = start_workers(groups, tmp)
                try:
                    for job in JOBS:
                        r = submit(job, inputs[job], groups * EXEC_CORES,
                                   zip_path, tmp)
                        assert r["executors"] == groups, r
                        key = (job, groups)
                        if key not in best or r["sec"] < best[key]["sec"]:
                            best[key] = r
                        print(json.dumps({"pass": _pass, "groups": groups,
                                          **r}), flush=True)
                finally:
                    _stop(workers)
    finally:
        _stop([master])

    pairs, rows = {}, []
    for job in JOBS:
        r1, r4 = best[(job, 1)], best[(job, 4)]
        eff = (r4["rows_per_sec"] / r1["rows_per_sec"]) / 4
        ceff = (r4["corrected_rows_per_sec"]
                / r1["corrected_rows_per_sec"]) / 4
        pairs[job] = {"throughput_1": r1["rows_per_sec"],
                      "throughput_4": r4["rows_per_sec"],
                      "efficiency": round(eff, 3),
                      "corrected_efficiency": round(ceff, 3)}
        rows.append(
            f"| {job} | {r1['rows']:,} | {r1['rows_per_sec']:,.0f} -> "
            f"{r4['rows_per_sec']:,.0f} | {eff:.3f} | {ceff:.3f} "
            f"({r1['tiny_sec']:.1f}s/{r4['tiny_sec']:.1f}s probe) |")

    report = f"""# REAL-cluster scaling: spark-submit at 1 vs 4 executors

Standalone master + worker processes on this machine; **each executor is a
separate worker JVM pinned by taskset to its own disjoint {EXEC_CORES}
physical cores** (executor count == worker count, verified per run), the
engine shipped via ``--py-files engine.zip`` (sha256 {zip_sha[:16]}…,
submit cwd outside the repo so the zip is the only import source), real
inter-executor shuffle over loopback TCP.  Strong scaling: both levels
process the same corpus; best of {REPS} interleaved passes.
Efficiency = (throughput@4 / throughput@1) / 4.

Corrected efficiency subtracts each level's tiny-job probe (the identical
pipeline on a fixed ~2-4k-row slice: scheduler + stage setup + dispatch cost
that does not grow with the data — BENCH/BASELINE.md's protocol) from the
timed region before forming the ratio.

| job | rows | rows/sec @1 -> @4 executors | raw eff | corrected eff |
| --- | --- | --- | --- | --- |
{chr(10).join(rows)}

- **extract** — the flagship fused Arrow kernel (map-only): per-executor
  Python worker pools, no exchange.  This is the north_rule's metric job
  ("turns/sec extracted").
- **lsh** — the MinHash-LSH near-dup pipeline: per-shingle signatures,
  banded bucket self-join (the SHUFFLE crosses executors), exact-Jaccard
  verify.  This is the job class where executor scaling is actually at risk.

## Finding: cold-JIT first waves can fake a 4-8x "scaling collapse"

The first version of this harness warmed the LSH pipeline with only 2,000
docs.  At 1 executor that single JVM absorbed the whole warmup and ran the
timed region hot (~31s); at 4 executors each JVM saw ~500 docs — too few for
HotSpot C2 to compile the generated shingle/minhash expression code — so the
timed first wave ran interpreted at ~100x per-row cost (task timelines: first
4 tasks per executor ~150s, every later identical task 0-1s), and the
4-executor level measured 129-247s, 4-8x SLOWER than 1 executor.  Warming
every executor with a 1/8 corpus slice (touches every scan split) dropped the
4-executor run to ~21s.  Lesson for short-window benchmarks of JVM codegen
pipelines: per-JVM JIT warmup is a fixed cost that amortizes to zero on a
long-running 100 TB job but dominates a ~30s timed region, and it scales
WITH executor count because each new JVM pays it separately.

## Single-machine caveat

The levels share one memory bus ({EXEC_CORES} -> {4 * EXEC_CORES} busy
cores); a real 4N-node cluster adds bandwidth with every node, so these
numbers are a LOWER bound on cluster scaling.  BENCH/BASELINE.md's
pure-multiprocessing hardware control measures the socket's own ceiling for
the 4 -> 16 busy-core transition at 0.544 efficiency for bandwidth-heavy
CPU work — the string/allocation-heavy LSH rows should be read against that
ceiling, the Arrow-kernel extract rows against its demonstrated headroom.

Generated by tools/bench_cluster.py.
"""
    (bench_dir / "CLUSTER_SCALING.md").write_text(report)
    print(json.dumps({"pairs": pairs, "zip_sha256": zip_sha}))


if __name__ == "__main__":
    orchestrate()
