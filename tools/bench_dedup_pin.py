"""Pin the r02->r03 dedup bench regressions (VERDICT r03 'What's wrong' #2).

BENCH_r02 vs BENCH_r03 at sf0.1 showed minhash_lsh_pairs 3.08s -> 15.63s,
simhash_neardup 2.86s -> 11.34s, simhash 0.69s -> 1.85s with no algorithmic
change in the operators (r03 only added persist-tracking + the convergence
raise).  This harness re-measures the three queries INTERLEAVED (round-robin
over reps, so shared-VM drift hits every variant equally) and A/Bs the one
plan-affecting r03 change — persisting the MinHash signature build side —
directly.  Output: one JSON line; findings recorded in
BENCH/dedup_regression.md.

    python tools/bench_dedup_pin.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import build_spark, force
    from ocr_engine_spark.operators import dedup

    spark = build_spark(cpus)
    docs = dedup.spread(
        dedup.load(spark, sf_dir, "documents").select("doc_id", "source", "text"))
    docs_nt = docs.select("doc_id", "text")

    variants = {
        "minhash_persist": lambda: dedup.minhash_lsh_pairs(
            docs_nt, jaccard_threshold=0.5, family="md5", persist=True),
        "minhash_nopersist": lambda: dedup.minhash_lsh_pairs(
            docs_nt, jaccard_threshold=0.5, family="md5", persist=False),
        "simhash": lambda: dedup.simhash(docs_nt, family="md5")
        .select("doc_id", "simhash"),
        "simhash_neardup": lambda: dedup.simhash_neardup_pairs(
            docs_nt, max_hamming=3),
    }

    # warmup pass (untimed): JVM JIT + Python worker fork
    force(variants["simhash"]())
    import gc

    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for name, fn in variants.items():  # interleaved round-robin
            dedup.release_persisted_artifacts()
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.perf_counter()
            force(fn())
            times[name].append(round(time.perf_counter() - t0, 3))

    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "reps": reps,
        "times": times,
        "median": {k: sorted(v)[len(v) // 2] for k, v in times.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
