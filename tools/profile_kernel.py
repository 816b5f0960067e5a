"""Profile the extraction kernel over a slice of the bench corpus (single core).

Usage: python tools/profile_kernel.py [n_rows]
Prints cumulative-time hotspots of extract_frame — the feedback loop for kernel
vectorization work (no Spark involved; the kernel is pure pandas/numpy).
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, ".")

from ocr_engine_spark.kernel.pipeline import extract_frame  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    tbl = pq.read_table("BENCH/transcripts_bench.parquet",
                        columns=["conv_id", "turn_idx", "text"])
    pdf = tbl.slice(0, n).to_pandas()
    print(f"{len(pdf)} rows, {pdf['text'].str.len().sum()} chars", flush=True)

    t0 = time.time()
    extract_frame(pdf.head(100))  # warm imports/regex caches
    pr = cProfile.Profile()
    t1 = time.time()
    pr.enable()
    out = extract_frame(pdf)
    pr.disable()
    dt = time.time() - t1
    print(f"extract_frame: {dt:.2f}s -> {len(pdf)/dt:.0f} turns/sec "
          f"(warm {t1-t0:.2f}s), {out['n_spans'].sum()} spans")
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
    print(s.getvalue())


if __name__ == "__main__":
    main()
