"""North_rule launch lifecycle, end to end: ``spark-submit --py-files engine.zip
jobs/extract_job.py`` with the engine imported FROM THE ZIP, not the repo tree.

The job file is copied to a temp dir and run with a cwd outside the repo, so its
own ``sys.path.insert(parent)`` points at the temp dir — the only way
``ocr_engine_spark`` resolves is through the shipped ``--py-files`` artifact,
exactly as on a cluster where executors unpack the zip.  Verifies the artifact
builder's determinism (pinned sha256 story) and the job's output + metrics.
"""

import json
import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tools.make_pyfiles import build  # noqa: E402

SPARK_SUBMIT = shutil.which("spark-submit")


def test_pyfiles_zip_deterministic(tmp_path):
    d1 = build(tmp_path / "a.zip")
    d2 = build(tmp_path / "b.zip")
    assert d1 == d2  # same tree -> same bytes -> pinnable hash


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_e2e(tmp_path):
    from ocr_engine_spark.sources.transcripts import (
        generate_transcripts, write_transcripts_parquet)

    # corpus with a seed none of the unit suites use; the package writer (not
    # raw pandas to_parquet: that emits TIMESTAMP(NANOS), which Spark rejects)
    input_parquet = tmp_path / "transcripts.parquet"
    write_transcripts_parquet(str(input_parquet), n_convs=40, seed=101)
    pdf = generate_transcripts(n_convs=40, seed=101)

    zip_path = tmp_path / "engine.zip"
    build(zip_path)
    job_copy = tmp_path / "extract_job.py"
    shutil.copy(REPO / "jobs" / "extract_job.py", job_copy)

    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path), str(job_copy),
         "--input", str(input_parquet), "--input-flavor", "parquet",
         "--output", str(out_dir), "--run-id", "submit-e2e",
         "--n-buckets", "8"],
        capture_output=True, text=True, timeout=420, cwd=tmp_path)
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["buckets_run"] == summary["buckets_total"] == 8

    # the shipped engine must agree with the in-repo engine turn for turn
    from ocr_engine_spark.kernel import extract_frame

    expected = extract_frame(pdf)
    import pandas as pd

    got = pd.read_parquet(out_dir / "extracted").sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = expected.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["extracted_text"].tolist() == exp["extracted_text"].tolist()
