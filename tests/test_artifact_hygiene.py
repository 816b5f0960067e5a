"""Process-lifetime temp-artifact policy (operators/dedup.py helpers): artifact
dirs register for atexit removal, and superseded corpus mtimes evict their
orphaned parquet dirs instead of accumulating in /tmp."""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from ocr_engine_spark.operators.dedup import (  # noqa: E402
    _ARTIFACT_DIRS, _cleanup_artifact_dirs, artifact_tmpdir,
    evict_stale_artifacts,
)


def test_artifact_tmpdir_registers_for_cleanup():
    d = artifact_tmpdir("test_hygiene_")
    assert os.path.isdir(d)
    assert d in _ARTIFACT_DIRS
    _ARTIFACT_DIRS.remove(d)
    os.rmdir(d)


def test_evict_stale_artifacts_removes_superseded_mtime_entries():
    d_old = artifact_tmpdir("test_hygiene_")
    d_new = artifact_tmpdir("test_hygiene_")
    cache = {
        ("sf", 0.5, "md5", 1.0): d_old + "/pairs.parquet",
        ("other_sf", 0.5, "md5", 1.0): d_new + "/pairs.parquet",
    }
    os.makedirs(cache[("sf", 0.5, "md5", 1.0)])
    evict_stale_artifacts(cache, ("sf", 0.5, "md5", 2.0))
    # superseded (same prefix, older mtime) entry evicted and its dir removed
    assert ("sf", 0.5, "md5", 1.0) not in cache
    assert not os.path.exists(d_old)
    # unrelated keys untouched
    assert ("other_sf", 0.5, "md5", 1.0) in cache
    for d in (d_old, d_new):
        if d in _ARTIFACT_DIRS:
            _ARTIFACT_DIRS.remove(d)
    os.path.isdir(d_new) and os.rmdir(d_new)


def test_cleanup_removes_all_registered_dirs():
    d = artifact_tmpdir("test_hygiene_")
    before = list(_ARTIFACT_DIRS)
    _cleanup_artifact_dirs()
    assert not _ARTIFACT_DIRS
    assert not os.path.exists(d)
    assert all(not os.path.exists(x) for x in before)
