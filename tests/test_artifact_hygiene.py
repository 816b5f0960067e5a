"""Process-lifetime temp-artifact policy (operators/dedup.py helpers): artifact
dirs register for atexit removal, and a corpus rewrite drops the superseded
cache ENTRY while leaving the old dir on disk until exit (a still-held lazy
reader over the old path must keep working)."""

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


def test_evict_drops_superseded_entries_but_keeps_dirs():
    d_old = artifact_tmpdir("test_hygiene_")
    path_old = d_old + "/pairs.parquet"
    os.makedirs(path_old)
    cache = {
        ("sf", 0.5, "md5", 1.0): path_old,
        ("other_sf", 0.5, "md5", 1.0): "unrelated",
    }
    evict_stale_artifacts(cache, ("sf", 0.5, "md5", 2.0))
    # superseded (same prefix, older mtime) ENTRY evicted ...
    assert ("sf", 0.5, "md5", 1.0) not in cache
    # ... but the dir survives for still-held lazy readers, and stays
    # registered for atexit reclamation
    assert os.path.isdir(path_old)
    assert d_old in _ARTIFACT_DIRS
    # unrelated keys untouched
    assert cache == {("other_sf", 0.5, "md5", 1.0): "unrelated"}
    _ARTIFACT_DIRS.remove(d_old)
    os.rmdir(path_old)
    os.rmdir(d_old)


def test_cleanup_removes_registered_dirs_without_touching_others():
    # simulate the atexit pass on an ISOLATED registry: invoking the real
    # global handler mid-process would delete artifacts other tests' caches
    # still point at (order-dependent breakage under -p random / xdist)
    d = artifact_tmpdir("test_hygiene_")
    _ARTIFACT_DIRS.remove(d)
    saved = list(_ARTIFACT_DIRS)
    _ARTIFACT_DIRS[:] = [d]
    try:
        _cleanup_artifact_dirs()
        assert not _ARTIFACT_DIRS
        assert not os.path.exists(d)
    finally:
        _ARTIFACT_DIRS[:] = saved
