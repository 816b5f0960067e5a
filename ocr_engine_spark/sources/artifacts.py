"""Hash-pinned artifact cache (S12) — the model/config artifact fetch graft.

The reference resolves a model version to a file in a local hub cache, verifying a
sha256 against the pinned factory hash and re-fetching on mismatch
(/root/reference/externals/sdsvtd/sdsvtd/factory.py:43-73, sdsvtr mirror).  The
graft ships engine artifacts (config tables, stopword lists, centroid seeds) to
executors via ``spark-submit --py-files/--archives``; this module is the
driver-side cache that guarantees what gets shipped is byte-exactly what was
pinned:

- ``expected_sha256`` pins the artifact: a source file whose digest differs is a
  configuration error -> raise (fail fast before any job is scheduled);
- a cached copy whose digest no longer matches the source is stale -> warn and
  replace (the reference's re-download path);
- no network fetch in the sandbox — the ``wget`` analogue is the cluster's
  artifact store, behind the same digest check.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import warnings


def sha256sum(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def fetch_artifact(source: str, cache_dir: str,
                   expected_sha256: str | None = None) -> str:
    """Resolve ``source`` into the cache, digest-verified.  Returns the cache path."""
    if not os.path.exists(source):
        raise ValueError(f"artifact not found: {source}")
    src_hash = sha256sum(source)
    if expected_sha256 is not None and src_hash != expected_sha256:
        raise ValueError(
            f"artifact {source} sha256 {src_hash[:12]}... does not match the "
            f"pinned {expected_sha256[:12]}...")
    os.makedirs(cache_dir, exist_ok=True)
    cached = os.path.join(cache_dir, os.path.basename(source))
    if not os.path.exists(cached):
        shutil.copy2(source, cached)
    elif sha256sum(cached) != src_hash:
        # the reference warns + re-fetches on a stale hub copy (factory.py:64-72)
        warnings.warn(
            f"cached artifact {cached} sha256 mismatch; replacing from source")
        os.remove(cached)
        shutil.copy2(source, cached)
    return cached
