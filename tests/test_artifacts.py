"""Hash-pinned artifact cache (S12 graft,
/root/reference/externals/sdsvtd/sdsvtd/factory.py:43-73 semantics)."""

import warnings

import pytest

from ocr_engine_spark.sources.artifacts import fetch_artifact, sha256sum


def test_fetch_copies_and_pins(tmp_path):
    src = tmp_path / "model.cfg"
    src.write_text("stopwords: [the, a]\n")
    cache = tmp_path / "hub"
    got = fetch_artifact(str(src), str(cache), expected_sha256=sha256sum(str(src)))
    assert got == str(cache / "model.cfg")
    assert open(got).read() == src.read_text()


def test_fetch_rejects_wrong_pin(tmp_path):
    src = tmp_path / "model.cfg"
    src.write_text("v1")
    with pytest.raises(ValueError, match="does not match the pinned"):
        fetch_artifact(str(src), str(tmp_path / "hub"), expected_sha256="0" * 64)


def test_fetch_missing_source_raises(tmp_path):
    with pytest.raises(ValueError, match="not found"):
        fetch_artifact(str(tmp_path / "nope.bin"), str(tmp_path / "hub"))


def test_stale_cache_replaced_with_warning(tmp_path):
    src = tmp_path / "model.cfg"
    src.write_text("v1")
    cache = tmp_path / "hub"
    cached = fetch_artifact(str(src), str(cache))
    # cache goes stale (the reference warns + re-fetches, factory.py:64-72)
    open(cached, "w").write("corrupted")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = fetch_artifact(str(src), str(cache))
    assert open(got).read() == "v1"
    assert any("mismatch" in str(x.message) for x in w)
