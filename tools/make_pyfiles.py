"""Build the ``--py-files`` artifact for cluster launches (north_rule lifecycle).

Packages ``ocr_engine_spark/`` into a deterministic zip: entries are added in
sorted order with a fixed timestamp, so the same source tree always produces the
same bytes — the sha256 printed here is the hash a deployment pins (the S12
artifact-fetch analogue, /root/reference/externals/sdsvtd/sdsvtd/factory.py:43-73,
where model weights are wget'd and sha256-verified).

    python tools/make_pyfiles.py [out.zip]     # default: dist/engine.zip
    spark-submit --py-files dist/engine.zip jobs/extract_job.py ...
"""

from __future__ import annotations

import hashlib
import pathlib
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parents[1]
PACKAGE = "ocr_engine_spark"
# fixed DOS timestamp (2020-01-01) so rebuilds are byte-identical
FIXED_DATE = (2020, 1, 1, 0, 0, 0)


def build(out_path: pathlib.Path) -> str:
    out_path.parent.mkdir(parents=True, exist_ok=True)
    sources = sorted((REPO / PACKAGE).rglob("*.py"))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for src in sources:
            info = zipfile.ZipInfo(
                str(src.relative_to(REPO)), date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, src.read_bytes())
    return hashlib.sha256(out_path.read_bytes()).hexdigest()


def main() -> None:
    out = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "engine.zip"
    digest = build(out)
    print(f"{out} sha256={digest}")


if __name__ == "__main__":
    main()
