"""Regenerate golden per-turn extraction fixtures (SURVEY.md §5.2 item 1).

The oracle kernel (ocr_engine_spark.kernel, pure Python) is the source of truth; this
script freezes its output on the seeded synthetic corpus as JSONL + reference-format TSV
(dto.py:464-477 round-trip format).  Run after any INTENTIONAL semantics change:

    python tools/make_golden.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from ocr_engine_spark.kernel.pipeline import extract_turn
from ocr_engine_spark.kernel.tsv import spans_to_tsv
from ocr_engine_spark.sources.transcripts import generate_transcripts

GOLDEN_DIR = pathlib.Path(__file__).resolve().parents[1] / "tests" / "golden"
N_CONVS = 40
SEED = 13
WHALE = 4


def main() -> None:
    df = generate_transcripts(N_CONVS, seed=SEED, whale_factor=WHALE)
    out_path = GOLDEN_DIR / "golden_turns.jsonl"
    tsv_path = GOLDEN_DIR / "golden_spans.tsv"
    n = 0
    with open(out_path, "w") as fh, open(tsv_path, "w") as tsv:
        for row in df.itertuples(index=False):
            r = extract_turn(row.text)
            rec = {
                "conv_id": row.conv_id,
                "turn_idx": int(row.turn_idx),
                "extracted_text": r["extracted_text"],
                "spans": r["spans"],
                "n_spans": r["n_spans"],
                "strip_ratio": r["strip_ratio"],
                "fmt": r["fmt"],
                "is_blank": r["is_blank"],
            }
            fh.write(json.dumps(rec, ensure_ascii=False, sort_keys=True) + "\n")
            tsv.write(f"# {row.conv_id}\t{int(row.turn_idx)}\n")
            tsv.write(spans_to_tsv(r["spans"]))
            n += 1
    print(f"wrote {n} golden turns -> {out_path}")


if __name__ == "__main__":
    main()
