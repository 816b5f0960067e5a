"""Round-trippable TSV fixture format (S8/S11).

Mirrors the reference's output contract so fixtures stay byte-comparable:

- writer: Page.write_to_file (/root/reference/src/dto.py:464-477) — one line per word,
  coordinates int(float(v))-truncated, tab-separated, text last.  The graft writes
  ``start\tend\tkind\ttext`` per span.
- reader: read_ocr_result_from_txt (/root/reference/src/utils.py:281-296) — split on
  tabs, skip blank lines and blank texts.
"""

from __future__ import annotations


def spans_to_tsv(spans) -> str:
    lines = []
    for sp in spans:
        start = int(float(sp["start"]))
        end = int(float(sp["end"]))
        lines.append(f"{start}\t{end}\t{sp['kind']}\t{sp['text']}")
    return "\n".join(lines) + ("\n" if lines else "")


def tsv_to_spans(payload: str):
    spans = []
    for line in payload.split("\n"):
        if not line:
            continue
        parts = line.split("\t")
        start, end, kind = int(parts[0]), int(parts[1]), parts[2]
        text = "\t".join(parts[3:])
        if not text or text == " ":  # blank-text filter (utils.py:293-295)
            continue
        spans.append({"start": start, "end": end, "kind": kind, "text": text})
    return spans
