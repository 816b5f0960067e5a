"""Deterministic synthetic transcript generator (FIXTURES.md §1 matrix).

Schema is authoritative from BASELINE.json input_hint:
    transcripts(conv_id string, turn_idx int32, role string, text string, tool string,
                ts timestamp)

Payload kinds exercise every pipeline stage: plain prose, boilerplate-laden HTML,
quote-skewed markdown, tool-call JSON, numeric-heavy turns, blank turns, and unicode edge
cases (Vietnamese diacritics from the reference recognizer's dictionary domain, the ✪
placeholder, emoji, CRLF).  Turn counts are Zipfian with an explicit whale conversation
(~100x the median) for skew tests.  Everything is seeded — same args, same bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_WORDS = (
    "spark engine extract content span line turn merge order batch stream table scan "
    "filter join window group sort hash key value row column vector query data fast slow "
    "small big part customer total price amount systems design agent transcript tool call "
    "answer question context token model index shard salt skew partition shuffle"
).split()

_VIET = ["Nguyễn", "Trần", "Hà Nội", "tiếng Việt", "Đà Nẵng", "phở", "cảm ơn"]
_EMOJI = ["🚀", "✨", "🧪", "📦"]

_HTML_BOILER = (
    '<html><head><style>body {{font: 12px}}</style>'
    "<script>var x = 1; trackUser();</script></head>"
    '<body><nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
    "<h1>{title}</h1><p>{p1} &amp; {p2}&#x27;s notes</p>"
    '<div class="content"><p>{p3}</p><a href="{url}">{anchor}</a></div>'
    "<footer>Copyright 2026 Example Corp</footer></body></html>"
)

_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["search", "calculator", "browser", "db_query"]


def _sentence(rng: np.random.RandomState, n: int) -> str:
    return " ".join(_WORDS[i] for i in rng.randint(0, len(_WORDS), n))


def _payload(rng: np.random.RandomState, kind: int) -> tuple[str, str | None]:
    """Return (text, tool) for one turn; kind selects the generator-matrix row."""
    if kind == 0:  # plain prose
        return _sentence(rng, int(rng.randint(8, 60))), None
    if kind == 1:  # HTML with boilerplate
        return _HTML_BOILER.format(
            title=_sentence(rng, 3), p1=_sentence(rng, 10), p2=_WORDS[rng.randint(len(_WORDS))],
            p3=_sentence(rng, 14), url=f"https://ex.com/{rng.randint(999)}",
            anchor=_sentence(rng, 2)), None
    if kind == 2:  # quote-skewed markdown
        depth = int(rng.randint(1, 4))
        lines = ["# " + _sentence(rng, 3)]
        for _ in range(int(rng.randint(2, 6))):
            lines.append("> " * depth + "- " + _sentence(rng, 7))
        lines.append(f"See [{_sentence(rng, 2)}](https://ex.com/doc) and **{_WORDS[rng.randint(len(_WORDS))]}**.")
        return "\n".join(lines), None
    if kind == 3:  # tool-call JSON
        tool = _TOOLS[rng.randint(len(_TOOLS))]
        payload = (
            '{"tool": "%s", "args": {"query": "%s", "limit": %d},'
            ' "result": ["%s", "%s"], "elapsed": %s}'
            % (tool, _sentence(rng, 4), rng.randint(1, 100),
               _sentence(rng, 5), _sentence(rng, 3),
               round(float(rng.rand()) * 10, 3))
        )
        return payload, tool
    if kind == 4:  # numeric-heavy
        return ("invoice 2024-0%d-1%d total $%d,%03d.%02d tax 8.25%% due 12/31/2026 qty %d"
                % (rng.randint(1, 9), rng.randint(0, 9), rng.randint(1, 99),
                   rng.randint(0, 999), rng.randint(0, 99), rng.randint(1, 50))), None
    if kind == 5:  # blank / whitespace-only
        return ["", "   ", "\n\n", "\t \n"][rng.randint(4)], None
    # unicode edge cases
    bits = [
        _VIET[rng.randint(len(_VIET))],
        _sentence(rng, 5),
        "✪" + _WORDS[rng.randint(len(_WORDS))] + "✪",
        _EMOJI[rng.randint(len(_EMOJI))],
    ]
    sep = "\r\n" if rng.rand() < 0.5 else " "
    return sep.join(bits), None


def generate_transcripts(n_convs: int = 50, seed: int = 7,
                         whale_factor: int = 100) -> pd.DataFrame:
    """Seeded corpus: Zipfian turn counts + one whale conversation (skew fixture)."""
    rng = np.random.RandomState(seed)
    median_turns = 8
    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": [], "tool": [], "ts": []}
    base_ts = np.datetime64("2026-01-01T00:00:00")
    for c in range(n_convs):
        if c == 0 and whale_factor > 1:
            n_turns = median_turns * whale_factor  # the skewed long conversation
        else:
            n_turns = int(min(1 + rng.zipf(1.6), 60))
        t0 = base_ts + np.timedelta64(int(rng.randint(0, 10_000_000)), "s")
        for t in range(n_turns):
            kind = int(rng.randint(0, 7))
            text, tool = _payload(rng, kind)
            rows["conv_id"].append(f"conv-{c:06d}")
            rows["turn_idx"].append(t)
            rows["role"].append(_ROLES[rng.randint(len(_ROLES))] if tool is None else "tool")
            rows["text"].append(text)
            rows["tool"].append(tool)
            rows["ts"].append(t0 + np.timedelta64(t * 30, "s"))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def write_transcripts_parquet(path: str, n_convs: int, seed: int = 7,
                              whale_factor: int = 100,
                              row_group_size: int | None = None) -> int:
    """Materialize a corpus to parquet (bench input); returns the row count.

    ``row_group_size`` caps rows per parquet row group: row groups are the scan's
    split boundaries, so small groups let ``spark.sql.files.maxPartitionBytes``
    byte-bound tasks even for a single file (a 1-row-group file is one task no
    matter the setting).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_transcripts(n_convs, seed=seed, whale_factor=whale_factor)
    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()), ("role", pa.string()),
        ("text", pa.string()), ("tool", pa.string()), ("ts", pa.timestamp("us")),
    ])
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    if row_group_size:
        pq.write_table(table, path, row_group_size=row_group_size)
    else:
        pq.write_table(table, path)
    return len(df)


def union_sources(dfs):
    """Multi-source ingestion (SURVEY.md §2.7): merge heterogeneous table layouts by
    COLUMN NAME, null-filling columns a source lacks.  Positional union would
    silently mis-map reordered schemas; ``unionByName(allowMissingColumns=True)``
    keeps every source readable as soon as its shared key columns exist."""
    if not dfs:
        raise ValueError("union_sources needs at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
