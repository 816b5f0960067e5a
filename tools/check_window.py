"""Window-rotation gate: changed queries must sit inside the driver's window.

The external correctness gate checks only the FIRST 50 ``queries()`` entries,
so the repo policy (VERDICT r3/r4) parks only long-stable queries past the
window and rotates anything recently changed to the front.  Round 3 showed the
policy can slip silently; this tool makes it mechanical:

- base = the most recent driver round-boundary commit (``round N: ...``);
- a query is DIRTY if, relative to that base (committed or not),
  (a) any module its implementing module can REACH through
      ``ocr_engine_spark.*`` references changed (the reference scan is a
      plain regex over file text, so lazy executor-side imports count, and
      reachability is the transitive closure — a kernel edit dirties every
      query whose operator rides the kernel), or
  (b) its oracle_sql() entry text changed / is new in ``__spark_entry__.py``
      (regex-extracted; constants interpolated through f-strings are outside
      the diff, a documented limitation);
- every dirty query must sit in positions 1..WINDOW of ``queries()``.

Run directly (``python tools/check_window.py``) or via the pytest wrapper in
``tests/test_contract_tail.py``; exit code 1 on violation.
"""

from __future__ import annotations

import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

WINDOW = 50
_REF = re.compile(r"ocr_engine_spark(?:\.\w+)+")
_ORACLE = re.compile(r'"(\w+)":\s*f?"""(.*?)"""', re.DOTALL)


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, capture_output=True,
                          text=True, timeout=30).stdout


def last_round_commit() -> str | None:
    out = _git("log", "--grep", "^round [0-9]*:", "-n", "1", "--format=%H")
    return out.strip() or None


def changed_files(base: str) -> set[str]:
    files = set(_git("diff", "--name-only", f"{base}..HEAD").split())
    files |= {line[3:].split(" -> ")[-1]
              for line in _git("status", "--porcelain").splitlines() if line}
    return files


def _module_name(path: pathlib.Path) -> str:
    rel = path.relative_to(REPO).with_suffix("")
    parts = list(rel.parts)
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts)


def _import_refs(path: pathlib.Path, text: str) -> set[str]:
    """All ocr_engine_spark modules ``path`` imports, resolved via the AST.

    Catches the spellings the dotted-text regex cannot: ``from
    ocr_engine_spark import x``, ``import ocr_engine_spark.x as y``, and
    relative imports (``from . import x``, ``from ..kernel import z``) —
    resolved against the file's own package — so the gate's soundness does
    not rest on an import-style convention.  Lazy in-function imports are
    AST nodes too, so they count.
    """
    import ast

    # the package relative imports resolve against: parent for a plain module,
    # the package itself for an __init__ — both are parts[:-1] ("__init__"
    # drops away exactly like the module filename does)
    pkg_parts = list(path.relative_to(REPO).with_suffix("").parts)[:-1]
    refs: set[str] = set()
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return refs
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            refs.update(a.name for a in node.names)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against this file's package
                base_parts = pkg_parts[:len(pkg_parts) - (node.level - 1)]
                base = ".".join(base_parts + ([node.module] if node.module else []))
            else:
                base = node.module or ""
            refs.add(base)
            refs.update(f"{base}.{a.name}" for a in node.names)
    return {r for r in refs if r.startswith("ocr_engine_spark")}


def reference_graph() -> dict[str, set[str]]:
    """module -> set of ocr_engine_spark modules its file references (dotted
    text mentions — lazy imports, strings — plus AST-resolved import forms)."""
    graph: dict[str, set[str]] = {}
    for path in (REPO / "ocr_engine_spark").rglob("*.py"):
        text = path.read_text()
        graph[_module_name(path)] = set(_REF.findall(text)) | _import_refs(path, text)
    return graph


def dirty_modules(changed: set[str]) -> set[str]:
    """Transitive closure: modules that can reach a changed module."""
    graph = reference_graph()
    seed = set()
    for f in changed:
        if f.startswith("ocr_engine_spark/") and f.endswith(".py"):
            seed.add(_module_name(REPO / f))
    dirty = set(seed)
    while True:
        grew = False
        for mod, refs in graph.items():
            if mod in dirty:
                continue
            # package references resolve because _module_name maps a package's
            # __init__.py to the bare package name, so its refs chain onward
            if any(r in dirty for r in refs):
                dirty.add(mod)
                grew = True
        if not grew:
            return dirty


def oracle_entries(text: str) -> dict[str, str]:
    tail = text.split("def oracle_sql", 1)[-1]
    return {m.group(1): m.group(2) for m in _ORACLE.finditer(tail)}


def dirty_oracles(base: str) -> set[str]:
    old = _git("show", f"{base}:__spark_entry__.py")
    new = (REPO / "__spark_entry__.py").read_text()
    o_old, o_new = oracle_entries(old), oracle_entries(new)
    return {k for k, v in o_new.items() if o_old.get(k) != v}


def check() -> list[str]:
    """Returns a list of violation strings (empty = pass)."""
    base = last_round_commit()
    if base is None:
        return []
    import __spark_entry__ as entrymod

    changed = changed_files(base)
    mods = dirty_modules(changed)
    oracles = dirty_oracles(base)
    qs = entrymod.queries()
    violations = []
    for pos, name in enumerate(qs):
        if pos < WINDOW:
            continue
        fn = qs[name]
        why = []
        if fn.__module__ in mods:
            why.append(f"module {fn.__module__} changed since {base[:8]}")
        if name in oracles:
            why.append("oracle text changed")
        if why:
            violations.append(
                f"{name} at position {pos + 1} (> {WINDOW}): " + "; ".join(why))
    return violations


def main() -> None:
    violations = check()
    for v in violations:
        print(f"[window] {v}")
    if violations:
        sys.exit(1)
    print(f"[window] ok: every changed query sits inside the first {WINDOW}")


if __name__ == "__main__":
    main()
