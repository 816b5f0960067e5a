"""Physical-plan introspection helpers.

The engine has no custom Catalyst rules (SURVEY.md §4.2) — its plan obligations are
properties of the built-in optimizer output: filters pushed to the scan, columns
pruned, dimensions broadcast, Python evaluation only where a kernel is intended.
These helpers make those properties assertable (tests/test_plans.py) and easy to
check interactively while iterating on an operator (`print(explain(df))`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain()` as a string (Spark only prints it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def read_schemas(df: DataFrame) -> list[str]:
    """The ReadSchema of every file scan in the plan — what actually hits storage."""
    return [l.split("ReadSchema:", 1)[1].strip()
            for l in explain(df).splitlines() if "ReadSchema:" in l]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters of every scan (empty list entries mean a full scan)."""
    return [l.split("PushedFilters:", 1)[1].strip()
            for l in explain(df).splitlines() if "PushedFilters:" in l]


def has_python_eval(df: DataFrame) -> bool:
    """True if any Python-worker node (ArrowEval/BatchEval/MapInPandas) is in the
    plan.  Relational/dedup operators must keep this False; kernel operators True."""
    p = explain(df)
    return "EvalPython" in p or "MapInPandas" in p or "FlatMapGroupsInPandas" in p


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle/broadcast-exchange) nodes — the scale currency."""
    return explain(df).count("Exchange")


def broadcast_join_count(df: DataFrame) -> int:
    return explain(df).count("BroadcastHashJoin")
