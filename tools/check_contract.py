"""Local replica of the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() on DuckDB over the same parquet tables, compare row count, schema
shape, and values (order-insensitive).

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import pathlib
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(want):
        problems.append(f"rowcount spark={len(got)} duckdb={len(want)}")
        return problems
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns spark={sorted(got.columns)} duckdb={sorted(want.columns)}")
        return problems
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(w[c].dtype, np.floating):
            gf = pd.to_numeric(g[c]).to_numpy(dtype=float)
            wf = pd.to_numeric(w[c]).to_numpy(dtype=float)
            both_nan = np.isnan(gf) & np.isnan(wf)
            eq = (gf == wf) | both_nan
            if not eq.all():
                diff = np.nanmax(np.abs(gf - wf))
                problems.append(f"col {c}: {int((~eq).sum())} mismatches, max|diff|={diff:.3e}")
        else:
            eq = gv == wv
            if not np.asarray(eq).all():
                bad = int((~np.asarray(eq)).sum())
                i = int(np.argmax(~np.asarray(eq)))
                problems.append(f"col {c}: {bad} mismatches, first: spark={gv[i]!r} duckdb={wv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        problems = compare(name, got, want)
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"[ok] {name}: {len(got)} rows match")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
