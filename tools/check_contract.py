"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() through DuckDB on the
same parquet tables, compare row count / column names / values.

Usage: python tools/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from ps_pagerank_spark import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(
                b[c].dtype, np.floating
            ):
                av = a[c].astype(float).to_numpy()
                bv = b[c].astype(float).to_numpy()
                if not np.allclose(av, bv, rtol=0, atol=0, equal_nan=True):
                    bad = int((~np.isclose(av, bv, rtol=0, atol=0)).sum())
                    worst = float(np.nanmax(np.abs(av - bv)))
                    problems.append(f"col {c}: {bad} mismatches, worst |Δ|={worst:g}")
            else:
                if not (a[c].to_numpy() == b[c].to_numpy()).all():
                    bad = int((a[c].to_numpy() != b[c].to_numpy()).sum())
                    problems.append(f"col {c}: {bad} value mismatches")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark(master="local[8]", app_name="contract_check")
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        t1 = time.perf_counter()
        if name not in os_:
            print(f"nosql {name}: rows={len(spark_pdf)} spark={t1-t0:.1f}s")
            continue
        try:
            duck_pdf = con.execute(os_[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        t2 = time.perf_counter()
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(
                f"ok    {name}: rows={len(spark_pdf)} "
                f"spark={t1-t0:.1f}s duck={t2-t1:.1f}s"
            )
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
