"""Emulate the driver's correctness gate: run every __spark_entry__
query at a given SF via Spark AND its oracle SQL via DuckDB; compare
row count, schema (column names), and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from algebird_spark.queries import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle_check")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = f"SPARK ERROR: {type(e).__name__}: {e}"
            print(f"[{name}] SPARK ERROR: {e}")
            continue
        el = time.time() - t0
        if name not in oracles:
            results[name] = f"rows-only ({len(sdf)} rows, {el:.1f}s)"
            print(f"[{name}] rows-only: {len(sdf)} rows in {el:.1f}s")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            print(f"[{name}] ORACLE SQL ERROR: {e}")
            continue
        a, b = normalize(sdf), normalize(odf)
        status = []
        if list(a.columns) != list(b.columns):
            status.append(f"SCHEMA {list(a.columns)} vs {list(b.columns)}")
        if len(a) != len(b):
            status.append(f"ROWS {len(a)} vs {len(b)}")
        if not status:
            # The driver's value hash is dtype-strict: DuckDB returning e.g.
            # HUGEINT->float64 where Spark returns int64 hash-mismatches even
            # when values are numerically equal. Flag dtype skew as FAIL so
            # this local gate predicts the driver exactly.
            dtype_bad = [c for c in a.columns
                         if np.issubdtype(a[c].dtype, np.number)
                         and np.issubdtype(b[c].dtype, np.number)
                         and (np.issubdtype(a[c].dtype, np.integer)
                              != np.issubdtype(b[c].dtype, np.integer))]
            if dtype_bad:
                status.append(
                    "DTYPE mismatch (int vs float) in "
                    + str([(c, str(a[c].dtype), str(b[c].dtype))
                           for c in dtype_bad]))
        if not status:
            if a.equals(b):
                status = ["OK"]
            else:
                diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
                # float tolerance check
                close = True
                for c in diff_cols:
                    if np.issubdtype(a[c].dtype, np.number) and \
                            np.issubdtype(b[c].dtype, np.number):
                        if not np.allclose(a[c].astype(float),
                                           b[c].astype(float),
                                           rtol=1e-9, atol=1e-6, equal_nan=True):
                            close = False
                    else:
                        close = False
                if close:
                    status = [f"OK~ (float-tol on {diff_cols})"]
                else:
                    status = [f"VALUES differ in {diff_cols}"]
                    for c in diff_cols[:3]:
                        mism = (a[c].astype(str) != b[c].astype(str))
                        idx = mism[mism].index[:3]
                        for i in idx:
                            status.append(f"  {c}[{i}]: spark={a[c][i]!r} oracle={b[c][i]!r}")
        results[name] = "; ".join(status)
        flag = "OK" if status[0].startswith("OK") else "FAIL"
        print(f"[{name}] {flag} ({len(a)} rows, {el:.1f}s) {'' if flag=='OK' else results[name]}")

    bad = {k: v for k, v in results.items()
           if not (v.startswith("OK") or v.startswith("rows-only"))}
    print(f"\n=== {len(results) - len(bad)}/{len(results)} OK; failures: {list(bad)}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
