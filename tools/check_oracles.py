"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count + schema-insensitive sorted-values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # normalize ints-as-objects / strings
            try:
                df[c] = pd.to_numeric(s)
                continue
            except (ValueError, TypeError):
                df[c] = s.astype(str)
        elif str(s.dtype).startswith(("int", "uint", "Int")):
            df[c] = s.astype("int64")
        elif str(s.dtype) == "bool" or str(s.dtype) == "boolean":
            df[c] = s.astype(bool)
        elif str(s.dtype).startswith("float"):
            df[c] = s.astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(duck_pdf)}")
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f":
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            else:
                eq = av == bv
            bad = (~eq).sum()
            if bad:
                i = int(np.nonzero(~eq)[0][0])
                problems.append(f"col {c}: {bad} mismatches, first at row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    from matrixprofiler_spark.queries import oracle_sql, queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = queries()
    sqls = oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            fails += 1
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only, {len(spdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            fails += 1
            continue
        problems = compare(name, spdf, dpdf)
        if problems:
            fails += 1
            print(f"FAIL {name} ({len(spdf)} vs {len(dpdf)} rows):")
            for p in problems[:4]:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(spdf)} rows match exactly ({time.time()-t0:.1f}s)")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
