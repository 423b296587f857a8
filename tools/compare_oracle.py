"""Local stand-in for the driver's correctness gate: run each
__spark_entry__.queries() entry and its oracle_sql() twin, compare
row count + column names + order-insensitive values.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if problems:
        return problems
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sc, oc = s[c], o[c].astype(s[c].dtype, errors="ignore")
        if pd.api.types.is_float_dtype(sc):
            eq = (sc.fillna(-1e308) - pd.to_numeric(oc).fillna(-1e308)).abs() <= 0
        else:
            try:
                eq = sc.astype(str).values == o[c].astype(str).values
            except Exception:
                eq = sc.values == o[c].values
        import numpy as np

        bad = int((~np.asarray(eq)).sum())
        if bad:
            idx = int(np.argmax(~np.asarray(eq)))
            problems.append(
                f"col {c}: {bad} mismatched values, first at row {idx}: "
                f"spark={s[c].iloc[idx]!r} oracle={o[c].iloc[idx]!r}"
            )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from graphanalytics_spark import get_spark

    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(os_[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(sdf, odf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} failed")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
