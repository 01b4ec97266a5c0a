"""Local replica of the driver's correctness gate.

Runs each registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and
(order-insensitively) values — exactly, plus with a float tolerance so
we can see *how* close a mismatch is.

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    from weather_analysis_bigdata__spark.sources.files import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return repr(v)

    out = df.map(canon)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> dict:
    res = {"name": name, "rows": len(spark_pdf), "oracle_rows": len(duck_pdf)}
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        res["status"] = "SCHEMA_MISMATCH"
        res["spark_cols"] = sorted(spark_pdf.columns)
        res["oracle_cols"] = sorted(duck_pdf.columns)
        return res
    if len(spark_pdf) != len(duck_pdf):
        res["status"] = "ROWCOUNT_MISMATCH"
        return res
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if a.equals(b):
        res["status"] = "OK"
        return res
    # Diagnose: which columns differ, and by how much if numeric
    res["status"] = "VALUE_MISMATCH"
    bad = {}
    for c in a.columns:
        neq = (a[c] != b[c]).sum()
        if neq:
            try:
                av = pd.to_numeric(
                    spark_pdf.reindex(sorted(spark_pdf.columns), axis=1)
                    .sort_values(by=list(sorted(spark_pdf.columns)))
                    .reset_index(drop=True)[c],
                    errors="coerce",
                )
                bv = pd.to_numeric(
                    duck_pdf.reindex(sorted(duck_pdf.columns), axis=1)
                    .sort_values(by=list(sorted(duck_pdf.columns)))
                    .reset_index(drop=True)[c],
                    errors="coerce",
                )
                bad[c] = {"n_diff": int(neq), "max_abs_diff": float((av - bv).abs().max())}
            except Exception:
                bad[c] = {"n_diff": int(neq)}
    res["bad_columns"] = bad
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    # Lazy (callable) oracles — the BPE literal VALUES tables — derive
    # their SQL from the corpus itself; bind them to THIS sweep's
    # corpus so a non-default --sf compares like against like.
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = args.sf

    from weather_analysis_bigdata__spark.registry import all_queries
    from weather_analysis_bigdata__spark.session import get_spark

    queries = all_queries()
    if args.names:
        queries = {k: v for k, v in queries.items() if k in args.names}

    spark = get_spark("oracle-check")
    con = duck_conn(args.sf)

    n_ok = n_bad = 0
    for name, q in queries.items():
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:400]}")
            n_bad += 1
            continue
        if q.oracle is None:
            print(f"skip  {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(q.oracle_text()).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:400]}")
            n_bad += 1
            continue
        res = compare(name, spark_pdf, duck_pdf)
        tag = "ok   " if res["status"] == "OK" else "FAIL "
        if res["status"] == "OK":
            n_ok += 1
            print(f"{tag} {name}: {res['rows']} rows ({time.time()-t0:.1f}s)")
        else:
            n_bad += 1
            print(f"{tag} {name}: {res}")
    print(f"\n{n_ok} ok, {n_bad} failed, {len(queries)} total")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
