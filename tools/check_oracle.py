#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
over the same parquet tables, then compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} != {len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns {scols} != {dcols}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        if neq.any().any():
            bad_cols = [c for c in a.columns if neq[c].any()]
            idx = neq.any(axis=1)
            problems.append(
                f"value mismatch in cols {bad_cols}; first diffs:\n"
                f"spark:\n{a[idx].head(3)}\nduck:\n{b[idx].head(3)}"
            )
    # dtype report (informational — driver may compare schemas strictly)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype {c}: spark={a[c].dtype} duck={b[c].dtype}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--format",
        choices=["parquet", "orc"],
        default="parquet",
        help="Spark-side scan format. 'orc' converts every table to ORC in "
        "a temp dir and routes load_table through it (the DuckDB oracle "
        "keeps reading the original parquet), proving the hash-matched "
        "answers are independent of the scan format.",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from deployment_spark import get_spark

    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    con = duck_connection(args.sf)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)

    spark_sf = args.sf
    if args.format == "orc":
        import shutil
        import tempfile

        from deployment_spark.schemas import TESTDATA_TABLES, load_table

        import atexit

        orc_dir = tempfile.mkdtemp(prefix="oracle_orc_")
        atexit.register(shutil.rmtree, orc_dir, ignore_errors=True)
        for t in TESTDATA_TABLES:
            load_table(spark, args.sf, t, fmt="parquet").write.mode(
                "overwrite"
            ).orc(f"{orc_dir}/{t}.orc")
        # the streaming entry is a parquet FILE-SOURCE by design — give it
        # the original file; every load_table scan goes through ORC
        shutil.copy(f"{args.sf}/events.parquet", f"{orc_dir}/events.parquet")
        os.environ["SPARK_GRAFT_TABLE_FORMAT"] = "orc"
        spark_sf = orc_dir
        print(f"[orc] tables converted to {orc_dir}; spark scans ORC, duckdb scans parquet")

    failed, passed, rows_only = [], [], []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, spark_sf).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"~ {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failed.append(name)
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            continue
        problems = compare(name, sdf, ddf)
        hard = [p for p in problems if not p.startswith("dtype")]
        if hard:
            failed.append(name)
            print(f"✗ {name} ({len(sdf)} vs {len(ddf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"    {p}")
        else:
            passed.append(name)
            soft = "; ".join(p for p in problems if p.startswith("dtype"))
            print(f"✓ {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)" + (f" [{soft}]" if soft else ""))

    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
