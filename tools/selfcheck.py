#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle comparison.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet, and
compares: row count, column names/dtypes (loose), and exact values after
sorting columns by name and rows by all columns.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        problems.append(f"cols spark={sc} duck={dc}")
        return problems
    a, b = canon(spark_df), canon(duck_df)
    if len(a) != len(b):
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            avn, bvn = av.astype(float), bv.astype(float)
            eq = (avn.values == bvn.values) | (avn.isna().values & bvn.isna().values)
            if not eq.all():
                diff = np.nanmax(np.abs(avn.values - bvn.values))
                problems.append(f"col {c}: {np.count_nonzero(~eq)} mismatches, maxdiff={diff:.3e}")
        else:
            avs, bvs = av.astype(str), bv.astype(str)
            eq = avs.values == bvs.values
            if not eq.all():
                i = int(np.argmax(~eq))
                problems.append(f"col {c}: {np.count_nonzero(~eq)} mismatches, first@{i}: spark={avs.values[i]!r} duck={bvs.values[i]!r}")
    # dtype notes (informational; the driver may be stricter)
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            problems.append(f"NOTE dtype {c}: spark={a[c].dtype} duck={b[c].dtype}")
    return problems


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark writes a parquet DIRECTORY (part files); DuckDB
            # needs the glob — lets selfcheck run on ScaleSmoke corpora
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        print(f"[ARG-ERR] unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output");  n_bad += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_df()
        try:
            duck_df = con.execute(oracle[name]).fetch_df()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {str(e).splitlines()[0]}");  n_bad += 1
            continue
        problems = compare(name, spark_df, duck_df)
        hard = [p for p in problems if not p.startswith("NOTE")]
        if hard:
            print(f"[FAIL] {name} ({len(spark_df)} rows)")
            for p in problems:
                print(f"       {p}")
            n_bad += 1
        else:
            note = "; ".join(p for p in problems if p.startswith("NOTE"))
            print(f"[ok]   {name} ({len(spark_df)} rows)" + (f"  {note}" if note else ""))
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failing ==")
    if n_ok + n_bad == 0:
        print("[ARG-ERR] zero queries checked")
        sys.exit(2)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
