#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs each oracle SQL from a Verify dump's oracle_sql.json in DuckDB over
the same testdata tables, loads the corresponding Spark result parquet,
sorts columns by name and rows by value, and diffs. Usage:

    python3 tools/oracle_check.py <sf_dir> <verify_out_dir> [query ...]
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64", errors="ignore")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # registry.json (when present) records which keys THIS Verify run
    # attempted — compare only those (oracle_sql.json always carries the
    # full map, even for subset runs)
    reg_path = f"{out_dir}/registry.json"
    reg = json.load(open(reg_path)) if os.path.exists(reg_path) else None
    attempted = set(reg["queries"]) if reg else None
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if attempted is not None and name not in attempted:
            continue
        try:
            exp = con.sql(sql).df()
            got = con.sql(
                f"FROM parquet_scan('{out_dir}/{name}/*.parquet')").df()
            e, g = canon(exp), canon(got)
            if list(e.columns) != list(g.columns):
                print(f"FAIL {name}: columns exp={list(e.columns)} "
                      f"got={list(g.columns)}")
                n_bad += 1
                continue
            if len(e) != len(g):
                print(f"FAIL {name}: rows exp={len(e)} got={len(g)}")
                n_bad += 1
                continue
            diff_cols = []
            for c in e.columns:
                a, b = e[c], g[c]
                if a.dtype.kind == "f" and b.dtype.kind == "f":
                    # the driver hashes RENDERED strings, where
                    # "-0.0" != "0.0" — plain == would pass a signed
                    # zero the driver fails, so require sign-bit
                    # equality too (a no-op on equal non-zero values)
                    av, bv = a.to_numpy(), b.to_numpy()
                    eq = (a.isna() & b.isna()) | \
                        ((a == b) & (np.signbit(av) == np.signbit(bv)))
                    if not eq.all():
                        diff_cols.append(c)
                else:
                    eq = (a.isna() & b.isna()) | (a.astype(str) == b.astype(str))
                    if not eq.all():
                        diff_cols.append(c)
            if diff_cols:
                print(f"FAIL {name}: value diff in {diff_cols}")
                for c in diff_cols[:2]:
                    mask = ~(((e[c].isna()) & (g[c].isna())) |
                             (e[c].astype(str) == g[c].astype(str)))
                    print(f"   {c} exp:", e[c][mask].head(3).tolist(),
                          "got:", g[c][mask].head(3).tolist())
                n_bad += 1
            else:
                print(f"ok   {name} ({len(e)} rows)")
                n_ok += 1
        except Exception as ex:
            print(f"ERR  {name}: {str(ex)[:200]}")
            n_bad += 1
    # self-defending gate (round-7 incident: 39 queries silently
    # vanished from the correctness file): every key the Verify run
    # ATTEMPTED must have left a result dump — a failing query leaves a
    # __verify_error marker parquet, so "no dump at all" means the gate
    # shrank and must be a visible failure, never an omission. Also
    # cross-check the oracled set against oracle_sql.json.
    if not only and reg is not None:
        for name in reg.get("queries", []):
            if not glob.glob(f"{out_dir}/{name}/*.parquet"):
                print(f"FAIL {name}: registry key has NO result dump "
                      f"(query vanished from the gate)")
                n_bad += 1
            elif name not in oracle:
                # non-oracled keys get no compare pass — a failure
                # marker in their slot must still go red here
                cols = [r[0] for r in con.sql(
                    f"DESCRIBE SELECT * FROM parquet_scan("
                    f"'{out_dir}/{name}/*.parquet')").fetchall()]
                if "__verify_error" in cols:
                    msg = con.sql(
                        f"SELECT __verify_error FROM parquet_scan("
                        f"'{out_dir}/{name}/*.parquet')").fetchone()[0]
                    print(f"FAIL {name}: did not execute: {msg[:200]}")
                    n_bad += 1
        missing_oracles = [n for n in reg.get("oracled", [])
                           if n not in oracle]
        if missing_oracles:
            print(f"FAIL registry: oracled keys absent from "
                  f"oracle_sql.json: {missing_oracles}")
            n_bad += 1
        print(f"registry: {len(reg.get('queries', []))} attempted, "
              f"{len(reg.get('oracled', []))} oracled")

    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
