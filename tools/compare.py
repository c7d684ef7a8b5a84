#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the oracle SQL in DuckDB over
views named after the parquet tables in sfDir, and compares against the
Spark result parquet: row count, column names, and values (columns sorted
by name, rows sorted by all columns). Queries present in oracle_sql.json
but missing from the output dir are reported explicitly (a Verify-side
failure). Floats compare with a small relative tolerance; timestamps are
normalized to microseconds before comparing.
"""
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def rows_equal(e, g):
    for c in e.columns:
        if pd.api.types.is_float_dtype(e[c]) and pd.api.types.is_float_dtype(g[c]):
            ok = np.isclose(e[c], g[c], rtol=1e-9, atol=1e-12, equal_nan=True)
        else:
            ok = e[c].astype(str).values == g[c].astype(str).values
        if not ok.all():
            return int(np.argmin(ok)), c
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"MISSING {name}: no Verify output (query threw? see stderr)")
            n_bad += 1
            continue
        try:
            exp = con.sql(sql).df()
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: cols exp={sorted(exp.columns)} got={sorted(got.columns)}")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_bad += 1
            continue
        e, g = canon(exp), canon(got)
        mism = rows_equal(e, g)
        if mism is not None:
            i, c = mism
            print(f"FAIL {name}: first mismatch row {i} col {c}\n exp: {e.loc[i].to_dict()}\n got: {g.loc[i].to_dict()}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(exp)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
