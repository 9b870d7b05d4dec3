#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = bare names over the sf
dir), sorts columns by name and rows by all columns, and compares cell
values (exact for non-floats, 1e-9 for floats).
"""
import sys, os, json, glob
import duckdb

def canon(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for q, sql in sorted(oracle.items()):
        resdir = os.path.join(outdir, q)
        files = glob.glob(os.path.join(resdir, "*.parquet"))
        if not files:
            print(f"FAIL {q}: no result parquet"); n_bad += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{resdir}/*.parquet'"))
            want = canon(con.sql(sql))
        except Exception as e:
            print(f"FAIL {q}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {q}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {q}: rows {len(got)} != {len(want)}"); n_bad += 1; continue
        bad = None
        for c in got.columns:
            g, w = got[c], want[c]
            if g.dtype.kind == "f" or w.dtype.kind == "f":
                import numpy as np
                if not np.allclose(g.astype(float), w.astype(float),
                                   rtol=0, atol=1e-9, equal_nan=True):
                    i = int(np.argmax(~np.isclose(g.astype(float), w.astype(float), rtol=0, atol=1e-9)))
                    bad = f"col {c} row {i}: {g.iloc[i]} != {w.iloc[i]}"; break
            else:
                if not g.astype(str).equals(w.astype(str)):
                    i = int((g.astype(str) != w.astype(str)).idxmax())
                    bad = f"col {c} row {i}: {g.iloc[i]!r} != {w.iloc[i]!r}"; break
        if bad:
            print(f"FAIL {q}: {bad}"); n_bad += 1
        else:
            print(f"ok   {q}: {len(got)} rows"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
