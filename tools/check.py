#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each <name>.parquet under verifyOutDir (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over the same fixture
tables and compares: schema (column names sorted), row count, and exact
values (column-name-sorted, row order as produced). Dev tool only — the
shipped Scala library does not depend on this.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def values_equal(a, b):
    if a.shape != b.shape:
        return False, f"shape {a.shape} vs {b.shape}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                ok = ((av.isna() & bv.isna()) | (av == bv)).all()
                if not ok:
                    diff = (av - bv).abs().max()
                    return False, f"col {c}: float mismatch, max abs diff {diff}"
            else:
                asv = av.astype(str).where(~av.isna(), '<NULL>')
                bsv = bv.astype(str).where(~bv.isna(), '<NULL>')
                if not (asv == bsv).all():
                    bad = (asv != bsv)
                    i = int(np.argmax(bad.values))
                    return False, f"col {c}: first mismatch row {i}: {asv.iloc[i]!r} vs {bsv.iloc[i]!r}"
        except Exception as e:
            return False, f"col {c}: compare error {e}"
    return True, ""

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            print(f"ROWS-ONLY {name}: rows={len(got)}")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        ok, msg = values_equal(g, e)
        if ok:
            # same values: also surface dtype skew (a dtype-sensitive
            # driver hash would flag these)
            dt = [f"{c}: {g[c].dtype} vs {e[c].dtype}" for c in g.columns
                  if str(g[c].dtype) != str(e[c].dtype)]
            flag = f"  [DTYPE SKEW: {'; '.join(dt)}]" if dt else ""
            print(f"PASS {name} ({len(g)} rows){flag}")
            n_pass += 1
        else:
            # check if row-order-only mismatch
            gs = g.sort_values(list(g.columns), kind='mergesort').reset_index(drop=True)
            es = e.sort_values(list(e.columns), kind='mergesort').reset_index(drop=True)
            ok2, _ = values_equal(gs, es)
            tag = " (ORDER ONLY)" if ok2 else ""
            print(f"FAIL {name}: {msg}{tag}")
            n_fail += 1
    print(f"== pass={n_pass} fail={n_fail} rows_only={n_rowsonly}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
