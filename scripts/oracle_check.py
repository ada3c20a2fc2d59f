#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the same parquet tables and compare against the Verify
output parquet (columns sorted by name, rows sorted, exact values).

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    res_dir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(res_dir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output");  fail += 1;  continue
    try:
        got = pq.read_table(files[0]).to_pandas()
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}"); fail += 1; continue
    g = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
    try:
        e = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
    except Exception as ex:
        print(f"FAIL {name}: oracle col mismatch {sorted(exp.columns)} vs {sorted(got.columns)}")
        fail += 1; continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        fail += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fail += 1; continue
    ok = True
    for c in g.columns:
        a, b = g[c], e[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                aa, bb = a.astype(float).values, b.astype(float).values
                exact = (aa == bb) | (pd.isna(aa) & pd.isna(bb))
                if not exact.all():
                    close = abs(aa - bb) <= 1e-9 * (1 + abs(bb))
                    n_bad = int((~close).sum()); n_inexact = int((~exact).sum())
                    print(f"  {name}.{c}: {n_inexact} inexact, {n_bad} beyond 1e-9")
                    if n_bad: ok = False
                    else: print(f"  {name}.{c}: WARNING approx-only match")
                    if not close.all():
                        idx = (~close).nonzero()[0][:3]
                        for i in idx: print(f"    row{i}: spark={aa[i]!r} duck={bb[i]!r}")
            elif a.dtype.kind == 'M' and b.dtype.kind == 'M':
                if not (a.values.astype('datetime64[us]')
                        == b.values.astype('datetime64[us]')).all():
                    print(f"  {name}.{c}: datetime mismatches"); ok = False
            elif a.dtype.kind in 'iu' and b.dtype.kind in 'iu':
                import numpy as np
                if not (a.values.astype('int64') == b.values.astype('int64')).all():
                    neq = (a.values.astype('int64') != b.values.astype('int64'))
                    print(f"  {name}.{c}: {int(neq.sum())} int mismatches")
                    ok = False
            else:
                if not a.equals(b):
                    neq = (a.astype(str) != b.astype(str))
                    print(f"  {name}.{c}: {int(neq.sum())} mismatches; e.g.")
                    idx = neq[neq].index[:3]
                    for i in idx: print(f"    row{i}: spark={a[i]!r} duck={b[i]!r}")
                    ok = False
        except Exception as ex2:
            print(f"  {name}.{c}: compare error {ex2}"); ok = False
    if ok:
        print(f"OK   {name} ({len(g)} rows)")
    else:
        print(f"FAIL {name}"); fail += 1

no_oracle = [d for d in os.listdir(out_dir)
             if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle]
for name in sorted(no_oracle):
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    n = pq.read_table(files[0]).num_rows if files else -1
    print(f"ROWS {name}: {n} (no oracle)")
print(f"\n{fail} failures")
sys.exit(1 if fail else 0)
