#!/usr/bin/env python3
"""Determinism probe: compare two Verify output dirs produced with
different parallelism (e.g. SPARK_GRAFT_CPUS=3 vs 8). A query whose
result set differs is partition-order dependent (nondeterministic
sort/limit/first/collect ordering) — a latent 100 TB correctness bug
even when a single-configuration oracle check passes.

Usage: python3 scripts/determinism_check.py <outDirA> <outDirB>
"""
import sys, glob, os
import pyarrow.parquet as pq

a_dir, b_dir = sys.argv[1], sys.argv[2]
names = sorted(os.path.basename(p) for p in glob.glob(os.path.join(a_dir, "q*")))
fail = miss = 0
for name in names:
    fa = glob.glob(os.path.join(a_dir, name, "*.parquet"))
    fb = glob.glob(os.path.join(b_dir, name, "*.parquet"))
    if not fa or not fb:
        print(f"MISS {name}: output absent on one side")
        miss += 1
        continue
    ta = pq.read_table(fa[0]).to_pandas()
    tb = pq.read_table(fb[0]).to_pandas()
    if sorted(ta.columns) != sorted(tb.columns):
        print(f"FAIL {name}: columns {sorted(ta.columns)} vs {sorted(tb.columns)}")
        fail += 1
        continue
    cols = sorted(ta.columns)
    ga = ta[cols].astype(str).sort_values(by=cols).reset_index(drop=True)
    gb = tb[cols].astype(str).sort_values(by=cols).reset_index(drop=True)
    if len(ga) != len(gb):
        print(f"FAIL {name}: {len(ga)} vs {len(gb)} rows")
        fail += 1
    elif not ga.equals(gb):
        diff = (ga != gb).any(axis=1)
        print(f"FAIL {name}: {int(diff.sum())} differing rows of {len(ga)}")
        fail += 1
print(f"\n{len(names)} queries, {fail} nondeterministic, {miss} missing")
sys.exit(1 if fail or miss else 0)
