#!/usr/bin/env python3
"""Oracle output-type lint: bind every oracle SQL in DuckDB and flag any
result column whose type is HUGEINT/UHUGEINT. The driver's hasher
serializes HUGEINT differently from BIGINT, so a bare SUM(...) (DuckDB
promotes integer SUM to HUGEINT) reaching an oracle's FINAL select list
reports hash_match=false even when values are exact (round-10 q302/q303/
q304/q309/q328). House rule: CAST every SUM-derived final column AS
BIGINT.

Usage: python3 scripts/oracle_typelint.py <sfDir> <oracle_sql.json>
Exit 1 if any oracle binds a HUGEINT output column.
"""
import sys, json
import duckdb

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(oracle_path))
bad = 0
for name in sorted(oracle):
    try:
        rel = con.sql(oracle[name])
        types = [str(t) for t in rel.types]
    except Exception as e:
        print(f"BINDERR {name}: {type(e).__name__}: {str(e)[:200]}")
        bad += 1
        continue
    huge = [(c, ty) for c, ty in zip(rel.columns, types)
            if "HUGEINT" in ty.upper()]
    if huge:
        print(f"HUGEINT {name}: {huge}")
        bad += 1
print(f"{'FAIL' if bad else 'OK'}: {len(oracle)} oracles, {bad} flagged")
sys.exit(1 if bad else 0)
