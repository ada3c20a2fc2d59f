#!/usr/bin/env python3
"""Cross-implementation check for the from-scratch SQLite WRITER:
open a database emitted by graft.sources.sqlite.SqliteWriter with the
real SQLite C library (via CPython's sqlite3) and dump every table.
A file our writer emits must be readable by the reference
implementation — header, master b-tree, page layout, record encoding,
rowid aliasing all checked for real, not just against our own reader.

Usage: python3 scripts/sqlite_crosscheck.py <db-path>
Prints each table's row count + rows (capped) and exits 1 on any error.
"""
import sys, sqlite3

path = sys.argv[1]
con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
try:
    tables = [r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name")]
    if not tables:
        print("FAIL: no tables"); sys.exit(1)
    # integrity_check walks every b-tree page and cell
    ic = con.execute("PRAGMA integrity_check").fetchone()[0]
    print(f"integrity_check: {ic}")
    ok = ic == "ok"
    for t in tables:
        rows = con.execute(f'SELECT * FROM "{t}"').fetchall()
        print(f"{t}: {len(rows)} rows")
        for r in rows[:5]:
            print("  ", r)
    sys.exit(0 if ok else 1)
except sqlite3.DatabaseError as e:
    print(f"FAIL: {type(e).__name__}: {e}")
    sys.exit(1)
