#!/usr/bin/env python3
"""Single-query mirror of check_oracle.py: compare an already-dumped
RunQuery parquet against its oracle SQL (from PrintOracle or a file).

Usage: python3 tools/check_one.py <sfDir> <dumpDir> <name> <oracleSqlFile>
dumpDir = directory holding <name>/*.parquet from graft.tools.RunQuery.
"""
import math
import sys

import duckdb

SF_DIR, DUMP, NAME, SQLFILE = sys.argv[1:5]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


import os

con = duckdb.connect()
for t in TABLES:
    p = f"{SF_DIR}/{t}.parquet"
    # ScaleUp output tables are parquet DIRECTORIES; testdata tables are files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
sql = open(SQLFILE).read()
got = con.sql(f"SELECT * FROM '{DUMP}/{NAME}/*.parquet'")
got_cols, got_types = list(got.columns), [str(t) for t in got.types]
got_rows = got.fetchall()
exp = con.sql(sql)
exp_cols, exp_types = list(exp.columns), [str(t) for t in exp.types]
exp_rows = exp.fetchall()
g, gc = canon(got_rows, got_cols)
e, ec = canon(exp_rows, exp_cols)
if gc != ec:
    sys.exit(f"FAIL {NAME}: columns {gc} != {ec}")
gt = [t for _, t in sorted(zip(got_cols, got_types))]
et = [t for _, t in sorted(zip(exp_cols, exp_types))]
if gt != et:
    sys.exit(f"FAIL {NAME}: types {list(zip(gc, gt))} != {list(zip(ec, et))}")
if len(g) != len(e):
    sys.exit(f"FAIL {NAME}: rows {len(g)} != {len(e)}")
bad = 0
for rg, re_ in zip(g, e):
    if not all(cmp_cell(a, b) for a, b in zip(rg, re_)):
        if bad < 5:
            print(f"  mismatch: got {rg} exp {re_}")
        bad += 1
if bad:
    sys.exit(f"FAIL {NAME}: {bad}/{len(g)} mismatching rows")
print(f"OK   {NAME}: {len(g)} rows")
