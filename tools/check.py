#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare per-query (rows, schema, values).

Usage: python3 tools/check.py [sfdir] [outdir]
(run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)
"""
import functools
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

# per-query progress must reach the log even when stdout is a pipe/file
print = functools.partial(print, flush=True)

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{SFDIR}/*.parquet"):
    name = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))

# graft.Verify records per-query execution failures here (self-describing
# artifact): surface them verbatim next to the missing-output FAILs
try:
    verify_errors = json.load(open(f"{OUTDIR}/_errors.json"))
except Exception:
    verify_errors = {}

import datetime


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return v

def rows_of_arrow(tbl):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    pydict = tbl.to_pydict()
    recs = [tuple(canon(pydict[c][i]) for c in cols) for i in range(tbl.num_rows)]
    types = {c: str(tbl.schema.field(c).type) for c in cols}
    return cols, recs, types

fail = ok = noracle = 0
for name in sorted(oracle):
    qdir = f"{OUTDIR}/{name}"
    if not os.path.isdir(qdir):
        why = verify_errors.get(name, "no spark output")
        print(f"FAIL {name}: {why}")
        fail += 1
        continue
    spark_tbl = pq.read_table(qdir)
    try:
        duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    scols, srows, stypes = rows_of_arrow(spark_tbl)
    dcols, drows, dtypes = rows_of_arrow(duck_tbl)
    if scols != dcols:
        print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
        fail += 1
        continue
    tdiff = {c: (stypes[c], dtypes[c]) for c in scols if stypes[c] != dtypes[c]}
    if tdiff:
        print(f"NOTE {name}: arrow type diffs {tdiff}")
    if len(srows) != len(drows):
        print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
        fail += 1
        continue
    # order-sensitive compare first; fall back to sorted compare note
    if srows == drows:
        print(f"OK   {name} ({len(srows)} rows)")
        ok += 1
    else:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        print(f"FAIL {name}: {len(diffs)}/{len(srows)} rows differ; first: ")
        i, a, b = diffs[0]
        print(f"  row {i}:")
        for c, x, y in zip(scols, a, b):
            mark = "  " if (x == y or (x is None and y is None)) else "->"
            if x != y:
                print(f"   {mark} {c}: spark={x!r} duck={y!r}")
        fail += 1

# queries without oracle -> rows-only check
all_q = {os.path.basename(d) for d in glob.glob(f"{OUTDIR}/*") if os.path.isdir(d)}
for name in sorted(all_q - set(oracle)):
    n = pq.read_table(f"{OUTDIR}/{name}").num_rows
    status = "OK  " if n > 0 else "WARN"
    print(f"{status} {name}: rows-only check, {n} rows")
    noracle += 1

print(f"\n{ok} ok, {fail} fail, {noracle} rows-only")
sys.exit(1 if fail else 0)
