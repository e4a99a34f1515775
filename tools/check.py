#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles and diff. Usage: check.py <sfDir> <verifyOut>"""
import duckdb, glob, json, os, sys
import pandas as pd

sfdir, out = sys.argv[1], sys.argv[2]

def fresh_con():
    # one connection PER ORACLE: a single long session accumulates
    # allocator state across ~200 queries and a heavy oracle's blow-up
    # (s10 at sf1 spills >75 GB of window sort) poisons every later
    # query with bad-alloc failures that look like real breaks
    c = duckdb.connect()
    for f in glob.glob(f"{sfdir}/*.parquet"):
        t = os.path.basename(f).replace(".parquet", "")
        c.sql(f"create view {t} as select * from read_parquet('{f}')")
    return c

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "no spark output")); continue
    con = None
    try:
        con = fresh_con()
        duck = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    finally:
        # release the connection on BOTH paths: a failed oracle (e.g. a
        # bad-alloc blow-up) must not keep its allocator state alive
        # while later oracles run
        if con is not None:
            con.close()
    spark = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{spark_dir}/*.parquet"))],
                      ignore_index=True)
    # driver behavior: sort columns by name, compare values
    duck = duck[sorted(duck.columns)]
    spark = spark[sorted(spark.columns)]
    if list(duck.columns) != list(spark.columns):
        fails.append((name, f"schema: duck={list(duck.columns)} spark={list(spark.columns)}")); continue
    if len(duck) != len(spark):
        fails.append((name, f"rows: duck={len(duck)} spark={len(spark)}")); continue
    # row-order sensitive compare (queries are fully ordered)
    mismatch = None
    for c in duck.columns:
        dv, sv = duck[c].tolist(), spark[c].tolist()
        for i, (a, b) in enumerate(zip(dv, sv)):
            if isinstance(a, float) and isinstance(b, float):
                ok = (a == b) or (a != a and b != b)
            else:
                ok = str(a) == str(b)
            if not ok:
                mismatch = f"col {c} row {i}: duck={a!r} spark={b!r}"; break
        if mismatch: break
    if mismatch: fails.append((name, mismatch))
    else: print(f"  OK  {name} ({len(duck)} rows)")

if fails:
    print("FAILURES:")
    for n, m in fails: print(f"  FAIL {n}: {m}")
    sys.exit(1)
print("all green")
