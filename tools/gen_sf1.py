#!/usr/bin/env python3
"""Deterministic sf1 generator: 10x replication of the driver's sf0.1
tables (dev tool, like check.py — NOT part of the Spark library).

Replica r (0..9) offsets every entity key by r * 10_000_000 so foreign
keys stay consistent (events.user_id -> customer.c_custkey,
lineitem.l_orderkey -> orders.o_orderkey, ...) and the offset space
never collides with the dedup operators' +100000/+200000 planted-id
ranges. Dimension tables (region, nation) are shared, as in TPC-H.
Replica payloads (text, embeddings, timestamps) are byte-identical to
the base — the recurring-crawl duplication shape the dedup family is
built for; correctness at sf1 compares Spark and DuckDB on the SAME
files, so the heavier duplicate structure stresses both engines
equally.

Files are written UNCOMPRESSED with bounded row groups: the replicated
payloads dictionary-compress ~50x, and Spark sizes input splits from
compressed file bytes — a compressed sf1 documents file is <1 MB on
disk for ~50 MB of scoring work, so every scan of it collapses to ONE
task no matter how maxPartitionBytes is tuned. Uncompressed, file
bytes track logical work and the SPARK_GRAFT_MAX_PARTITION_BYTES
session knob (graft.SessionTuning) yields honest scan parallelism.

Usage: python3 tools/gen_sf1.py [outdir] [replicas]
       (defaults: /root/repo/data/sf1, 10; replicas=30 makes sf3 —
        the second decade-and-a-half of scale evidence)
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10   # replication factor
OFF = 10_000_000            # per-replica key offset

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# key columns to offset, per table; every other column is copied as-is
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["region", "nation"]

# rows per parquet row group, sized so uncompressed groups land ~2-8 MB
ROW_GROUP = {"documents": 4096, "embeddings": 4096, "lineitem": 65536,
             "orders": 65536, "customer": 32768}


def replicate_sql(table: str) -> None:
    keys = OFFSET_COLS[table]
    cols = [c[0] for c in con.execute(
        f"describe select * from '{SRC}/{table}.parquet'").fetchall()]
    selects = []
    for r in range(R):
        proj = ", ".join(
            f"{c} + {r * OFF} AS {c}" if c in keys else c for c in cols)
        selects.append(f"SELECT {proj} FROM '{SRC}/{table}.parquet'")
    union = "\nUNION ALL\n".join(selects)
    rg = ROW_GROUP.get(table, 65536)
    con.execute(
        f"COPY ({union}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET, "
        f"COMPRESSION UNCOMPRESSED, ROW_GROUP_SIZE {rg})")
    n = con.execute(f"select count(*) from '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def copy_shared(table: str) -> None:
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{table}.parquet') "
        f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    print(f"{table}: shared dimension copied")


def replicate_events() -> None:
    # events.ts is a NANOSECOND parquet timestamp; Spark reads it via the
    # legacy nanosAsLong path (graft.Tables.events), so the sf1 file must
    # preserve the physical type — pyarrow round-trips it, DuckDB would
    # coerce. event_id/user_id are offset per replica, ts kept identical
    # (uniform 10x daily volume; day-keyed operators see the same days).
    t = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for r in range(R):
        cols = {}
        for name in t.schema.names:
            col = t.column(name)
            if name in ("event_id", "user_id"):
                col = pa.chunked_array([
                    pa.compute.add(chunk, r * OFF) for chunk in col.chunks])
            cols[name] = col
        parts.append(pa.table(cols, schema=t.schema))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{OUT}/events.parquet",
                   compression="none", row_group_size=65536)
    print(f"events: {big.num_rows} rows (timestamp[ns] preserved)")


for tbl in SHARED:
    copy_shared(tbl)
for tbl in OFFSET_COLS:
    replicate_sql(tbl)
replicate_events()
print("done ->", OUT)
