#!/usr/bin/env python
"""Shared round-closing dry run (FIXTURES.md round-verification
protocol): the full PRIORITY window at sf0.001 + sf0.01 + sf0.1,
every remaining registry query at sf0.01 — driver-gate semantics
(sorted stringified rows vs the DuckDB oracle; rows-only queries
execute + row count).

ONE implementation for every round (r13 review: the per-round copies
r9-r12 were five diverging replicas of the gate).  Usage:

    python scripts/dryrun.py [round-tag]

The historical scripts/dryrun_r{9..12}.py are frozen records of what
ran those rounds; new rounds call this one.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

TAG = sys.argv[1] if len(sys.argv) > 1 else "rX"

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[16]")
    .appName(f"dryrun-{TAG}")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import duckdb

import __spark_entry__ as E
from artemia_airflow_spark.plans.registry import PRIORITY

q, o = E.queries(), E.oracle_sql()
assert set(PRIORITY) <= set(q), sorted(set(PRIORITY) - set(q))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def duck_for(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def check(name, sf_dir, con):
    sdf = q[name](spark, sf_dir)
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    if name not in o:
        return f"rows-only n={len(srows)}"
    drows = sorted(
        tuple(str(x) for x in r) for r in con.execute(o[name]).fetchall()
    )
    assert srows == drows, (name, sf_dir, srows[:2], drows[:2])
    return f"ok n={len(srows)}"


fails = []
for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
    con = duck_for(sf_dir)
    for name in PRIORITY:
        t0 = time.time()
        try:
            msg = check(name, sf_dir, con)
        except Exception as e:  # noqa: BLE001
            fails.append((sf_dir, name, repr(e)[:200]))
            msg = "FAIL " + repr(e)[:120]
        print(f"{sf_dir.split('/')[-1]:8s} {name:36s} {msg} "
              f"({time.time()-t0:.1f}s)", flush=True)
    con.close()

con = duck_for("/root/testdata/sf0.01")
prio = set(PRIORITY)
rest = [n for n in q if n not in prio]
for name in rest:
    t0 = time.time()
    try:
        msg = check(name, "/root/testdata/sf0.01", con)
    except Exception as e:  # noqa: BLE001
        fails.append(("sf0.01", name, repr(e)[:200]))
        msg = "FAIL " + repr(e)[:120]
    print(f"{'sf0.01':8s} {name:36s} {msg} ({time.time()-t0:.1f}s)",
          flush=True)
con.close()

print(f"\nTOTAL queries: {len(q)}  PRIORITY: {len(PRIORITY)}  "
      f"FAILS: {len(fails)}")
for f in fails:
    print("FAIL:", f)
sys.exit(1 if fails else 0)
