#!/usr/bin/env python
"""Ad-hoc single-query oracle check at the 3 SFs: quickcheck.py q_name [q2 ...]"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]").appName("quickcheck")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import duckdb
import __spark_entry__ as E
q, o = E.queries(), E.oracle_sql()
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
def duck_for(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con

# Rendered-type classes: the driver hashes pandas-rendered values, so
# DuckDB/Spark type divergence (esp. HUGEINT -> float64) fails the
# driver even when VALUES match here.  One shared map (plans/typelint).
from artemia_airflow_spark.plans.typelint import duck_render_class as duck_cls
from artemia_airflow_spark.plans.typelint import spark_render_class as spark_cls

def type_check(sdf, con, sql):
    sp = {f.name.lower(): spark_cls(f.dataType.simpleString()) for f in sdf.schema.fields}
    du = {r[0].lower(): duck_cls(r[1]) for r in con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()}
    probs = [f"{c}: HUGEINT in oracle" for c, cls in du.items() if cls == "HUGEINT"]
    probs += [f"{c}: spark={sp.get(c)} duck={du.get(c)}"
              for c in set(sp) | set(du) if sp.get(c) != du.get(c) and du.get(c) != "HUGEINT"]
    return probs
rc = 0
for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    con = duck_for(sf_dir)
    for name in sys.argv[1:]:
        t0 = time.time()
        try:
            sdf = q[name](spark, sf_dir)
            srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
            if name not in o:
                print(f"{sf_dir} {name}: rows-only n={len(srows)} {time.time()-t0:.1f}s")
                continue
            drows = sorted(tuple(str(x) for x in r) for r in con.execute(o[name]).fetchall())
            tprobs = type_check(sdf, con, o[name])
            if tprobs:
                rc = 1
                print(f"{sf_dir} {name}: TYPE-MISMATCH {tprobs} (driver hash WILL fail even if values match)")
            elif srows == drows:
                print(f"{sf_dir} {name}: ok n={len(srows)} {time.time()-t0:.1f}s")
            else:
                rc = 1
                print(f"{sf_dir} {name}: MISMATCH spark={len(srows)} duck={len(drows)}")
                sonly = [r for r in srows if r not in set(drows)][:3]
                donly = [r for r in drows if r not in set(srows)][:3]
                print("  spark-only:", sonly)
                print("  duck-only :", donly)
        except Exception as e:
            rc = 1
            print(f"{sf_dir} {name}: ERROR {type(e).__name__}: {str(e)[:300]}")
print("DONE rc=", rc)
sys.exit(rc)
