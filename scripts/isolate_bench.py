#!/usr/bin/env python
"""Isolated best-of-3 timing for a few queries in a FRESH session —
the drift-adjudication protocol (SCALE.md bench methodology): never
trust a suite-position regression; isolate it first.

Usage: python scripts/isolate_bench.py q_name [q_name ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from artemia_airflow_spark.session import build_session

    import __spark_entry__ as entrymod

    spark = build_session("aas-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # same warm-up as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        return x

    n = spark.sparkContext.defaultParallelism
    spark.range(n * 4, numPartitions=n).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    import gc

    out = {}
    for name in sys.argv[1:]:
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            jsc = spark.sparkContext._jsc.sc()
            for rdd_id in list(spark.sparkContext._jsc.getPersistentRDDs().keys()):
                try:
                    jsc.getPersistentRDDs().get(rdd_id).get().unpersist(True)
                except Exception:
                    pass
            gc.collect()
            spark._jvm.System.gc()
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
