#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/r18/.

Usage: python scripts/capture_plans.py before q_a q_b ...
       python scripts/capture_plans.py after  q_a q_b ...

Writes plans/r18/<query>_<tag>.txt.  Plan capture is driver-side only
(no job runs), so it is safe to run while other Spark work is active.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r18")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-capture")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{path}: {plan.count('Exchange')} Exchange, "
              f"{plan.count('BatchEvalPython') + plan.count('ArrowEvalPython')} PyEval, "
              f"{len(plan.splitlines())} lines")
    spark.stop()


if __name__ == "__main__":
    main()
