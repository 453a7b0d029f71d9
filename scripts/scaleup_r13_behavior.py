#!/usr/bin/env python
"""100x + skewed-user scale measurement for the behavioral quartet
(r13, VERDICT r12 next #5): sessionize / funnel / retention /
transitions at

* 1x    — sf0.1 events (100k rows, 1500 users);
* 100x  — 10M rows as 100 DISTINCT user populations (user_id offset
          per copy: per-user density stays representative);
* 100xS — 10M rows where TEN of the 100 copies collapse onto ONE hot
          user_id, i.e. a single user owns 10% of all events (1M
          rows) — the adversarial regime for the quartet's single
          user_id exchange, because a window partition key CANNOT be
          split by AQE: the hot user's rows must serialize one task's
          sort.  The claim under test is that this stays a linear
          in-task sort (bounded memory, no OOM, runtime ~ rows), not
          a cliff.

Isolated best-of-3 per (query, corpus), anchor query q_agg_group at 1x
for harness-noise context.  Usage:
    python scripts/scaleup_r13_behavior.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
UNI = "/tmp/aas_scaleup_r13_uni"
SKEW = "/tmp/aas_scaleup_r13_skew"
HOT_USER = 999_999_999

QUERIES = ["q_sessionize", "q_funnel", "q_retention", "q_event_transitions"]
ANCHOR = "q_agg_group"


def build_events(spark, dst: str, skewed: bool) -> None:
    from pyspark.sql import functions as F

    from artemia_airflow_spark.catalog import scan

    path = f"{dst}/events.parquet"
    if os.path.exists(path):
        return
    os.makedirs(dst, exist_ok=True)
    e = scan(spark, SRC, "events")
    copies = spark.range(100).select(F.col("id").alias("copy"))
    uid = (F.col("user_id") + F.col("copy") * 1_000_000)
    if skewed:
        # copies 90..99 all land on ONE user: 10% of the corpus
        uid = F.when(F.col("copy") >= 90, F.lit(HOT_USER)).otherwise(uid)
    (
        e.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("copy") * 10_000_000).alias("event_id"),
            # per-copy second jitter so the hot user's 1M events are
            # 10 interleaved-but-distinct sequences, not 10 identical
            (F.col("ts") + F.make_interval(secs=F.col("copy"))).alias("ts"),
            uid.alias("user_id"),
            "event_type", "value", "props",
        )
        .write.mode("overwrite").parquet(path)
    )


def time_query(spark, fn, sf_dir: str) -> float:
    import gc

    best = float("inf")
    spark.catalog.clearCache()
    gc.collect()
    spark._jvm.System.gc()
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from artemia_airflow_spark.session import build_session

    import __spark_entry__ as E

    spark = build_session("aas-scaleup-r13")
    spark.sparkContext.setLogLevel("ERROR")
    build_events(spark, UNI, skewed=False)
    build_events(spark, SKEW, skewed=True)
    qs = E.queries()
    out = {}
    out[ANCHOR + "@1x"] = time_query(spark, qs[ANCHOR], SRC)
    for name in QUERIES:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], UNI)
        t100s = time_query(spark, qs[name], SKEW)
        out[name] = {
            "t_1x": t1, "t_100x": t100, "t_100x_skew": t100s,
            "growth_100x": round(t100 / t1, 2),
            "skew_penalty": round(t100s / t100, 2),
        }
    spark.stop()
    sys.stdout.write(json.dumps(out, indent=1, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
