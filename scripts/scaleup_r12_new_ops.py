#!/usr/bin/env python
"""10x scale-up measurement for the round-12 operator additions
(SCALE.md empirical-scaling protocol): build a synthetic 10x corpus in
/tmp — events replicated as TEN DISTINCT USER POPULATIONS (user_id
offset per copy, so per-user event density stays representative
instead of every user gaining 10x events) and documents as perturbed
copies (per-copy token suffix keeps segment/dedup structure honest) —
then isolated best-of-3 of each new query at 1x (sf0.1) and 10x.

Usage: python scripts/scaleup_r12_new_ops.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/aas_scaleup_r12_new"

QUERIES = [
    "q_sessionize", "q_funnel", "q_retention", "q_event_transitions",
    "q_dedup_segments", "q_text_perplexity", "q_sketch_cms_portable",
    "q_text_postings", "q_sim_topk_filtered",
]
ANCHOR = "q_agg_group"


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    from artemia_airflow_spark.catalog import scan

    if not os.path.exists(f"{DST}/events.parquet"):
        e = scan(spark, SRC, "events")
        copies = spark.range(10).select(F.col("id").alias("copy"))
        (
            e.crossJoin(copies)
            .select(
                (F.col("event_id") + F.col("copy") * 10_000_000).alias("event_id"),
                # jitter a few seconds per copy so sequences aren't
                # ten identical interleavings
                (F.col("ts") + F.make_interval(secs=F.col("copy"))).alias("ts"),
                (F.col("user_id") + F.col("copy") * 1_000_000).alias("user_id"),
                "event_type", "value", "props",
            )
            .write.mode("overwrite").parquet(f"{DST}/events.parquet")
        )
    if not os.path.exists(f"{DST}/documents.parquet"):
        d = scan(spark, SRC, "documents")
        copies = spark.range(10).select(F.col("id").alias("copy"))
        (
            d.crossJoin(copies)
            .select(
                (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
                F.when(F.col("copy") == 0, F.col("text")).otherwise(
                    F.concat_ws(" ", F.col("text"), F.concat(F.lit("c"), F.col("copy")))
                ).alias("text"),
                "lang", "source", "n_chars",
            )
            .write.mode("overwrite").parquet(f"{DST}/documents.parquet")
        )
    # the filtered-similarity query reads embeddings: replicate with
    # vec_id offsets (labels unchanged -> 10x corpus behind the filter)
    if not os.path.exists(f"{DST}/embeddings.parquet"):
        emb = scan(spark, SRC, "embeddings")
        copies = spark.range(10).select(F.col("id").alias("copy"))
        (
            emb.crossJoin(copies)
            .select(
                (F.col("vec_id") + F.col("copy") * 10_000_000).alias("vec_id"),
                "embedding", "label",
            )
            .write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")
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

    spark = build_session("aas-scaleup-new")
    spark.sparkContext.setLogLevel("ERROR")
    build_corpus(spark)
    qs = E.queries()
    out = {}
    out[ANCHOR + "@1x"] = time_query(spark, qs[ANCHOR], SRC)
    for name in QUERIES:
        t1 = time_query(spark, qs[name], SRC)
        t10 = time_query(spark, qs[name], DST)
        out[name] = {"t_1x": t1, "t_10x": t10, "growth": round(t10 / t1, 2)}
    spark.stop()
    sys.stdout.write(json.dumps(out, indent=1, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
