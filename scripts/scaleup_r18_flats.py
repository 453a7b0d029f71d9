#!/usr/bin/env python
"""100x scale points for the five r17 changes that were plan-justified
but locally flat at sf0.1 (VERDICT r17 item 3): q_retrieval_mmr,
q_retrieval_rrf, q_retrieval_bm25, q_sketch_cms_portable,
q_embed_drift — each got a materialize-reused-subtree / shared-pass
restructuring in r17 whose win is claimed at scale, not at toy SF.
This script produces the at-scale measurement those claims were
missing, on the same 100x replica protocol as the r12-r14 scale
records (copy-offset ids, bounded probe sets stay bounded — exactly
the production shape where a fixed query set runs against a growing
corpus).

Also records the two r17 regression sentinels (VERDICT item 7):
q_embed_drift (+15% local cost of the lazy checkpoint) and
q_merge_upsert (+0.13-0.28s duplicate-change-key guard) at 100x, so
the "at-scale trade" defense is a number, not an argument.

Usage: python scripts/scaleup_r18_flats.py   (quiet box, no other
Spark work — the r13 protocol)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
FLAT = "/tmp/aas_scaleup_r18_flat"
N_FILES = 64
ANCHOR = "q_agg_group"

DOC_QUERIES = ["q_retrieval_bm25", "q_sketch_cms_portable"]
EMB_QUERIES = ["q_embed_drift", "q_retrieval_mmr"]
BOTH_QUERIES = ["q_retrieval_rrf"]
ORD_QUERIES = ["q_merge_upsert"]


def _built(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def build_flat(spark) -> None:
    """One 100x dir holding documents, embeddings AND orders so the
    multi-table faces (rrf reads docs+emb) run unchanged."""
    from artemia_airflow_spark.catalog import scan

    os.makedirs(FLAT, exist_ok=True)
    copies = spark.range(100).select(F.col("id").alias("copy"))

    path = f"{FLAT}/documents.parquet"
    if not _built(path):
        d = scan(spark, SRC, "documents")
        (
            d.crossJoin(copies)
            .select(
                (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
            .repartition(N_FILES)
            .write.mode("overwrite").parquet(path)
        )

    path = f"{FLAT}/embeddings.parquet"
    if not _built(path):
        emb = scan(spark, SRC, "embeddings")
        (
            emb.crossJoin(copies)
            .select(
                (F.col("vec_id") + F.col("copy") * 10_000_000).alias("vec_id"),
                "embedding", "label",
            )
            .repartition(N_FILES)
            .write.mode("overwrite").parquet(path)
        )

    path = f"{FLAT}/orders.parquet"
    if not _built(path):
        o = spark.read.parquet(f"{SRC}/orders.parquet")
        (
            o.crossJoin(copies)
            .select(
                (F.col("o_orderkey") + F.col("copy") * 100_000_000)
                .alias("o_orderkey"),
                *[c for c in o.columns if c != "o_orderkey"],
            )
            .repartition(N_FILES)
            .write.mode("overwrite").parquet(path)
        )


def time_query(spark, fn, sf_dir: str) -> float:
    """bench.py's per-query reset, verbatim: at 100x the faces'
    localCheckpoint blocks are ~100s of MB and clearCache alone leaves
    them pinned — without the unpersist sweep, later faces in the run
    inflate 2-3x from heap pressure (the suite-position pathology the
    bench fixed in r4; re-observed here as 5.3 -> 18.3 s swings on an
    untouched face)."""
    import gc

    best = float("inf")
    spark.catalog.clearCache()
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    except Exception:
        pass
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

    spark = build_session("aas-scaleup-r18")
    spark.sparkContext.setLogLevel("ERROR")
    build_flat(spark)
    qs = E.queries()
    out = {ANCHOR + "@1x": time_query(spark, qs[ANCHOR], SRC)}
    print(ANCHOR, out[ANCHOR + "@1x"], flush=True)
    names = sys.argv[1:] or DOC_QUERIES + EMB_QUERIES + BOTH_QUERIES + ORD_QUERIES
    for name in names:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], FLAT)
        out[name] = {
            "t_1x": t1,
            "t_100x": t100,
            "growth_100x": round(t100 / t1, 2),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
