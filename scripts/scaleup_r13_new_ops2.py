#!/usr/bin/env python
"""Scale measurement for the round-13 operator additions (B130-B137):

* events-based faces (pagerank / MAD / PSI / attribution) at 100x
  (10M rows, 100 distinct user populations — reuses the behavioral
  quartet's corpus) plus the skewed-user regime for the two faces
  with a user_id window (pagerank's lag pairs, attribution's carried
  touch);
* documents-based faces (DSIR / zipf / weighted sample) at 100x
  (500k docs — doc_id offset per copy so ids stay unique and the
  A-ES uniforms stay distinct);
* the KMeans face at 100x embeddings (200k vectors, vec_id offset;
  copies >= 5 so the corpus/probe split semantics of other faces are
  unaffected — kmeans uses all rows either way).

Isolated best-of-3 per (query, corpus), noop sink, q_agg_group anchor.
Usage: python scripts/scaleup_r13_new_ops2.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
EV_UNI = "/tmp/aas_scaleup_r13_uni"     # events from the quartet run
EV_SKEW = "/tmp/aas_scaleup_r13_skew"
DOC_UNI = "/tmp/aas_scaleup_r13_docs"
EMB_UNI = "/tmp/aas_scaleup_r13_emb"

EVENT_QUERIES = ["q_graph_pagerank", "q_outliers_mad", "q_drift_psi",
                 "q_attribution"]
SKEW_QUERIES = ["q_graph_pagerank", "q_attribution"]
DOC_QUERIES = ["q_select_dsir", "q_text_zipf", "q_sample_weighted"]
EMB_QUERIES = ["q_cluster_kmeans"]
ANCHOR = "q_agg_group"


def build_events(spark, dst: str, skewed: bool) -> None:
    from scaleup_r13_behavior import build_events as _be
    _be(spark, dst, skewed)


def build_docs(spark, dst: str) -> None:
    from pyspark.sql import functions as F

    from artemia_airflow_spark.catalog import scan

    path = f"{dst}/documents.parquet"
    if os.path.exists(path):
        return
    os.makedirs(dst, exist_ok=True)
    d = scan(spark, SRC, "documents")
    copies = spark.range(100).select(F.col("id").alias("copy"))
    (
        d.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .write.mode("overwrite").parquet(path)
    )


def build_emb(spark, dst: str) -> None:
    from pyspark.sql import functions as F

    from artemia_airflow_spark.catalog import scan

    path = f"{dst}/embeddings.parquet"
    if os.path.exists(path):
        return
    os.makedirs(dst, exist_ok=True)
    e = scan(spark, SRC, "embeddings")
    copies = spark.range(100).select(F.col("id").alias("copy"))
    (
        e.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * 10_000_000).alias("vec_id"),
            "embedding", "label",
        )
        .write.mode("overwrite").parquet(path)
    )


def time_query(spark, fn, sf_dir: str) -> float:
    # ONE measurement protocol for both r13 scale records (r13 review:
    # a pasted copy here could silently desynchronize from the
    # behavioral script SCALE.md presents as sharing the protocol)
    from scaleup_r13_behavior import time_query as _tq
    return _tq(spark, fn, sf_dir)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from artemia_airflow_spark.session import build_session

    import __spark_entry__ as E

    spark = build_session("aas-scaleup-r13-new")
    spark.sparkContext.setLogLevel("ERROR")
    build_events(spark, EV_UNI, skewed=False)
    build_events(spark, EV_SKEW, skewed=True)
    build_docs(spark, DOC_UNI)
    build_emb(spark, EMB_UNI)
    qs = E.queries()
    out = {ANCHOR + "@1x": time_query(spark, qs[ANCHOR], SRC)}
    for name in EVENT_QUERIES:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], EV_UNI)
        rec = {"t_1x": t1, "t_100x": t100,
               "growth_100x": round(t100 / t1, 2)}
        if name in SKEW_QUERIES:
            t100s = time_query(spark, qs[name], EV_SKEW)
            rec["t_100x_skew"] = t100s
            rec["skew_penalty"] = round(t100s / t100, 2)
        out[name] = rec
    for name in DOC_QUERIES:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], DOC_UNI)
        out[name] = {"t_1x": t1, "t_100x": t100,
                     "growth_100x": round(t100 / t1, 2)}
    for name in EMB_QUERIES:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], EMB_UNI)
        out[name] = {"t_1x": t1, "t_100x": t100,
                     "growth_100x": round(t100 / t1, 2)}
    spark.stop()
    sys.stdout.write(json.dumps(out, indent=1, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
