#!/usr/bin/env python
"""100x scale points for the round-14 additions (B150-B165).

HARNESS FIX (r14, found by the first measurement attempt): the r13
replica corpora were written as ONE parquet file each — replicated
text compresses so hard (100 copies of the same strings hit the
dictionary) that 100x documents landed in a 4.9 MB single file, which
Spark scans as ONE partition.  Every "100x" doc-face measurement on
that corpus was really a 1-task parallelism-starvation measurement
(the observed 2-task straggler stage), not a data-scale measurement.
A real cluster never reads 100x data from one file, so THIS script
writes its corpora repartitioned into 64 files and measures against
those; the one-file numbers are kept out of SCALE.md except as the
documented harness finding.

Event faces (q_attribution_session, q_engagement_decay,
q_rate_anomalies, q_churn_weekly, q_split_temporal,
q_value_percentiles_daily) run at 1x (sf0.1), 100x uniform (100
distinct user populations), and — for the user-partitioned ones — the
10%-hot-user skew corpus (the r13 behavioral protocol: a window
partition key cannot be split by AQE, so the claim under test is a
linear in-task sort, not a cliff).

Document faces (q_select_classifier, q_divergence_js,
q_vocab_coverage, q_select_budget, q_dedup_rate_by_source,
q_text_novelty, q_select_calibration) run at 1x and 100x documents
(replicated with distinct doc_ids).  Replica caveat where it matters:
replicas collapse every gram's doc frequency to ~100, so novelty's
OUTPUT degenerates to zero — the runtime shape (gram equi-join) is
what is measured, and it is multiplicity-linear (an equality join
against a count relation, not pair materialization).

Embedding faces (q_embed_drift, q_index_upsert_portable,
q_label_noise) run at 1x and 100x embeddings (distinct vec_ids).

Isolated best-of-3 per (query, corpus); anchor q_agg_group at 1x for
box-state context.  Usage: python scripts/scaleup_r14_new_ops.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaleup_r13_behavior import HOT_USER, SRC, time_query

EV_UNI = "/tmp/aas_scaleup_r14_ev"
EV_SKEW = "/tmp/aas_scaleup_r14_ev_skew"
DOC_UNI = "/tmp/aas_scaleup_r14_docs"
EMB_UNI = "/tmp/aas_scaleup_r14_emb64"
N_FILES = 64

EVENT_UNIFORM = [
    "q_attribution_session", "q_engagement_decay", "q_rate_anomalies",
    "q_churn_weekly", "q_split_temporal", "q_value_percentiles_daily",
]
# user-partitioned shapes where the hot user stresses the one exchange
EVENT_SKEW = ["q_attribution_session", "q_engagement_decay", "q_churn_weekly"]
DOC_QUERIES = [
    "q_select_classifier", "q_divergence_js", "q_vocab_coverage",
    "q_select_budget", "q_dedup_rate_by_source", "q_text_novelty",
    "q_select_calibration",
]
EMB_QUERIES = ["q_embed_drift", "q_index_upsert_portable", "q_label_noise"]
ANCHOR = "q_agg_group"


def build_events(spark, dst: str, skewed: bool) -> None:
    from pyspark.sql import functions as F

    from artemia_airflow_spark.catalog import scan

    path = f"{dst}/events.parquet"
    # a partially-written dir from an interrupted run must rebuild:
    # only trust the parquet commit marker (ADVICE r14)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    os.makedirs(dst, exist_ok=True)
    e = scan(spark, SRC, "events")
    copies = spark.range(100).select(F.col("id").alias("copy"))
    uid = (F.col("user_id") + F.col("copy") * 1_000_000)
    if skewed:
        uid = F.when(F.col("copy") >= 90, F.lit(HOT_USER)).otherwise(uid)
    (
        e.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("copy") * 10_000_000)
            .alias("event_id"),
            (F.col("ts") + F.make_interval(secs=F.col("copy"))).alias("ts"),
            uid.alias("user_id"),
            "event_type", "value", "props",
        )
        .repartition(N_FILES)
        .write.mode("overwrite").parquet(path)
    )


def build_docs(spark, dst: str) -> None:
    from pyspark.sql import functions as F

    from artemia_airflow_spark.catalog import scan

    path = f"{dst}/documents.parquet"
    # a partially-written dir from an interrupted run must rebuild:
    # only trust the parquet commit marker (ADVICE r14)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
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
        .repartition(N_FILES)
        .write.mode("overwrite").parquet(path)
    )


def build_embeddings(spark, dst: str) -> None:
    from pyspark.sql import functions as F

    from artemia_airflow_spark.catalog import scan

    path = f"{dst}/embeddings.parquet"
    # a partially-written dir from an interrupted run must rebuild:
    # only trust the parquet commit marker (ADVICE r14)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    os.makedirs(dst, exist_ok=True)
    emb = scan(spark, SRC, "embeddings")
    copies = spark.range(100).select(F.col("id").alias("copy"))
    (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * 10_000_000).alias("vec_id"),
            "embedding", "label",
        )
        .repartition(N_FILES)
        .write.mode("overwrite").parquet(path)
    )


def main() -> None:
    from artemia_airflow_spark.session import build_session

    import __spark_entry__ as E

    spark = build_session("aas-scaleup-r14")
    spark.sparkContext.setLogLevel("ERROR")
    build_events(spark, EV_UNI, skewed=False)
    build_events(spark, EV_SKEW, skewed=True)
    build_docs(spark, DOC_UNI)
    build_embeddings(spark, EMB_UNI)
    qs = E.queries()
    out = {ANCHOR + "@1x": time_query(spark, qs[ANCHOR], SRC)}
    for name in EVENT_UNIFORM:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], EV_UNI)
        rec = {"t_1x": t1, "t_100x": t100,
               "growth_100x": round(t100 / t1, 2)}
        if name in EVENT_SKEW:
            ts = time_query(spark, qs[name], EV_SKEW)
            rec["t_100x_skew"] = ts
            rec["skew_penalty"] = round(ts / t100, 2)
        out[name] = rec
        print(name, rec, flush=True)
    for name in DOC_QUERIES:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], DOC_UNI)
        out[name] = {"t_1x": t1, "t_100x": t100,
                     "growth_100x": round(t100 / t1, 2)}
        print(name, out[name], flush=True)
    for name in EMB_QUERIES:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], EMB_UNI)
        out[name] = {"t_1x": t1, "t_100x": t100,
                     "growth_100x": round(t100 / t1, 2)}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
