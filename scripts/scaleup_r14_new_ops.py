#!/usr/bin/env python
"""100x scale points for the round-14 additions (B150-B162).

Event faces (q_attribution_session, q_engagement_decay,
q_rate_anomalies, q_churn_weekly, q_split_temporal) run at 1x
(sf0.1), 100x uniform (100 distinct user populations), and — for the
user-partitioned ones — the 10%-hot-user skew corpus (the r13
behavioral protocol: a window partition key cannot be split by AQE,
so the claim under test is a linear in-task sort, not a cliff).

Document faces (q_select_classifier, q_divergence_js,
q_vocab_coverage, q_select_budget, q_dedup_rate_by_source,
q_text_novelty) run at 1x and 100x documents (replicated with
distinct doc_ids).  Note the replica caveat where it matters:
replicas collapse every gram's doc frequency to ~100, so novelty's
OUTPUT degenerates to zero — the runtime shape (gram equi-join) is
what is being measured, and it is multiplicity-linear here (equality
join against a count relation, not pair materialization).

Embedding faces (q_embed_drift, q_index_upsert_portable) run at 1x
and 100x embeddings (distinct vec_ids).

Isolated best-of-3 per (query, corpus); anchor q_agg_group at 1x for
box-state context.  Usage: python scripts/scaleup_r14_new_ops.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaleup_r13_behavior import SKEW, UNI, build_events, time_query
from scaleup_r13_new_ops2 import DOC_UNI, SRC, build_docs

EMB_UNI = "/tmp/aas_scaleup_r14_emb"

EVENT_UNIFORM = [
    "q_attribution_session", "q_engagement_decay", "q_rate_anomalies",
    "q_churn_weekly", "q_split_temporal",
]
# user-partitioned shapes where the hot user stresses the one exchange
EVENT_SKEW = ["q_attribution_session", "q_engagement_decay", "q_churn_weekly"]
DOC_QUERIES = [
    "q_select_classifier", "q_divergence_js", "q_vocab_coverage",
    "q_select_budget", "q_dedup_rate_by_source", "q_text_novelty",
]
EMB_QUERIES = ["q_embed_drift", "q_index_upsert_portable"]
ANCHOR = "q_agg_group"


def build_embeddings(spark, dst: str) -> None:
    from pyspark.sql import functions as F

    from artemia_airflow_spark.catalog import scan

    path = f"{dst}/embeddings.parquet"
    if os.path.exists(path):
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
        .write.mode("overwrite").parquet(path)
    )


def main() -> None:
    from artemia_airflow_spark.session import build_session

    import __spark_entry__ as E

    spark = build_session("aas-scaleup-r14")
    spark.sparkContext.setLogLevel("ERROR")
    build_events(spark, UNI, skewed=False)
    build_events(spark, SKEW, skewed=True)
    build_docs(spark, DOC_UNI)
    build_embeddings(spark, EMB_UNI)
    qs = E.queries()
    out = {ANCHOR + "@1x": time_query(spark, qs[ANCHOR], SRC)}
    for name in EVENT_UNIFORM:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], UNI)
        rec = {"t_1x": t1, "t_100x": t100,
               "growth_100x": round(t100 / t1, 2)}
        if name in EVENT_SKEW:
            ts = time_query(spark, qs[name], SKEW)
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
