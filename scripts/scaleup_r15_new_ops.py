#!/usr/bin/env python
"""100x scale points for the round-15 additions (B171-B177).

Reuses the r14 corpus builders (64-file layout — the r13 one-file
replica starvation trap stays fixed) and the r13 timing protocol
(isolated best-of-3 per (query, corpus), anchor q_agg_group at 1x).

Event face: q_funnel_value (user-partitioned windows -> also measured
on the 10%-hot-user skew corpus; the claim under test is a linear
in-task sort on the one unsplittable window partition, not a cliff).

Document faces: q_mix_epoch_plan, q_select_influence,
q_text_compression, q_text_langid_quality — all single-scan
per-source/per-lang aggregates, expected ~linear.

Embedding faces: q_embed_outliers (two corpus exchanges) and
q_index_stream_portable (the full stream->table->index loop: build,
stream drain, query tail — the measured point includes TxTable
creates and three micro-batches, i.e. the worst case, like the B152
measurement before it).

Usage: python scripts/scaleup_r15_new_ops.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaleup_r13_behavior import SRC, time_query
from scaleup_r14_new_ops import (
    DOC_UNI,
    EMB_UNI,
    EV_SKEW,
    EV_UNI,
    build_docs,
    build_embeddings,
    build_events,
)

ANCHOR = "q_agg_group"
EVENT_SKEWABLE = ["q_funnel_value"]
DOC_QUERIES = [
    "q_mix_epoch_plan", "q_select_influence", "q_text_compression",
    "q_text_langid_quality",
]
EMB_QUERIES = ["q_embed_outliers", "q_index_stream_portable"]


def main() -> None:
    from artemia_airflow_spark.session import build_session

    import __spark_entry__ as E

    spark = build_session("aas-scaleup-r15")
    spark.sparkContext.setLogLevel("ERROR")
    build_events(spark, EV_UNI, skewed=False)
    build_events(spark, EV_SKEW, skewed=True)
    build_docs(spark, DOC_UNI)
    build_embeddings(spark, EMB_UNI)
    qs = E.queries()
    out = {ANCHOR + "@1x": time_query(spark, qs[ANCHOR], SRC)}
    for name in EVENT_SKEWABLE:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], EV_UNI)
        ts = time_query(spark, qs[name], EV_SKEW)
        out[name] = {
            "t_1x": t1, "t_100x": t100,
            "growth_100x": round(t100 / t1, 2),
            "t_100x_skew": ts, "skew_penalty": round(ts / t100, 2),
        }
        print(name, out[name], flush=True)
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
