#!/usr/bin/env python
"""100x scale points for the late round-13 additions (B136-B143):
attribution/PSI already measured; this covers MI / OLS trend /
inter-event gaps (events at 100x — the quartet corpus), split
manifest (documents at 100x), and the cross-source matrix at 10x
REPLICAS (pair materialization is quadratic in duplicate
multiplicity: the 100x-replica point is ~10^4 x the 1x pair count —
that regime is the max_bucket guard's domain, found and guarded in
r13; 10x replicas = ~100x pairs is the honest measurable point).
Shares the behavioral script's corpora and measurement protocol."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaleup_r13_behavior import time_query
from scaleup_r13_new_ops2 import (
    DOC_UNI, EV_UNI, SRC, build_docs, build_events,
)

DOC_10X = "/tmp/aas_scaleup_r13_docs10"


def build_docs_10x(spark, dst):
    import os as _os

    from pyspark.sql import functions as F

    from artemia_airflow_spark.catalog import scan

    path = f"{dst}/documents.parquet"
    if _os.path.exists(path):
        return
    _os.makedirs(dst, exist_ok=True)
    d = scan(spark, SRC, "documents")
    copies = spark.range(10).select(F.col("id").alias("copy"))
    (
        d.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .write.mode("overwrite").parquet(path)
    )

EVENT_QUERIES = ["q_mutual_info", "q_trend_ols", "q_interevent_gaps"]
DOC_QUERIES = ["q_split_manifest"]
ANCHOR = "q_agg_group"


def main() -> None:
    from artemia_airflow_spark.session import build_session

    import __spark_entry__ as E

    spark = build_session("aas-scaleup-r13-late")
    spark.sparkContext.setLogLevel("ERROR")
    build_events(spark, EV_UNI, skewed=False)
    build_docs(spark, DOC_UNI)
    qs = E.queries()
    out = {ANCHOR + "@1x": time_query(spark, qs[ANCHOR], SRC)}
    # q_mutual_info runs on documents; route it to the doc corpus
    for name in EVENT_QUERIES:
        corpus = DOC_UNI if name == "q_mutual_info" else EV_UNI
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], corpus)
        out[name] = {"t_1x": t1, "t_100x": t100,
                     "growth_100x": round(t100 / t1, 2)}
        print(name, out[name], flush=True)
    for name in DOC_QUERIES:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], DOC_UNI)
        out[name] = {"t_1x": t1, "t_100x": t100,
                     "growth_100x": round(t100 / t1, 2)}
        print(name, out[name], flush=True)
    build_docs_10x(spark, DOC_10X)
    t1 = time_query(spark, qs["q_dedup_cross_source"], SRC)
    rec = {"t_1x": t1}
    import time as _t
    t0 = _t.perf_counter()
    try:
        t10 = time_query(spark, qs["q_dedup_cross_source"], DOC_10X)
        rec.update(t_10x_replicas=t10,
                   growth_10x_replicas=round(t10 / t1, 2))
    except Exception as e:  # noqa: BLE001 - the guard IS the result
        rec.update(
            t_10x_replicas="GUARD",
            guard_fired_after_s=round(_t.perf_counter() - t0, 1),
            error=str(e)[:200],
        )
    rec["note"] = ("pairs scale ~multiplicity^2; replica corpora are "
                   "the max_bucket guard's domain")
    out["q_dedup_cross_source"] = rec
    spark.stop()
    sys.stdout.write(json.dumps(out, indent=1, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
