#!/usr/bin/env python
"""Source-SKEW scale point for the round-16 capstone and mix family.

Builds a 100x document corpus whose source distribution is skewed —
~90% of all documents land on ONE hot source (the crawl-dump reality:
one domain dominates) — and measures q_corpus_pipeline,
q_mix_temperature_apply and q_pack_efficiency against the UNIFORM
100x corpus from scaleup_r16_capstone.  The claims under test:

- the capstone's per-stage aggregates key on source only for the
  |sources|-row factor table (skew concentrates an aggregate bucket,
  not a join side), and packing partitions on (split, doc_id % 32) —
  source skew must NOT serialize packing;
- apply_temperature's up-sampling factor for the TAIL sources grows
  as sqrt(hot/tail) — the skew corpus stresses the explode path the
  uniform corpus barely exercises.

64-file layout (the r13 one-file starvation trap stays fixed).
Usage: python scripts/scaleup_r16_skew.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaleup_r13_behavior import SRC, time_query
from scaleup_r14_new_ops import DOC_UNI, N_FILES, build_docs

DOC_SKEW = "/tmp/aas_scaleup_r16_docs_skew"
QUERIES = ["q_corpus_pipeline", "q_mix_temperature_apply", "q_pack_efficiency"]


def build_docs_skewed(spark, dst: str) -> None:
    from pyspark.sql import functions as F

    from artemia_airflow_spark.catalog import scan

    path = f"{dst}/documents.parquet"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    os.makedirs(dst, exist_ok=True)
    d = scan(spark, SRC, "documents")
    copies = spark.range(100).select(F.col("id").alias("copy"))
    (
        d.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            "text", "lang",
            # ~90% of rows collapse onto one hot source; the rest keep
            # their original source label (the tail)
            F.when((F.col("doc_id") + F.col("copy")) % 10 < 9,
                   F.lit("src_hot")).otherwise(F.col("source"))
            .alias("source"),
            "n_chars",
        )
        .repartition(N_FILES)
        .write.mode("overwrite").parquet(path)
    )


def main() -> None:
    from artemia_airflow_spark.session import build_session

    import __spark_entry__ as E

    spark = build_session("aas-scaleup-r16-skew")
    spark.sparkContext.setLogLevel("ERROR")
    build_docs(spark, DOC_UNI)
    build_docs_skewed(spark, DOC_SKEW)
    qs = E.queries()
    out = {"anchor_q_agg_group@1x": time_query(spark, qs["q_agg_group"], SRC)}
    print("anchor", out["anchor_q_agg_group@1x"], flush=True)
    for name in QUERIES:
        t100 = time_query(spark, qs[name], DOC_UNI)
        ts = time_query(spark, qs[name], DOC_SKEW)
        out[name] = {
            "t_100x_uniform": t100, "t_100x_skew": ts,
            "skew_penalty": round(ts / t100, 2),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
