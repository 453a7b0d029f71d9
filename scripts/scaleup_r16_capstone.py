#!/usr/bin/env python
"""100x scale points for the round-16 additions.

q_corpus_pipeline — the composed capstone — at 1x (sf0.1) and on the
100x replica document corpus (64-file layout; r13 one-file starvation
trap stays fixed).  On the replica corpus the exact-dedup stage
COLLAPSES the 100x replication (replicas share normalized text), so
the measurement isolates exactly what should grow: the pre-dedup
scan-side stages (scrub, langid, the classifier's bigram explode and
presence aggregation, the dedup exchange itself), while the post-dedup
tail stays 1x-sized — the shape a dedup-first pipeline is FOR.

q_curriculum re-measured after the r16 two-phase bin-grid refactor
(the r15 record predates it): the unpartitioned running sum now ranks
<= 1024 bin rows instead of every distinct score.

Usage: python scripts/scaleup_r16_capstone.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaleup_r13_behavior import SRC, time_query
from scaleup_r14_new_ops import DOC_UNI, build_docs

ANCHOR = "q_agg_group"
DOC_QUERIES = ["q_corpus_pipeline", "q_curriculum"]


def main() -> None:
    from artemia_airflow_spark.session import build_session

    import __spark_entry__ as E

    spark = build_session("aas-scaleup-r16")
    spark.sparkContext.setLogLevel("ERROR")
    build_docs(spark, DOC_UNI)
    qs = E.queries()
    out = {ANCHOR + "@1x": time_query(spark, qs[ANCHOR], SRC)}
    print(ANCHOR, out[ANCHOR + "@1x"], flush=True)
    for name in DOC_QUERIES:
        t1 = time_query(spark, qs[name], SRC)
        t100 = time_query(spark, qs[name], DOC_UNI)
        out[name] = {"t_1x": t1, "t_100x": t100,
                     "growth_100x": round(t100 / t1, 2)}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
