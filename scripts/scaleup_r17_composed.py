#!/usr/bin/env python
"""100x scale points for the round-17 composed faces.

q_behavior_pipeline — the events-family composition — at 1x (sf0.1),
on the 100x uniform replica corpus, and on the 90%-hot-user skew
corpus (the adversarial case for the single user_id exchange every
behavioral face shares: the hot user's partition serializes its
windows; the measurement records the cliff, the mitigation at fleet
scale is the same as the family's — per-user state is bounded by the
user's OWN history, and a 90%-single-user corpus is a data bug the
per-source quota cap upstream exists to catch).

q_corpus_release — the trainer hand-off — at 1x and on the 100x
replica document corpus, where exact dedup COLLAPSES the replication
(replicas share normalized text): the growth isolates the pre-dedup
scan-side stages plus the export write of the collapsed survivor set,
the shape a dedup-first release pipeline is FOR.

Usage: python scripts/scaleup_r17_composed.py
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
    EV_SKEW,
    EV_UNI,
    build_docs,
    build_events,
)

ANCHOR = "q_agg_group"


def main() -> None:
    from artemia_airflow_spark.session import build_session

    import __spark_entry__ as E

    spark = build_session("aas-scaleup-r17")
    spark.sparkContext.setLogLevel("ERROR")
    build_events(spark, EV_UNI, skewed=False)
    build_events(spark, EV_SKEW, skewed=True)
    build_docs(spark, DOC_UNI)
    qs = E.queries()
    out = {ANCHOR + "@1x": time_query(spark, qs[ANCHOR], SRC)}
    print(ANCHOR, out[ANCHOR + "@1x"], flush=True)

    name = "q_behavior_pipeline"
    t1 = time_query(spark, qs[name], SRC)
    t100 = time_query(spark, qs[name], EV_UNI)
    tskew = time_query(spark, qs[name], EV_SKEW)
    out[name] = {
        "t_1x": t1, "t_100x": t100, "growth_100x": round(t100 / t1, 2),
        "t_100x_skew90": tskew, "skew_penalty": round(tskew / t100, 2),
    }
    print(name, out[name], flush=True)

    name = "q_corpus_release"
    t1 = time_query(spark, qs[name], SRC)
    t100 = time_query(spark, qs[name], DOC_UNI)
    out[name] = {"t_1x": t1, "t_100x": t100,
                 "growth_100x": round(t100 / t1, 2)}
    print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
