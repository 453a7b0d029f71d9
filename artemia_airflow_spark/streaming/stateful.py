"""Custom stateful streaming operator via applyInPandasWithState (B50+).

``running_user_stats``: per-user cumulative (count, sum, max) over an
event stream — the canonical "operator Spark lacks" shape: arbitrary
per-key state evolved batch by batch, with timeout-based state expiry
bounded by the watermark.

Works identically on a static DataFrame (via groupBy/agg fallback) and
a stream; tests assert the stream's final state equals the batch
aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = "user_id long, n_events long, sum_value double, max_value double"
_STATE_SCHEMA = "n long, s double, m double"


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State update fn: fold each micro-batch's rows for this user into
    (count, sum, max).  Emits the running totals after every batch."""
    if state.hasTimedOut:
        state.remove()
        return
    n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        if len(pdf):
            n += len(pdf)
            s += float(pdf["value"].sum())
            m = max(m, float(pdf["value"].max()))
    state.update((n, s, m))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s], "max_value": [m]}
    )


def running_user_stats_stream(events: DataFrame) -> DataFrame:
    """Stateful per-user running stats over a stream (update mode)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the closed-form aggregate the stream's final state
    must converge to."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
    )
