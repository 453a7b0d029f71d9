"""Custom join operators Spark lacks natively (SURVEY.md §4.2).

Currently: as-of join (B16).  Implemented as a composition of built-in
DataFrame ops (equi-join + window top-1) so Catalyst still owns the
physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    tiebreak: str,
    how: str = "inner",
    left_id: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the same
    key and the greatest ``right_time <= left_time`` (ties broken by the
    greatest ``tiebreak``, which must be unique on the right).

    Semantics pinned per SURVEY.md §7 H4 so the DuckDB oracle can use
    the identical window formulation (DuckDB's native ASOF JOIN breaks
    ties differently).

    Physical shape: equi-join on the key (hash/SMJ — Catalyst decides,
    broadcast if the right side is small) with the time bound as a join
    residual, then a per-left-row window top-1.  At 100 TB this is
    shuffle-on-key + window — both partition-parallel.  If the right
    side has many rows per key (unbounded history), pre-reduce it with
    the same window *before* the join or bucket both sides on the key;
    the dominant cost is the join fan-out, not the window.
    """
    cond = (left[left_on] == right[right_on]) & (right[right_time] <= left[left_time])
    joined = left.join(right, cond, how)
    # Window key: a unique left id if the caller has one (narrow shuffle
    # key), else all left columns (correct but wider exchange).
    part_cols = [left_id] if left_id else list(left.columns)
    w = Window.partitionBy(*part_cols).orderBy(
        F.col(right_time).desc(), F.col(tiebreak).desc()
    )
    return (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_rn")
    )
