"""CDC merge/upsert (B62): apply a change set (upserts + deletes) to a
target table in one distributed pass.

The reference's pipelines refresh an external store wholesale
(dags/update_tr_from_ex_dag.py:97-103 triggers a full re-scrape); a
100 TB table cannot be rewritten per batch, so the engine ships the
standard MERGE INTO semantics as a composition of DataFrame ops:

    result =   target rows with no change row          (keep)
             + change rows matching a target row        (update)
             + change rows matching nothing             (insert)
             - change rows flagged deleted              (delete)

Physical shape: ONE full-outer shuffle join on the key — no driver
action, no second pass.  At scale the join co-locates for free when
the target is bucketed on the key (see sources/files.py
write_bucketed_table); the change set is usually orders of magnitude
smaller and broadcast-joins under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from artemia_airflow_spark.catalog import scan
from artemia_airflow_spark.plans.registry import declared
from artemia_airflow_spark.session import ensure_engine_conf


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    *,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics: rows of ``changes`` replace same-key rows
    of ``target``, new keys are inserted, and (optionally) rows where
    ``changes[delete_col]`` is true delete the target row.

    Both inputs must share the schema (minus ``delete_col``).  The key
    must be unique on each side — standard MERGE precondition; enforce
    upstream with exact dedup (operators/dedup.py) when in doubt.  A
    duplicate key on the CHANGES side fails loudly via an in-plan
    guard (r17b review: the full-outer join would otherwise fan the
    duplicate out into conflicting output rows — silent corruption; a
    key would carry two verdicts).  The guard's count window partitions
    by the join key, so it rides the exchange the full-outer join
    needs anyway — zero extra shuffles.
    """
    data_cols = [c for c in target.columns if c != key]
    ch = changes
    if delete_col is None:
        ch = ch.withColumn("__del", F.lit(False))
    else:
        ch = ch.withColumn("__del", F.coalesce(F.col(delete_col), F.lit(False))).drop(
            delete_col
        )
    t = target.select(key, *[F.col(c).alias(f"__t_{c}") for c in data_cols])
    c_ = ch.select(
        key, "__del", *[F.col(c).alias(f"__c_{c}") for c in data_cols]
    )
    # the guard rides __del (always read downstream), the
    # cross_source_matrix raise_error precedent
    wk = Window.partitionBy(key)
    c_ = c_.withColumn("__kn", F.count(F.lit(1)).over(wk)).withColumn(
        "__del",
        F.when(
            F.col("__kn") > 1,
            F.raise_error(F.concat(
                F.lit("merge_upsert: duplicate change rows for key "),
                F.col(key).cast("string"),
                F.lit(" — at most one change row per key (dedupe the"
                      " increment upstream)"),
            )),
        ).otherwise(F.col("__del")),
    ).drop("__kn")
    joined = t.join(c_, key, "full_outer")
    # change row present and not a delete -> change values win;
    # change row absent -> keep target; delete -> drop
    has_change = F.col("__del").isNotNull()
    kept = joined.filter(~(has_change & F.col("__del")))
    out_cols = [F.col(key)] + [
        F.when(has_change, F.col(f"__c_{c}")).otherwise(F.col(f"__t_{c}")).alias(c)
        for c in data_cols
    ]
    return kept.select(*out_cols)


@declared(
    "q_merge_upsert",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 1000 = 0 THEN o_orderkey + 100000000
                  ELSE o_orderkey END AS key2,
             o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS new_price,
             o_orderkey % 97 = 0 AS is_delete
      FROM orders WHERE o_orderkey % 10 = 0
    ), target AS (
      SELECT o_orderkey AS key2, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      FROM orders
    ), merged AS (
      SELECT COALESCE(c.key2, t.key2) AS key2,
             CASE WHEN c.key2 IS NOT NULL THEN c.o_orderstatus
                  ELSE t.o_orderstatus END AS o_orderstatus,
             CASE WHEN c.key2 IS NOT NULL THEN c.new_price ELSE t.price END AS price
      FROM target t FULL OUTER JOIN changes c ON t.key2 = c.key2
      WHERE NOT (c.key2 IS NOT NULL AND c.is_delete)
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM merged GROUP BY o_orderstatus
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B62: MERGE of a deterministic change set into orders — every 10th
    order is changed (price doubled), every multiple of 1000 arrives
    under a NEW key (insert), every multiple of 97 within the change
    set is a delete.  Per-status row count + price total after merge;
    the oracle reproduces the same full-outer merge in SQL."""
    ensure_engine_conf(spark)
    o = scan(spark, sf_dir, "orders")
    target = o.select(
        F.col("o_orderkey").alias("key2"),
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price"),
    )
    ch = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.when(
            F.col("o_orderkey") % 1000 == 0, F.col("o_orderkey") + 100_000_000
        )
        .otherwise(F.col("o_orderkey"))
        .alias("key2"),
        "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 2)
        .cast("double")
        .alias("price"),
        (F.col("o_orderkey") % 97 == 0).alias("is_delete"),
    )
    merged = merge_upsert(target, ch, "key2", delete_col="is_delete")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("price").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


def scd2_history(
    changes: DataFrame, key: str, ts_col: str, *, tiebreak: str
) -> DataFrame:
    """SCD type-2: turn a stream of per-key change rows into validity
    intervals — each row becomes [valid_from, valid_to) with valid_to =
    the next change's timestamp (NULL while current).

    One window per key (lead), shard-parallel on the key hash — the
    standard dimension-history build; ``tiebreak`` must be unique per
    (key, ts) so interval edges are deterministic (H3)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    return changes.withColumn("valid_to", F.lead(ts_col).over(w)).withColumn(
        "is_current", F.col("valid_to").isNull()
    )


@declared(
    "q_scd2",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, value,
             date_trunc('second', CAST(ts AS TIMESTAMP)) AS tsec
      FROM events
    )
    SELECT user_id, event_id, value,
           CAST(epoch(tsec) AS BIGINT) AS valid_from_s,
           CAST(epoch(lead(tsec) OVER w) AS BIGINT) AS valid_to_s,
           lead(tsec) OVER w IS NULL AS is_current
    FROM c WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B62 companion: SCD2 dimension history — per-user value change
    intervals from the events stream, oracle-checked (second-truncated
    event time, event_id tiebreak)."""
    ensure_engine_conf(spark)
    ev = scan(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.date_trunc("second", "ts").alias("tsec")
    )
    hist = scd2_history(ev, "user_id", "tsec", tiebreak="event_id")
    return hist.select(
        "user_id",
        "event_id",
        "value",
        F.col("tsec").cast("long").alias("valid_from_s"),
        F.col("valid_to").cast("long").alias("valid_to_s"),
        "is_current",
    )


def merge_rollup(
    base_agg: DataFrame, delta_agg: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental aggregate maintenance: fold a delta's partial
    aggregates into an existing rollup table without rescanning the
    base data.  Both inputs carry the SAME associative measure columns
    (counts as BIGINT, sums as exact DECIMAL partials); the merge is a
    union + re-aggregation — shuffle sized by the ROLLUP keyspace, not
    the fact table.  This is how a 100 TB daily rollup absorbs a new
    day: aggregate the new partition only, merge partials."""
    measures = [c for c in base_agg.columns if c not in keys]
    return (
        base_agg.unionByName(delta_agg)
        .groupBy(*keys)
        .agg(*[F.sum(m).alias(m) for m in measures])
    )


@declared(
    "q_rollup_incremental",
    oracle="""
    SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance, oracle-checked by EQUIVALENCE:
    the base rollup (events before Jan 15) merged with the delta's
    partial aggregates (events from Jan 15 on) must equal the full
    recompute over all events — which is exactly what the oracle runs.
    Partial sums stay DECIMAL(18,2) (exact, order-insensitive) until
    the final cast."""
    ensure_engine_conf(spark)
    ev = scan(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )

    base = partial(ev.filter(F.col("ts") < cutoff))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    merged = merge_rollup(base, delta, ["event_type", "day"])
    return merged.select(
        "event_type",
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )
