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

from pyspark.sql import DataFrame, SparkSession
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
    upstream with exact dedup (operators/dedup.py) when in doubt.
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
