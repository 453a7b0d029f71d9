"""Scale-feature evidence tests: webhook sink batching (B5), bucketed
co-located joins (zero-shuffle recurring join), partition pruning on
the partitioned sink (B4)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from artemia_airflow_spark.catalog import scan
from artemia_airflow_spark.sources.http import webhook_sink
from tests.conftest import SF_SMOKE


def test_webhook_sink_batches_rows(spark, tmp_path):
    """foreachPartition POST batching: every row delivered exactly once,
    in batches no larger than batch_size.  The recorder writes to files
    (executor-side state can't flow back through closures)."""
    rec_dir = tmp_path / "posts"
    rec_dir.mkdir()

    def post(url, body):
        import uuid

        payload = json.loads(body)
        with open(os.path.join(str(rec_dir), uuid.uuid4().hex), "w") as f:
            json.dump(payload, f)
        return 200

    df = scan(spark, SF_SMOKE, "events").select("event_id", "event_type").limit(100)
    webhook_sink(df, "https://hook.example/x", post=post, batch_size=30)

    batches = []
    for fn in os.listdir(str(rec_dir)):
        with open(os.path.join(str(rec_dir), fn)) as f:
            batches.append(json.load(f))
    assert all(0 < len(b) <= 30 for b in batches)
    ids = sorted(r["event_id"] for b in batches for r in b)
    assert len(ids) == 100 and len(set(ids)) == 100


def test_bucketed_join_has_no_shuffle(spark):
    """bucketBy co-location: joining two tables bucketed on the same key
    must produce a SortMergeJoin with NO Exchange — the 100 TB recurring
    fact-fact join pattern (SCALE.md)."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = scan(spark, SF_SMOKE, "orders")
    li = scan(spark, SF_SMOKE, "lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        "b_orders", format="parquet", mode="overwrite"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
        "b_lineitem", format="parquet", mode="overwrite"
    )
    # broadcast would hide the point at this tiny SF; force SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        # and it still computes the right thing
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_sink_prunes_partitions(spark, tmp_path):
    """B4: reading one partition of a partitionBy sink scans only that
    directory (PartitionFilters in the plan)."""
    out = str(tmp_path / "orders_part")
    scan(spark, SF_SMOKE, "orders").write.partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    n_all = spark.read.parquet(out).count()
    n_f = back.count()
    assert 0 < n_f < n_all


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling, demonstrated at runtime: a join where 99%
    of left rows share one hot key must come back with the skewed
    partition split (skew=true in the executed plan) instead of one
    straggler task owning the whole key — the runtime complement to the
    explicit salted_join operator."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        # per-row high-entropy payload: a constant literal would be
        # projected after the join (constant folding) and the bare join
        # keys compress below the skew threshold in the shuffle files
        pad = F.md5(F.col("id").cast("string"))
        left = spark.range(100_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            pad.alias("payload"),
        )
        right = spark.range(1000).select(F.col("id").alias("k"), pad.alias("rpad"))
        joined = left.join(right, "k")
        # execute THIS DataFrame's QueryExecution (a write or count()
        # spawns its own) so its adaptive plan finalizes before
        # inspection; the collected rows are discarded
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
