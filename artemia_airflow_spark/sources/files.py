"""File sources & sinks beyond the parquet catalog (B2, B4).

Schema-applied CSV/JSON reads and partitioned parquet writes.  The
declared queries are rows-only round-trips (write -> re-read -> agg):
value equality is covered by the relational oracle suite; these check
the I/O path itself.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from artemia_airflow_spark.catalog import scan
from artemia_airflow_spark.plans.registry import declared
from artemia_airflow_spark.session import ensure_engine_conf


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """B2: schema-applied CSV read (never inferSchema at scale — schema
    inference is an extra full pass over 100 TB)."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """B2: schema-applied JSON-lines read."""
    return spark.read.schema(schema).json(path)


def write_parquet(
    df: DataFrame, path: str, *, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """B4: partitioned parquet sink.  ``partition_by`` low-cardinality
    keys only (each value = a directory); at 100 TB add
    .sortWithinPartitions on the query key for row-group skipping."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


@declared("q_sink_parquet")
def q_sink_parquet(spark, sf_dir):
    """B4 (rows-only): write orders partitioned by status to a temp dir,
    re-read one partition — exercises partition pruning on read (the
    scan touches only the o_orderstatus=F directory)."""
    ensure_engine_conf(spark)
    out = os.path.join(tempfile.gettempdir(), "aas_sink_parquet")
    o = scan(spark, sf_dir, "orders")
    write_parquet(o, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    return back.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


def write_partitioned_by_month(
    spark: SparkSession, sf_dir: str, out: str
) -> None:
    """Write orders in the shard-by-date layout a 100 TB corpus lives
    on: one directory per month (~80 partitions over the 1992-1998
    span — low cardinality, directory-sized files)."""
    o = scan(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    write_parquet(o, out, partition_by=["o_month"])


@declared("q_sink_partitioned")
def q_sink_partitioned(spark, sf_dir):
    """B4/§4.2 (rows-only): partitioned write + partition-pruned read.

    Writes orders partitioned by month, re-reads with a month-range
    partition filter — the scan's PartitionFilters prune to the 12
    matching directories (asserted in tests/test_plans.py) so the read
    cost is proportional to the queried window, not the table.  This is
    the layout dynamic partition pruning (DPP) rides on; the DPP join
    itself is pinned by test_partitioned_read_dynamic_pruning."""
    ensure_engine_conf(spark)
    out = os.path.join(tempfile.gettempdir(), "aas_sink_partitioned")
    write_partitioned_by_month(spark, sf_dir, out)
    back = spark.read.parquet(out).filter(
        (F.col("o_month") >= "1995-01") & (F.col("o_month") <= "1995-12")
    )
    return back.groupBy("o_month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@declared("q_source_json")
def q_source_json(spark, sf_dir):
    """B2 (rows-only): JSON round-trip — events -> JSON-lines on disk ->
    schema-applied read-back -> per-type counts."""
    ensure_engine_conf(spark)
    out = os.path.join(tempfile.gettempdir(), "aas_source_json")
    e = scan(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", F.col("ts").cast("string").alias("ts_str")
    )
    e.write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts_str", T.StringType()),
        ]
    )
    back = read_json(spark, out, schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.min("event_id").alias("min_id")
    )
