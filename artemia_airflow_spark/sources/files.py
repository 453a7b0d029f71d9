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
from artemia_airflow_spark.functions.core import process_scratch_dir
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


@declared(
    "q_sink_parquet",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q_sink_parquet(spark, sf_dir):
    """B4, ORACLE-CHECKED (round-5 upgrade): write orders partitioned
    by status to a temp dir, re-read one partition — exercises
    partition pruning on read (the scan touches only the
    o_orderstatus=F directory).  The write-then-read round-trip is
    differentially checkable because parquet round-trips these types
    losslessly: the oracle computes the same aggregate straight from
    the source table."""
    ensure_engine_conf(spark)
    out = os.path.join(process_scratch_dir("aas_sink_parquet_"), "t")
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


@declared(
    "q_sink_partitioned",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-12'
    GROUP BY 1
    """,
)
def q_sink_partitioned(spark, sf_dir):
    """B4/§4.2, ORACLE-CHECKED (round-6 upgrade from rows-only):
    partitioned write + partition-pruned read.

    Writes orders partitioned by month, re-reads with a month-range
    partition filter — the scan's PartitionFilters prune to the 12
    matching directories (asserted in tests/test_plans.py) so the read
    cost is proportional to the queried window, not the table.  This is
    the layout dynamic partition pruning (DPP) rides on; the DPP join
    itself is pinned by test_partitioned_read_dynamic_pruning.
    Differentially checkable because the parquet round-trip is lossless
    for these types: the oracle computes the identical aggregate
    straight from the source table (o_month string == the partition
    directory value Spark reads back)."""
    ensure_engine_conf(spark)
    out = os.path.join(process_scratch_dir("aas_sink_partitioned_"), "t")
    write_partitioned_by_month(spark, sf_dir, out)
    back = spark.read.parquet(out).filter(
        (F.col("o_month") >= "1995-01") & (F.col("o_month") <= "1995-12")
    )
    return back.groupBy("o_month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


def write_bucketed_table(
    df: DataFrame, table: str, *, bucket_col: str, num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """B4 scale tier: bucketed (and optionally sorted) parquet table.

    Bucketing pre-shuffles the table ONCE at write time: rows are hashed
    on ``bucket_col`` into ``num_buckets`` files per partition, and the
    bucket spec is recorded in the catalog.  Every later join or
    aggregation on that column reads bucket i against bucket i with no
    Exchange on that side — at 100 TB the difference between
    re-shuffling two fact tables on every query and a map-side merge.
    ``sort_col`` additionally sorts within buckets so sort-merge joins
    skip their sort."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a fresh session's in-memory catalog does not know about a table
    # directory left in the warehouse by an earlier session; saveAsTable
    # then fails with LOCATION_ALREADY_EXISTS — clear the local location
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme in ("file", ""):
        import shutil

        shutil.rmtree(os.path.join(wh.path, table.lower()), ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


@declared(
    "q_sink_bucketed",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
)
def q_sink_bucketed(spark, sf_dir):
    """B4/§4.2: bucketed co-located fact⋈fact join.  orders and lineitem
    are both written bucketed 16 ways on the order key; the join plan
    has NO shuffle on either input (asserted in tests/test_plans.py —
    the only Exchange left is the small post-join aggregation)."""
    ensure_engine_conf(spark)
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(o, "aas_orders_bkt", bucket_col="o_orderkey", sort_col="o_orderkey")
    write_bucketed_table(li, "aas_lineitem_bkt", bucket_col="l_orderkey", sort_col="l_orderkey")
    ob = spark.table("aas_orders_bkt")
    lb = spark.table("aas_lineitem_bkt")
    return (
        ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    )


@declared(
    "q_source_json",
    oracle="""
    SELECT event_type, COUNT(*) AS n, CAST(MIN(event_id) AS BIGINT) AS min_id
    FROM events GROUP BY event_type
    """,
)
def q_source_json(spark, sf_dir):
    """B2, ORACLE-CHECKED (round-6 upgrade from rows-only): JSON
    round-trip — events -> JSON-lines on disk -> schema-applied
    read-back -> per-type counts.  Differentially checkable because
    the round-trip is lossless for these columns (ids/strings exact;
    the aggregate uses only them), so the oracle computes the same
    aggregate straight from the source table."""
    ensure_engine_conf(spark)
    out = os.path.join(process_scratch_dir("aas_source_json_"), "t")
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


@declared(
    "q_sink_orc",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sink_orc(spark, sf_dir):
    """ORC sink + source round-trip (r14), ORACLE-CHECKED: Spark's
    second first-class columnar format (native ORC reader/writer, no
    extra packages) — a lineitem slice written to ORC, re-read, and
    aggregated with the DECIMAL money recipe.  ORC round-trips these
    types losslessly, and the write predicate re-applies on read (ORC
    pushes it to stripe/row-group indexes), so the oracle computes
    the identical aggregate straight from the parquet source; a hash
    match proves the format conversion is value-neutral end to end.
    Scratch lives under the reaped process dir (the q_sim_index
    precedent — never a fixed /tmp name)."""
    ensure_engine_conf(spark)
    out = os.path.join(process_scratch_dir("aas_sink_orc_"), "lineitem")
    li = scan(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
    )
    li.select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"
    ).write.mode("overwrite").orc(out)
    back = spark.read.orc(out).filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
    )
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
        .alias("sum_qty"),
    )


@declared(
    "q_compact_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM orders WHERE o_orderkey % 10 = 0
    GROUP BY o_orderpriority
    """,
)
def q_compact_roundtrip(spark, sf_dir):
    """Small-file compaction value-neutrality (r14), ORACLE-CHECKED:
    an orders slice lands in a TxTable through five separate commits
    (a create plus four appends — the small-file accretion every
    long-running ingest suffers), ``compact()`` bin-packs the live files in one
    data_change=false commit, and the aggregate runs over the
    COMPACTED snapshot — the oracle computes it straight from the
    source, so a hash match proves compaction rewrote bytes, not
    rows.  The file-count drop and time-travel survival are pinned by
    the storage tests; this face puts the value-neutrality claim
    under the driver's differential gate."""
    from artemia_airflow_spark.sources.txtable import TxTable

    ensure_engine_conf(spark)
    root = os.path.join(process_scratch_dir("aas_compact_"), "orders")
    o = scan(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 10 == 0
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")
    t = TxTable.create(
        spark, o.filter(F.col("o_orderkey") % 50 == 0), root,
        key_col="o_orderkey",
    )
    for r in range(1, 5):
        t.append(o.filter(
            (F.col("o_orderkey") % 50 == 10 * r)
        ))
    before = len(t.files())
    t.compact(target_files=2)
    after = len(t.files())
    if after >= before:  # not assert: -O must never strip this pin
        raise ValueError(
            f"q_compact_roundtrip: compaction did not reduce files "
            f"({before} -> {after}) — the value-neutrality face would "
            "be green without testing anything"
        )
    return t.snapshot().groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .alias("sum_price"),
    )
