"""Relational operator surface (SURVEY.md §2-B B1, B6-B39, B51).

Each declared query is a small, fully-declarative DataFrame (or SQL)
plan — no collects, no Python row loops — so Catalyst applies pushdown,
pruning, join selection and whole-stage codegen, and the identical code
scales from sf0.001 to a 1000-executor cluster.

Reference parity notes: the reference's only in-repo data operations are
JSON field extraction + predicate evaluation on HTTP responses
(dags/update_tr_from_ex_dag.py:21-39) and a top-1-by-recency fetch
(dags/update_tr_from_ex_dag.py:53,59-63); those generalize here to
q_fn_json, q_filter/q_case and q_topk/q_join_asof respectively.  The
rest of the inventory is the driver-mandated engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from artemia_airflow_spark.catalog import run_sql, scan
from artemia_airflow_spark.functions.core import DEC, dec_avg, dec_sum, spread_for_compute, ts_second
from artemia_airflow_spark.plans.registry import declared
from artemia_airflow_spark.session import ensure_engine_conf


# --------------------------------------------------------------------------
# Scans / projections / filters (B1, B6-B9)
# --------------------------------------------------------------------------

@declared("q_scan", oracle="SELECT r_regionkey, r_name FROM region")
def q_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: bare parquet scan (vectorized reader; trivially parallel by
    row-group at scale)."""
    ensure_engine_conf(spark)
    return scan(spark, sf_dir, "region").select("r_regionkey", "r_name")


@declared(
    "q_project",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name, c_nationkey AS nationkey,
           c_acctbal + 100.0 AS bal_plus
    FROM customer
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: select/rename/compute — column pruning reaches the scan
    (ReadSchema shows only the 4 referenced columns)."""
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        (F.col("c_acctbal") + F.lit(100.0)).alias("bal_plus"),
    )


@declared(
    "q_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: conjunctive predicate — pushed to the parquet scan
    (PushedFilters: GreaterThan(l_quantity,30), EqualTo(l_returnflag,R))."""
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@declared(
    "q_filter_pred",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#7', 'Brand#13')
      AND p_size BETWEEN 10 AND 30
      AND p_name LIKE '%widget%'
      AND p_type IS NOT NULL
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: IN / BETWEEN / LIKE / IS NOT NULL predicates."""
    ensure_engine_conf(spark)
    p = scan(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")
        & F.col("p_size").between(10, 30)
        & F.col("p_name").like("%widget%")
        & F.col("p_type").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@declared(
    "q_case",
    oracle="""
    SELECT CASE WHEN o_orderstatus = 'F' THEN 'done'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'pending' END AS status_bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
)
def q_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: CASE expression — mirrors the reference's 3-way status branch
    (dags/update_tr_from_ex_dag.py:25-35) as a data-plane conditional."""
    ensure_engine_conf(spark)
    o = scan(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_orderstatus") == "F", "done")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
    )
    return (
        o.select(bucket.alias("status_bucket"), "o_totalprice")
        .groupBy("status_bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Joins (B10-B17)
# --------------------------------------------------------------------------

@declared(
    "q_join_inner",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: 3-way inner equi-join. Catalyst picks broadcast-hash for the
    small dims automatically (autoBroadcastJoinThreshold); at 100 TB the
    orders<->customer edge becomes a shuffled hash/SMJ on the key while
    nation stays broadcast."""
    ensure_engine_conf(spark)
    o = scan(spark, sf_dir, "orders")
    c = scan(spark, sf_dir, "customer")
    n = scan(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice").alias("revenue"))
    )


@declared(
    "q_join_broadcast",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11: explicit broadcast hint — `part` is a dimension table; at
    100 TB broadcasting it avoids shuffling the (huge) lineitem fact.
    The explicit hint makes the physical plan deterministic regardless
    of stats."""
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem")
    p = scan(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"), dec_sum("l_quantity").alias("sum_qty"))
    )


@declared(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 (left): null-extending join + count(col) ignoring nulls."""
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@declared(
    "q_join_full",
    oracle="""
    SELECT n_nationkey, n_name, s_suppkey, s_name
    FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 (full): both-sides null extension."""
    ensure_engine_conf(spark)
    n = scan(spark, sf_dir, "nation")
    s = scan(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "full").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


@declared(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13: left-semi join == EXISTS. Semi joins only ship the join key
    of the probe side — the cheapest existence check at scale."""
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@declared(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: left-anti join == NOT EXISTS."""
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@declared(
    "q_join_range",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_late,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS late_qty
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15: equi key + range residual. Spark executes the equi part as a
    hash/SMJ and applies the range predicate as a post-join filter — no
    cartesian blow-up at scale."""
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem")
    o = scan(spark, sf_dir, "orders")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late"), dec_sum("l_quantity").alias("late_qty"))
    )


@declared(
    "q_join_asof",
    oracle="""
    SELECT event_id, user_id, o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
    FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id
                   AND o.o_orderdate <= date_trunc('second', e.ts)
    ) t WHERE rn = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: as-of join — latest order at-or-before each event's time,
    per user (ties -> max o_orderkey; hazard H4 avoided by using the
    identical window formulation on both engines).

    Uses :func:`artemia_airflow_spark.operators.joins.asof_join`; see
    that module for the 100 TB plan-shape discussion.
    """
    ensure_engine_conf(spark)
    from artemia_airflow_spark.operators.joins import asof_join

    e = scan(spark, sf_dir, "events").select(
        "event_id", "user_id", ts_second("ts").alias("ts_sec")
    )
    o = scan(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    joined = asof_join(
        e, o,
        left_on="user_id", right_on="o_custkey",
        left_time="ts_sec", right_time="o_orderdate",
        tiebreak="o_orderkey", left_id="event_id",
    )
    return joined.select(
        "event_id", "user_id", "o_orderkey",
        # o_orderdate is TIMESTAMP_NTZ (naive parquet); NTZ->LTZ under
        # the UTC session then ->long == DuckDB epoch() on the naive value
        F.col("o_orderdate").cast("timestamp").cast("long").alias("order_epoch"),
    )


@declared(
    "q_join_cross",
    oracle="""
    SELECT r_name, COUNT(*) AS n_pairs
    FROM region CROSS JOIN nation
    GROUP BY r_name
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: guarded cartesian (two tiny dims)."""
    ensure_engine_conf(spark)
    r = scan(spark, sf_dir, "region")
    n = scan(spark, sf_dir, "nation")
    return r.crossJoin(n).groupBy("r_name").agg(F.count(F.lit(1)).alias("n_pairs"))


# --------------------------------------------------------------------------
# Aggregations (B18-B22)
# --------------------------------------------------------------------------

@declared(
    "q_agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18: keyless aggregate — Spark plans partial+final HashAggregate
    (map-side combine), so the shuffle carries one row per partition."""
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dec_sum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@declared(
    "q_agg_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6)))
               AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 — FLAGSHIP: TPC-H-Q1-style pricing summary.

    Scan -> pushed filter -> partial HashAggregate (map-side, 6 groups)
    -> 6-row shuffle -> final HashAggregate.  The shuffle volume is
    O(groups x partitions) regardless of input size — exactly the shape
    that survives 100 TB.

    The 128-bit decimal sums are the CPU cost here, and the fixture
    files carry a single parquet row group (scan parallelism 1), so the
    partial agg is spread across cores first; `spread_for_compute` is a
    no-op on real multi-split inputs.
    """
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    li = li.select(
        "l_returnflag", "l_linestatus", "l_shipdate",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    )
    return (
        spread_for_compute(li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            # Products of 2-dp columns are exact 4-6-dp decimals; casting
            # to scale 6 puts the binary double ~1e-10 from the true
            # value — far from any rounding midpoint — so Spark's
            # string-based and DuckDB's binary-based double->decimal
            # rounding agree (scale 2 would sit ON .xx5 midpoints).
            F.sum(disc_price.cast("decimal(28,6)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(28,6)")).cast("double").alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@declared(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: exact distinct aggregation (expand + two-phase agg under the
    hood; for 100 TB cardinality estimates use q_agg_approx/HLL)."""
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@declared("q_agg_approx")
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21 (rows-only): HyperLogLog++ cardinality — the 100 TB-scale
    substitute for exact COUNT DISTINCT; sketch merges are associative
    so the shuffle stays tiny.  Not oracle-checked (HLL != DuckDB's
    approx_distinct internals)."""
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@declared(
    "q_agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: ROLLUP over the region->nation hierarchy."""
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer")
    n = scan(spark, sf_dir, "nation")
    r = scan(spark, sf_dir, "region")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dec_sum("c_acctbal").alias("sum_bal"))
    )


@declared(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: CUBE — all grouping-set combinations."""
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n_rows"))


# --------------------------------------------------------------------------
# Window functions (B23-B25)
# --------------------------------------------------------------------------

@declared(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn,
           CAST(dr AS INT) AS dr, CAST(quartile AS INT) AS quartile
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER w AS INT) AS rn,
             dense_rank() OVER w AS dr,
             ntile(4) OVER w AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) t WHERE rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: ranking window family — top-3 orders per customer with a
    unique tiebreak (hazard H3)."""
    ensure_engine_conf(spark)
    o = scan(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.dense_rank().over(w).alias("dr"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


@declared(
    "q_window_lag",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id)
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24: lag/lead per user over event time (second-truncated, H1)."""
    ensure_engine_conf(spark)
    e = scan(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(ts_second("ts"), F.col("event_id"))
    return e.select(
        "user_id", "event_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@declared(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: explicit-frame running sum; decimal accumulation makes the
    prefix sums exact (H2) so they match DuckDB's segment-tree windows."""
    ensure_engine_conf(spark)
    o = scan(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


# --------------------------------------------------------------------------
# Sort / limit / top-k (B26-B27)
# --------------------------------------------------------------------------

@declared(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26+B27: global top-k. Spark plans TakeOrderedAndProject — each
    partition keeps its local top-10, the driver merges; no global sort
    at any scale."""
    ensure_engine_conf(spark)
    o = scan(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Set operations (B28-B30)
# --------------------------------------------------------------------------

@declared(
    "q_set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28: UNION DISTINCT."""
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = scan(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@declared(
    "q_set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29: INTERSECT (distinct semantics)."""
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = scan(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@declared(
    "q_set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: EXCEPT (distinct semantics — `subtract`, not `exceptAll`,
    which would only remove one occurrence per right-side row)."""
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = scan(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# --------------------------------------------------------------------------
# Scalar function families (B31-B37)
# --------------------------------------------------------------------------

@declared(
    "q_fn_string",
    oracle="""
    SELECT doc_id,
           lower(substr(text, 1, 12)) AS prefix12,
           CAST(length(text) AS INT) AS text_len,
           concat(lang, '-', source) AS lang_source,
           upper(lang) AS lang_up,
           replace(source, 'src', 'S') AS source_short
    FROM documents
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: string function family (reference analogue: f-string URL
    building, dags/update_tr_from_ex_dag.py:52,121)."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 12)).alias("prefix12"),
        F.length("text").alias("text_len"),
        F.concat_ws("-", "lang", "source").alias("lang_source"),
        F.upper("lang").alias("lang_up"),
        F.regexp_replace("source", "src", "S").alias("source_short"),
    )


@declared(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mth,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
             AS days_since
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: date/time function family (reference analogue: cron +
    pendulum tz arithmetic, dags/update_tr_from_ex_dag.py:75,82-83)."""
    ensure_engine_conf(spark)
    o = scan(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
    )


@declared(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           abs(l_discount - 0.05) AS disc_dev,
           sqrt(l_extendedprice) AS price_sqrt,
           l_orderkey % 7 AS mod7
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33: math function family (floor/ceil/abs/sqrt/mod — all IEEE-
    deterministic; pow intentionally avoided, libm variance)."""
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_orderkey") % 7).alias("mod7"),
    )


@declared(
    "q_fn_array",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents) t
    GROUP BY token
    HAVING COUNT(*) >= 3
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34+B54: split -> explode (the UDTF shape: 1 row -> N rows) ->
    re-aggregate."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
    )


@declared(
    "q_fn_map",
    oracle="""
    SELECT doc_id,
           'lang,source' AS meta_keys,
           lang AS meta_lang,
           n_chars AS info_chars
    FROM documents
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: map/struct constructors + field access.  The Spark side
    genuinely round-trips through MAP and STRUCT values; the oracle
    states the expected post-access scalars directly (DuckDB's map
    construction syntax differs, but the OUTPUT contract is plain
    columns, so the differential check still pins construction, key
    order, and field access).

    The declared face emits only scalar columns (``meta_keys`` is
    ``array_join``-flattened): the driver canonicalizer sorts result
    columns with pandas and raw array cells are unhashable (r2 driver
    error `TypeError: unhashable type: 'list'`)."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")).alias("meta"),
        F.named_struct(F.lit("n_chars"), F.col("n_chars"), F.lit("lang"), F.col("lang")).alias(
            "info"
        ),
    ).select(
        "doc_id",
        F.array_join(F.map_keys("meta"), ",").alias("meta_keys"),
        F.col("meta")["lang"].alias("meta_lang"),
        F.col("info.n_chars").alias("info_chars"),
    )


@declared(
    "q_fn_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: JSON field extraction — the reference's ONLY real data
    operation (`response.json().get("status")`,
    dags/update_tr_from_ex_dag.py:21-23), generalized to a columnar op."""
    ensure_engine_conf(spark)
    e = scan(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
    )


@declared(
    "q_fn_null",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0)
             AS urgent_spend,
           COUNT(o_orderkey) AS n_urgent,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_nullable
    FROM customer
    LEFT JOIN (SELECT * FROM orders
               WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F') o
      ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def q_fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: coalesce/nullif over genuine left-join nulls (reference
    analogue: defensive `.get()` chains, dags/update_tr_from_ex_dag.py:22-23)."""
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.coalesce(dec_sum("o_totalprice"), F.lit(0.0)).alias("urgent_spend"),
            F.count("o_orderkey").alias("n_urgent"),
        )
        .withColumn("seg_nullable", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")))
    )


# --------------------------------------------------------------------------
# Subqueries (B38-B39) — SQL surface via spark.sql so Catalyst's
# subquery rewrites (decorrelation -> semi join) are exercised.
# --------------------------------------------------------------------------

_SUBQ_SCALAR_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders
)
"""


@declared("q_subq_scalar", oracle=_SUBQ_SCALAR_SQL)
def q_subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B38: scalar subquery (orders above deterministic global mean).
    Identical SQL text runs on both engines."""
    return run_sql(spark, sf_dir, _SUBQ_SCALAR_SQL)


_SUBQ_IN_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


@declared("q_subq_in", oracle=_SUBQ_IN_SQL)
def q_subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39: IN subquery — Catalyst rewrites to a left-semi join
    (RewritePredicateSubquery); same SQL text on both engines."""
    return run_sql(spark, sf_dir, _SUBQ_IN_SQL)


# --------------------------------------------------------------------------
# UDF surface (B51-B53)
# --------------------------------------------------------------------------

@declared(
    "q_udf_scalar",
    oracle="""
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
    FROM documents
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B51: row-at-a-time Python UDF (the data-plane PythonOperator
    analogue, dags/update_tr_from_ex_dag.py:107-116).  Deliberately the
    slow path — kept off hot paths; q_pandas_* show the vectorized way."""
    ensure_engine_conf(spark)

    @F.udf("int")
    def token_count(text: str) -> int:
        return len(text.split(" "))

    d = scan(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens"))


@declared(
    "q_pandas_norm",
    oracle="""
    SELECT doc_id, lang, n_chars,
           round((n_chars - avg(n_chars) OVER (PARTITION BY lang)) /
                 CASE WHEN stddev_pop(n_chars) OVER (PARTITION BY lang) = 0
                      THEN 1.0
                      ELSE stddev_pop(n_chars) OVER (PARTITION BY lang) END,
                 6) AS z_chars
    FROM documents
    """,
)
def q_pandas_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B53: grouped applyInPandas — per-lang z-score of doc length
    (Arrow-batched; each group processed as one pandas frame).  Rounded
    to 6dp so the pandas kernel is value-comparable to the SQL window
    formulation (population std, degenerate groups -> divide by 1)."""
    ensure_engine_conf(spark)
    import pandas as pd

    d = scan(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def znorm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        std = pdf.n_chars.std(ddof=0)
        z = (pdf.n_chars - pdf.n_chars.mean()) / (std if std else 1.0)
        return pdf.assign(z_chars=z.round(6))

    return d.groupBy("lang").applyInPandas(
        znorm, "doc_id long, lang string, n_chars long, z_chars double"
    )
