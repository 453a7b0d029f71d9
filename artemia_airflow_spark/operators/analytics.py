"""Composite analytic queries: full TPC-H-style multi-join reports plus
unpivot and calendar gap-fill.

The single-operator queries (relational.py / relational2.py) prove each
primitive; these prove the primitives COMPOSE — multi-way join trees
where Catalyst must pick broadcast vs shuffle per edge, aggregate above
them, and take deterministic top-k.  This is the shape of every real
report a user of the reference's externalized pipeline would run
(dags/update_tr_from_ex_dag.py:88-90 delegates exactly this kind of
batch analytics to an external repo).

Scale notes: broadcast hints are pinned ONLY on true dims — nation (25
rows) and region (5 rows), bounded at every sf.  Orders, customer AND
supplier are sf-linear in TPC-H (sf*1.5M / sf*150k / sf*10k rows) and
must NOT be hint-broadcast — those edges shuffle on their join keys,
and AQE's runtime join-strategy switch upgrades them to broadcast only
when a filter actually leaves a small side.  Fact-side aggregations
partial-aggregate map-side because decimal sums are associative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from artemia_airflow_spark.catalog import scan
from artemia_airflow_spark.functions.core import spread_for_compute
from artemia_airflow_spark.plans.registry import declared
from artemia_airflow_spark.session import ensure_engine_conf

_REVENUE_DEC = "decimal(28,6)"


def _revenue() -> "F.Column":
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_REVENUE_DEC)


@declared(
    "q_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): 3-way join, revenue agg, top-10.

    Plan shape: orders and customer are FACT-SCALE tables (orders is
    10x customer; ~1.5B rows at sf1000) so neither carries a broadcast
    hint — the fact edges shuffle on their join keys and AQE converts
    to broadcast at runtime when a filtered side turns out small.  The
    only other wide exchange is the per-orderkey aggregation, then
    TakeOrderedAndProject.  Deterministic top-k: l_orderkey is unique
    per group (H3).
    """
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = scan(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = scan(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "orderdate", "l_orderkey")
        .limit(10)
    )


@declared(
    "q_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                                AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-way join including the
    customer-nation == supplier-nation locality predicate.

    Broadcast hints only on the TRUE dims — nation (25 rows) and
    region (5).  Orders, customer and supplier are sf-linear
    (sf*1.5M / sf*150k / sf*10k rows) so those edges shuffle on their
    keys; AQE may still broadcast them at runtime when a filter
    leaves a small side.  The final aggregate is 25 groups.
    """
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = scan(spark, sf_dir, "lineitem")
    s = scan(spark, sf_dir, "supplier")
    n = scan(spark, sf_dir, "nation")
    r = scan(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        # supplier grows linearly with sf (~10M rows / >1GB at sf1000), so
        # no pinned broadcast hint: the edge shuffles on its key and AQE
        # upgrades to broadcast at runtime only when it actually fits
        # under autoBroadcastJoinThreshold.
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@declared(
    "q_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): lost revenue per customer
    over a quarter+, top-20.  Returnflag filter pushes to the lineitem
    scan; only nation (25 rows) carries a broadcast hint — orders and
    customer are fact-scale and shuffle on their keys (AQE upgrades to
    broadcast at runtime if the quarter filter leaves a small side);
    c_custkey tiebreaks the top-k (H3)."""
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = scan(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = scan(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@declared(
    "q_unpivot",
    oracle="""
    WITH long AS (
      SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT metric,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM long GROUP BY metric
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (DataFrame.unpivot / melt) + per-metric
    rollup.  Unpivot is a zero-shuffle map-side expansion (x4 rows);
    the only exchange is the 4-group aggregate."""
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem")
    return (
        spread_for_compute(li)
        .unpivot(
            [],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "metric",
            "value",
        )
        .groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(_REVENUE_DEC)).cast("double").alias("total"),
        )
    )


@declared(
    "q_gapfill",
    oracle="""
    WITH cal AS (
      SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                         INTERVAL 1 DAY)) AS DATE) AS day
    ), daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-04-01'
      GROUP BY day
    )
    SELECT cal.day, CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_orders
    FROM cal LEFT JOIN daily USING (day)
    """,
)
def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: dense daily calendar (sequence + explode)
    left-joined to per-day order counts, missing days as 0.

    The calendar is generated, not scanned — one row exploded into the
    date range, broadcast against the aggregated (already tiny) daily
    counts.  The standard resample/asfreq primitive for time-series
    feature pipelines."""
    ensure_engine_conf(spark)
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    daily = (
        scan(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cal.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n_orders")
    )


@declared(
    "q_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice, l_discount
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations by year):
    5-way join where ONLY the true dims broadcast (the two nation
    aliases); the lineitem⋈supplier⋈orders⋈customer sf-linear edges
    shuffle on their keys — the plan that survives sf1000."""
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    )
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = scan(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = scan(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = scan(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        # supplier: no pinned broadcast (sf-linear table; AQE decides).
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair | rpair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@declared(
    "q_tpch_q14",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           round(CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
                 ELSE CAST(0 AS DECIMAL(28,6)) END)
              / SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
              AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY ship_month
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion revenue share by ship month): fact ⋈
    broadcast(part) — part is a true dim — with a conditional DECIMAL
    aggregate; the division happens on the exact decimal sums so the
    ratio hashes identically cross-engine."""
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    p = scan(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue()
    zero = F.lit(0).cast("decimal(28,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month"))
        .agg(
            F.round(
                (
                    F.lit(100.0)
                    * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                    / F.sum(rev)
                ).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@declared(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS over
    the fact-fact orders⋈lineitem edge, counted by priority.

    The fixture's lineitem has no l_commitdate/l_receiptdate, so the
    "late order" predicate is adapted to l_shipdate > o_orderdate + 30d
    — same plan shape as spec Q4: a LEFT SEMI join on the orderkey
    (equi key + residual non-equi condition), which at sf1000 shuffles
    both facts on l_orderkey/o_orderkey once and never materializes the
    multiplicity of matching lineitems.  The quarter filter on orders
    reaches the parquet scan (PushedFilters) and prunes before the
    shuffle; the final aggregate is 5 groups.
    """
    ensure_engine_conf(spark)
    o = scan(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@declared(
    "q_tpch_q17",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): correlated
    scalar subquery — per-part average quantity — against the same
    fact table.

    The fixture's part has no p_container, so the dim filter is
    p_brand alone.  Spark-first decorrelation: (1) semi-join lineitem
    down to the filtered parts FIRST (brand selects ~1/25 of parts, so
    the per-part AVG is computed over ~1/25 of lineitem, not all of
    it); (2) groupBy(l_partkey).avg as the threshold table — one row
    per qualifying part; (3) rejoin and filter l_quantity < 0.2*avg.
    No pinned broadcasts: the brand's part list and the threshold
    table are sf-linear (|part|/25 rows), so AQE upgrades those edges
    to broadcast at runtime only while they actually fit — at any sf
    the worst case is one shuffle of the brand-pruned fact on
    l_partkey, reused by both the threshold and probe sides.

    Determinism (mirrors q_tpch_q18/q22): both aggregates cast per-row
    to DECIMAL(18,2) before summing — the decimal sum is exact at any
    sf and partition order, and the remaining double ops (one
    division, one multiply) are single correctly-rounded IEEE steps
    both engines evaluate identically.  A plain double SUM here would
    accumulate partition-order-dependent ulps at scale.
    """
    ensure_engine_conf(spark)
    p = scan(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4").select(
        "p_partkey"
    )
    li = scan(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # prune the fact to the brand's parts once; reuse for threshold + probe
    pruned = li.join(p, li.l_partkey == p.p_partkey, "left_semi")
    thresh = pruned.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_cap")
    )
    return (
        pruned.alias("l")
        .join(thresh.alias("t"), F.col("l.l_partkey") == F.col("t.l_partkey"))
        .filter(F.col("l.l_quantity") < F.col("qty_cap"))
        .agg(
            (
                F.sum(F.col("l.l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@declared(
    "q_tpch_q18",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN-subquery with
    HAVING over the same fact table, top-100.

    Spark-first decorrelation: the per-order quantity sum is computed
    ONCE (groupBy l_orderkey — one fact shuffle, map-side partial agg),
    filtered to big orders, and reused as BOTH the IN-subquery filter
    and the output's total_qty — the naive plan scans/aggregates
    lineitem twice.  The surviving orders (rare: HAVING > 250 keeps a
    few % at any sf) join orders then customer; AQE broadcasts the
    tiny filtered side at runtime.  o_orderkey tiebreaks the top-k
    (H3).
    """
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__qty"))
        .filter(F.col("__qty") > 250)
    )
    o = scan(spark, sf_dir, "orders")
    c = scan(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            F.col("__qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@declared(
    "q_tpch_q19",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    OR-of-ANDs across both join sides.

    The fixture's part has no p_container, so the clauses branch on
    p_brand/p_size.  Catalyst extracts the common implied predicates:
    the part side prunes to the three brands at the SCAN
    (PushedFilters on p_brand IN), the lineitem side to the quantity
    hull [1,40] — so the join's input is pre-filtered on both sides
    and only the residual OR evaluates post-join.  One fact shuffle on
    l_partkey at worst; AQE broadcasts the brand-pruned part side when
    it fits.
    """
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = scan(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@declared(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the double
    correlated subquery — EXISTS(another supplier in the order) AND
    NOT EXISTS(another LATE supplier in the order).

    The fixture's lineitem has no l_commitdate/l_receiptdate, so
    "late" is adapted to l_shipdate > o_orderdate + 60d (the residual
    references the ORDER's date, which is why the naive plan scans
    lineitem three times with a correlated probe each).  Spark-first
    decorrelation: join lineitem⋈orders('F') ONCE, then per-order
    WINDOW aggregates compute both existence tests in the same pass —
    n_supp >= 2 ⟺ the EXISTS, and n_late_supp == 1 (given l1 itself
    is late) ⟺ the NOT EXISTS.  Windows (not groupBy + rejoin)
    because Catalyst does not dedupe common subplans: an agg + rejoin
    of the same join re-EXECUTES the join twice (verified in the
    formatted plan), while the two windows share one exchange on
    l_orderkey — one fact join, one shuffle, no correlated re-scans.
    The supplier name attach is an sf-linear edge left to AQE.
    s_name tiebreaks the top-k (H3).
    """
    ensure_engine_conf(spark)
    o = scan(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = scan(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "__late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    w = Window.partitionBy("o_orderkey")
    waiting = (
        lo.withColumn(
            "__n_supp", F.size(F.collect_set("l_suppkey").over(w))
        )
        .withColumn(
            "__n_late_supp",
            F.size(
                F.collect_set(F.when(F.col("__late"), F.col("l_suppkey"))).over(w)
            ),
        )
        .filter(
            F.col("__late") & (F.col("__n_supp") >= 2) & (F.col("__n_late_supp") == 1)
        )
        .select("l_suppkey")
    )
    s = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@declared(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): left OUTER
    join with a predicate in the JOIN CONDITION (not WHERE — zero-order
    customers must survive with c_count = 0), then two stacked
    aggregations.

    The fixture's orders has no o_comment, so the spec's NOT LIKE
    comment filter becomes an o_orderpriority exclusion — same plan
    shape.  At scale: one fact-fact outer shuffle on the customer key;
    the first aggregate collapses to |customer| rows (COUNT(col)
    correctly skips the outer join's null-extended rows), the second to
    the tiny distinct-count domain.  Both partial-aggregate map-side.
    """
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer").select("c_custkey")
    o = scan(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@declared(
    "q_tpch_q22",
    oracle="""
    SELECT c_nationkey AS cntry,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                              / COUNT(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY cntry
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): uncorrelated scalar
    subquery (positive-balance average) + NOT EXISTS anti-join against
    the fact, aggregated by country.

    Fixture adaptations: customer has no c_phone, so "country code" is
    c_nationkey directly; and every fixture customer has at least one
    order, so the spec's "never ordered" anti-join becomes "never
    placed an URGENT order" (same anti-join shape, non-degenerate
    selectivity).  Plan: the scalar average is a 1-row
    aggregate broadcast into the filter (no driver round-trip — it
    stays a subquery in the plan); customers above it anti-join orders
    on the customer key (shuffle carries only c_custkey + grouping
    cols), then a 25-group aggregate.  The threshold is computed as
    exact-DECIMAL sum (associative, partitioning-independent) cast to
    double, divided by the integer count — bit-identical in both
    engines at any partitioning, so the filter boundary can never
    flip a customer between engines (a plain double AVG could differ
    in the last ulp and would, eventually, land on a customer).
    """
    ensure_engine_conf(spark)
    c = scan(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg")
    )
    o = (
        scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("__avg"))
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        no_orders.groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


@declared(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    filter-heavy single-table aggregate.  Every predicate reaches the
    parquet scan (PushedFilters on shipdate/discount/quantity — the
    plan test pins this), so row-groups failing min/max stats never
    decompress; what survives feeds a map-side DECIMAL partial sum and
    a 1-row exchange.  The I/O-bound query whose whole cost at 100 TB
    is how much the scan can skip.
    """
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_REVENUE_DEC))
        .cast("double")
        .alias("revenue")
    )


@declared(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): argmax over an aggregate — the
    per-supplier quarterly revenue, then the supplier(s) achieving the
    global maximum.

    The revenue aggregate is DECIMAL (exact), so the equality against
    its own MAX is engine-safe — no float-boundary hazard.  Plan: one
    fact shuffle to the per-supplier aggregate (sf*10k rows), a 1-row
    MAX broadcast back onto it (scalar-subquery shape, no driver
    round-trip), and an sf-linear supplier attach left to AQE.  Like
    Q21, the revenue subplan feeds two consumers (itself and its MAX);
    at |suppliers| rows the re-execution is a rounding error — but the
    same argmax over a FACT-sized aggregate should localCheckpoint or
    rewrite via a rank window instead.
    """
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__max"))
    s = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("__max"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@declared(
    "q_tpch_q8",
    oracle="""
    SELECT o_year,
           round(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                               ELSE CAST(0 AS DECIMAL(28,6)) END)
                      / SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region ON n1.n_regionkey = r_regionkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        AND p_type = 'PROMO'
    ) t
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the widest spec join
    tree — part, lineitem, supplier, orders, customer, two nation
    aliases, region — with a conditional share ratio per year.

    The fixture's p_type is a single word, so the spec's
    'ECONOMY ANODIZED STEEL' filter becomes p_type = 'PROMO'.  Plan:
    the p_type filter prunes part at the scan and that edge joins
    FIRST, so lineitem is cut to ~1/6 before touching the wider
    orders/customer edges; nation×2 and region broadcast (bounded
    dims); part, supplier, orders, customer all shuffle (sf-linear,
    no pinned hints — AQE upgrades at runtime).  The share is
    DECIMAL-sum / DECIMAL-sum, divided as doubles and rounded to 6dp
    identically in both engines (same pattern as Q14).
    """
    ensure_engine_conf(spark)
    p = scan(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = scan(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = scan(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = scan(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = scan(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = scan(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = scan(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    zero = F.lit(0).cast(_REVENUE_DEC)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("volume", _revenue())
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                (
                    F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(zero))
                    / F.sum("volume")
                ).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Derived partsupp + the two TPC-H composites it unblocks (Q2, Q20).
#
# The fixture set has no partsupp table (SURVEY §8), so partsupp is
# DERIVED deterministically from part x supplier with the TPC-H dbgen
# shape — 4 candidate suppliers per part via
#   ps_suppkey = (p_partkey + i * (S/4 + p_partkey/S)) % S,  i in 0..3
# (0-based keys; S = |supplier|) — and pure-arithmetic availqty /
# supplycost columns.  Both engines build the SAME rows from the SAME
# inputs (plain BIGINT arithmetic + one exact double division), so the
# oracle is a full hash match, not rows-only.  DISTINCT guards the
# small-S fixture regime where the stride can hit 0 mod S and collapse
# a part's 4 candidates (TPC-H's own parameter regime guarantees
# S/4 + P/S < S; sf0.001's S=10 does not).
# ---------------------------------------------------------------------------

PARTSUPP_CTE = """
sc AS (SELECT COUNT(*) AS s FROM supplier),
ps0 AS (
  SELECT DISTINCT
     p_partkey AS ps_partkey,
     (p_partkey + i * (CAST(FLOOR(s / 4.0) AS BIGINT)
                       + CAST(FLOOR(p_partkey / CAST(s AS DOUBLE)) AS BIGINT))) % s
       AS ps_suppkey
  FROM part CROSS JOIN sc CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(i)
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         ((ps_partkey * 47 + ps_suppkey * 31) % 40) + 1 AS ps_availqty,
         CAST((ps_partkey * 7919 + ps_suppkey * 4271) % 100000 AS DOUBLE) / 100.0 + 1.0
           AS ps_supplycost
  FROM ps0
)
"""


def derive_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp derived from part x supplier-count (see block comment).

    Plan shape: part scan -> 1-row broadcast of the supplier count ->
    4-way explode -> distinct (one dim-scale shuffle).  partsupp is
    4x|part| rows — dim-scale at every SF, never fact-scale.
    """
    part = scan(spark, sf_dir, "part").select("p_partkey")
    sc = scan(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("s"))
    pk, s, i = F.col("p_partkey"), F.col("s"), F.col("i")
    step = F.floor(s / F.lit(4.0)).cast("long") + F.floor(pk / s.cast("double")).cast("long")
    ps0 = (
        part.crossJoin(F.broadcast(sc))
        .select(pk, s, F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"))
        .select(pk.alias("ps_partkey"), ((pk + i * step) % s).alias("ps_suppkey"))
        .distinct()
    )
    psk, ssk = F.col("ps_partkey"), F.col("ps_suppkey")
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        ((psk * 47 + ssk * 31) % 40 + 1).alias("ps_availqty"),
        (((psk * 7919 + ssk * 4271) % 100000).cast("double") / 100.0 + 1.0).alias(
            "ps_supplycost"
        ),
    )


@declared(
    "q_tpch_q2",
    oracle="WITH " + PARTSUPP_CTE + """
    , eur AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost, s_name, s_acctbal, n_name
      FROM partsupp
           JOIN supplier ON s_suppkey = ps_suppkey
           JOIN nation ON n_nationkey = s_nationkey
           JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
    FROM eur JOIN part ON p_partkey = ps_partkey
    WHERE p_type = 'ECONOMY' AND p_size >= 25
      AND ps_supplycost = (SELECT MIN(e2.ps_supplycost) FROM eur e2
                           WHERE e2.ps_partkey = eur.ps_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (min-cost supplier): the correlated-MIN-subquery family.

    The oracle keeps the spec's correlated scalar subquery; the Spark
    plan uses the scalable rewrite — ONE window MIN over the
    region-filtered partsupp partitioned by part, then filter to the
    minimum — so the candidate set is scanned once instead of once per
    outer row.  nation/region broadcast (bounded dims); supplier and
    part are sf-linear so their joins shuffle and AQE may upgrade.
    The MIN is computed over ALL Europe suppliers of a part (before the
    part predicate), exactly like the spec's subquery.
    """
    ensure_engine_conf(spark)
    ps = derive_partsupp(spark, sf_dir)
    supp = scan(spark, sf_dir, "supplier")
    nat = F.broadcast(scan(spark, sf_dir, "nation"))
    reg = F.broadcast(scan(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    eur = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(nat, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(reg, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    best = eur.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    part_f = (
        scan(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") >= 25))
        .select("p_partkey", "p_brand")
    )
    return (
        best.join(part_f, F.col("p_partkey") == F.col("ps_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@declared(
    "q_tpch_q20",
    oracle="WITH " + PARTSUPP_CTE + """
    , qty AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS year_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE')
      AND s_suppkey IN (
        SELECT ps_suppkey
        FROM partsupp JOIN qty ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND ps_availqty > 0.5 * year_qty
      )
    ORDER BY s_name
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (excess-stock suppliers): nested EXISTS-over-aggregate.

    Spark shape: lineitem is the only fact table — its year filter
    pushes to the scan, then ONE partial-aggregated shuffle on
    (l_partkey, l_suppkey) produces the per-pair year quantity; the
    availqty comparison and the part-name block are dim-scale joins;
    the final supplier gate is a LEFT SEMI join (IN-subquery rewrite,
    same family test_in_subquery_rewrites_to_semi_join pins).  The
    region gate uses EUROPE (region-level, not the spec's single
    nation) so every fixture SF yields a non-degenerate result set.
    """
    ensure_engine_conf(spark)
    ps = derive_partsupp(spark, sf_dir)
    parts_small = (
        scan(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = scan(spark, sf_dir, "lineitem")
    qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("year_qty")
        )
    )
    qual = (
        ps.join(parts_small, F.col("ps_partkey") == F.col("p_partkey"), "leftsemi")
        .join(
            qty,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("year_qty"))
        .select("ps_suppkey")
    )
    supp = scan(spark, sf_dir, "supplier")
    nat = F.broadcast(scan(spark, sf_dir, "nation"))
    reg = F.broadcast(scan(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    return (
        supp.join(qual, F.col("s_suppkey") == F.col("ps_suppkey"), "leftsemi")
        .join(nat, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(reg, F.col("r_regionkey") == F.col("n_regionkey"), "leftsemi")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        .orderBy("s_name")
    )


@declared(
    "q_tpch_q9",
    oracle="WITH " + PARTSUPP_CTE + """
    SELECT nation, o_year, CAST(SUM(amount_e4) AS BIGINT) AS sum_profit_e4
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(FLOOR((l_extendedprice * (1 - l_discount)
                         - ps_supplycost * l_quantity) * 10000 + 0.5) AS BIGINT)
               AS amount_e4
      FROM lineitem
           JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN nation ON n_nationkey = s_nationkey
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): widest partsupp join tree —
    lineitem x partsupp x supplier x orders x nation, profit =
    revenue minus supply cost, by nation and order year.

    Determinism: profit has exactly 4 decimal places (2-dp price x
    2-dp discount, 2-dp cost x integer qty), so each row is scaled to
    an e4 BIGINT before summing — integer sums are order-independent
    and engine-portable (no double-sum drift, no decimal midpoints).
    Plan shape: the part-name block is a LEFT SEMI on the lineitem
    fact; partsupp/orders joins shuffle on their keys (sf-linear
    sides, no broadcast pins); nation broadcasts; final agg is
    partial+final over |nations| x |years| groups.
    """
    ensure_engine_conf(spark)
    ps = derive_partsupp(spark, sf_dir)
    li = scan(spark, sf_dir, "lineitem")
    part_red = (
        scan(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    supp = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ords = scan(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    nat = F.broadcast(scan(spark, sf_dir, "nation"))
    amount_e4 = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("ps_supplycost") * F.col("l_quantity")
        )
        * 10000
        + F.lit(0.5)
    )
    return (
        li.join(part_red, F.col("l_partkey") == F.col("p_partkey"), "leftsemi")
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(ords, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nat, F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            "o_year",
            amount_e4.alias("amount_e4"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount_e4").cast("bigint").alias("sum_profit_e4"))
        .orderBy("nation", F.col("o_year").desc())
    )


@declared(
    "q_tpch_q11",
    oracle="WITH " + PARTSUPP_CTE + """
    , eurps AS (
      SELECT ps_partkey,
             CAST(FLOOR(ps_supplycost * ps_availqty * 100 + 0.5) AS BIGINT) AS v
      FROM partsupp
           JOIN supplier ON s_suppkey = ps_suppkey
           JOIN nation ON n_nationkey = s_nationkey
           JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    agg AS (
      SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_e2
      FROM eurps GROUP BY ps_partkey
    )
    SELECT ps_partkey, value_e2 FROM agg
    WHERE value_e2 * (SELECT COUNT(*) FROM agg) > 2 * (SELECT SUM(value_e2) FROM agg)
    ORDER BY value_e2 DESC, ps_partkey
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-part supply value within a
    region, keeping parts above a value threshold derived from the
    SAME aggregate (the spec's scalar-subquery-over-identical-agg
    family).  Threshold adapted to a scale-free form — value > 2x the
    mean part value — so every fixture SF yields a non-degenerate
    result (the spec's 0.0001/SF constant collapses to 0 or all rows
    off-spec-scale).  All-integer comparison (value_e2 * count >
    2 * total_e2): exact and engine-portable.

    Plan shape: the total and count attach to the tiny post-agg frame
    with an UNPARTITIONED window (the r6 window-over-agg totals trick)
    — the partsupp subtree is scanned ONCE, not re-executed per scalar
    subquery.
    """
    ensure_engine_conf(spark)
    ps = derive_partsupp(spark, sf_dir)
    supp = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = F.broadcast(scan(spark, sf_dir, "nation"))
    reg = F.broadcast(scan(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    v = F.floor(F.col("ps_supplycost") * F.col("ps_availqty") * 100 + F.lit(0.5))
    agg = (
        ps.join(supp, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(nat, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(reg, F.col("r_regionkey") == F.col("n_regionkey"), "leftsemi")
        .select("ps_partkey", v.alias("v"))
        .groupBy("ps_partkey")
        .agg(F.sum("v").cast("bigint").alias("value_e2"))
    )
    w = Window.partitionBy()
    return (
        agg.withColumn("total_e2", F.sum("value_e2").over(w))
        .withColumn("n_parts", F.count(F.lit(1)).over(w))
        .filter(F.col("value_e2") * F.col("n_parts") > 2 * F.col("total_e2"))
        .select("ps_partkey", "value_e2")
        .orderBy(F.col("value_e2").desc(), "ps_partkey")
    )


@declared(
    "q_tpch_q16",
    oracle="WITH " + PARTSUPP_CTE + """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): NOT-IN anti-join plus
    multi-key count-distinct.  The spec excludes suppliers with
    complaint comments; the fixture has no s_comment, so the
    deterministic analogue excludes negative-balance suppliers — the
    rewrite family (NOT IN -> anti join against a filtered dim) is
    identical.

    Plan shape: part predicates push to the scan (<>, NOT LIKE, IN all
    pushable); the exclusion list is a filtered dim-scale anti join;
    one partial-aggregated shuffle keyed (brand, type, size, suppkey)
    for the distinct, then the final count.
    """
    ensure_engine_conf(spark)
    ps = derive_partsupp(spark, sf_dir)
    part_f = scan(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = scan(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(bad, F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part_f, F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("ps_suppkey")).cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@declared(
    "q_tpch_q12",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             CAST(FLOOR(epoch(l_shipdate) / 86400) AS BIGINT) AS ship_day,
             CAST(FLOOR(epoch(l_shipdate) / 86400) AS BIGINT)
               + ((l_orderkey * 11 + l_linenumber * 5) % 60) - 30 AS commit_day,
             CAST(FLOOR(epoch(l_shipdate) / 86400) AS BIGINT)
               + ((l_orderkey * 7 + l_linenumber * 3) % 30) + 1 AS receipt_day,
             CASE (l_orderkey + l_linenumber) % 7
               WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR'
               WHEN 3 THEN 'TRUCK' WHEN 4 THEN 'RAIL' WHEN 5 THEN 'FOB'
               ELSE 'REG AIR' END AS ship_mode
      FROM lineitem
    )
    SELECT ship_mode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN li ON o_orderkey = l_orderkey
    WHERE ship_mode IN ('MAIL', 'SHIP')
      AND commit_day < receipt_day
      AND ship_day < commit_day
      AND receipt_day >= 9862 AND receipt_day < 10227
    GROUP BY ship_mode
    ORDER BY ship_mode
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes & priority): two-branch conditional
    aggregation over a fact-fact join.

    The fixture has no l_shipmode/l_commitdate/l_receiptdate, so all
    three DERIVE deterministically from existing columns (same doctrine
    as partsupp, B98): ship mode by line-key residue, commit/receipt as
    bounded day offsets from the ship date.  ALL date logic runs in
    epoch-day BIGINT arithmetic (floor(epoch/86400)) — no interval
    dialect, no timezone edge; the receipt-year window [9862, 10227) is
    calendar 1997 in epoch days.  Join shuffles on the order key
    (fact-fact, no broadcast); the CASE branches partial-aggregate
    map-side into 2 longs per mode.
    """
    ensure_engine_conf(spark)
    li = scan(spark, sf_dir, "lineitem")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    ship_day = F.floor(
        F.col("l_shipdate").cast("timestamp").cast("long") / F.lit(86400)
    )
    modes = ["MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "FOB"]
    mode = F.lit("REG AIR")
    for i, m in reversed(list(enumerate(modes))):
        mode = F.when((ok + ln) % 7 == i, m).otherwise(mode)
    lid = li.select(
        "l_orderkey",
        ship_day.alias("ship_day"),
        (ship_day + ((ok * 11 + ln * 5) % 60) - 30).alias("commit_day"),
        (ship_day + ((ok * 7 + ln * 3) % 30) + 1).alias("receipt_day"),
        mode.alias("ship_mode"),
    ).filter(
        F.col("ship_mode").isin("MAIL", "SHIP")
        & (F.col("commit_day") < F.col("receipt_day"))
        & (F.col("ship_day") < F.col("commit_day"))
        & (F.col("receipt_day") >= 9862)
        & (F.col("receipt_day") < 10227)
    )
    orders = scan(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lid.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("ship_mode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


@declared(
    "q_gapfill_interpolate",
    oracle="""
    WITH cal AS (
      SELECT CAST(unnest(generate_series(DATE '1995-01-01',
                                         DATE '1995-03-31',
                                         INTERVAL 1 DAY)) AS DATE) AS day
    ), daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS v
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-04-01'
        AND o_orderkey % 19 = 0
      GROUP BY day
    ), joined AS (
      SELECT cal.day, daily.v FROM cal LEFT JOIN daily USING (day)
    ), carried AS (
      SELECT day, v,
             last_value(v IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END
                        IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS pd,
             first_value(v IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END
                         IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS nd
      FROM joined
    )
    SELECT day,
           CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS observed,
           CAST(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (day - pd) // (nd - pd)
             WHEN pv IS NOT NULL THEN pv
             ELSE nv END AS BIGINT) AS value_cents
    FROM carried
    """,
)
def q_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill by LINEAR INTERPOLATION (r14) — the resample
    companion to q_gapfill's zero-fill: missing days take the exact
    integer interpolation ``prev + (next - prev) * gap_pos DIV
    gap_len`` between the bracketing observed days (truncating DIV,
    identical in both engines including negative slopes), the head
    back-fills and the tail forward-fills — pandas
    ``interpolate(limit_direction='both')`` semantics for a daily
    metric, engine-exact at cent scale.

    Scale shape: the dense axis is GENERATED (one row exploded) and
    calendar-bounded, so the carried prev/next windows — unpartitioned
    by construction — only ever rank the day-grain relation; the
    corpus contributes one map-side-combined daily aggregate.  A
    sparse slice of orders (1 in 19) makes real gaps at every SF."""
    ensure_engine_conf(spark)
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    daily = (
        scan(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
            & (F.col("o_orderkey") % 19 == 0)
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                  .cast("bigint")).alias("v")
        )
    )
    joined = cal.join(daily, "day", "left")
    wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    carried = joined.select(
        "day", "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("pd"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("nd"),
    )
    interp = F.expr(
        "pv + (nv - pv) * datediff(day, pd) DIV datediff(nd, pd)"
    )
    return carried.select(
        "day",
        F.when(F.col("v").isNotNull(), 1).otherwise(0).cast("bigint")
        .alias("observed"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
        .cast("bigint").alias("value_cents"),
    )
