"""A data-plane pipeline demo: the orchestration layer (Surface A)
driving DataFrame stages (Surface B) — trigger rules, XCom handoff and
all — exposed as a declared query so the driver contract exercises the
whole stack end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from artemia_airflow_spark.catalog import scan
from artemia_airflow_spark.functions.core import dec_sum
from artemia_airflow_spark.pipeline import Pipeline, StageContext
from artemia_airflow_spark.plans.registry import declared
from artemia_airflow_spark.session import ensure_engine_conf


def build_analytics_pipeline(sf_dir: str) -> Pipeline:
    """extract (2 parallel scans) -> transform (join+agg, consumes both
    upstream DataFrames via XCom) -> quality gate -> publish."""
    pipe = Pipeline("analytics_demo", schedule="@daily", tags=("demo",))

    @pipe.stage("extract_orders")
    def extract_orders(ctx: StageContext):
        return scan(ctx.spark, sf_dir, "orders")

    @pipe.stage("extract_customers")
    def extract_customers(ctx: StageContext):
        return scan(ctx.spark, sf_dir, "customer")

    @pipe.stage("transform")
    def transform(ctx: StageContext):
        o = ctx.xcom_pull("extract_orders")
        c = ctx.xcom_pull("extract_customers")
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dec_sum("o_totalprice").alias("revenue"),
            )
        )

    @pipe.stage("quality_gate")
    def quality_gate(ctx: StageContext):
        df = ctx.xcom_pull("transform")
        n = df.count()
        if n == 0:
            raise RuntimeError("quality gate: empty result")
        return df

    extract_orders >> transform
    extract_customers >> transform
    transform >> quality_gate
    return pipe


@declared(
    "q_pipeline",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_pipeline(spark, sf_dir):
    """ORACLE-CHECKED (round-6 upgrade from rows-only): run the full
    orchestration stack (parallel extract stages -> XCom DataFrame
    handoff -> gated transform) and return the final stage's
    DataFrame.  The orchestration layer adds no nondeterminism — the
    final stage IS a deterministic join+decimal-agg, so the oracle is
    the equivalent plain SQL; a hash match proves both the engine
    result and that the DAG run (trigger rules, XCom plumbing) handed
    the right frames through."""
    ensure_engine_conf(spark)
    pipe = build_analytics_pipeline(sf_dir)
    results = pipe.run(spark)
    return results["quality_gate"].value
