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


@declared("q_pipeline")
def q_pipeline(spark, sf_dir):
    """Rows-only: run the full orchestration stack (parallel extract
    stages -> XCom DataFrame handoff -> gated transform) and return the
    final stage's DataFrame."""
    ensure_engine_conf(spark)
    pipe = build_analytics_pipeline(sf_dir)
    results = pipe.run(spark)
    return results["quality_gate"].value
