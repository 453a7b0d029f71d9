"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``artemia_airflow_spark``; this module only
re-exports the declared-query registry (SURVEY.md §2-B, FIXTURES.md §3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from artemia_airflow_spark.plans.registry import (
    ORACLE,
    QUERIES,
    load_all_query_modules,
    ordered_queries,
)

load_all_query_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (B19, TPC-H-Q1-style pricing summary) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_agg_group"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    queries still needing a driver CORRECTNESS row come first."""
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per oracle-checkable query; keys
    absent here (rows-only set) are non-SQL-expressible or
    nondeterministic by design (FIXTURES.md §3)."""
    return dict(ORACLE)
