"""Declared-query registry — the normative map the driver consumes.

Every implemented operator registers a ``(spark, sf_dir) -> DataFrame``
builder under a stable key; oracle-checkable ones also register the
equivalent DuckDB SQL (FIXTURES.md §3).  ``__spark_entry__.queries`` /
``oracle_sql`` simply re-export these dicts.

Determinism contract applied to every registered query (SURVEY.md §7):
money/quantity sums via DECIMAL(18,2) then DOUBLE; counts are BIGINT in
both engines; every top-k/rank order ends in a unique-key tiebreak;
``events.ts`` is second-truncated or exported as epoch BIGINT; every
computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def declared(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` marks the weaker
    rows-only check (non-SQL-expressible / nondeterministic ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate declared query {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all_query_modules() -> None:
    """Import every module that declares queries (idempotent)."""
    import artemia_airflow_spark.operators.analytics  # noqa: F401
    import artemia_airflow_spark.operators.curation  # noqa: F401
    import artemia_airflow_spark.operators.dedup  # noqa: F401
    import artemia_airflow_spark.operators.multimodal  # noqa: F401
    import artemia_airflow_spark.operators.relational  # noqa: F401
    import artemia_airflow_spark.operators.relational2  # noqa: F401
    import artemia_airflow_spark.operators.similarity  # noqa: F401
    import artemia_airflow_spark.operators.text  # noqa: F401
    import artemia_airflow_spark.pipelines.analytics_demo  # noqa: F401
    import artemia_airflow_spark.sources.files  # noqa: F401
    import artemia_airflow_spark.sources.http  # noqa: F401
    import artemia_airflow_spark.streaming.windows  # noqa: F401
