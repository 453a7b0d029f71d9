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

# Driver-check ordering: the per-round CORRECTNESS gate walks ``queries()``
# in insertion order and caps at ~50 entries per round.  Rounds 1-3
# jointly produced a clean row for every declared query EXCEPT the five
# whose round-3 row was the events.ts fixture-encoding error (fixed in
# catalog.scan this round).  ``PRIORITY`` front-loads round 4 with
# (a) those five, (b) the queries new in round 4, then (c) the rest of
# the oracle-declared set for cheap re-confirmation on the new fixtures.
PRIORITY: list[str] = [
    # (a) round-3 driver errors: events.ts TIMESTAMP_NTZ breakage, fixed
    "q_agg_hll", "q_stream_first", "q_scd2", "q_rollup_incremental",
    "q_fn_json",
    # (b) new in round 4
    "q_tpch_q4", "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q21",
    "q_tpch_q13", "q_tpch_q22", "q_tpch_q6", "q_tpch_q15", "q_tpch_q8",
    "q_stream_session_state", "q_dedup_semantic", "q_decontaminate_bloom",
    "q_mix_apply",
    # (b') rows-only -> oracle upgrades in round 4: their oracle status
    # is new, so they need a fresh driver row inside the ~50 cut
    "q_fn_map", "q_text_langid", "q_text_quality_full", "q_text_wordpiece",
    # (c) oracle re-confirmation on the regenerated fixtures
    "q_tpch_q7", "q_tpch_q14", "q_length_buckets",
    "q_sink_bucketed", "q_pii_redact", "q_pack_sequences",
    "q_merge_upsert", "q_fn_null",
    "q_subq_scalar", "q_subq_in", "q_udf_scalar", "q_pandas_norm",
    "q_pivot", "q_agg_grouping_sets", "q_join_right", "q_subq_exists",
    "q_distinct_cols", "q_window_range_frame", "q_fn_string2", "q_fn_date2",
    "q_udtf", "q_agg_percentile", "q_agg_approx_percentile",
    "q_agg_filtered", "q_window_dist",
    "q_sim_topk", "q_sim_ann_lsh", "q_embed_stats", "q_sim_ivf",
    "q_text_tokens", "q_text_quality", "q_text_langid",
    "q_text_fingerprint", "q_text_wordpiece", "q_text_tfidf",
    "q_text_quality_full",
    "q_pipeline", "q_sink_parquet", "q_source_json", "q_source_http",
    "q_source_http_ds",
    "q_stream_tumble", "q_stream_slide", "q_stream_session",
    "q_stream_join", "q_stream_dedup",
    "q_sink_partitioned", "q_dedup_substring", "q_decontaminate_substring",
    "q_pack_firstfit", "q_multimodal_neardup", "q_fn_map",
    "q_embed_centroid", "q_sample_stratified",
]


def ordered_queries() -> dict[str, QueryFn]:
    """Registry in driver-check order: PRIORITY names first (those that
    still need a CORRECTNESS row), then the rest in registration order."""
    front = {n: QUERIES[n] for n in PRIORITY if n in QUERIES}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    return {**front, **rest}


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
    import artemia_airflow_spark.operators.cdc  # noqa: F401
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
    import artemia_airflow_spark.streaming.stateful  # noqa: F401
    import artemia_airflow_spark.streaming.windows  # noqa: F401
