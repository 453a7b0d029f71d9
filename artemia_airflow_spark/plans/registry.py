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
# in insertion order and caps at ~50 entries per round.  After round 4,
# 73 queries' newest driver row predates the round-3/4 fixture
# regeneration (42 oracle rows last passed in r1, 5 in r2, 4 in r3,
# plus 22 rows-only).  ``PRIORITY`` front-loads round 5 with
# (a) this round's rows-only -> oracle upgrades, (b) queries whose
# implementation changed this round (need a fresh green row), then
# (c) the stale oracle rows oldest-first (r1, then r2, then r3), with
# the stale rows-only set at the tail for round 6.
PRIORITY: list[str] = [
    # (a) rows-only -> oracle upgrades in round 5
    "q_text_fingerprint", "q_sample_stratified", "q_multimodal_decode",
    "q_sink_parquet",
    # (b) implementation changed in round 5 (perf fixes / decimal casts /
    # ANN config retune per the recall harness)
    "q_fn_array", "q_text_langid", "q_tpch_q17", "q_sim_ivf",
    "q_sim_ann_lsh",
    # (b') new declared queries in round 5
    "q_text_scrub", "q_source_cap",
    # (b'') sf0.1-robustness fixes in round 5: session-boundary rule
    # aligned to session_window (merge at == gap) and q_window_dist's
    # engine-portable scaled-int rounding — need fresh rows
    "q_window_dist", "q_stream_session_state", "q_stream_session",
    # (c) stale oracle rows, last confirmed r1 (pre-regeneration fixtures)
    "q_scan", "q_project", "q_filter", "q_filter_pred", "q_case",
    "q_join_inner", "q_join_broadcast", "q_join_left", "q_join_full",
    "q_join_semi", "q_join_anti", "q_join_range", "q_join_asof",
    "q_join_cross",
    "q_agg_global", "q_agg_group", "q_agg_distinct", "q_agg_rollup",
    "q_agg_cube",
    "q_window_rank", "q_window_lag", "q_window_running", "q_topk",
    "q_set_union", "q_set_intersect", "q_set_except",
    "q_fn_string", "q_fn_date", "q_fn_math",
    "q_tpch_q3", "q_tpch_q5", "q_tpch_q10",
    "q_unpivot", "q_gapfill", "q_decontaminate", "q_shard",
    "q_mix_weights", "q_text_repetition", "q_dedup_exact",
    "q_dedup_embed", "q_multimodal",
    # (c) stale oracle rows, last confirmed r2
    "q_stream_tumble", "q_stream_slide",
    "q_stream_join", "q_stream_dedup",
    # (c) stale oracle rows, last confirmed r3
    "q_embed_stats", "q_text_tokens", "q_text_quality", "q_text_tfidf",
    # tail: stale rows-only set (weaker check; refresh round 6)
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram",
    "q_dedup_clusters", "q_dedup_embed_lsh", "q_multimodal_pipeline",
    "q_multimodal_neardup", "q_agg_approx", "q_embed_centroid",
    "q_pipeline", "q_sink_partitioned", "q_source_json", "q_source_http",
    "q_source_http_ds", "q_dedup_substring", "q_decontaminate_substring",
    "q_pack_firstfit",
]

assert len(PRIORITY) == len(set(PRIORITY)), "duplicate PRIORITY entry"


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
