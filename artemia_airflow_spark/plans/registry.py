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
# in insertion order and caps at ~50 entries per round.  Round-6 window:
# (a) queries whose implementation changed this round, (a') the 15 new
# round-6 queries, then (b) the 30 formerly-stale rows (r1/r2/r3 —
# VERDICT r5 item 1), then (c) the oldest r4 rows filling to ~50.
# ROUND-7 ROTATION NOTE: after this window lands, the stale tail is the
# ~27 r4 rows that did NOT fit (q_pii_redact, q_pivot, q_scd2,
# q_sim_topk, q_stream_first, q_subq_*, q_text_wordpiece, most TPC-H
# q4-q22 rows, q_udf_scalar, q_udtf, q_window_range_frame, ...) —
# front-load those plus whatever round 7 changes.
PRIORITY: list[str] = [
    # (a) implementation changed in round 6: bloom rebuilt (JVM bit_or
    # build + per-doc probe kernel), stratified threshold switched to
    # round-half-up (ADVICE r5), oracle upgrades for centroid /
    # partitioned-sink / pipeline
    "q_decontaminate_bloom", "q_sample_stratified",
    "q_embed_centroid", "q_sink_partitioned", "q_pipeline",
    "q_mix_apply",  # bucket hash switched to portable Lehmer in r6
    # (a') new declared queries in round 6: ACID MERGE storage tier,
    # overlapping document chunking, stream-static enrichment join,
    # skew-salted join certification
    "q_merge_acid", "q_text_chunk", "q_stream_enrich", "q_join_salted",
    "q_mix_temperature", "q_quantile_sketch", "q_profile",
    "q_mix_temperature_apply", "q_stream_join_outer",
    # (b) stale rows, last confirmed r1 (pre-regeneration fixtures)
    "q_agg_approx", "q_dedup_clusters", "q_dedup_embed",
    "q_dedup_embed_lsh", "q_dedup_exact", "q_dedup_minhash",
    "q_dedup_ngram", "q_dedup_simhash", "q_mix_weights", "q_multimodal",
    "q_multimodal_pipeline", "q_text_repetition",
    # (b) stale rows, last confirmed r2
    "q_source_http", "q_source_http_ds", "q_source_json",
    "q_stream_dedup", "q_stream_join", "q_stream_slide", "q_stream_tumble",
    # (b) stale rows, last confirmed r3
    "q_decontaminate_substring", "q_dedup_substring", "q_embed_stats",
    "q_multimodal_neardup", "q_pack_firstfit",
    "q_text_quality", "q_text_tfidf", "q_text_tokens",
    # (c) oldest r4 rows, filling the window to ~50
    "q_agg_approx_percentile", "q_agg_filtered", "q_agg_grouping_sets",
    "q_agg_hll", "q_agg_percentile", "q_dedup_semantic",
    "q_distinct_cols", "q_fn_date2", "q_fn_json", "q_fn_map",
    "q_fn_null", "q_fn_string2", "q_join_right", "q_length_buckets",
    "q_merge_upsert", "q_pack_sequences", "q_pandas_norm",
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
    import artemia_airflow_spark.operators.joins  # noqa: F401
    import artemia_airflow_spark.operators.multimodal  # noqa: F401
    import artemia_airflow_spark.operators.relational  # noqa: F401
    import artemia_airflow_spark.operators.relational2  # noqa: F401
    import artemia_airflow_spark.operators.similarity  # noqa: F401
    import artemia_airflow_spark.operators.sketches  # noqa: F401
    import artemia_airflow_spark.operators.text  # noqa: F401
    import artemia_airflow_spark.pipelines.analytics_demo  # noqa: F401
    import artemia_airflow_spark.sources.files  # noqa: F401
    import artemia_airflow_spark.sources.http  # noqa: F401
    import artemia_airflow_spark.sources.txtable  # noqa: F401
    import artemia_airflow_spark.streaming.stateful  # noqa: F401
    import artemia_airflow_spark.streaming.windows  # noqa: F401
