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
# in insertion order and caps at ~50 entries per round.  Round-9 window
# (VERDICT r8 item 1): (a) queries NEW or IMPLEMENTATION-CHANGED in
# round 9 — the column-mapping oracle, the SQL time-travel face, the
# portable MinHash oracle, the ledger-health oracle update (skipped
# stages out of percentiles), and q_dedup_ngram (degraded-bucket
# signal added) — then (b) the COMPLETE 48-row r6-stale tail (every
# query whose newest driver row is r6, per VERDICT r8).  5 + 48 = 53:
# the driver caps at ~50, so the LAST three entries — all rows-only
# multimodal/packing checks, the weakest-value rows — may slip to the
# r10 window; they are deliberately ordered last.
# ROUND-10 ROTATION NOTE: the stale tail will then be the 50-row r7
# window (q_agg_global/percentile/filtered, q_pivot, q_window_range_
# frame, q_join_right, q_fn_map/json/null/string2, q_subq_*, q_udf_
# scalar, q_pandas_norm, q_udtf, q_sink_bucketed, q_pii_redact,
# q_pack_sequences, q_stream_first, q_merge_upsert, q_scd2, q_rollup_
# incremental, q_length_buckets, tpch q7/q14/q4/q18/q19/q21/q13/q22/
# q6/q15/q8 + composites, q_sim_topk, q_text_scrub/quality_full/
# wordpiece/oov, q_sql_text/join, ...) plus whatever slipped here.
PRIORITY: list[str] = [
    # (a) new/changed in round 9 (14 entries: the mid-round additions —
    # the portable simhash/clusters/bloom/winnowing/ngram-verify/KMV
    # oracles, the incremental-dedup face, and the PQ + IVF-PQ ANN
    # tiers — join the first five; with the 48-row tail that is 62, so
    # the ~50 cap now slips the TWELVE trailing rows-only entries to
    # r10 — still the weakest-value rows by design)
    "q_schema_evolution", "q_sql_timetravel", "q_dedup_minhash_portable",
    "q_dedup_simhash_portable", "q_dedup_clusters_portable",
    "q_decontaminate_bloom_portable", "q_dedup_substring_portable",
    "q_dedup_ngram_portable", "q_agg_kmv_portable", "q_dedup_incremental",
    "q_sim_pq", "q_sim_ivf_pq",
    "q_ledger_health", "q_dedup_ngram",
    # (b) the complete r6 tail (oldest rows first in value terms:
    # full-oracle rows, then rows-only; the final three are the
    # designated slip-to-r10 candidates)
    "q_dedup_exact", "q_dedup_embed", "q_merge_acid",
    "q_sink_partitioned", "q_source_json", "q_source_http",
    "q_source_http_ds", "q_distinct_cols", "q_fn_date2",
    "q_agg_grouping_sets", "q_agg_percentile", "q_agg_filtered",
    "q_quantile_sketch", "q_profile", "q_mix_weights", "q_mix_apply",
    "q_mix_temperature", "q_mix_temperature_apply", "q_text_chunk",
    "q_text_tfidf", "q_text_tokens", "q_text_quality",
    "q_stream_tumble", "q_stream_slide", "q_stream_join",
    "q_stream_join_outer", "q_stream_dedup", "q_stream_enrich",
    "q_join_salted", "q_sample_stratified", "q_embed_centroid",
    "q_embed_stats", "q_multimodal", "q_pipeline",
    "q_agg_approx", "q_agg_approx_percentile", "q_agg_hll",
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_clusters",
    "q_dedup_embed_lsh", "q_dedup_semantic", "q_dedup_substring",
    "q_decontaminate_substring", "q_decontaminate_bloom",
    "q_multimodal_neardup", "q_multimodal_pipeline", "q_pack_firstfit",
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
    import artemia_airflow_spark.ledger  # noqa: F401
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
    import artemia_airflow_spark.operators.sqltext  # noqa: F401
    import artemia_airflow_spark.operators.text  # noqa: F401
    import artemia_airflow_spark.pipelines.analytics_demo  # noqa: F401
    import artemia_airflow_spark.sources.files  # noqa: F401
    import artemia_airflow_spark.sources.http  # noqa: F401
    import artemia_airflow_spark.sources.txtable  # noqa: F401
    import artemia_airflow_spark.streaming.stateful  # noqa: F401
    import artemia_airflow_spark.streaming.windows  # noqa: F401
