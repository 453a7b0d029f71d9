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
# in insertion order and caps at ~50 entries per round.  Round-10
# window (VERDICT r9 item 1): (a) queries NEW or IMPLEMENTATION-
# CHANGED in round 10 — the SRP-LSH / approx-percentile / media-pHash
# portable oracles, SQ8 quantization, the fuzzy join, the PQ/IVF-PQ
# candidate-cut rework, the winnowing-key simplification, the
# lineage-truncation seam (incremental dedup), and the ledger source
# column (q_ledger_health's write path) — then
# (b) the TWICE-DEFERRED 12-row r6-stale rows-only debt, IN FULL and
# ahead of everything stale-r7 (they were the designated slip set in
# r8 AND r9; VERDICT r9 "What's wrong" #3 demands them first), then
# (c) the 50-row r7-stale tail, full-oracle aggregate/TPC-H/SQL faces
# first.  10 + 12 + 50 = 72 > the ~50 cap: the trailing ~22 r7 rows
# slip to r11 — all rows the driver has hash-matched in r7 and whose
# implementations are untouched since.
# ROUND-11 ROTATION NOTE: front-load whatever r7 rows slipped here
# (observe CORRECTNESS_r10's actual cut point), then the r8 tail
# (48 rows, oldest-first).
PRIORITY: list[str] = [
    # (a) new/changed in round 10
    "q_sim_ann_lsh_portable", "q_agg_approx_percentile_portable",
    "q_multimodal_neardup_portable", "q_embed_quantize", "q_join_fuzzy",
    "q_sim_pq", "q_sim_ivf_pq", "q_dedup_substring_portable",
    "q_dedup_incremental", "q_ledger_health",
    # (b) the complete r6-stale rows-only debt (12 rows, paid first)
    "q_agg_hll", "q_dedup_minhash", "q_dedup_simhash",
    "q_dedup_clusters", "q_dedup_embed_lsh", "q_dedup_semantic",
    "q_dedup_substring", "q_decontaminate_substring",
    "q_decontaminate_bloom", "q_multimodal_neardup",
    "q_multimodal_pipeline", "q_pack_firstfit",
    # (c) the r7-stale tail: flagship + aggregate faces, TPC-H, SQL,
    # then the operator remainder (the trailing rows are the r11
    # slip candidates — all untouched full-oracle or tested rows)
    "q_agg_global", "q_agg_group", "q_sim_topk", "q_validate",
    "q_sql_text", "q_sql_join",
    "q_tpch_q2", "q_tpch_q4", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8",
    "q_tpch_q9", "q_tpch_q11", "q_tpch_q12", "q_tpch_q13",
    "q_tpch_q14", "q_tpch_q15", "q_tpch_q16", "q_tpch_q18",
    "q_tpch_q19", "q_tpch_q20", "q_tpch_q21", "q_tpch_q22",
    "q_merge_upsert", "q_scd2", "q_rollup_incremental",
    "q_pii_redact", "q_pack_sequences", "q_length_buckets",
    "q_text_scrub", "q_text_repetition", "q_text_fingerprint",
    "q_text_wordpiece", "q_text_quality_full", "q_text_oov",
    "q_fn_map", "q_fn_json", "q_fn_null", "q_fn_string2",
    "q_subq_scalar", "q_subq_in", "q_subq_exists",
    "q_udf_scalar", "q_pandas_norm", "q_udtf",
    "q_pivot", "q_join_right", "q_window_range_frame",
    "q_sink_bucketed", "q_stream_first",
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
