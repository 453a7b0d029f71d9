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
# in insertion order and caps at ~50 entries per round.  Round-7 window
# (VERDICT r6 item 1): (a) the 10 new round-7 queries (raw-SQL surface,
# TPC-H Q2/Q9/Q11/Q16/Q20 over derived partsupp + Q12 over derived ship
# columns, validation gate, OOV rate), then (b) ALL 35 rows whose
# newest driver CORRECTNESS row is r4
# — after this window lands, no query's newest row is older than r5.
# (c) fills to 50 with r5 rows from families this round touched
# (repetition re-tier, text siblings, flagship family).
# ROUND-8 ROTATION NOTE: the stale tail will then be the ~37 remaining
# r5 rows (q_agg_*, q_join_*, q_window_*, q_set_*, q_fn_array/date/
# math/string, q_tpch_q3/q5/q10/q17, q_sim_ann_lsh/ivf, stream session
# pair, scrub/langid/fingerprint, ...) — front-load those plus whatever
# round 8 changes.
PRIORITY: list[str] = [
    # (a) new in round 7
    "q_sql_text", "q_tpch_q2", "q_tpch_q20",
    "q_tpch_q9", "q_tpch_q11", "q_tpch_q12", "q_tpch_q16",
    "q_validate", "q_text_oov", "q_sql_join",
    # (b) the complete r4 tail (newest driver row two fixture
    # generations old — VERDICT r6 item 1 names exactly this set)
    "q_fn_json", "q_fn_map", "q_fn_null", "q_fn_string2",
    "q_join_right", "q_length_buckets", "q_merge_upsert",
    "q_pack_sequences", "q_pandas_norm", "q_pii_redact", "q_pivot",
    "q_rollup_incremental", "q_scd2", "q_sim_topk", "q_sink_bucketed",
    "q_stream_first", "q_subq_exists", "q_subq_in", "q_subq_scalar",
    "q_text_quality_full", "q_text_wordpiece",
    "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q18",
    "q_tpch_q19", "q_tpch_q21", "q_tpch_q22", "q_tpch_q4",
    "q_tpch_q6", "q_tpch_q7", "q_tpch_q8",
    "q_udf_scalar", "q_udtf", "q_window_range_frame",
    # (c) fills to 50: q_text_repetition (re-tiered this round, r6 row)
    # plus the highest-traffic r5 rows (flagship family, window family,
    # text family siblings of this round's changes)
    "q_text_repetition", "q_text_fingerprint", "q_text_scrub",
    "q_agg_group", "q_agg_global",
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
    import artemia_airflow_spark.operators.sqltext  # noqa: F401
    import artemia_airflow_spark.operators.text  # noqa: F401
    import artemia_airflow_spark.pipelines.analytics_demo  # noqa: F401
    import artemia_airflow_spark.sources.files  # noqa: F401
    import artemia_airflow_spark.sources.http  # noqa: F401
    import artemia_airflow_spark.sources.txtable  # noqa: F401
    import artemia_airflow_spark.streaming.stateful  # noqa: F401
    import artemia_airflow_spark.streaming.windows  # noqa: F401
