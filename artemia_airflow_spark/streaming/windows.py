"""Streaming operators over the `events` table (B45-B49).

`F.window` / `F.session_window` / `dropDuplicates` behave identically
on static DataFrames and streams, so each operator ships two faces:

- a batch-mode declared query (oracle-checkable where DuckDB can
  reproduce the bucketing deterministically), and
- a true Structured Streaming runner (``stream_*`` functions) used by
  tests/ to replay `events` through readStream with watermarks.

Scale notes: windowed aggregation state is keyed by (key, window) and
bounded by the watermark; `availableNow` triggers make replay runs
batch-shaped.  At 100 TB the file source is swapped for Kafka with the
same transformation graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artemia_airflow_spark.catalog import scan
from artemia_airflow_spark.functions.core import DEC, dec_sum
from artemia_airflow_spark.plans.registry import declared
from artemia_airflow_spark.session import ensure_engine_conf


# --------------------------------------------------------------------------
# Transformation graphs (shared batch/stream)
# --------------------------------------------------------------------------

def tumbling_counts(events: DataFrame, *, width: str = "1 hour") -> DataFrame:
    """B47: tumbling event-time window — count + exact value sum."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, *, width: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """B47: sliding window variant (each event lands in width/slide buckets)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("long").alias("bucket_start"), "n_events")
    )


def session_counts(events: DataFrame, *, gap: str = "30 minutes") -> DataFrame:
    """B48: gap-based session windows per user."""
    return (
        events.groupBy(F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("session_start"),
            F.col("w.end").cast("long").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def _attribution_graph(
    events: DataFrame, horizon: str, *, how: str, truncate_condition: bool
) -> DataFrame:
    """Shared view->purchase graph behind both attribution faces; the
    GENUINE differences are the join type and whether the time
    condition runs on second-truncated or raw event time (the outer
    face must condition on the raw watermarked column — see
    attribution_join_outer)."""
    ts_col = (
        F.date_trunc("second", "ts") if truncate_condition else F.col("ts")
    )
    e = events.withColumn("__jts", ts_col)
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event"),
        F.col("user_id"),
        F.col("__jts").alias("v_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event"),
        F.col("user_id").alias("p_user"),
        F.col("__jts").alias("p_ts"),
    )
    lag = (
        (F.col("p_ts").cast("long") - F.col("v_ts").cast("long"))
        if truncate_condition
        else (
            F.date_trunc("second", "p_ts").cast("long")
            - F.date_trunc("second", "v_ts").cast("long")
        )
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {horizon}")),
            how,
        )
        .select("view_event", "purchase_event", "user_id", lag.alias("lag_s"))
    )


def attribution_join(events: DataFrame, *, horizon: str = "1 hour") -> DataFrame:
    """B49: view->purchase attribution — every (view, purchase) pair of
    the same user with the purchase inside ``horizon`` after the view.

    Shared batch/stream graph: on streams, both filtered sides carry
    watermarks and the time-range predicate lets Spark bound the join
    state (view-side rows expire once the purchase-side watermark
    passes view.ts + horizon).  Event time is second-truncated (H1) so
    batch face and DuckDB oracle agree."""
    return _attribution_graph(events, horizon, how="inner", truncate_condition=True)


def attribution_join_outer(events: DataFrame, *, horizon: str = "1 hour") -> DataFrame:
    """B96: LEFT OUTER stream-stream join — attribution including the
    views that converted to NOTHING (the rows an inner join hides, and
    exactly the rows a funnel analysis needs).

    Streaming semantics: outer stream-stream joins REQUIRE the
    event-time range condition on the WATERMARKED columns themselves —
    Spark's outer-join state cleanup cannot prove eviction bounds
    through a derived (date_trunc'd) column — so this face conditions
    on the RAW ``ts`` and only the OUTPUT lag is second-truncated.
    That makes the raw condition STRICTLY TIGHTER than the inner
    face's truncated one: a pair whose raw order straddles a second
    boundary (view 10:00:00.8, purchase 10:00:00.2) matches the inner
    face but is null-extended here — do NOT mix the two faces in one
    funnel computation.  The oracle uses the identical raw condition.
    Spark emits an unmatched left row with nulls only once the
    right-side watermark passes ``view.ts + horizon`` (the state-store
    eviction point, when "no purchase arrived in the window" becomes
    provable); in batch every unmatched view emits immediately."""
    return _attribution_graph(
        events, horizon, how="left_outer", truncate_condition=False
    )


@declared(
    "q_stream_join_outer",
    oracle="""
    SELECT v.event_id AS view_event, p.event_id AS purchase_event, v.user_id,
           CAST(epoch(date_trunc('second', p.ts))
                - epoch(date_trunc('second', v.ts)) AS BIGINT) AS lag_s
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
      AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def q_stream_join_outer(spark, sf_dir):
    """B96 batch face of the left-outer stream-stream attribution join
    (same transformation graph as the watermarked streaming face):
    every view, converted or not."""
    ensure_engine_conf(spark)
    return attribution_join_outer(scan(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# True streaming faces (used by tests/test_streaming.py)
# --------------------------------------------------------------------------

def stream_events(spark: SparkSession, sf_dir: str, *, max_files_per_trigger: int = 1) -> DataFrame:
    """B45: replay the events parquet as a file-source stream."""
    schema = scan(spark, sf_dir, "events").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(f"{sf_dir}/events.parquet")
    )


def stream_tumbling(spark: SparkSession, sf_dir: str, *, watermark: str = "10 minutes") -> DataFrame:
    """B46+B47: watermarked streaming tumbling aggregation.  Watermark
    bounds state: windows older than max(event time) - watermark are
    finalized and evicted."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", watermark)
    return tumbling_counts(ev)


def stream_dedup(spark: SparkSession, sf_dir: str, *, watermark: str = "10 minutes") -> DataFrame:
    """B49: stateful streaming dedup on event_id within the watermark
    horizon (exactly-once per id under replay)."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", watermark)
    return ev.dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory_sink(
    stream_df: DataFrame, name: str, timeout_s: int = 120, *,
    output_mode: str = "append",
) -> DataFrame:
    """Drive a streaming query with Trigger.AvailableNow into an
    in-memory sink and return the materialized result (test harness).

    ``output_mode`` defaults to 'append' (valid for every streaming
    plan); pass 'complete' for aggregated streams where the full result
    table is wanted — 'complete' on a non-aggregating stream (e.g.
    dropDuplicatesWithinWatermark) is an AnalysisException in Spark.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
    return stream_df.sparkSession.table(name)


# --------------------------------------------------------------------------
# Declared queries (batch faces)
# --------------------------------------------------------------------------

@declared(
    "q_stream_tumble",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumble(spark, sf_dir):
    """B47 in batch mode — identical code path (`F.window`) as the
    streaming face; epoch-aligned 1h tumbling == date_trunc('hour')."""
    ensure_engine_conf(spark)
    return tumbling_counts(scan(spark, sf_dir, "events"))


@declared(
    "q_stream_slide",
    oracle="""
    SELECT bucket_start, COUNT(*) AS n_events FROM (
      SELECT CAST(FLOOR(epoch(ts) / 900) * 900 - 900 * k AS BIGINT) AS bucket_start
      FROM events CROSS JOIN range(4) t(k)
    ) GROUP BY bucket_start
    """,
)
def q_stream_slide(spark, sf_dir):
    """B47 sliding variant (1h window / 15min slide).  Oracle expands
    each event into its 4 containing epoch-aligned window starts —
    exactly Spark's assignment rule (start = floor(t/slide)*slide - k*slide)."""
    ensure_engine_conf(spark)
    return sliding_counts(scan(spark, sf_dir, "events"))


@declared(
    "q_stream_session",
    oracle="""
    WITH e AS (
      SELECT user_id, date_trunc('second', ts) AS tsec, value FROM events
    ), marked AS (
      SELECT *, CASE WHEN lag(tsec) OVER w IS NULL
                       OR tsec > lag(tsec) OVER w + INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec)
    ), sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsec
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT CAST(epoch(MIN(tsec)) AS BIGINT) AS session_start,
           CAST(epoch(MAX(tsec)) + 1800 AS BIGINT) AS session_end,
           user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
)
def q_stream_session(spark, sf_dir):
    """B48 in batch mode, ORACLE-CHECKED (hazard H6 resolved): both
    engines session-ize on second-truncated event time, so the Spark
    merge rule (merge iff next <= last + gap — session_window merges
    windows that MEET, verified empirically on an exact-gap pair at
    sf0.1) and the oracle's gaps-and-islands reconstruction (new
    session iff diff > gap, strictly) are exactly complementary."""
    ensure_engine_conf(spark)
    ev = scan(spark, sf_dir, "events").withColumn("ts", F.date_trunc("second", "ts"))
    return session_counts(ev)


@declared(
    "q_stream_join",
    oracle="""
    WITH e AS (
      SELECT event_id, date_trunc('second', ts) AS tsec, user_id, event_type
      FROM events
    )
    SELECT v.event_id AS view_event, p.event_id AS purchase_event, v.user_id,
           CAST(epoch(p.tsec) - epoch(v.tsec) AS BIGINT) AS lag_s
    FROM e v JOIN e p ON v.user_id = p.user_id
      AND v.event_type = 'view' AND p.event_type = 'purchase'
      AND p.tsec >= v.tsec AND p.tsec <= v.tsec + INTERVAL 1 HOUR
    """,
)
def q_stream_join(spark, sf_dir):
    """B49 batch face of the stream-stream attribution join (same
    transformation graph as the watermarked streaming face)."""
    ensure_engine_conf(spark)
    return attribution_join(scan(spark, sf_dir, "events"))


@declared(
    "q_stream_dedup",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM (SELECT any_value(event_type) AS event_type
          FROM events GROUP BY event_id)
    GROUP BY event_type
    """,
)
def q_stream_dedup(spark, sf_dir):
    """B49 batch face: event_id dedup then per-type counts.  Oracle-
    checkable because fixture event_ids are unique (dropDuplicates'
    arbitrary-survivor choice cannot differ); the oracle's any_value
    per id mirrors the same survivor semantics."""
    ensure_engine_conf(spark)
    e = scan(spark, sf_dir, "events").dropDuplicates(["event_id"])
    return e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def enrich_with_dim(
    events: DataFrame, dim: DataFrame, *,
    stream_key: str = "user_id", dim_key: str = "c_custkey",
    dim_cols: tuple[str, ...] = ("c_mktsegment", "c_nationkey"),
) -> DataFrame:
    """B91: stream-static enrichment join — the standard "attach the
    dimension" streaming pattern.  The static side is explicitly
    broadcast, so every micro-batch joins map-side against a local
    copy: NO join state, NO watermark requirement (stream-stream joins
    need both), and the stream never shuffles.  At 100 TB/day the
    stream side stays partition-parallel and the dim refresh cadence
    is a re-broadcast, not a reshuffle.  Left join keeps stream rows
    whose key misses the dim (slowly-arriving dimension rows — route
    to a fixup path downstream rather than dropping events).

    Works identically on a batch frame (same transformation graph) —
    that batch face is what the oracle checks; the streaming face is
    pinned stream==batch by tests/test_streaming.py."""
    d = dim.select(F.col(dim_key).alias(stream_key), *dim_cols)
    return events.join(F.broadcast(d), stream_key, "left")


@declared(
    "q_stream_enrich",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def q_stream_enrich(spark, sf_dir):
    """B91 batch face of the stream-static enrichment join: events
    enriched with the customer dimension (broadcast), rolled up per
    (segment, event_type)."""
    ensure_engine_conf(spark)
    ev = scan(spark, sf_dir, "events")
    cust = scan(spark, sf_dir, "customer")
    return (
        enrich_with_dim(ev, cust)
        .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Custom stateful operator: applyInPandasWithState (B49+)
# --------------------------------------------------------------------------

def stateful_first_event(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user novelty detection — emit each user's FIRST event (by
    (ts, event_id)) exactly once across the whole stream, with one
    boolean of state per user.

    This is the escape hatch for stateful semantics the built-in
    operators can't express (the built-ins cover dedup/session/window;
    arbitrary per-key state machines need this API).  State is one
    tuple per key, Arrow-batched per micro-batch — at 100 TB the state
    store is RocksDB-backed and sized by #distinct keys, not events.

    Emission is first-by-processing-order across micro-batches; it
    equals the event-time first when the source replays in time order
    (log/Kafka streams are time-ordered per partition — asserted
    against the batch face in tests/test_streaming.py).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id long, first_ts_s long, first_event_id long, first_value double"

    def first_fn(key, pdf_iter, state):
        if state.exists:
            for _ in pdf_iter:  # drain: user already emitted
                pass
            return
        best = None
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            row = pdf.iloc[0]
            if best is None or (row.ts, row.event_id) < (best.ts, best.event_id):
                best = row
        if best is not None:
            state.update((True,))
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "first_ts_s": [int(best.ts.timestamp())],
                    "first_event_id": [int(best.event_id)],
                    "first_value": [float(best.value)],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        first_fn, out_schema, "done boolean", "append", GroupStateTimeout.NoTimeout
    )


@declared(
    "q_stream_first",
    oracle="""
    SELECT user_id,
           CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT)
             AS first_ts_s,
           event_id AS first_event_id,
           value AS first_value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_stream_first(spark, sf_dir):
    """B49+ batch face of the custom stateful first-event operator:
    per-user first event by (ts, event_id), as min(struct(...)) —
    lexicographic struct-min == the composite ordering, and unlike a
    row_number window it PARTIAL-aggregates map-side: the shuffle
    carries one candidate row per (partition, user), not every event.
    Equivalence with the stream face is asserted by
    test_stream_first_equals_batch."""
    ensure_engine_conf(spark)
    ev = scan(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "value")).alias("m")
    )
    return m.select(
        "user_id",
        F.col("m.ts").cast("long").alias("first_ts_s"),
        F.col("m.event_id").alias("first_event_id"),
        F.col("m.value").alias("first_value"),
    )


def stream_to_parquet(
    stream_df: DataFrame, path: str, checkpoint: str, *, timeout_s: int = 120
) -> None:
    """Exactly-once streaming parquet sink (B45+): file sink + WAL
    checkpoint, driven with Trigger.AvailableNow (drain everything
    available, then stop — the batch-like face of a continuous sink).

    Exactly-once mechanics at any scale: the file sink commits each
    micro-batch's files atomically through the checkpoint's write-ahead
    metadata log, so a restart after ANY failure point either replays
    an uncommitted batch (its part-files were never registered — the
    re-read ignores orphans) or skips a committed one.  Readers see
    each input row exactly once, verified across a kill/restart by
    tests/test_streaming.py::test_stream_parquet_sink_exactly_once.
    """
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream_to_parquet did not drain in {timeout_s}s")
