"""Atomic run-ledger: the engine's replacement for the reference's
Postgres metadata DB (``docker-compose.yaml:58``, SURVEY.md §1.2 —
"DagRun/TaskInstance state" -> "a small parquet table the engine owns").

Every completed DagRun is recorded as one immutable parquet directory
under the ledger root, committed with WRITE-TEMP-THEN-RENAME:

    <root>/_tmp_<uuid>/part-*.parquet      (in flight, invisible)
    <root>/run_id=<pipeline>__<uuid>/      (committed, atomic rename)

``os.rename`` of a directory is atomic on POSIX (and HDFS); readers
glob only ``run_id=*`` directories, so a reader NEVER sees a
half-written run and two concurrent writers NEVER collide (each run
owns a unique directory; there is no shared file to append to — the
classic parquet-append lost-update problem is designed out rather than
locked around).  On S3-style object stores, where rename is
copy+delete, swap the commit step for a real table-format commit
protocol (Delta/Iceberg) behind the same ``record()`` signature.

The ledger is sized for metadata, not data: one row per stage per run,
one small file per run.  Compaction (coalescing old run directories)
can run offline without blocking writers — committed directories are
immutable.
"""

from __future__ import annotations

import os
import uuid
from typing import TYPE_CHECKING, Any, Mapping

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:
    from artemia_airflow_spark.pipeline import StageResult

RUN_SCHEMA = (
    "pipeline string, run_id string, stage string, state string, "
    "attempts int, error string, value_json string, "
    "started_at double, finished_at double, "
    "duration_s double, sla_missed boolean, source string"
)


def _to_json(value: Any) -> str | None:
    """JSON-encode a stage's XCom value if it is cleanly serializable
    (Airflow's XCom contract); None otherwise — a non-serializable
    value simply makes that stage non-resumable, never an error."""
    import json

    try:
        return json.dumps(value)
    except (TypeError, ValueError):
        return None


class RunLedger:
    """Append-only DagRun history with atomic per-run commits."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- write ---------------------------------------------------------
    def record(
        self,
        spark: SparkSession,
        pipeline: str,
        results: Mapping[str, "StageResult"],
        *,
        started_at: float = 0.0,
        finished_at: float = 0.0,
        source: str = "scheduled",
    ) -> str:
        """Commit one run's per-stage outcomes; returns the run_id.

        ``source`` is the Airflow run_type analogue ("scheduled" /
        "manual" / "backfill" — r10, VERDICT r9 missing #2): it rides
        every stage row so ``runs()``/audits can tell a
        trigger_now(conf=...) run from the cron ticker's.  Runs
        recorded before r10 read back with a NULL source (the explicit
        read schema null-fills old directories).

        The parquet write lands in a ``_tmp_`` directory; the single
        ``os.rename`` at the end is the commit point — before it the
        run is invisible to :meth:`read`, after it the run is complete.
        A writer dying mid-write leaves only a ``_tmp_`` orphan (safe
        to sweep), never a torn run.

        A zero-stage run (empty ``results``) is NOT committed: an empty
        DataFrame write produces a ``run_id=*`` directory with no part
        files, which passes :meth:`read`'s listdir check but breaks
        ``spark.read.parquet`` ('unable to infer schema') for the whole
        ledger root when such runs are the only committed ones.  The
        run_id is still returned; there is simply nothing to record.
        """
        run_id = f"{pipeline}__{uuid.uuid4().hex}"
        if not results:
            return run_id
        rows = [
            (
                pipeline,
                run_id,
                stage,
                r.state,
                int(r.attempts),
                str(r.error) if r.error is not None else None,
                _to_json(r.value) if r.state == "success" else None,
                float(started_at),
                float(finished_at),
                float(getattr(r, "duration_s", 0.0)),
                bool(getattr(r, "sla_missed", False)),
                source,
            )
            for stage, r in results.items()
        ]
        tmp = os.path.join(self.root, f"_tmp_{uuid.uuid4().hex}")
        final = os.path.join(self.root, f"run_id={run_id}")
        df = spark.createDataFrame(rows, RUN_SCHEMA).coalesce(1)
        # drop the run_id data column: it rides the directory name as a
        # partition column, so read() recovers it without storing it twice
        df.drop("run_id").write.mode("overwrite").parquet(tmp)
        os.rename(tmp, final)  # COMMIT (atomic on POSIX/HDFS)
        return run_id

    # -- read ----------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        """All committed runs (committed = renamed into ``run_id=*``).

        Returns an empty frame with the full schema when no run has
        committed yet.
        """
        committed = [
            os.path.join(self.root, d)
            for d in os.listdir(self.root)
            if d.startswith("run_id=")
        ]
        if not committed:
            return spark.createDataFrame([], RUN_SCHEMA)
        # explicit schema: runs recorded BEFORE the round-6 SLA columns
        # read back null-filled instead of poisoning schema inference
        # across mixed-vintage run directories
        return (
            spark.read.schema(RUN_SCHEMA)
            .option("basePath", self.root)
            .parquet(os.path.join(self.root, "run_id=*"))
        )

    def resumable_values(self, spark: SparkSession, run_id: str) -> dict[str, Any]:
        """XCom values of the stages that SUCCEEDED in ``run_id`` with a
        JSON-serializable value — the state a resumed run can skip
        re-computing.  Succeeded stages whose value didn't serialize are
        absent (they re-execute on resume; correct, just not free)."""
        import json

        from pyspark.sql import functions as F

        rows = (
            self.read(spark)
            .filter(
                (F.col("run_id") == run_id)
                & (F.col("state") == "success")
                & F.col("value_json").isNotNull()
            )
            .select("stage", "value_json")
            .collect()
        )
        return {r.stage: json.loads(r.value_json) for r in rows}

    def last_run_states(
        self, spark: SparkSession, pipeline: str
    ) -> dict[str, str] | None:
        """{stage: state} of ``pipeline``'s most recently STARTED
        committed run, or None when the pipeline has never run — the
        depends_on_past gate's read (Pipeline.run).  Metadata-sized
        collect: one run's stage rows."""
        from pyspark.sql import functions as F

        df = self.read(spark).filter(F.col("pipeline") == pipeline)
        last = df.groupBy("run_id").agg(
            F.max("started_at").alias("t")
        ).orderBy(F.col("t").desc(), F.col("run_id")).limit(1).collect()
        if not last:
            return None
        rows = df.filter(F.col("run_id") == last[0].run_id).select(
            "stage", "state"
        ).collect()
        return {r.stage: r.state for r in rows}

    def runs(self, spark: SparkSession, pipeline: str | None = None) -> DataFrame:
        """One row per committed run with aggregate state (``success``
        iff no stage failed), attempt and SLA-miss totals — the ONE
        definition of "a run" every consumer (health, runs_report,
        depends_on_past, tests) builds on; r13 review retired
        runs_report's parallel copy of this aggregate."""
        from pyspark.sql import functions as F

        df = self.read(spark)
        if pipeline is not None:
            df = df.filter(F.col("pipeline") == pipeline)
        return df.groupBy("pipeline", "run_id").agg(
            F.count(F.lit(1)).alias("n_stages"),
            F.max(
                F.when(F.col("state").isin("failed", "upstream_failed"), 1).otherwise(0)
            ).alias("any_failed"),
            F.sum("attempts").cast("bigint").alias("total_attempts"),
            F.sum(F.when(F.col("sla_missed"), 1).otherwise(0))
            .cast("bigint").alias("n_sla_missed"),
            F.min("started_at").alias("started_at"),
            F.max("finished_at").alias("finished_at"),
            # one source per run (every stage row carries the same
            # value; max is null-safe for pre-r10 directories)
            F.max("source").alias("source"),
        )

    def runs_report(
        self, spark: SparkSession, *, limit_per_pipeline: int = 20
    ) -> DataFrame:
        """Human-facing recent-runs report — the engine twin of the
        reference's web-UI runs page (docker-compose.yaml:118-133: the
        apiserver/flower surface is the ONE reference affordance the
        engine previously answered only with the health rollup,
        VERDICT r12 missing #3): the ``limit_per_pipeline`` most
        recent runs of every pipeline, one row per run, newest first.

        Columns: (pipeline, run_seq [1 = newest by started_at],
        state ['success'|'failed'], n_stages, total_attempts,
        n_sla_missed, duration_ms, source).  run_seq replaces the
        uuid-random run_id in the report face so the output is
        deterministic for fixtures; operators who need the id join
        back through :meth:`runs`.

        Scale shape: the ledger is one row per stage per run
        (metadata-sized), so this is one run-level aggregate plus a
        per-pipeline ranking window over run-count-sized relations —
        never anything corpus-shaped."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        per_run = self.runs(spark)
        w = Window.partitionBy("pipeline").orderBy(
            F.col("started_at").desc(), F.col("run_id")
        )
        return (
            per_run.withColumn(
                "run_seq", F.row_number().over(w).cast("bigint")
            )
            .filter(F.col("run_seq") <= limit_per_pipeline)
            .select(
                "pipeline", "run_seq",
                F.when(F.col("any_failed") == 1, F.lit("failed"))
                .otherwise(F.lit("success")).alias("state"),
                F.col("n_stages").cast("bigint").alias("n_stages"),
                "total_attempts", "n_sla_missed",
                F.floor(
                    (F.col("finished_at") - F.col("started_at")) * 1000
                    + F.lit(0.5)
                ).cast("bigint").alias("duration_ms"),
                "source",
            )
        )

    def health(self, spark: SparkSession) -> DataFrame:
        """Per-pipeline health rollup — the engine face of the
        reference's live-observability surface (flower + the
        healthcheck blocks, docker-compose.yaml:315-332, :97-101):
        run/failure counts, stage failure and SLA-miss counts, and
        exact p50/p95 stage durations as scaled-int milliseconds
        (floor(s*1000+0.5) — the registry's engine-portable encoding
        for interpolated percentiles; never a raw double).

        Duration percentiles cover EXECUTED stages only: ``skipped``
        and ``upstream_failed`` rows record ``duration_s = 0.0`` for a
        stage that never ran, and including them drags p50/p95 toward
        zero, misreporting stage latency (ADVICE r8).  ``failed``
        stages DID run, so their durations stay in.  Counts
        (``n_stages`` etc.) still cover every recorded row.

        Two metadata-sized aggregations (run-level over ``runs()``,
        stage-level over ``read()``) joined per pipeline — the ledger
        is one row per stage per run, so even a year of runs is
        broadcast-sized next to any data table."""
        from pyspark.sql import functions as F

        per_run = self.runs(spark).groupBy("pipeline").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
            F.sum("any_failed").cast("bigint").alias("n_failed_runs"),
        )
        executed_dur = F.when(
            ~F.col("state").isin("skipped", "upstream_failed"),
            F.col("duration_s"),
        )
        per_stage = self.read(spark).groupBy("pipeline").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_stages"),
            F.sum(
                F.when(F.col("state") == "failed", 1).otherwise(0)
            ).cast("bigint").alias("n_stage_failures"),
            F.sum(F.when(F.col("sla_missed"), 1).otherwise(0))
            .cast("bigint").alias("n_sla_missed"),
            F.floor(
                F.percentile(executed_dur, F.lit(0.5)) * 1000 + F.lit(0.5)
            ).cast("bigint").alias("p50_stage_ms"),
            F.floor(
                F.percentile(executed_dur, F.lit(0.95)) * 1000 + F.lit(0.5)
            ).cast("bigint").alias("p95_stage_ms"),
        )
        return per_run.join(per_stage, "pipeline")


def _register_health_query() -> None:
    from artemia_airflow_spark.plans.registry import declared

    # Deterministic ledger fixture: fixed pipelines/stages/durations.
    # run_ids are uuid-random but aggregated away, so the rollup is
    # exactly reproducible; the oracle is the hand-computed VALUES
    # literal (percentile = linear interpolation at p*(n-1), over
    # EXECUTED stages only — skipped rows are excluded, ADVICE r8:
    # ingest durations sorted [1.0,1.5,2.0,2.5,3.0,5.0] -> p50 2.25s,
    # p95 4.5s; export [0.5] (the skipped s2 is out) -> 0.5s / 0.5s).
    _ORACLE = """
    SELECT * FROM (VALUES
      ('ingest', CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(6 AS BIGINT),
       CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(2250 AS BIGINT),
       CAST(4500 AS BIGINT)),
      ('export', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(2 AS BIGINT),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(500 AS BIGINT),
       CAST(500 AS BIGINT))
    ) AS t(pipeline, n_runs, n_failed_runs, n_stages, n_stage_failures,
           n_sla_missed, p50_stage_ms, p95_stage_ms)
    """

    @declared("q_ledger_health", oracle=_ORACLE)
    def q_ledger_health(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Observability query (flower analogue): record a fixed set of
        runs through the real atomic-commit path, read them back, and
        roll up per-pipeline health.  The fixture is deterministic by
        construction (explicit durations), so this is a full
        hash-match oracle row despite the ledger being engine state
        rather than fixture data; ``sf_dir`` is unused by design.

        Temp hygiene (r8 reviews): each invocation gets its OWN
        mkdtemp ledger (concurrent pipeline stages may run this query
        on driver threads, and the returned DataFrame reads its
        parquet lazily — wiping a shared dir would delete the files
        backing another invocation's not-yet-collected result), but
        all of them live under ONE process-scoped parent that is
        removed at process exit, so repeated driver/test runs never
        accumulate litter beyond the process lifetime."""
        from artemia_airflow_spark.functions.core import process_scratch_dir
        from artemia_airflow_spark.pipeline import StageResult

        led = RunLedger(process_scratch_dir("ledger_health_"))
        ok = lambda d, **kw: StageResult("success", duration_s=d, **kw)  # noqa: E731
        runs = [
            ("ingest", {"s1": ok(1.0), "s2": ok(3.0)}),
            ("ingest", {
                "s1": ok(2.0),
                "s2": StageResult("failed", duration_s=5.0, sla_missed=True),
            }),
            ("ingest", {"s1": ok(1.5), "s2": ok(2.5)}),
            ("export", {"s1": ok(0.5), "s2": StageResult("skipped")}),
        ]
        for pipeline, results in runs:
            led.record(spark, pipeline, results)
        return led.health(spark)


def _register_runs_report_query() -> None:
    from artemia_airflow_spark.plans.registry import declared

    # Deterministic fixture (explicit started/finished/attempts), so
    # the report is exactly reproducible; oracle = hand-computed VALUES
    # (run_seq orders started_at DESC per pipeline; duration_ms =
    # floor((finished-started)*1000+0.5); a run is 'failed' iff any
    # stage failed/upstream_failed; attempts sum over ALL rows).
    _ORACLE = """
    SELECT * FROM (VALUES
      ('ingest', CAST(1 AS BIGINT), 'success', CAST(2 AS BIGINT),
       CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(3000 AS BIGINT),
       'scheduled'),
      ('ingest', CAST(2 AS BIGINT), 'failed', CAST(2 AS BIGINT),
       CAST(4 AS BIGINT), CAST(1 AS BIGINT), CAST(12500 AS BIGINT),
       'manual'),
      ('ingest', CAST(3 AS BIGINT), 'success', CAST(2 AS BIGINT),
       CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(10000 AS BIGINT),
       'scheduled'),
      ('export', CAST(1 AS BIGINT), 'success', CAST(1 AS BIGINT),
       CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1250 AS BIGINT),
       'backfill')
    ) AS t(pipeline, run_seq, state, n_stages, total_attempts,
           n_sla_missed, duration_ms, source)
    """

    @declared("q_runs_report", oracle=_ORACLE)
    def q_runs_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Runs-report observability face (r13, VERDICT r12 missing #3
        — the reference's web-UI/flower runs page,
        docker-compose.yaml:118-133): record a fixed set of runs
        through the real atomic-commit path, read them back, and
        report the recent runs per pipeline, newest first.  The
        fixture sets explicit started/finished/attempts so the report
        is a full hash-match oracle row; ``sf_dir`` is unused by
        design.  Shares q_ledger_health's process-scoped scratch
        hygiene (one mkdtemp per invocation under one atexit-reaped
        parent)."""
        from artemia_airflow_spark.functions.core import process_scratch_dir
        from artemia_airflow_spark.pipeline import StageResult

        led = RunLedger(process_scratch_dir("ledger_health_"))
        ok = lambda a: StageResult("success", attempts=a)  # noqa: E731
        runs = [
            # (pipeline, started, finished, source, {stage: result})
            ("ingest", 100.0, 110.0, "scheduled",
             {"s1": ok(1), "s2": ok(2)}),
            ("ingest", 200.0, 212.5, "manual",
             {"s1": ok(1),
              "s2": StageResult("failed", attempts=3, sla_missed=True)}),
            ("ingest", 300.0, 303.0, "scheduled",
             {"s1": ok(1), "s2": StageResult("skipped")}),
            ("export", 50.0, 51.25, "backfill", {"s1": ok(1)}),
        ]
        for pipeline, t0, t1, source, results in runs:
            led.record(
                spark, pipeline, results,
                started_at=t0, finished_at=t1, source=source,
            )
        return led.runs_report(spark)


_register_health_query()
_register_runs_report_query()
