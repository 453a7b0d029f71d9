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
    "duration_s double, sla_missed boolean"
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
    ) -> str:
        """Commit one run's per-stage outcomes; returns the run_id.

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

    def runs(self, spark: SparkSession, pipeline: str | None = None) -> DataFrame:
        """One row per committed run with aggregate state (``success``
        iff no stage failed)."""
        from pyspark.sql import functions as F

        df = self.read(spark)
        if pipeline is not None:
            df = df.filter(F.col("pipeline") == pipeline)
        return df.groupBy("pipeline", "run_id").agg(
            F.count(F.lit(1)).alias("n_stages"),
            F.max(
                F.when(F.col("state").isin("failed", "upstream_failed"), 1).otherwise(0)
            ).alias("any_failed"),
            F.min("started_at").alias("started_at"),
            F.max("finished_at").alias("finished_at"),
        )
