"""Exactly-once streaming ingestion into the transactional table tier.

``stream_to_txtable`` bridges the two storage faces the engine ships:
Structured Streaming (B45/B82) and the ACID commit-log table (B89).
Each micro-batch lands as ONE TxTable append commit stamped with the
(query_name, batch_id) pair in the commit meta; a replayed batch after
any crash point is detected from the table's own commit log and
skipped, so readers of the table see every input row exactly once —
without trusting the streaming checkpoint alone.

Why the table-side stamp matters: the foreachBatch contract is only
at-least-once (the checkpoint records batch completion AFTER the user
handler ran, so a crash between append-commit and checkpoint-commit
replays the batch).  Delta/Iceberg solve this with txnAppId/txnVersion
idempotent writes; the TxTable meta stamp is the same design.

Scale shape: per-batch overhead is one append commit (O(1) log I/O via
the auto-rebase path) plus, once per RUN, a backward walk of the
commit log to find this query's newest stamp (bounded by commits since
the query last ran; the in-memory cache makes every later batch O(1)).
The batch data itself is written by executors as normal parquet adds —
the driver never touches rows.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from artemia_airflow_spark.sources.txtable import (
    TxTable,
    _version_path,
    head_version,
)


def last_committed_batch(root: str, query_name: str) -> int | None:
    """Newest ``stream_batch_id`` any commit at ``root`` carries for
    ``query_name`` (None if the query never committed).  Walks the log
    backward from head so the cost is bounded by the commits since
    this query's last append, not the full log length."""
    head = head_version(root)
    if head is None:
        return None
    for v in range(head, -1, -1):
        with open(_version_path(root, v)) as f:
            meta = json.load(f).get("meta") or {}
        if meta.get("stream_query") == query_name:
            return int(meta["stream_batch_id"])
    return None


def stream_to_txtable(
    stream_df: DataFrame,
    root: str,
    checkpoint: str,
    *,
    query_name: str,
    timeout_s: int = 120,
) -> None:
    """Drain everything available from ``stream_df`` into the TxTable
    at ``root`` (which must already exist — create it with
    ``TxTable.create`` so the key column is declared), exactly once.

    Trigger.AvailableNow, like :func:`stream_to_parquet`: drain, then
    stop — call again any time to ingest what arrived since; the
    streaming checkpoint skips consumed source files and the
    table-side batch stamp skips replayed half-committed batches.

    Contract (same as Delta's txnAppId idempotent writes):
    ``query_name`` is bound to ONE checkpoint lineage — batch ids are
    only monotone within a checkpoint, so restarting with a FRESH
    checkpoint under the same query_name would wrongly skip its
    restarted batch ids.  New checkpoint => new query_name.
    """
    # per-RUN memo: one disk walk on the first batch, O(1) after
    state: dict[str, int | None] = {}

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if "last" not in state:
            state["last"] = last_committed_batch(root, query_name)
        last = state["last"]
        if last is not None and batch_id <= last:
            return  # replayed batch: its append already committed
        t = TxTable(batch_df.sparkSession, root)
        t.append(
            batch_df,
            meta={"stream_query": query_name, "stream_batch_id": int(batch_id)},
        )
        state["last"] = batch_id

    q = (
        stream_df.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream_to_txtable did not drain in {timeout_s}s")
