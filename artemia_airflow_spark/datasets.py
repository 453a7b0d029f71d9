"""Data-aware scheduling (A18): Airflow's Datasets/Assets model —
"run pipeline B when pipeline A has updated the data B reads" —
instead of guessing a cron offset between producer and consumer.

Airflow semantics reproduced:
- a pipeline declares ``outlets`` (dataset URIs it updates on a
  successful run) and ``triggers_on`` (URIs it consumes);
- a consumer becomes runnable when ALL its ``triggers_on`` datasets
  have been updated since its last run (Airflow's AND condition);
- updates only count from SUCCESSFUL producer runs.

``run_data_aware`` executes one data-aware WAVE: the given seed
pipelines run first (these are the cron/manual-triggered roots), every
success emits its outlets, and consumers fire as their conditions
complete — cascading until quiescent.  Deterministic order
(registration order among runnable pipelines) so reruns are
reproducible.  The once-per-wave guard bounds every wave: a dataset
CYCLE with no external seed simply never fires (no run, no error) —
there is no explicit cycle detector; inspect the returned run map for
pipelines you expected to fire.

TxTable integration: a transactional table (sources/txtable.py) is the
natural dataset — its commit log IS the update signal.  Use
``txtable_version(uri)`` as the change detector for EXTERNAL updates
(a producer outside this driver): ``poll_txtable_datasets`` compares
the last-seen committed version per table root and emits an update
event when it advanced, so a consumer pipeline can be driven by
another process's commits without any message bus.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from artemia_airflow_spark.pipeline import Pipeline


def run_data_aware(
    pipelines: list,
    spark,
    *,
    seeds: list[str] | None = None,
    pre_updated: set[str] | None = None,
    params: dict | None = None,
    raise_on_failure: bool = True,
) -> dict[str, dict]:
    """Execute one data-aware wave over ``pipelines``.

    ``seeds`` names the pipelines that start the wave (default: every
    pipeline with no ``triggers_on`` — the schedule-triggered roots);
    ``pre_updated`` marks dataset URIs already fresh before the wave
    (e.g. detected by :func:`poll_txtable_datasets`).  Returns
    {pipeline_name: per-stage results} for every pipeline that ran.

    Failure semantics: every pipeline runs with its failures CONTAINED
    (one failing seed never aborts unrelated seeds or discards the
    partial run map — the wave always completes); a failed producer
    emits no outlets.  With ``raise_on_failure=True`` (default) a
    :class:`WaveFailed` is raised AFTER the wave drains, carrying the
    full run map (``.ran``) and the failed pipeline names.
    """
    by_name = {p.name: p for p in pipelines}
    if seeds is None:
        seeds = [p.name for p in pipelines if not getattr(p, "triggers_on", ())]
    unknown = [s for s in seeds if s not in by_name]
    if unknown:
        raise ValueError(f"unknown seed pipelines: {unknown}")

    updated: set[str] = set(pre_updated or ())
    ran: dict[str, dict] = {}
    # dedupe seeds order-preservingly: a duplicate name in the caller's
    # list must not run that pipeline twice in one wave (the once-per-
    # wave guard only protects _enqueue_runnable additions — ADVICE r6)
    queue = list(dict.fromkeys(seeds))

    # consumers whose conditions are ALREADY met by pre_updated fire
    # even with no seeds (the poll-driven entry path: an external
    # producer's commits satisfied them before this wave started)
    def _enqueue_runnable() -> None:
        queue.extend(
            p.name
            for p in pipelines
            if p.name not in ran
            and p.name not in queue
            and getattr(p, "triggers_on", ())
            and all(u in updated for u in p.triggers_on)
        )

    _enqueue_runnable()

    failed: list[str] = []
    while queue:
        name = queue.pop(0)
        pipe = by_name[name]
        # failures are contained per pipeline so the wave always drains
        results = pipe.run(spark, params, raise_on_failure=False)
        ran[name] = results
        ok = all(
            r.state in ("success", "skipped") for r in results.values()
        )
        if ok:
            updated.update(getattr(pipe, "outlets", ()))
        else:
            failed.append(name)
        _enqueue_runnable()

    if failed and raise_on_failure:
        raise WaveFailed(failed, ran)
    return ran


class WaveFailed(RuntimeError):
    """One or more pipelines in a data-aware wave failed; the wave
    still drained — ``.ran`` holds every pipeline's results and
    ``.failed`` the failing names."""

    def __init__(self, failed: list[str], ran: dict[str, dict]) -> None:
        self.failed = failed
        self.ran = ran
        super().__init__(f"data-aware wave: pipelines failed: {failed}")


def txtable_version(root: str) -> int | None:
    """Committed head version of the TxTable at ``root`` (None when no
    table exists there yet) — the change signal for dataset polling.
    Delegates to the table's own log-layout implementation so external
    polling can never diverge from the table's head."""
    from artemia_airflow_spark.sources.txtable import head_version

    return head_version(root)


def poll_txtable_datasets(
    uris: dict[str, str], last_seen: dict[str, int]
) -> dict[str, int]:
    """External-producer change detection: ``uris`` maps dataset URI ->
    TxTable root; returns {uri: new_version} for URIs whose committed
    version advanced past ``last_seen``.  ``last_seen`` is NOT touched
    here — commit it with :func:`commit_seen` only AFTER the consumer
    wave succeeds, so a crashed/failed wave re-observes the same event
    on the next poll (at-least-once delivery, like Airflow dataset
    events persisting until consumed; the peek-then-commit split is
    what prevents an event from being lost to a mid-wave crash).
    Feed ``set(pending)`` to :func:`run_data_aware` as ``pre_updated``
    — another process's commits drive this driver's consumers with no
    message bus, because the commit log IS the event log."""
    pending: dict[str, int] = {}
    for uri, root in uris.items():
        v = txtable_version(root)
        if v is not None and v > last_seen.get(uri, -1):
            pending[uri] = v
    return pending


def commit_seen(last_seen: dict[str, int], pending: dict[str, int]) -> None:
    """Acknowledge consumed dataset events (call after a successful
    wave): advances ``last_seen`` to the polled versions."""
    last_seen.update(pending)
