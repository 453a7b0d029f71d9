"""Sensor-as-stream (A4/B50): poll-until-predicate as a terminating
Structured Streaming query.

Reference parity: HttpSensor poke loop — poll every ``poke_interval``
seconds until ``response_check`` returns True or ``timeout`` elapses
(dags/update_tr_from_ex_dag.py:118-130), with the 3-way predicate
semantics of ``check_github_action_run_status`` (:18-39): True = done,
False = keep polling, raise = hard fail.

Spark-native form: a rate source ticks at the poke interval; each
micro-batch evaluates the predicate via ``foreachBatch`` and stops the
query on success — non-blocking, observable through the streaming UI,
and cancellable like any query (the A11 timeout analogue).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import SparkSession


class SensorTimeout(TimeoutError):
    """Sensor did not succeed within its timeout budget (reference:
    AirflowSensorTimeout after timeout=3600, update_tr_from_ex_dag.py:128)."""


class SensorFailed(RuntimeError):
    """Predicate raised — done-with-failure (reference: AirflowException
    branches, update_tr_from_ex_dag.py:29-32,36-39)."""


def run_sensor_stream(
    spark: SparkSession,
    predicate: Callable[[], bool],
    *,
    poke_interval_s: float = 60.0,
    timeout_s: float = 3600.0,
) -> int:
    """Run the predicate on a streaming tick until it returns True.

    Returns the number of pokes taken.  Raises SensorTimeout /
    SensorFailed mirroring the reference's 3-way outcome.
    """
    state = {"pokes": 0, "done": False, "error": None}

    def poke(batch_df, batch_id) -> None:  # noqa: ANN001 — foreachBatch contract
        if state["done"] or state["error"] is not None:
            return
        if batch_df.isEmpty():
            return  # rate source warm-up tick, not a poke
        state["pokes"] += 1
        try:
            if predicate():
                state["done"] = True
        except Exception as exc:  # noqa: BLE001 — 3-way predicate contract
            state["error"] = exc

    ticks = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    # poke cadence = micro-batch trigger cadence (rate rowsPerSecond is
    # integer-only, so sub-1Hz poking is expressed via the trigger)
    query = (
        ticks.writeStream.foreachBatch(poke)
        .trigger(processingTime=f"{max(int(poke_interval_s * 1000), 50)} milliseconds")
        .start()
    )
    try:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if state["error"] is not None:
                raise SensorFailed(str(state["error"])) from state["error"]
            if state["done"]:
                return state["pokes"]
            time.sleep(min(0.05, poke_interval_s / 10))
        raise SensorTimeout(f"sensor not done after {timeout_s}s ({state['pokes']} pokes)")
    finally:
        query.stop()
