"""State-v2 custom stateful operator via ``transformWithStateInPandas``
(Spark 4 StatefulProcessor API) — the successor to
``applyInPandasWithState`` (streaming/stateful.py): named state
variables with per-state TTL, timers, and RocksDB-backed stores.

``running_user_stats_tws`` mirrors streaming/stateful.py's
``running_user_stats_stream`` — per-user cumulative (count, sum, max)
— so tests can assert both state APIs converge to the same batch
aggregate.  At 100 TB the state store is RocksDB
(``spark.sql.streaming.stateStore.providerClass``), sized by #distinct
keys; transformWithState REQUIRES that provider even locally, so the
runner sets it on the session.

Environment note: Spark's transformWithState Python runner talks to
the JVM over protobuf; in sandboxes without the ``google.protobuf``
package the query fails at start with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE.  ``HAS_PROTOBUF``
gates the test; the applyInPandasWithState operators
(streaming/stateful.py, stateful_first_event) carry the custom-state
coverage where protobuf is unavailable — including the state-v2 TTL
semantics, twinned as ``running_user_stats_ttl`` (event-time idle
expiry: in-band reset + timeout cleanup) so TTL coverage never
depends on this runner.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:
    import pandas as pd

STATS_SCHEMA = "user_id long, n_events long, sum_value double, max_value double"

try:  # transformWithState's Python runner requires protobuf
    from google.protobuf import descriptor as _descriptor  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningStatsProcessor(StatefulProcessor):
    """Per-key running (count, sum, max) in a single ValueState tuple."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", "n long, s double, m double")

    def handleInputRows(
        self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: Any
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        prev = self._state.get() if self._state.exists() else None
        n, s, m = prev if prev is not None else (0, 0.0, float("-inf"))
        for pdf in rows:
            if len(pdf):
                n += len(pdf)
                s += float(pdf["value"].sum())
                m = max(m, float(pdf["value"].max()))
        self._state.update((n, s, m))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "max_value": [m],
            }
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """Stateful per-user running stats on the state-v2 API (update
    mode; emits the running totals for each key touched by a batch).
    The session must use the RocksDB state store provider — see
    ``ROCKSDB_PROVIDER``.

    Gated at call time on ``HAS_PROTOBUF``: Spark's transformWithState
    Python runner cannot start without ``google.protobuf``, and the
    failure surfaces only at stream start
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE) — so rather than
    ship a path that dies mid-query, fall back to the
    applyInPandasWithState twin (streaming/stateful.py), which has the
    identical output contract (STATS_SCHEMA, update mode, running
    totals per key per batch).  Callers get the state-v2 features
    (TTL, timers, RocksDB) wherever protobuf exists and the same
    semantics everywhere else."""
    if not HAS_PROTOBUF:
        import warnings

        warnings.warn(
            "transformWithState unavailable (google.protobuf missing); "
            "falling back to applyInPandasWithState — same output "
            "contract, but state-v2 features (TTL, timers, RocksDB "
            "named state) are NOT active",
            RuntimeWarning,
            stacklevel=2,
        )
        from artemia_airflow_spark.streaming.stateful import running_user_stats_stream

        return running_user_stats_stream(events)
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningStatsProcessor(),
            STATS_SCHEMA,
            "Update",
            "None",
        )
    )
