"""Spark-native pipeline orchestration (SURVEY.md §2-A, A1-A12).

Re-implements the reference's Airflow surface as a small driver-side
library whose unit of data exchange is the DataFrame:

- A1  Pipeline(name, schedule, tags)            <- DAG(...)
- A2  ``a >> b`` / ``a >> [b, c]`` on Stage     <- dependency edges
- A3  HttpStage (injectable transport)          <- HttpOperator
- A4  SensorStage (poll loop w/ 3-way predicate)<- HttpSensor(poke)
- A6  PythonStage (arbitrary callable)          <- PythonOperator
- A7  upstream results dict ("XCom" = DataFrame/scalar handoff)
- A8  RetryPolicy (fixed/exponential, capped)   <- retries/backoff
- A9  trigger rules all_success|one_failed|all_failed
- A10 schedule string (cron held for an external ticker; `run()` is
      one DagRun — catchup=False semantics)
- A11 run_timeout_s watchdog
- A12 Connections registry (never logged)

Spark itself replaces the Celery/Redis substrate (A13): intra-query
distribution is the executors' job; this layer only sequences queries.
Independent ready stages run concurrently on driver threads so
independent Spark jobs overlap (FAIR-pool friendly), mirroring the
reference's fan-out at dags/update_tr_from_ex_dag.py:154.
"""

from __future__ import annotations

import threading
import time
import warnings
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

# ---------------------------------------------------------------------------
# Retry policy (A8)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RetryPolicy:
    """Reference defaults: 1 retry / 5 min (update_tr_from_ex_dag.py:72-76);
    azure task: 3 retries, exponential 3min -> cap 10min
    (hello_function_dag.py:30-33)."""

    retries: int = 0
    retry_delay_s: float = 300.0
    exponential_backoff: bool = False
    max_retry_delay_s: float | None = None

    def delays(self) -> list[float]:
        out = []
        for attempt in range(self.retries):
            d = self.retry_delay_s * (2**attempt if self.exponential_backoff else 1)
            if self.max_retry_delay_s is not None:
                d = min(d, self.max_retry_delay_s)
            out.append(d)
        return out


# ---------------------------------------------------------------------------
# Connections (A12)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Connection:
    """Named credentialed endpoint (reference: github_api_conn etc.,
    update_tr_from_ex_dag.py:47-51).  ``repr`` hides the secret."""

    conn_id: str
    base_url: str = ""
    login: str = ""
    password: str = ""

    def __repr__(self) -> str:  # never leak secrets into logs
        return f"Connection(conn_id={self.conn_id!r}, base_url={self.base_url!r})"


class Connections:
    def __init__(self) -> None:
        self._store: dict[str, Connection] = {}

    def register(self, conn: Connection) -> None:
        self._store[conn.conn_id] = conn

    def get(self, conn_id: str) -> Connection:
        if conn_id not in self._store:
            raise KeyError(f"unknown connection {conn_id!r}")
        return self._store[conn_id]

    @classmethod
    def from_spark_conf(cls, spark, prefix: str = "engine.conn.") -> "Connections":
        """A12: resolve connections from the Spark conf namespace
        ``engine.conn.<name>.{base_url,login,password}`` — the engine's
        analogue of the reference's secrets-backed connection store
        (dags/update_tr_from_ex_dag.py:47-51); values never logged."""
        out = cls()
        try:
            entries = spark.sparkContext.getConf().getAll()
        except Exception:
            entries = []
        by_name: dict[str, dict] = {}
        for k, v in entries:
            if k.startswith("spark." + prefix) or k.startswith(prefix):
                rest = k.split(prefix, 1)[1]
                name, _, field = rest.partition(".")
                if field in ("base_url", "login", "password"):
                    by_name.setdefault(name, {})[field] = v
        for name, fields in by_name.items():
            out.register(Connection(conn_id=name, **fields))
        return out


# ---------------------------------------------------------------------------
# Stages (A2/A3/A4/A6) & trigger rules (A9)
# ---------------------------------------------------------------------------

TRIGGER_RULES = ("all_success", "one_failed", "all_failed", "all_done")


class TaskGroup:
    """Airflow TaskGroup parity (round 9): a named grouping that
    PREFIXES member task_ids (``group.task``, nested groups chain) and
    participates in ``>>`` arrows as a unit — ``a >> group`` wires
    ``a`` to the group's ROOTS (members with no upstream inside the
    group), ``group >> b`` wires its LEAVES to ``b``.  Created via
    ``Pipeline.task_group(name)`` (a context manager); stages added
    inside the ``with`` block join every group on the stack, so an
    outer group's arrows also cover nested members — Airflow's
    semantics.  Purely structural: execution, trigger rules, pools and
    the ledger all see the prefixed task_ids."""

    def __init__(self, name: str) -> None:
        if not name or "." in name:
            # dots are the group separator; allowing them in a group
            # name would make "a.b" ambiguous between nesting and name
            raise ValueError("task group name must be non-empty, no dots")
        self.name = name
        self.members: list["Stage"] = []
        # arrows touching a group that is still OPEN (inside its with
        # block) are DEFERRED and resolved when the block exits — an
        # eager resolution would miss members/edges declared after the
        # arrow and silently drop dependencies (r9 review).  Airflow
        # resolves group wiring at DAG-build completion for the same
        # reason.
        self.closed = False
        self._pending_upstream: list["Stage"] = []
        self._pending_downstream: list[object] = []

    def _close(self) -> None:
        """Resolve deferred arrows (called by task_group's context
        exit).  Downstream targets may themselves be open groups —
        wiring to them re-defers on their pending list."""
        self.closed = True
        for s in self._pending_upstream:
            for r in self._roots():
                s >> r
        self._pending_upstream.clear()
        for t in self._pending_downstream:
            for leaf in self._leaves():
                leaf >> t
        self._pending_downstream.clear()

    def _member_ids(self) -> set[str]:
        return {s.task_id for s in self.members}

    def _roots(self) -> list["Stage"]:
        ids = self._member_ids()
        return [
            s for s in self.members
            if not any(u.task_id in ids for u in s.upstream)
        ]

    def _leaves(self) -> list["Stage"]:
        ids = self._member_ids()
        return [
            s for s in self.members
            if not any(d.task_id in ids for d in s.downstream)
        ]

    def __rshift__(self, other):
        if not self.closed:
            self._pending_downstream.append(other)
            return other
        for leaf in self._leaves():
            leaf >> other
        return other

    def __lshift__(self, other):
        targets = other if isinstance(other, list) else [other]
        for t in targets:
            t >> self
        return other

    def __repr__(self) -> str:
        return f"TaskGroup({self.name!r}, {len(self.members)} members)"


class Stage:
    """A node in the pipeline DAG.  ``fn(ctx)`` receives a StageContext
    and may return anything; DataFrame returns are the idiomatic
    "XCom" (A7) — a scalar XCom is just its 1x1 degenerate case."""

    def __init__(
        self,
        task_id: str,
        fn: Callable[["StageContext"], Any],
        *,
        retry: RetryPolicy | None = None,
        trigger_rule: str = "all_success",
        sla_s: float | None = None,
        pool: str | None = None,
        priority_weight: int = 1,
        on_failure: Callable[[str, "StageResult"], None] | None = None,
        on_retry: Callable[[str, int, BaseException], None] | None = None,
        depends_on_past: bool = False,
        execution_timeout_s: float | None = None,
        isolate: bool = False,
    ) -> None:
        if trigger_rule not in TRIGGER_RULES:
            raise ValueError(f"trigger_rule must be one of {TRIGGER_RULES}")
        if execution_timeout_s is not None and execution_timeout_s <= 0:
            raise ValueError("execution_timeout_s must be > 0")
        if isolate and execution_timeout_s is None:
            raise ValueError(
                "isolate=True only makes sense with execution_timeout_s: "
                "process isolation exists to make the deadline kill real"
            )
        self.task_id = task_id
        self.fn = fn
        self.retry = retry or RetryPolicy()
        self.trigger_rule = trigger_rule
        # Airflow pools: a named, slot-limited queue; a ready stage whose
        # pool is full is QUEUED (deferred to a later wave), never failed
        self.pool = pool
        # Airflow priority_weight: under contention (pool full / width
        # cap hit) higher-weight ready stages win slots first; ties keep
        # declaration order (stable sort).  Irrelevant without caps —
        # uncapped ready stages all run concurrently anyway.
        self.priority_weight = priority_weight
        # Airflow on_failure_callback parity: fires ONCE, after the final
        # attempt only, with the same exception-isolation contract as
        # on_sla_miss (a broken callback never changes the stage outcome)
        self.on_failure = on_failure
        # Airflow on_retry_callback parity: fires after each FAILED
        # attempt that will be retried (never after the final one —
        # that's on_failure's moment), receiving (task_id, attempt,
        # error); same exception isolation
        self.on_retry = on_retry
        # Branching (A17): a branch stage's return value names the
        # downstream task_id(s) allowed to run; its other DIRECT
        # downstream stages are skipped (BranchPythonOperator
        # semantics).  Set via branch_stage(); plain stages ignore it.
        self.is_branch = False
        # Airflow-parity SLA: a wall-clock budget for the stage.  A miss
        # is RECORDED (StageResult.sla_missed) and notified
        # (Pipeline.on_sla_miss), never a failure — Airflow's
        # sla_miss_callback semantics, distinct from the hard A11
        # run_timeout that aborts the run.
        self.sla_s = sla_s
        # Airflow execution_timeout parity (r10, VERDICT r9 missing #1):
        # a HARD per-attempt deadline, distinct from the advisory
        # sla_s above (records, never kills) and the run-scoped A11
        # run_timeout_s.  A timed-out attempt has its Spark job group
        # cancelled (interruptOnCancel), consumes ONE retry attempt,
        # and surfaces as StageTimeout — so it composes with
        # RetryPolicy, on_retry, on_failure and trigger rules exactly
        # like any other attempt failure.
        self.execution_timeout_s = execution_timeout_s
        # Opt-in PROCESS isolation for the hard deadline (r11, VERDICT
        # r10 missing #1): the attempt runs in a forked child that the
        # deadline SIGKILLs — a real kill, Airflow's task-process
        # semantics — instead of the default thread + job-group-cancel
        # path, whose pure-Python zombies CPython cannot kill.
        # Constraints (the IPC cost of a real kill): the stage body
        # must NOT touch ctx.spark (the child must never speak to the
        # parent's JVM/py4j sockets), and its return value must be
        # picklable (it crosses a process pipe — "XCom-serializable").
        self.isolate = isolate
        # Airflow depends_on_past parity (A-surface, VERDICT r8 item 4):
        # this stage runs only if ITS OWN instance in the pipeline's
        # most recent ledger-recorded run did not fail — skipped/absent
        # past instances (and the first run ever) allow it.  Blocked
        # stages resolve upstream_failed so downstream gating cascades
        # exactly like an in-run failure.  Requires a ledger-backed
        # pipeline (checked at run()).
        self.depends_on_past = depends_on_past
        self.upstream: list[Stage] = []
        self.downstream: list[Stage] = []

    def __rshift__(self, other: "Stage | list[Stage] | TaskGroup"):
        if isinstance(other, TaskGroup):
            # wiring to a group means wiring to its roots (Airflow);
            # an OPEN group defers until its with-block exits so later
            # members/edges are covered
            if not other.closed:
                other._pending_upstream.append(self)
                return other
            for t in other._roots():
                self >> t
            return other
        targets = other if isinstance(other, list) else [other]
        for t in targets:
            if isinstance(t, TaskGroup):
                self >> t
                continue
            self.downstream.append(t)
            t.upstream.append(self)
        return other

    def __lshift__(self, other: "Stage | list[Stage]") -> "Stage | list[Stage]":
        sources = other if isinstance(other, list) else [other]
        for s in sources:
            s >> self
        return other

    def __repr__(self) -> str:
        return f"Stage({self.task_id!r})"


class _IsolationBarrier:
    """Stand-in for a JVM-backed XCom value inside a process-isolated
    stage (r11 review): a forked child must never call through the
    parent's py4j sockets, and a DataFrame XCom is exactly such a
    handle — any use fails loudly with the remedy instead of
    corrupting the shared connection.  The failure is an
    AttributeError subclass so duck-typing feature probes
    (``hasattr``/``getattr``-with-default, pickle's ``__getstate__``
    probe) take their fallback branch instead of crashing — only a
    REAL attribute use surfaces the error."""

    __slots__ = ("_task_id", "_kind")

    def __init__(self, task_id: str, kind: str) -> None:
        self._task_id = task_id
        self._kind = kind

    def __getattr__(self, name: str):
        # bare AttributeError for the slots themselves: during
        # unpickle/deepcopy, __getstate__ probes run on a fresh
        # instance whose slots are unset — formatting the message
        # below would re-enter __getattr__ forever (r11 review pass 4)
        if name in ("_task_id", "_kind"):
            raise AttributeError(name)
        raise AttributeError(
            f"isolated stage cannot use JVM-backed XCom "
            f"{self._task_id!r} ({self._kind}): the forked child must "
            "not speak to the parent's JVM sockets — collect()/convert "
            "the value in the upstream stage, or drop isolate=True"
        )

    def __repr__(self) -> str:
        return (f"<IsolationBarrier task_id={self._task_id!r} "
                f"kind={self._kind}>")


def _is_jvm_backed(v: Any) -> bool:
    """True for any value that is a handle over the parent's JVM
    connection.  Two detectors compose (r11 review pass 4): isinstance
    against the known handle bases catches USER-MODULE subclasses (a
    wrapper class extending DataFrame lives in the caller's module),
    and the dotted module prefix catches every other pyspark/py4j
    type (GroupedData, writers, raw JavaObject, ...) without
    false-positiving sibling top-level modules like ``pyspark_utils``.
    The pure-Python pyspark values a collect()-style XCom legitimately
    carries (Row, schema DataTypes) are explicitly exempt — they are
    fork-safe plain data."""
    from pyspark import RDD, Broadcast, SparkContext
    from pyspark.sql import Column, DataFrame
    from pyspark.sql.types import DataType, Row

    if isinstance(v, (Row, DataType)):
        return False
    if isinstance(v, (DataFrame, Column, RDD, Broadcast, SparkContext,
                      SparkSession)):
        return True
    mod = type(v).__module__ or ""
    return mod in ("pyspark", "py4j") or mod.startswith(("pyspark.", "py4j."))


def _sanitize_for_fork(v: Any, task_id: str, depth: int = 0) -> Any:
    """Recursively replace JVM-backed values (including ones nested in
    tuple/list/dict XComs, e.g. a (DataFrame, DataFrame) pair) with
    loud :class:`_IsolationBarrier` guards.  Depth-capped: exotic
    deeply-nested XComs keep their outer structure and any handle
    deeper than the cap still fails in-child on use (pyspark handles
    cannot survive a fork functionally; the barrier just makes the
    error message actionable)."""
    if _is_jvm_backed(v):
        return _IsolationBarrier(task_id, type(v).__name__)
    # EXACT type checks: rebuilding a subclass as its base container
    # would mangle it — Row is a tuple subclass whose attribute access
    # a plain tuple() rebuild destroys (r11 review pass 3), same for
    # namedtuples/OrderedDict.
    if depth < 4:
        rec = lambda x: _sanitize_for_fork(x, task_id, depth + 1)  # noqa: E731
        if type(v) is tuple:
            return tuple(rec(x) for x in v)
        if type(v) is list:
            return [rec(x) for x in v]
        if type(v) is dict:
            # keys too: a DataFrame is hashable and can key a dict
            return {rec(k): rec(x) for k, x in v.items()}
        if type(v) in (set, frozenset):
            return type(v)(rec(x) for x in v)
    # subclass containers (Row-wrapping-a-handle, namedtuples) and
    # anything past the depth cap: if a handle hides ANYWHERE inside,
    # replace the WHOLE value with one barrier — passing it through
    # would hand the fork a live py4j handle whose in-child use
    # corrupts the shared connection (r11 review pass 4)
    from collections.abc import Mapping

    if (isinstance(v, (tuple, list, set, frozenset, Mapping))
            and _contains_jvm(v)):
        return _IsolationBarrier(task_id, type(v).__name__)
    return v


def _sanitize_results_for_fork(results: Mapping[str, Any]) -> dict[str, Any]:
    """Replace JVM-backed upstream results with loud
    :class:`_IsolationBarrier` guards before they cross into a forked
    child — top-level and nested in plain containers."""
    return {k: _sanitize_for_fork(v, k) for k, v in results.items()}


def _contains_jvm(v: Any, depth: int = 0) -> bool:
    """True if ``v`` is — or nests, through any container INCLUDING
    subclasses (Row, namedtuples), sets, and dict keys — a JVM-backed
    value.  isinstance traversal on purpose: detection must be at
    least as broad as the sanitizer's exact-type rebuild, so whatever
    the rebuild cannot reach is still caught and barrier-replaced
    wholesale."""
    from collections.abc import Mapping

    if _is_jvm_backed(v):
        return True
    if depth >= 20:  # out-of-contract nesting; also guards cycles
        return False
    if isinstance(v, (tuple, list, set, frozenset)):
        return any(_contains_jvm(x, depth + 1) for x in v)
    if isinstance(v, Mapping):  # incl. UserDict/MappingProxyType
        return any(
            _contains_jvm(x, depth + 1)
            for kv in v.items() for x in kv
        )
    return False


@dataclass
class StageContext:
    """What a stage sees at execute time: the session, upstream results
    keyed by task_id (A7), connections, and the pipeline params."""

    spark: SparkSession
    results: Mapping[str, Any]
    connections: Connections
    params: Mapping[str, Any]
    # A14: set on the RESUME execution of a deferrable stage (the
    # TriggerEvent its Deferred wait ended with); None on first run
    trigger_event: Any = None

    def xcom_pull(self, task_id: str) -> Any:
        """Airflow-parity accessor (reference: ti.xcom_pull,
        update_tr_from_ex_dag.py:121)."""
        return self.results[task_id]


def http_stage(
    task_id: str,
    *,
    conn_id: str,
    endpoint: Callable[[StageContext], str] | str,
    method: str = "POST",
    body: Callable[[StageContext], str] | str | None = None,
    transport: Callable[[str, str, str, Connection], Any],
    retry: RetryPolicy | None = None,
    trigger_rule: str = "all_success",
) -> Stage:
    """A3: HTTP task with late-bound endpoint/body templating — the
    engine's f-string analogue of Jinja `{{ ti.xcom_pull(...) }}`
    (update_tr_from_ex_dag.py:121).  ``transport(method, url, body,
    conn)`` is injected so tests run offline."""

    def fn(ctx: StageContext) -> Any:
        conn = ctx.connections.get(conn_id)
        ep = endpoint(ctx) if callable(endpoint) else endpoint
        bd = body(ctx) if callable(body) else body
        return transport(method, conn.base_url + ep, bd or "", conn)

    return Stage(task_id, fn, retry=retry, trigger_rule=trigger_rule)


def sensor_stage(
    task_id: str,
    *,
    predicate: Callable[[StageContext], bool],
    poke_interval_s: float = 60.0,
    timeout_s: float = 3600.0,
    retry: RetryPolicy | None = None,
    trigger_rule: str = "all_success",
    clock: Callable[[], float] = time.monotonic,
    sleep: Callable[[float], None] = time.sleep,
) -> Stage:
    """A4: poke-mode sensor with the reference's 3-way outcome
    (update_tr_from_ex_dag.py:18-39): predicate True -> success, False
    -> keep poking, raise -> immediate failure.  Injectable clock/sleep
    keep tests instant."""

    def fn(ctx: StageContext) -> int:
        from artemia_airflow_spark.streaming.sensor import SensorTimeout

        deadline = clock() + timeout_s
        pokes = 0
        while clock() < deadline:
            pokes += 1
            if predicate(ctx):
                return pokes
            sleep(poke_interval_s)
        raise SensorTimeout(f"{task_id}: not done after {timeout_s}s ({pokes} pokes)")

    return Stage(task_id, fn, retry=retry, trigger_rule=trigger_rule)


# ---------------------------------------------------------------------------
# Pipeline (A1) + runner (A9/A11, replaces scheduler+Celery)
# ---------------------------------------------------------------------------

class DependsOnPastBlocked(RuntimeError):
    """Marker error on a stage resolved upstream_failed by the
    depends_on_past gate (never raised directly; rides
    StageResult.error so raise_on_failure can tell a gate-blocked run
    from an ordinary upstream cascade and refuse to report it as
    success)."""


class StageFailed(RuntimeError):
    pass


class Deferred:
    """Return value of a deferrable stage's SUBMIT phase (A14, r10 —
    the Airflow triggerer analogue): "suspend me; poll ``trigger`` on
    the shared :class:`Triggerer` thread; re-run me with
    ``ctx.trigger_event`` set when it fires or times out."

    While deferred the stage occupies NO worker thread and NO pool
    slot — the deferral is exactly Airflow's worker-slot release.  The
    trigger callable must be cheap and non-blocking (it runs on the
    one thread multiplexing every deferred stage); a truthy return
    fires the event with that value."""

    def __init__(
        self,
        trigger: Callable[[], Any],
        *,
        poke_interval_s: float = 60.0,
        timeout_s: float = 3600.0,
    ) -> None:
        if poke_interval_s <= 0 or timeout_s <= 0:
            raise ValueError("poke_interval_s and timeout_s must be > 0")
        self.trigger = trigger
        self.poke_interval_s = poke_interval_s
        self.timeout_s = timeout_s


@dataclass
class TriggerEvent:
    """What a resumed deferrable stage sees in ``ctx.trigger_event``."""

    fired: bool  # True: trigger returned truthy; False: deadline passed
    value: Any = None
    error: BaseException | None = None  # trigger callable raised


class Triggerer:
    """One daemon thread multiplexing every deferred stage's trigger
    (A14): the engine's stand-in for Airflow's asyncio triggerer
    process.  Registered triggers are polled at their own cadence with
    an injectable clock/sleep (tests run instantly); fired/timed-out
    events wake the pipeline's wave loop through ``condition``."""

    def __init__(
        self,
        *,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
        tick_s: float = 0.05,
    ) -> None:
        self._clock = clock
        self._sleep = sleep
        self._tick_s = tick_s
        self.condition = threading.Condition()
        self._waiting: dict[str, dict] = {}
        self.events: dict[str, TriggerEvent] = {}
        self._thread: threading.Thread | None = None

    def register(self, task_id: str, deferred: Deferred) -> None:
        now = self._clock()
        with self.condition:
            self._waiting[task_id] = {
                "d": deferred,
                "next_poke": now,  # first poke immediately
                "deadline": now + deferred.timeout_s,
            }
            # _loop only exits after clearing _thread UNDER this lock,
            # so this check cannot race a dying thread into a
            # never-polled registration (r10 review #1): either we see
            # _thread set (the loop will re-read _waiting before
            # exiting) or None (we start a fresh one)
            if self._thread is None:
                self._thread = threading.Thread(
                    target=self._loop, name="triggerer", daemon=True
                )
                self._thread.start()

    def ensure_running(self) -> None:
        """Restart the loop thread if it died while triggers are still
        waiting (ADVICE r10): ``_loop``'s finally clears the slot on an
        unexpected crash (an injected clock/sleep raising), but without
        this check recovery only happens on a FUTURE ``register()`` —
        already-deferred stages would be orphaned, their timeouts
        enforced by a dead thread.  The wave loop calls this on every
        deferred-wait pass, so a crashed triggerer is re-spawned within
        one 0.25 s tick and the waiting entries (still in ``_waiting``)
        resume polling with their original deadlines."""
        with self.condition:
            if self._waiting and (
                self._thread is None or not self._thread.is_alive()
            ):
                self._thread = threading.Thread(
                    target=self._loop, name="triggerer", daemon=True
                )
                self._thread.start()

    def cancel_prefix(self, prefix: str) -> None:
        """Drop every waiting trigger and undelivered event whose key
        starts with ``prefix`` — run-exit cleanup so an abandoned run's
        triggers stop polling and its stale events can never be
        consumed by a later run (r10 review #2)."""
        with self.condition:
            for k in [k for k in self._waiting if k.startswith(prefix)]:
                del self._waiting[k]
            for k in [k for k in self.events if k.startswith(prefix)]:
                del self.events[k]

    def _loop(self) -> None:
        try:
            self._loop_inner()
        finally:
            # ANY exit (normal drain or an unexpected crash) clears the
            # slot so the next register() can start a fresh thread —
            # a crashed loop must never permanently orphan the waiters
            with self.condition:
                if self._thread is threading.current_thread():
                    self._thread = None

    def _loop_inner(self) -> None:
        while True:
            with self.condition:
                entries = list(self._waiting.items())
                if not entries:
                    self._thread = None  # exit protocol: clear BEFORE
                    return               # releasing (register() syncs)
            now = self._clock()
            fired: dict[str, TriggerEvent] = {}
            for task_id, e in entries:
                if now >= e["deadline"]:
                    fired[task_id] = TriggerEvent(fired=False)
                    continue
                if now < e["next_poke"]:
                    continue
                e["next_poke"] = now + e["d"].poke_interval_s
                try:
                    v = e["d"].trigger()
                except Exception as exc:  # noqa: BLE001 — trigger crash
                    # fires the event with the error: the resumed stage
                    # decides (the deferrable sensor re-raises), so a
                    # broken trigger is a loud stage failure, never a
                    # silent forever-wait
                    fired[task_id] = TriggerEvent(fired=False, error=exc)
                    continue
                if v:
                    fired[task_id] = TriggerEvent(fired=True, value=v)
            if fired:
                with self.condition:
                    for task_id, ev in fired.items():
                        # entry may have been cancel_prefix'd while we
                        # polled: deliver only if still wanted
                        if self._waiting.pop(task_id, None) is not None:
                            self.events[task_id] = ev
                    self.condition.notify_all()
            # sleep until the SOONEST next poke or deadline (capped at
            # 1 s so fresh registrations are noticed promptly) — the
            # fixed 50 ms tick woke ~72k times for one hour-long wait
            # (r10 review #6)
            now = self._clock()
            nxt = min(min(e["next_poke"], e["deadline"]) for _, e in entries)
            self._sleep(max(self._tick_s, min(nxt - now, 1.0)))


def deferrable_sensor_stage(
    task_id: str,
    *,
    trigger: Callable[[StageContext], Any],
    poke_interval_s: float = 60.0,
    timeout_s: float = 3600.0,
    retry: RetryPolicy | None = None,
    trigger_rule: str = "all_success",
    pool: str | None = None,
) -> Stage:
    """A14: the deferrable twin of :func:`sensor_stage`.  The poke-mode
    sensor HOLDS its worker thread (and pool slot) for the whole wait;
    this one returns :class:`Deferred` on first execution — releasing
    thread and slot — and resumes when the shared triggerer fires.
    Timeout surfaces as ``SensorTimeout`` (the poke-mode contract); a
    trigger that raised re-raises its error in the stage.  With a
    RetryPolicy, a failed resume RE-DEFERS on its retry attempt (the
    consumed TriggerEvent is cleared, so the retry opens a fresh wait
    window rather than instantly replaying the stale timeout — r10
    review).  The retry budget is CUMULATIVE across deferral cycles
    (deferral never consumes an attempt, failures always do — Airflow
    try_number semantics), so a persistently-failing trigger fails
    terminally after retries+1 total failed attempts."""

    def fn(ctx: StageContext) -> Any:
        from artemia_airflow_spark.streaming.sensor import SensorTimeout

        ev = ctx.trigger_event
        if ev is None:
            # submit phase: capture ctx so the trigger can read xcoms
            return Deferred(
                lambda: trigger(ctx),
                poke_interval_s=poke_interval_s,
                timeout_s=timeout_s,
            )
        if ev.error is not None:
            raise ev.error
        if not ev.fired:
            raise SensorTimeout(
                f"{task_id}: trigger not fired after {timeout_s}s (deferred)"
            )
        return ev.value

    return Stage(
        task_id, fn, retry=retry, trigger_rule=trigger_rule, pool=pool
    )


class StageTimeout(RuntimeError):
    """A stage attempt exceeded its hard ``execution_timeout_s``
    deadline (the per-task Airflow execution_timeout analogue).  The
    attempt's Spark job group is cancelled before this is raised; it
    rides StageResult.error (with StageResult.timed_out set) so
    callers can tell a deadline kill from an ordinary exception."""


class DeferMisuse(ValueError):
    """A stage kind that cannot defer returned Deferred (e.g. a branch
    stage) — a programming error, NOT a transient failure: _run_stage
    fails the stage immediately without consuming retry backoff
    (r10 review #5)."""


class PipelineTimeout(TimeoutError):
    pass


def _as_task_ids(value: Any) -> set[str]:
    """Normalize a branch callable's return (task_id | list | set |
    None) into the chosen-task set; None/empty chooses nothing; any
    other shape is an explicit error (not a TypeError from deep inside
    a worker thread)."""
    if value is None:
        return set()
    if isinstance(value, str):
        return {value}
    try:
        ids = set(value)
    except TypeError:
        raise ValueError(
            f"branch chooser must return a task_id, an iterable of "
            f"task_ids, or None — got {type(value).__name__}: {value!r}"
        ) from None
    bad = [x for x in ids if not isinstance(x, str)]
    if bad:
        raise ValueError(f"branch chooser returned non-string task_ids: {bad!r}")
    return ids


def branch_stage(
    task_id: str,
    chooser: Callable[["StageContext"], Any],
    *,
    retry: "RetryPolicy | None" = None,
    trigger_rule: str = "all_success",
    pool: str | None = None,
    priority_weight: int = 1,
    on_failure: "Callable[[str, StageResult], None] | None" = None,
    on_retry: "Callable[[str, int, BaseException], None] | None" = None,
) -> Stage:
    """A17: BranchPythonOperator parity — ``chooser(ctx)`` returns the
    task_id (or list of task_ids) of the DIRECT downstream stage(s)
    allowed to run; every other direct downstream is marked
    ``skipped``, and the skip cascades through their all_success
    descendants exactly like an upstream failure cascade (Airflow's
    skip propagation).  Returning None/[] skips every branch.  The
    chosen value also lands in XCom (results[task_id].value), so
    downstream stages can inspect which path ran."""
    st = Stage(
        task_id, chooser, retry=retry, trigger_rule=trigger_rule,
        pool=pool, priority_weight=priority_weight,
        on_failure=on_failure, on_retry=on_retry,
    )
    st.is_branch = True
    return st


def mapped_stage(
    task_id: str,
    fn: Callable[["StageContext", Any], Any],
    over: Callable[["StageContext"], Any],
    *,
    retry: "RetryPolicy | None" = None,
    trigger_rule: str = "all_success",
    max_parallel: int = 4,
    sla_s: float | None = None,
    pool: str | None = None,
    priority_weight: int = 1,
    on_failure: "Callable[[str, StageResult], None] | None" = None,
    on_retry: "Callable[[str, int, BaseException], None] | None" = None,
    sleep: Callable[[float], None] = time.sleep,
) -> Stage:
    """A19: dynamic task mapping (Airflow's ``task.expand``) — the
    work-list is only known at RUN time: ``over(ctx)`` produces the
    items (typically from an upstream XCom), ``fn(ctx, item)`` runs
    once per item with PER-ITEM retries (each item gets the stage's
    retry budget independently, like Airflow's mapped task instances),
    up to ``max_parallel`` items on driver threads so their Spark jobs
    overlap.

    The stage's XCom value is the list of per-item values in item
    order.  Failure semantics: every item runs to completion (no
    fail-fast — a 1000-item map reports ALL broken items, not the
    first); if any item exhausted its retries the stage FAILS with a
    MappedItemsFailed carrying {index: error}, so downstream
    all_success gating and the A9 failure branches behave exactly as
    for a plain stage."""
    policy = retry or RetryPolicy()

    def run_all(ctx: "StageContext") -> list:
        items = list(over(ctx))
        values: list[Any] = [None] * len(items)
        errors: dict[int, BaseException] = {}
        lock = threading.Lock()
        idx_iter = iter(range(len(items)))

        def worker() -> None:
            while True:
                with lock:
                    i = next(idx_iter, None)
                if i is None:
                    return
                delays = [0.0, *policy.delays()]
                last: BaseException | None = None
                for attempt, delay in enumerate(delays, start=1):
                    if delay:
                        sleep(delay)
                    try:
                        v = fn(ctx, items[i])
                        with lock:
                            values[i] = v
                        last = None
                        break
                    except BaseException as exc:  # noqa: BLE001 — even
                        # SystemExit from an item must be RECORDED, not
                        # silently kill the worker leaving values[i]=None
                        # and a 'successful' stage with corrupted XCom
                        last = exc
                        # on_retry fires PER MAPPED ITEM (Airflow: each
                        # mapped task instance has its own callbacks),
                        # after each failed attempt that will retry —
                        # same exception isolation as the Stage path
                        if attempt < len(delays) and on_retry is not None:
                            try:
                                on_retry(f"{task_id}[{i}]", attempt, exc)
                            except Exception:  # noqa: BLE001
                                pass  # a broken callback never changes retries
                if last is not None:
                    with lock:
                        errors[i] = last

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(max(1, min(max_parallel, len(items) or 1)))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise MappedItemsFailed(task_id, errors, n_items=len(items))
        return values

    # per-item retries live inside run_all; the stage wrapper must not
    # multiply them with stage-level retries — the pin also stops
    # Pipeline.add's default_retry swap (which matches on the bare
    # RetryPolicy() sentinel) from re-introducing whole-map retries
    st = Stage(
        task_id, run_all, retry=RetryPolicy(), trigger_rule=trigger_rule,
        sla_s=sla_s, pool=pool, priority_weight=priority_weight,
        on_failure=on_failure,
    )
    st._retry_pinned = True
    return st


class MappedItemsFailed(RuntimeError):
    """One or more mapped items exhausted their retries; carries
    {item_index: error} so the caller can retry/inspect precisely."""

    def __init__(self, task_id: str, errors: dict, *, n_items: int) -> None:
        self.task_id = task_id
        self.errors = errors
        self.n_items = n_items
        super().__init__(
            f"mapped stage {task_id!r}: {len(errors)}/{n_items} items failed "
            f"(indices {sorted(errors)[:10]})"
        )


@dataclass
class StageResult:
    state: str  # success | failed | skipped | upstream_failed
    value: Any = None
    error: BaseException | None = None
    attempts: int = 0
    duration_s: float = 0.0
    sla_missed: bool = False
    # final attempt was killed by the stage's execution_timeout_s
    # deadline (error is the StageTimeout)
    timed_out: bool = False
    # abandoned timed-out attempt THREADS still running user code when
    # this result was recorded (ADVICE r10): the default deadline path
    # cannot kill pure-Python work, so a stage with retries can pile up
    # concurrent zombies mutating shared state — this makes the pile
    # observable (a warning is also emitted).  Always 0 with
    # ``isolate=True``, where the kill is a real SIGKILL.
    zombie_attempts: int = 0


class Pipeline:
    """A1: named, schedulable DAG of stages.

    ``run()`` executes one DagRun: topological order, trigger-rule
    gating, per-stage retries, optional wall-clock budget (A11 —
    reference dagrun_timeout=2h, hello_function_dag.py:13).  Failure
    branches (`one_failed`/`all_failed` stages) let a run end
    "successfully handled" exactly like the reference's notify_failure
    path (update_tr_from_ex_dag.py:143-152).
    """

    def __init__(
        self,
        name: str,
        *,
        schedule: str | None = None,
        tags: tuple[str, ...] = (),
        default_retry: RetryPolicy | None = None,
        run_timeout_s: float | None = None,
        sleep: Callable[[float], None] = time.sleep,
        ledger: "Any | None" = None,
        on_sla_miss: Callable[[str, "StageResult"], None] | None = None,
        outlets: tuple[str, ...] = (),
        triggers_on: tuple[str, ...] = (),
        max_active_tasks: int | None = None,
        pools: Mapping[str, int] | None = None,
        max_active_runs: int | None = None,
        triggerer: "Triggerer | None" = None,
    ) -> None:
        self.name = name
        # A14: the shared trigger-multiplexing thread deferrable stages
        # suspend onto; injectable for instant tests (fake clock/sleep)
        self.triggerer = triggerer if triggerer is not None else Triggerer()
        # timed-out attempt threads the deadline path could not kill,
        # per task_id — pruned of finished threads whenever a result is
        # recorded, surfaced as StageResult.zombie_attempts (ADVICE r10)
        self._zombies: dict[str, list[threading.Thread]] = {}
        # Concurrency caps (Airflow max_active_tasks + pools): a ready
        # stage beyond a cap is QUEUED — it simply waits for a later
        # wave — never failed or skipped, and trigger rules see only
        # terminal states so gating is unaffected.  This mirrors the
        # CeleryExecutor worker-slot behavior the reference deploys
        # (docker-compose.yaml:165-188): 50 independent Spark-job
        # stages with max_active_tasks=4 submit at most 4 at a time.
        if max_active_tasks is not None and max_active_tasks < 1:
            raise ValueError("max_active_tasks must be >= 1")
        self.max_active_tasks = max_active_tasks
        # Airflow max_active_runs parity (VERDICT r8 item 4): RUN-level
        # concurrency cap.  run() acquires a slot before executing any
        # stage and releases it when the run ends; a run beyond the cap
        # BLOCKS (queues) until a slot frees — never fails, never
        # skips.  Enforced in run() itself so every entry point (the
        # ticker, backfill fan-out, ad-hoc threads) honors one cap.
        if max_active_runs is not None and max_active_runs < 1:
            raise ValueError("max_active_runs must be >= 1")
        self.max_active_runs = max_active_runs
        self._run_slots = (
            threading.Semaphore(max_active_runs)
            if max_active_runs is not None else None
        )
        self._active_lock = threading.Lock()
        self._active_runs = 0
        # diagnostics for tests/operators: high-water mark of
        # concurrently active runs over the pipeline's lifetime
        self.peak_active_runs = 0
        self.pools = dict(pools or {})
        for pname, slots in self.pools.items():
            if slots < 1:
                raise ValueError(f"pool {pname!r} must have >= 1 slot")
        # A18 data-aware scheduling (datasets.py): URIs this pipeline
        # UPDATES on success (outlets) and URIs whose updates make it
        # runnable (triggers_on, AND semantics — Airflow Datasets)
        self.outlets = tuple(outlets)
        self.triggers_on = tuple(triggers_on)
        self.schedule = schedule  # cron string, driven by an external ticker (A10)
        self.tags = tags
        self.default_retry = default_retry
        self.run_timeout_s = run_timeout_s
        self._sleep = sleep
        self.stages: dict[str, Stage] = {}
        self.connections = Connections()
        self.on_sla_miss = on_sla_miss
        # optional RunLedger (ledger.py): the engine's metadata-DB face
        # (SURVEY §1.2) — every run() commits its per-stage outcomes
        # atomically, success or failure
        self.ledger = ledger
        # diagnostics: wave count of the most recent run() (0 before
        # any run — readable without AttributeError, r7 review)
        self.last_run_waves = 0
        # TaskGroup nesting stack (task_group() context manager):
        # stages added while the stack is non-empty get the dotted
        # group prefix and join every group on the stack
        self._group_stack: list[TaskGroup] = []

    # -- construction -------------------------------------------------
    def task_group(self, name: str):
        """Airflow TaskGroup parity: ``with pipe.task_group("g") as g:``
        prefixes every stage added inside with ``g.`` (nested groups
        chain: ``outer.inner.task``) and returns the group for arrow
        wiring (``start >> g >> end``).  See :class:`TaskGroup`."""
        from contextlib import contextmanager

        @contextmanager
        def _cm():
            tg = TaskGroup(name)
            self._group_stack.append(tg)
            try:
                yield tg
            finally:
                popped = self._group_stack.pop()
                assert popped is tg
                tg._close()  # resolve deferred arrows (r9 review)

        return _cm()

    def add(self, stage: Stage) -> Stage:
        # validate FIRST, mutate after: a failed add must leave the
        # stage and any open groups untouched, or a retried add would
        # double-prefix the task_id and duplicate group membership
        # (r9 review)
        new_id = stage.task_id
        if self._group_stack:
            prefix = ".".join(g.name for g in self._group_stack)
            new_id = f"{prefix}.{new_id}"
        if new_id in self.stages:
            raise ValueError(f"duplicate task_id {new_id!r}")
        if stage.pool is not None and stage.pool not in self.pools:
            # fail at construction, like Airflow's missing-pool error —
            # not mid-run where it would strand a half-executed wave
            raise ValueError(
                f"stage {new_id!r} references unknown pool "
                f"{stage.pool!r} (declared pools: {sorted(self.pools)})"
            )
        stage.task_id = new_id
        for g in self._group_stack:
            g.members.append(stage)
        if (
            self.default_retry is not None
            and stage.retry == RetryPolicy()
            and not getattr(stage, "_retry_pinned", False)
        ):
            stage.retry = self.default_retry
        self.stages[stage.task_id] = stage
        return stage

    def stage(
        self,
        task_id: str,
        *,
        retry: RetryPolicy | None = None,
        trigger_rule: str = "all_success",
        sla_s: float | None = None,
        pool: str | None = None,
        priority_weight: int = 1,
        on_failure: Callable[[str, StageResult], None] | None = None,
        on_retry: Callable[[str, int, BaseException], None] | None = None,
        depends_on_past: bool = False,
        execution_timeout_s: float | None = None,
        isolate: bool = False,
    ) -> Callable[[Callable[[StageContext], Any]], Stage]:
        """Decorator sugar: ``@pipe.stage("t")`` over a ctx->Any fn (A6)."""

        def deco(fn: Callable[[StageContext], Any]) -> Stage:
            return self.add(
                Stage(
                    task_id, fn, retry=retry, trigger_rule=trigger_rule,
                    sla_s=sla_s, pool=pool, priority_weight=priority_weight,
                    on_failure=on_failure, on_retry=on_retry,
                    depends_on_past=depends_on_past,
                    execution_timeout_s=execution_timeout_s,
                    isolate=isolate,
                )
            )

        return deco

    # -- introspection -------------------------------------------------
    def to_dot(self) -> str:
        """Graphviz DOT text of the DAG — the engine's stand-in for the
        Airflow graph view (debuggability: render with any dot viewer).
        Nodes annotate branchiness, non-default trigger rules, pools,
        and retry budgets; edges follow declaration order; TaskGroups
        render as nested ``subgraph cluster_*`` boxes (the Airflow
        graph-view grouping), derived from the dotted task_id prefixes
        — dots in task_ids are the group separator by convention.
        Pure string construction — safe to call on an unexecuted
        pipeline."""
        def esc(x: str) -> str:
            # DOT quoted-ID escaping: a quote/backslash in a name must
            # not break the output's syntax (r7 review)
            return x.replace("\\", "\\\\").replace('"', '\\"')

        def node_line(s: Stage) -> str:
            notes = []
            if s.is_branch:
                notes.append("branch")
            if s.trigger_rule != "all_success":
                notes.append(s.trigger_rule)
            if s.pool is not None:
                notes.append(f"pool={s.pool}")
            if s.retry.retries:
                notes.append(f"retries={s.retry.retries}")
            label = esc(s.task_id) + (f"\\n[{', '.join(notes)}]" if notes else "")
            shape = "diamond" if s.is_branch else "box"
            return f'"{esc(s.task_id)}" [shape={shape}, label="{label}"];'

        # prefix tree over dotted ids: one subtree per task group
        tree: dict = {}
        for s in self.stages.values():
            node = tree
            for part in s.task_id.split(".")[:-1]:
                node = node.setdefault("g:" + part, {})
            node.setdefault("stages", []).append(s)

        def emit(node: dict, indent: str, path: list[str]) -> list[str]:
            out = []
            for s in node.get("stages", []):
                out.append(indent + node_line(s))
            for k in node:
                if not k.startswith("g:"):
                    continue
                name = k[2:]
                full = ".".join([*path, name])
                out.append(f'{indent}subgraph "cluster_{esc(full)}" {{')
                out.append(f'{indent}  label="{esc(name)}";')
                out += emit(node[k], indent + "  ", [*path, name])
                out.append(indent + "}")
            return out

        lines = [f'digraph "{esc(self.name)}" {{', "  rankdir=LR;"]
        lines += emit(tree, "  ", [])
        for s in self.stages.values():
            for d in s.downstream:
                lines.append(f'  "{esc(s.task_id)}" -> "{esc(d.task_id)}";')
        lines.append("}")
        return "\n".join(lines)

    # -- execution ----------------------------------------------------
    def _toposort(self) -> list[Stage]:
        order: list[Stage] = []
        seen: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(s: Stage) -> None:
            mark = seen.get(s.task_id)
            if mark == 0:
                raise ValueError(f"cycle detected at {s.task_id!r}")
            if mark == 1:
                return
            seen[s.task_id] = 0
            for up in s.upstream:
                visit(up)
            seen[s.task_id] = 1
            order.append(s)

        for s in self.stages.values():
            visit(s)
        return order

    def _should_run(self, stage: Stage, results: dict[str, StageResult]) -> bool:
        # branch gating first (A17): a succeeded branch upstream whose
        # chosen set excludes this stage skips it regardless of rule
        for u in stage.upstream:
            if u.is_branch:
                r = results[u.task_id]
                if r.state == "success" and stage.task_id not in _as_task_ids(r.value):
                    return False
        ups = [results[u.task_id] for u in stage.upstream]
        if not ups:
            return True
        n_failed = sum(1 for r in ups if r.state in ("failed", "upstream_failed"))
        n_success = sum(1 for r in ups if r.state == "success")
        rule = stage.trigger_rule
        if rule == "all_success":
            return n_failed == 0 and n_success == len(ups)
        if rule == "one_failed":
            return n_failed >= 1
        if rule == "all_failed":
            return n_failed == len(ups)
        return True  # all_done

    def _call_with_deadline(self, stage: Stage, ctx: StageContext) -> Any:
        """One attempt under the stage's optional hard deadline (A-gap
        #1, r10).  The attempt runs on a daemon thread that first tags
        itself with a unique Spark job group (interruptOnCancel=True;
        pinned-thread mode maps the Python thread to one JVM thread,
        so the group covers exactly this attempt's jobs); on deadline
        the group is cancelled (AndFutureJobs, so Spark work the
        zombie submits later dies too) — a hung Spark action then
        aborts executor-side — and StageTimeout raises in the runner.
        A pure-Python hang cannot be force-killed (CPython), so its
        thread is left as a daemon; the PIPELINE regains the slot
        either way, which is the contract that matters.

        CONSEQUENCE when composed with RetryPolicy (r10 review): a
        retry after a timeout may overlap a zombie attempt still
        executing non-Spark Python (its Spark work is group-cancelled,
        its Python is not) — unlike Airflow, which kills the task
        process.  Stage bodies combining execution_timeout_s with
        retries must be idempotent under concurrent duplicate
        execution — the discipline at-least-once executors demand."""
        if stage.execution_timeout_s is None:
            return stage.fn(ctx)
        if stage.isolate:
            return self._call_isolated(stage, ctx)
        import uuid

        group = f"{self.name}:{stage.task_id}:{uuid.uuid4().hex[:8]}"
        sc = None
        try:
            if ctx.spark is not None:
                sc = ctx.spark.sparkContext
        except Exception:  # noqa: BLE001 — test doubles without a context
            sc = None
        box: dict[str, Any] = {}
        done = threading.Event()

        def _attempt() -> None:
            try:
                if sc is not None:
                    sc.setJobGroup(
                        group,
                        f"stage {stage.task_id} "
                        f"(deadline {stage.execution_timeout_s}s)",
                        interruptOnCancel=True,
                    )
                box["value"] = stage.fn(ctx)
            except BaseException as exc:  # noqa: BLE001 — relayed below
                box["error"] = exc
            finally:
                done.set()

        th = threading.Thread(
            target=_attempt, name=f"stage-{stage.task_id}-attempt", daemon=True
        )
        th.start()
        if not done.wait(stage.execution_timeout_s):
            if sc is not None:
                try:
                    # AndFutureJobs (Spark 3.5+, JVM-side): a zombie
                    # stalled in pre-Spark Python would otherwise
                    # submit its big action AFTER the deadline cancel
                    # and run it to completion holding executors
                    # (r10 review); plain cancelJobGroup only stops
                    # already-active jobs
                    sc._jsc.sc().cancelJobGroupAndFutureJobs(group)
                except Exception:  # noqa: BLE001 — cancel is best-effort
                    try:
                        sc.cancelJobGroup(group)
                    except Exception:  # noqa: BLE001
                        pass
            # the thread survives the "kill" if it is in pure Python —
            # record it so the pile of concurrent zombies is observable
            # on the stage's final result (ADVICE r10)
            self._zombies.setdefault(stage.task_id, []).append(th)
            raise StageTimeout(
                f"stage {stage.task_id!r} exceeded execution_timeout_s="
                f"{stage.execution_timeout_s} (attempt killed; Spark job "
                f"group {group!r} cancelled)"
            )
        if "error" in box:
            raise box["error"]
        return box.get("value")

    def _call_isolated(self, stage: Stage, ctx: StageContext) -> Any:
        """One attempt in a killable CHILD PROCESS (r11, VERDICT r10
        missing #1 — opt-in via ``Stage(isolate=True)``): on deadline
        the child is SIGKILLed, so the kill is REAL even for pure
        Python — Airflow's task-process semantics — and retries can
        never overlap a zombie.  Fork start method: ``stage.fn`` and
        ``ctx`` cross into the child by inheritance (no pickling of
        closures), only the RESULT crosses back over a pipe, so it
        must be picklable.  The child's context carries ``spark=None``
        (a fork must never speak to the parent's JVM sockets), so a
        stage body that does touch Spark fails in-child with a clear
        None error instead of corrupting the py4j connection — the
        guard is per-STAGE, not per-pipeline (r11 review: a pure-Python
        stage inside a Spark DAG is exactly the motivating case).
        Fork-safety caveat (inherent to fork, documented not guarded):
        the parent is multi-threaded (wave workers, triggerer), so the
        child must not depend on locks another thread could hold at
        fork time — keep isolated stage bodies self-contained (no
        shared loggers/connections), the same discipline os.fork
        demands anywhere."""
        import dataclasses
        import multiprocessing as mp

        try:
            mp_ctx = mp.get_context("fork")
        except ValueError as exc:  # e.g. Windows: no fork start method
            raise RuntimeError(
                "Stage(isolate=True) requires a fork-capable platform: "
                "stage bodies and their context cross into the child by "
                "fork inheritance (closures are never pickled), which "
                "spawn/forkserver cannot provide. Run isolated stages on "
                "Linux, or drop isolate=True."
            ) from exc
        recv, send = mp_ctx.Pipe(duplex=False)
        # gather the pieces with getattr-defaults FIRST: context doubles
        # may lack trigger_event/params entirely, and a params that is
        # not dict()-able must not be conflated with the non-dataclass
        # TypeError below (r11 review pass 5)
        ev = getattr(ctx, "trigger_event", None)
        if isinstance(ev, TriggerEvent):
            err = ev.error
            if err is not None and _is_jvm_backed(err):
                # e.g. a Py4JJavaError holds a live JavaObject whose
                # repr fetches the Java stack over the gateway socket —
                # raising it in-child would speak on the parent's
                # connection; replace with a plain, picklable twin
                err = RuntimeError(
                    f"trigger error {type(err).__name__} was JVM-backed "
                    "and cannot cross into an isolated stage child: "
                    f"{err!s:.500}"
                )
            # a trigger's fired value may itself be JVM-backed
            ev = dataclasses.replace(
                ev,
                value=_sanitize_for_fork(ev.value, "<trigger_event>"),
                error=err,
            )
        raw_params = getattr(ctx, "params", None) or {}
        try:
            params = _sanitize_for_fork(dict(raw_params), "<params>")
        except TypeError:  # non-mapping params double: pass through
            params = raw_params
        try:
            child_ctx = dataclasses.replace(
                ctx, spark=None,
                results=_sanitize_results_for_fork(ctx.results),
                params=params,
                trigger_event=ev,
            )
        except TypeError:
            # non-dataclass context (custom test double): we cannot
            # rebuild it, so fall back to the pre-r11 guard — a live
            # spark OR any JVM-backed result must be REJECTED, never
            # inherited by the fork (r11 review: silent passthrough
            # reopened the py4j-corruption hole for exactly this path)
            has_jvm = False
            try:
                has_jvm = ctx.spark is not None
            except Exception:  # noqa: BLE001 — doubles without .spark
                has_jvm = False
            if not has_jvm:
                try:
                    has_jvm = (
                        any(_contains_jvm(v) for v in ctx.results.values())
                        or _contains_jvm(dict(getattr(ctx, "params", None)
                                              or {}))
                        or _contains_jvm(getattr(
                            getattr(ctx, "trigger_event", None),
                            "value", None))
                        or _contains_jvm(getattr(
                            getattr(ctx, "trigger_event", None),
                            "error", None))
                    )
                except Exception:  # noqa: BLE001 — doubles w/o results
                    has_jvm = False
            if has_jvm:
                raise ValueError(
                    f"stage {stage.task_id!r}: isolate=True with a "
                    "non-dataclass context carrying a live Spark "
                    "session or JVM-backed results — the forked child "
                    "cannot share the parent's JVM connection"
                ) from None
            child_ctx = ctx

        def _child(conn) -> None:
            try:
                v = stage.fn(child_ctx)
                payload = ("ok", v)
            except BaseException as exc:  # noqa: BLE001 — relayed below
                payload = ("err", exc)
            try:
                conn.send(payload)
            except Exception:  # noqa: BLE001 — unpicklable value/error
                conn.send(("err", RuntimeError(
                    f"stage {stage.task_id!r}: isolated result not "
                    f"picklable: {payload[1]!r}"
                )))
            finally:
                conn.close()

        proc = mp_ctx.Process(
            target=_child, args=(send,),
            name=f"stage-{stage.task_id}-isolated", daemon=True,
        )
        proc.start()
        send.close()  # child holds the only writer; EOF tracks its death
        deadline = time.monotonic() + stage.execution_timeout_s
        try:
            while True:
                if recv.poll(0.05):
                    break
                if not proc.is_alive() and not recv.poll(0):
                    raise RuntimeError(
                        f"stage {stage.task_id!r}: isolated attempt died "
                        f"(exitcode {proc.exitcode}) without a result"
                    )
                if time.monotonic() >= deadline:
                    proc.kill()
                    proc.join(5.0)
                    raise StageTimeout(
                        f"stage {stage.task_id!r} exceeded "
                        f"execution_timeout_s={stage.execution_timeout_s} "
                        f"(isolated process SIGKILLed — hard kill, no "
                        "zombie attempt survives)"
                    )
            try:
                kind, payload = recv.recv()
            except EOFError:
                raise RuntimeError(
                    f"stage {stage.task_id!r}: isolated attempt closed "
                    "the result pipe without a result"
                ) from None
            proc.join(5.0)
            if kind == "err":
                raise payload
            return payload
        finally:
            recv.close()

    def _run_stage(
        self, stage: Stage, ctx: StageContext, *, consumed_attempts: int = 0,
    ) -> StageResult:
        # ``consumed_attempts`` carries the retry budget ACROSS deferral
        # cycles (A14): a resume execution starts where the previous
        # cycle's failures left off — without this, retry-then-re-defer
        # resets the budget every cycle and a persistently-erroring
        # trigger loops forever (r10: reproduced on the reference DAG's
        # exhausted-transport path).  Airflow semantics: deferral never
        # increments try_number, failures do.
        delays = [0.0, *stage.retry.delays()][consumed_attempts:]
        # a RESUME execution's first attempt owes no backoff: the
        # backoff for this attempt was slept in the cycle that
        # re-deferred, before the Deferred was returned — re-sleeping
        # it here would double-pay it on a worker thread AFTER the
        # trigger already fired (r10 review)
        if ctx.trigger_event is not None and delays:
            delays = [0.0, *delays[1:]]
        last: BaseException | None = None
        t0 = time.monotonic()

        def _finish(res: StageResult) -> StageResult:
            res.duration_s = time.monotonic() - t0
            # surface abandoned timed-out attempts still running user
            # code (ADVICE r10): prune finished threads, report the
            # live pile on the result and warn so duplicate concurrent
            # executions are visible, not silent
            alive = [
                t for t in self._zombies.get(stage.task_id, ())
                if t.is_alive()
            ]
            if alive:
                self._zombies[stage.task_id] = alive
                res.zombie_attempts = len(alive)
                warnings.warn(
                    f"stage {stage.task_id!r}: {len(alive)} timed-out "
                    "attempt(s) still executing pure-Python work the "
                    "deadline could not kill — concurrent duplicate "
                    "execution in progress (use isolate=True for a "
                    "real kill)",
                    RuntimeWarning,
                    stacklevel=2,
                )
            else:
                self._zombies.pop(stage.task_id, None)
            # SLA spans ALL attempts including backoff sleeps — the
            # consumer-visible latency, which is what an SLA is about
            if stage.sla_s is not None and res.duration_s > stage.sla_s:
                res.sla_missed = True
                if self.on_sla_miss is not None:
                    try:
                        self.on_sla_miss(stage.task_id, res)
                    except Exception:  # noqa: BLE001 — a broken callback
                        pass  # must never fail the stage it reports on
            if res.state == "failed" and stage.on_failure is not None:
                # after the FINAL attempt only (_finish runs once per
                # stage execution), same isolation as on_sla_miss
                try:
                    stage.on_failure(stage.task_id, res)
                except Exception:  # noqa: BLE001 — a broken callback
                    pass  # must never mask or change the stage outcome
            return res

        if not delays:
            # every attempt was consumed in earlier cycles; nothing
            # left to run (defensive — re-defer only happens with
            # budget remaining).  Routed through _finish so the A21
            # on_failure / SLA contracts still fire (r10 review)
            return _finish(
                StageResult(
                    "failed",
                    error=RuntimeError(
                        f"stage {stage.task_id!r}: retry budget "
                        "exhausted across deferral cycles"
                    ),
                    attempts=consumed_attempts,
                )
            )
        for attempt, delay in enumerate(delays, start=1):
            if delay:
                self._sleep(delay)
            try:
                value = self._call_with_deadline(stage, ctx)
                if isinstance(value, Deferred):
                    # A14 submit phase: not a completion — the runner
                    # suspends the stage (no result recorded, no slot
                    # held) and the triggerer owns the wait.  Returned
                    # as a distinct state so execute() can register it;
                    # bypasses retries/SLA/on_failure by design (those
                    # apply to real attempts, and the resume execution
                    # gets its own full _run_stage pass).
                    if stage.is_branch:
                        raise DeferMisuse(
                            f"branch stage {stage.task_id!r} cannot defer"
                        )
                    return StageResult(
                        "deferred", value=value,
                        attempts=consumed_attempts + attempt - 1,
                    )
                if stage.is_branch:
                    # Airflow parity: an invalid branch target raises —
                    # a typo must not silently skip every branch
                    chosen = _as_task_ids(value)
                    known = {d.task_id for d in stage.downstream}
                    unknown = chosen - known
                    if unknown:
                        raise ValueError(
                            f"branch {stage.task_id!r} chose unknown "
                            f"downstream task_ids {sorted(unknown)} "
                            f"(direct downstream: {sorted(known)})"
                        )
                    # A one-shot generator/iterator return is consumed
                    # by the validation above, so re-normalizing the raw
                    # value in _should_run would yield an empty set and
                    # silently skip every branch (ADVICE r6): store the
                    # normalized sorted list instead.  Stable re-iterable
                    # shapes (str/list/tuple/set/None) pass through so
                    # XCom keeps the chooser's exact value.
                    if value is not None and not isinstance(
                        value, (str, list, tuple, set, frozenset)
                    ):
                        value = sorted(chosen)
                return _finish(
                    StageResult(
                        "success", value=value,
                        attempts=consumed_attempts + attempt,
                    )
                )
            except DeferMisuse as exc:
                # programming error: fail NOW, no backoff, no on_retry
                return _finish(
                    StageResult(
                        "failed", error=exc,
                        attempts=consumed_attempts + attempt,
                    )
                )
            except Exception as exc:  # noqa: BLE001 — retry boundary
                last = exc
                # a resumed deferrable stage must not replay its
                # consumed TriggerEvent on retry (r10 review #3): clear
                # it so the retry attempt re-defers with a fresh wait
                # window instead of instantly re-raising the stale
                # timeout/error for every backoff cycle
                if ctx.trigger_event is not None:
                    ctx.trigger_event = None
                if attempt < len(delays) and stage.on_retry is not None:
                    try:
                        stage.on_retry(
                            stage.task_id, consumed_attempts + attempt, exc
                        )
                    except Exception:  # noqa: BLE001 — a broken callback
                        pass  # must never change retry behavior
        return _finish(
            StageResult(
                "failed", error=last,
                attempts=consumed_attempts + len(delays),
                timed_out=isinstance(last, StageTimeout),
            )
        )

    def run(
        self,
        spark: SparkSession,
        params: Mapping[str, Any] | None = None,
        *,
        raise_on_failure: bool = True,
        resume_from: str | None = None,
        ignore_depends_on_past: bool = False,
        source: str = "scheduled",
    ) -> dict[str, StageResult]:
        """Execute one DagRun; returns per-stage results.

        ``source`` tags the ledger record with the Airflow run_type
        analogue ("scheduled" default; schedule.trigger_now passes
        "manual", schedule.backfill "backfill").

        Ready stages at the same depth execute concurrently (driver
        threads -> overlapping Spark jobs), matching the reference's
        parallel fan-out semantics (A2 list RHS).

        ``resume_from=<run_id>`` is the engine's "clear failed tasks
        and re-run" (Airflow parity): stages that SUCCEEDED in the
        referenced ledger run with a JSON-serializable XCom value are
        skipped and their recorded values injected downstream; failed /
        skipped / non-serializable-value stages re-execute.  Requires
        the pipeline to have been constructed with a ledger.

        ``max_active_runs``: with the cap set, a run beyond it BLOCKS
        here (queued) until an active run finishes — every entry point
        (ticker, backfill fan-out, ad-hoc threads) funnels through this
        one semaphore.  ``depends_on_past`` stages gate on the ledger's
        most recent prior run (see Stage): a blocked stage resolves
        upstream_failed and KEEPS blocking later runs until a
        successful instance lands.  Two repair paths, both Airflow
        parity: ``resume_from=<failed run_id>`` (clear-and-rerun — the
        gate never reads the run being resumed) or
        ``ignore_depends_on_past=True`` (the `airflow dags backfill
        -i` flag).  With ``raise_on_failure`` a gate-blocked run
        raises StageFailed — a run that executed nothing must never
        report success to its caller.
        """
        if self._run_slots is not None:
            self._run_slots.acquire()
        try:
            with self._active_lock:
                self._active_runs += 1
                self.peak_active_runs = max(
                    self.peak_active_runs, self._active_runs
                )
            try:
                return self._execute_run(
                    spark, params,
                    raise_on_failure=raise_on_failure,
                    resume_from=resume_from,
                    ignore_depends_on_past=ignore_depends_on_past,
                    source=source,
                )
            finally:
                with self._active_lock:
                    self._active_runs -= 1
        finally:
            if self._run_slots is not None:
                self._run_slots.release()

    def _execute_run(
        self,
        spark: SparkSession,
        params: Mapping[str, Any] | None = None,
        *,
        raise_on_failure: bool = True,
        resume_from: str | None = None,
        ignore_depends_on_past: bool = False,
        source: str = "scheduled",
    ) -> dict[str, StageResult]:
        start = time.monotonic()
        order = self._toposort()
        past_states: dict[str, str] | None = None
        # resume_from IS Airflow's clear-and-rerun: the failed states
        # being resumed are exactly the ones the user just cleared, so
        # the gate must not read them back and re-block the repair run
        # (r9 review finding)
        gate_active = not ignore_depends_on_past and resume_from is None
        if gate_active and any(s.depends_on_past for s in order):
            if self.ledger is None:
                raise ValueError(
                    "depends_on_past requires a ledger-backed pipeline "
                    "(the gate reads the previous run's stage states)"
                )
            # one metadata read per run, shared by every gated stage;
            # None = first run ever -> everything is allowed
            past_states = self.ledger.last_run_states(spark, self.name)
        results: dict[str, StageResult] = {}
        values: dict[str, Any] = {}
        if resume_from is not None:
            if self.ledger is None:
                raise ValueError("resume_from requires a ledger-backed pipeline")
            for task_id, value in self.ledger.resumable_values(spark, resume_from).items():
                if task_id in self.stages:
                    results[task_id] = StageResult("success", value=value, attempts=0)
                    values[task_id] = value
        pending = [s for s in order if s.task_id not in results]
        lock = threading.Lock()

        def _past_blocked(s: Stage) -> bool:
            return (
                s.depends_on_past
                and past_states is not None
                and past_states.get(s.task_id) in ("failed", "upstream_failed")
            )
        # diagnostics: wave count of the last run (how many scheduling
        # rounds the DAG took — slot contention shows up here)
        self.last_run_waves = 0

        deferred: set[str] = set()
        # retry attempts consumed by earlier deferral cycles, per stage
        # (cleared on terminal result) — see _run_stage consumed_attempts
        resume_spent: dict[str, int] = {}
        trig = self.triggerer
        # run-scoped trigger keys (r10 review #2): a Triggerer lives on
        # the Pipeline (or is shared via injection) across runs — a
        # stale event from an abandoned run, or a same-named stage in a
        # concurrent run, must never be consumed here
        import uuid as _uuid

        run_token = _uuid.uuid4().hex

        def _tkey(task_id: str) -> str:
            return f"{run_token}:{task_id}"

        try:
            while pending:
                self.last_run_waves += 1
                if self.run_timeout_s is not None and time.monotonic() - start > self.run_timeout_s:
                    raise PipelineTimeout(f"pipeline {self.name!r} exceeded {self.run_timeout_s}s")
                # A14: stages whose trigger fired (or timed out) leave the
                # deferred set and re-contend as ready; their resume
                # execution consumes the TriggerEvent via ctx
                with trig.condition:
                    for t in [t for t in deferred if _tkey(t) in trig.events]:
                        deferred.discard(t)
                if deferred:
                    # EVERY wave, not just the all-deferred branch: a
                    # crashed triggerer must be re-spawned even while
                    # ready compute stages keep the loop busy, or the
                    # deferred stages' polls/deadlines stall until the
                    # ready queue drains (r11 review)
                    trig.ensure_running()
                ready = [
                    s
                    for s in pending
                    if s.task_id not in deferred
                    and all(u.task_id in results for u in s.upstream)
                ]
                if not ready:
                    if deferred:
                        # everything runnable is suspended on the triggerer:
                        # wait for an event (short fallback timeout keeps
                        # the A11 run deadline live) instead of spinning;
                        # ensure_running already ran above this wave
                        with trig.condition:
                            if not any(
                                _tkey(t) in trig.events for t in deferred
                            ):
                                trig.condition.wait(timeout=0.25)
                        continue
                    raise RuntimeError("deadlock: no ready stages (bug in toposort?)")
                # concurrency caps AFTER the deadlock check: dependency-ready
                # stages beyond max_active_tasks / their pool's slots stay in
                # `pending` (queued) and re-contend next wave.  Waves join all
                # threads before recomputing, so every slot frees at wave end
                # and the first runnable stage always wins one (caps >= 1) —
                # a capped wave can never livelock.  Stages that will only
                # resolve to skipped/upstream_failed consume NO slot (Airflow
                # parity: non-executing tasks don't occupy pools — r7 review
                # finding): they run no user code, so they're granted freely
                # and a to-be-skipped stage can never hold a slot a runnable
                # same-pool stage is waiting for.
                if self.max_active_tasks is not None or self.pools:
                    granted: list[Stage] = []
                    pool_used: dict[str, int] = {}
                    n_running = 0
                    # contention order: higher priority_weight first,
                    # declaration order on ties (stable sort).  results is
                    # stable here — the wave's workers haven't started.
                    for s in sorted(ready, key=lambda s: -s.priority_weight):
                        try:
                            will_run = self._should_run(s, results)
                        except Exception:  # noqa: BLE001 — let the worker
                            will_run = True  # record the failure (ADVICE r6)
                        if not will_run or _past_blocked(s):
                            # slotless resolution: runs no user code, so it
                            # must not hold a slot a runnable same-pool
                            # stage waits on (r7 rule; r9 review extended
                            # it to the depends_on_past gate)
                            granted.append(s)
                            continue
                        if (
                            self.max_active_tasks is not None
                            and n_running >= self.max_active_tasks
                        ):
                            continue  # width cap: queued, not failed
                        if s.pool is not None:
                            if pool_used.get(s.pool, 0) >= self.pools[s.pool]:
                                continue  # pool full: queued, not failed
                            pool_used[s.pool] = pool_used.get(s.pool, 0) + 1
                        granted.append(s)
                        n_running += 1
                    ready = granted

                def execute(s: Stage) -> None:
                    # depends_on_past gate first: a past-blocked stage runs
                    # no user code and resolves upstream_failed so default
                    # trigger rules cascade the block downstream, exactly
                    # like an in-run failure (Airflow: the instance won't
                    # schedule; downstream all_success instances follow)
                    if _past_blocked(s):
                        with lock:
                            results[s.task_id] = StageResult(
                                "upstream_failed",
                                error=DependsOnPastBlocked(
                                    f"depends_on_past: {s.task_id!r} did not "
                                    "succeed in the previous run"
                                ),
                            )
                        return
                    try:
                        # _should_run runs INSIDE the try (ADVICE r6): a
                        # harness-path exception (e.g. a malformed branch
                        # value hit while normalizing the chosen set) must
                        # record a failure, NOT die in a daemon thread
                        # leaving `pending` re-spawning the stage forever
                        if not self._should_run(s, results):
                            ups = [results[u.task_id] for u in s.upstream]
                            state = (
                                "upstream_failed"
                                if any(r.state in ("failed", "upstream_failed") for r in ups)
                                and s.trigger_rule == "all_success"
                                else "skipped"
                            )
                            with lock:
                                results[s.task_id] = StageResult(state)
                            return
                        with trig.condition:
                            ev = trig.events.pop(_tkey(s.task_id), None)
                        ctx = StageContext(
                            spark, dict(values), self.connections,
                            dict(params or {}), trigger_event=ev,
                        )
                        res = self._run_stage(
                            s, ctx,
                            consumed_attempts=resume_spent.get(s.task_id, 0),
                        )
                        if res.state == "deferred":
                            # A14: suspend — no result recorded (the stage
                            # stays pending, invisible to trigger rules),
                            # no slot held past this wave; the triggerer
                            # owns the wait from here
                            with lock:
                                deferred.add(s.task_id)
                                resume_spent[s.task_id] = res.attempts
                            trig.register(_tkey(s.task_id), res.value)
                            return
                    except BaseException as exc:  # noqa: BLE001 — see above
                        res = StageResult("failed", error=exc, attempts=0)
                        # A21 contract: on_failure fires whenever the stage
                        # ENDS failed — including harness-path failures that
                        # bypass _run_stage/_finish (r7 review finding)
                        if s.on_failure is not None:
                            try:
                                s.on_failure(s.task_id, res)
                            except Exception:  # noqa: BLE001
                                pass  # never mask the recorded failure
                    with lock:
                        results[s.task_id] = res
                        resume_spent.pop(s.task_id, None)
                        if res.state == "success":
                            values[s.task_id] = res.value

                if self.run_timeout_s is None and len(ready) == 1:
                    execute(ready[0])
                else:
                    # Run stages in worker threads and join against the
                    # remaining run budget so a single hung stage (sensor
                    # with a longer poke timeout, blocking transport, ...)
                    # still trips the A11 deadline — Airflow kills the
                    # dagrun at dagrun_timeout regardless of task state.
                    # Python cannot forcibly kill the stage thread; it is
                    # daemonized and abandoned, the run itself fails fast.
                    threads = [
                        threading.Thread(target=execute, args=(s,), daemon=True)
                        for s in ready
                    ]
                    for t in threads:
                        t.start()
                    for t in threads:
                        if self.run_timeout_s is None:
                            t.join()
                            continue
                        remaining = self.run_timeout_s - (time.monotonic() - start)
                        t.join(max(remaining, 0.0))
                        if t.is_alive():
                            raise PipelineTimeout(
                                f"pipeline {self.name!r} exceeded {self.run_timeout_s}s "
                                "(stage still running; thread abandoned)"
                            )
                pending = [s for s in pending if s.task_id not in results]
        finally:
            # abandoned deferrals stop polling; undelivered events die
            # with the run (they can never be legally consumed again)
            trig.cancel_prefix(run_token + ":")

        if self.ledger is not None:
            # record BEFORE raise_on_failure: failed runs belong in the
            # history exactly like Airflow's metadata DB keeps them
            self.ledger.record(
                spark,
                self.name,
                results,
                started_at=time.time() - (time.monotonic() - start),
                finished_at=time.time(),
                source=source,
            )

        if raise_on_failure:
            # a gate-blocked run has NO 'failed' state (nothing ran),
            # but returning normally would report a run that executed
            # nothing as success to every exception-contract caller
            # run after run (r9 review) — blocked is loud, like failed
            blocked = [
                t for t, r in results.items()
                if isinstance(r.error, DependsOnPastBlocked)
            ]
            if blocked:
                first = sorted(blocked)[0]
                raise StageFailed(
                    f"stage {first!r} blocked by depends_on_past (previous "
                    "run failed; repair via resume_from or "
                    "ignore_depends_on_past=True)"
                ) from results[first].error
            hard_failures = [
                t
                for t, r in results.items()
                if r.state == "failed"
                and not any(
                    d.trigger_rule in ("one_failed", "all_failed")
                    and results.get(d.task_id, StageResult("missing")).state == "success"
                    for d in self.stages[t].downstream
                )
            ]
            if hard_failures:
                first = hard_failures[0]
                raise StageFailed(f"stage {first!r} failed") from results[first].error
        return results
