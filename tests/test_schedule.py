"""Cron evaluator + scheduler ticker tests (A10)."""

from __future__ import annotations

from datetime import datetime

import pytest

from artemia_airflow_spark.pipeline import Pipeline, Stage
from artemia_airflow_spark.schedule import Cron, run_scheduler


@pytest.mark.parametrize(
    "expr,after,want",
    [
        # the reference's main schedule: daily at midnight (:82)
        ("0 0 * * *", datetime(2026, 8, 13, 10, 30), datetime(2026, 8, 14, 0, 0)),
        ("@daily", datetime(2026, 8, 13, 0, 0), datetime(2026, 8, 14, 0, 0)),
        ("*/15 * * * *", datetime(2026, 8, 13, 10, 7), datetime(2026, 8, 13, 10, 15)),
        ("30 9 * * *", datetime(2026, 8, 13, 9, 31), datetime(2026, 8, 14, 9, 30)),
        ("0 12 1 * *", datetime(2026, 8, 13, 0, 0), datetime(2026, 9, 1, 12, 0)),
        # day-of-week: 2026-08-13 is a Thursday; next Sunday is 08-16
        ("0 0 * * 0", datetime(2026, 8, 13, 5, 0), datetime(2026, 8, 16, 0, 0)),
        ("5,35 * * * *", datetime(2026, 8, 13, 10, 6), datetime(2026, 8, 13, 10, 35)),
        ("0 9-17 * * *", datetime(2026, 8, 13, 17, 30), datetime(2026, 8, 14, 9, 0)),
        # Feb 30 never exists -> clamps forward to next valid month day
        ("0 0 30 2 *", datetime(2026, 1, 1, 0, 0), None),
    ],
)
def test_cron_next_fire(expr, after, want):
    c = Cron(expr)
    if want is None:
        with pytest.raises(ValueError):
            c.next_fire(after)
    else:
        assert c.next_fire(after) == want


def test_cron_rejects_garbage():
    with pytest.raises(ValueError):
        Cron("not a cron")
    with pytest.raises(ValueError):
        Cron("61 * * * *")
    with pytest.raises(ValueError):
        Cron("*/0 * * * *")


def test_cron_matches_minute_grid():
    c = Cron("*/20 6 * * *")
    assert c.matches(datetime(2026, 8, 13, 6, 0))
    assert c.matches(datetime(2026, 8, 13, 6, 40))
    assert not c.matches(datetime(2026, 8, 13, 6, 10))
    assert not c.matches(datetime(2026, 8, 13, 7, 0))


def test_scheduler_ticker_runs_pipelines_in_fire_order():
    """Simulated clock: two pipelines on different cadences; the ticker
    must interleave them by next-fire time with catchup=False."""
    fake = {"now": datetime(2026, 8, 13, 0, 0, 30)}
    ran = []

    def now():
        return fake["now"]

    def sleep(s):
        from datetime import timedelta

        fake["now"] += timedelta(seconds=s)

    fast = Pipeline("fast", schedule="*/10 * * * *", sleep=sleep)
    fast.add(Stage("t", lambda ctx: "fast"))
    slow = Pipeline("slow", schedule="0 * * * *", sleep=sleep)
    slow.add(Stage("t", lambda ctx: "slow"))

    n = run_scheduler(
        [fast, slow], spark=None, now=now, sleep=sleep, max_runs=8,
        on_run=lambda name, when, res: ran.append((name, when.strftime("%H:%M"))),
    )
    assert n == 8
    assert ran == [
        ("fast", "00:10"), ("fast", "00:20"), ("fast", "00:30"),
        ("fast", "00:40"), ("fast", "00:50"),
        ("fast", "01:00"), ("slow", "01:00"), ("fast", "01:10"),
    ]


def test_cron_step_scoped_to_comma_part():
    """'5,10-20/2': the /2 step belongs only to the 10-20 part — the
    plain 5 must stay a single minute, not expand to 5..59."""
    c = Cron("5,10-20/2 * * * *")
    assert c.minute == {5, 10, 12, 14, 16, 18, 20}
    # a stepped bare start still expands to the field's end: 10/15
    assert Cron("10/15 * * * *").minute == {10, 25, 40, 55}
    # and a stepped range after a plain value leaves a later plain value alone
    assert Cron("1,20-30/5,45 * * * *").minute == {1, 20, 25, 30, 45}


def test_schedule_windows_daily_inclusive_start():
    from datetime import datetime as dt

    from artemia_airflow_spark.schedule import schedule_windows

    w = schedule_windows("@daily", dt(2024, 1, 1), dt(2024, 1, 4))
    assert w == [
        (dt(2024, 1, 1), dt(2024, 1, 2)),
        (dt(2024, 1, 2), dt(2024, 1, 3)),
        (dt(2024, 1, 3), dt(2024, 1, 4)),
    ]
    # unaligned start: first fire after it
    w2 = schedule_windows("@daily", dt(2024, 1, 1, 6, 30), dt(2024, 1, 3))
    assert w2 == [(dt(2024, 1, 2), dt(2024, 1, 3))]
    # empty range
    assert schedule_windows("@daily", dt(2024, 1, 1, 1), dt(2024, 1, 1, 2)) == []


def test_backfill_runs_each_interval_with_logical_date(spark):
    """Airflow `dags backfill` parity: one run per scheduled interval in
    [start, end), oldest first, logical_date/data_interval in params,
    each run ledger-recorded."""
    import tempfile
    from datetime import datetime as dt

    from artemia_airflow_spark.ledger import RunLedger
    from artemia_airflow_spark.schedule import backfill

    led = RunLedger(tempfile.mkdtemp(prefix="aas_backfill_"))
    pipe = Pipeline("bf_demo", schedule="@daily", ledger=led)
    seen = []

    @pipe.stage("work")
    def work(ctx):
        seen.append(
            (ctx.params["logical_date"], ctx.params["data_interval_end"])
        )
        return ctx.params["logical_date"].isoformat()

    out = backfill(pipe, spark, dt(2024, 3, 1), dt(2024, 3, 4))
    assert sorted(out) == [dt(2024, 3, 1), dt(2024, 3, 2), dt(2024, 3, 3)]
    assert seen == [
        (dt(2024, 3, 1), dt(2024, 3, 2)),
        (dt(2024, 3, 2), dt(2024, 3, 3)),
        (dt(2024, 3, 3), dt(2024, 3, 4)),
    ]
    assert all(r["work"].state == "success" for r in out.values())
    assert led.runs(spark, "bf_demo").count() == 3  # every interval audited


def test_backfill_requires_schedule(spark):
    from datetime import datetime as dt

    from artemia_airflow_spark.schedule import backfill

    pipe = Pipeline("no_sched")
    with pytest.raises(ValueError, match="schedule"):
        backfill(pipe, spark, dt(2024, 1, 1), dt(2024, 1, 2))


def test_schedule_windows_never_start_before_requested_start():
    """Code-review regression (r6): a sub-minute start (00:00:30) must
    not emit the 00:00 window that began before it."""
    from datetime import datetime as dt

    from artemia_airflow_spark.schedule import schedule_windows

    w = schedule_windows("@daily", dt(2024, 1, 1, 0, 0, 30), dt(2024, 1, 3))
    assert w == [(dt(2024, 1, 2), dt(2024, 1, 3))]
    assert all(s >= dt(2024, 1, 1, 0, 0, 30) for s, _ in w)


def test_data_aware_wave_and_semantics(spark):
    """A18 Datasets parity: consumers run when ALL their trigger
    datasets updated (AND); cascade proceeds until quiescent; a FAILED
    producer does not emit its outlets."""
    from artemia_airflow_spark.datasets import run_data_aware
    from artemia_airflow_spark.pipeline import Pipeline

    order = []

    def mk(name, outlets=(), triggers_on=(), fail=False):
        p = Pipeline(name, outlets=outlets, triggers_on=triggers_on)

        @p.stage("work")
        def work(ctx, _n=name, _f=fail):
            if _f:
                raise RuntimeError("boom")
            order.append(_n)
            return _n

        return p

    a = mk("a", outlets=("ds://one",))
    b = mk("b", outlets=("ds://two",))
    c = mk("c", triggers_on=("ds://one", "ds://two"), outlets=("ds://three",))
    d = mk("d", triggers_on=("ds://three",))
    e = mk("e", triggers_on=("ds://never",))

    ran = run_data_aware([a, b, c, d, e], spark)
    assert order == ["a", "b", "c", "d"]  # c waits for BOTH, e never runs
    assert set(ran) == {"a", "b", "c", "d"}

    # failed producer emits nothing
    order.clear()
    a2 = mk("a2", outlets=("ds://x",), fail=True)
    b2 = mk("b2", triggers_on=("ds://x",))
    ran2 = run_data_aware([a2, b2], spark, raise_on_failure=False)
    assert set(ran2) == {"a2"} and order == []


def test_txtable_dataset_polling(spark, tmp_path):
    """External-producer detection: a TxTable commit advances the
    dataset version; polling reports the change exactly once and the
    change drives a consumer wave."""
    from pyspark.sql import functions as F

    from artemia_airflow_spark.datasets import (
        poll_txtable_datasets,
        run_data_aware,
        txtable_version,
    )
    from artemia_airflow_spark.pipeline import Pipeline
    from artemia_airflow_spark.sources.txtable import TxTable

    root = str(tmp_path / "ds_table")
    assert txtable_version(root) is None
    t = TxTable.create(
        spark,
        spark.range(5).select(F.col("id").alias("k"), F.lit(1.0).alias("v")),
        root,
        key_col="k",
    )
    from artemia_airflow_spark.datasets import commit_seen

    uris = {"ds://tbl": root}
    seen: dict[str, int] = {}
    pending = poll_txtable_datasets(uris, seen)
    assert pending == {"ds://tbl": 0}  # v0 detected, last_seen untouched
    # at-least-once: a crashed wave re-observes the same event
    assert poll_txtable_datasets(uris, seen) == {"ds://tbl": 0}
    commit_seen(seen, pending)
    assert poll_txtable_datasets(uris, seen) == {}  # acked: no re-fire
    t.append(spark.range(5, 8).select(F.col("id").alias("k"), F.lit(2.0).alias("v")))
    pending = poll_txtable_datasets(uris, seen)
    assert pending == {"ds://tbl": 1}
    changed = set(pending)

    got = []
    consumer = Pipeline("consumer", triggers_on=("ds://tbl",))

    @consumer.stage("read")
    def read(ctx):
        got.append(TxTable(ctx.spark, root).snapshot().count())
        return got[-1]

    ran = run_data_aware([consumer], spark, seeds=[], pre_updated=changed)
    assert set(ran) == {"consumer"} and got == [8]


def test_data_aware_wave_failure_contained_and_raised_after_drain(spark):
    """Code-review regression (r6): one failing seed never aborts
    unrelated seeds — the wave drains fully, then WaveFailed carries
    the complete run map."""
    import pytest as _pytest

    from artemia_airflow_spark.datasets import WaveFailed, run_data_aware
    from artemia_airflow_spark.pipeline import Pipeline

    ran_names = []

    def mk(name, fail=False):
        p = Pipeline(name)

        @p.stage("w")
        def w(ctx, _n=name, _f=fail):
            if _f:
                raise RuntimeError("x")
            ran_names.append(_n)
            return _n

        return p

    bad, good = mk("bad", fail=True), mk("good")
    with _pytest.raises(WaveFailed) as ei:
        run_data_aware([bad, good], spark)
    assert ran_names == ["good"]  # unrelated seed still ran
    assert set(ei.value.ran) == {"bad", "good"} and ei.value.failed == ["bad"]


def test_data_aware_duplicate_seeds_run_once(spark):
    """ADVICE r6: a duplicate name in the user-supplied seeds list must
    not run that pipeline twice in one wave — the once-per-wave guard
    only protected _enqueue_runnable additions."""
    from artemia_airflow_spark.datasets import run_data_aware
    from artemia_airflow_spark.pipeline import Pipeline, Stage

    runs = []
    p = Pipeline("dup_seed")
    p.add(Stage("s", lambda ctx: runs.append("ran")))
    ran = run_data_aware([p], spark, seeds=["dup_seed", "dup_seed"])
    assert runs == ["ran"]
    assert set(ran) == {"dup_seed"}


def test_backfill_parallelism_respects_max_active_runs(spark):
    """VERDICT r8 item 4 ticker test: a parallel backfill fan-out
    submits many logical dates at once, but the pipeline's OWN
    max_active_runs semaphore caps what executes — effective
    concurrency is min(parallelism, cap), every date completes, and
    each run carries its own logical_date params."""
    import time as _time

    from artemia_airflow_spark.pipeline import Pipeline
    from artemia_airflow_spark.schedule import backfill

    pipe = Pipeline("bf", schedule="0 * * * *", max_active_runs=2)
    seen = []

    @pipe.stage("work")
    def work(ctx):
        _time.sleep(0.1)
        seen.append(ctx.params["logical_date"])
        return str(ctx.params["data_interval_end"])

    out = backfill(
        pipe, spark,
        datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 6, 0),
        parallelism=4,
    )
    assert len(out) == 6 and len(seen) == 6
    assert pipe.peak_active_runs == 2  # capped AND saturated
    assert all(r["work"].state == "success" for r in out.values())
    # each run saw its own logical date
    assert sorted(seen) == [datetime(2024, 1, 1, h) for h in range(6)]

    with pytest.raises(ValueError, match="parallelism"):
        backfill(pipe, spark, datetime(2024, 1, 1), datetime(2024, 1, 2),
                 parallelism=0)


def test_scheduler_pause_skips_fires_and_unpause_resumes():
    """A-gap #2 (r10): a paused pipeline's cron fires are SKIPPED (no
    run, no on_run, observed via on_skip); unpausing resumes at the
    next match with catchup=False (skipped fires are never backfilled)."""
    from artemia_airflow_spark.schedule import SchedulerControl

    fake = {"now": datetime(2026, 8, 13, 0, 0, 30)}
    ran, skipped = [], []

    def now():
        return fake["now"]

    def sleep(s):
        from datetime import timedelta

        fake["now"] += timedelta(seconds=s)

    pipe = Pipeline("p", schedule="*/10 * * * *", sleep=sleep)
    pipe.add(Stage("t", lambda ctx: "ok"))
    control = SchedulerControl()
    control.pause("p")

    def on_skip(name, when):
        skipped.append(when.strftime("%H:%M"))
        if len(skipped) == 2:  # operator unpauses mid-stream
            control.unpause(name)

    n = run_scheduler(
        [pipe], spark=None, now=now, sleep=sleep, max_runs=2,
        control=control, on_skip=on_skip,
        on_run=lambda name, when, res: ran.append(when.strftime("%H:%M")),
    )
    assert n == 2
    assert skipped == ["00:10", "00:20"]  # paused fires skipped
    assert ran == ["00:30", "00:40"]      # resumed at the NEXT match


def test_scheduler_paused_pipeline_records_nothing(spark, tmp_path):
    """A paused fire leaves the ledger untouched — skipping is not a
    recorded run state."""
    from artemia_airflow_spark.ledger import RunLedger
    from artemia_airflow_spark.schedule import SchedulerControl

    fake = {"now": datetime(2026, 8, 13, 0, 0, 30)}

    def now():
        return fake["now"]

    def sleep(s):
        from datetime import timedelta

        fake["now"] += timedelta(seconds=s)

    ledger = RunLedger(str(tmp_path / "ledger"))
    paused = Pipeline("paused", schedule="*/10 * * * *", sleep=sleep,
                      ledger=ledger)
    paused.add(Stage("t", lambda ctx: "never"))
    other = Pipeline("other", schedule="*/10 * * * *", sleep=sleep,
                     ledger=ledger)
    other.add(Stage("t", lambda ctx: "ran"))
    control = SchedulerControl()
    control.pause("paused")
    n = run_scheduler(
        [paused, other], spark=spark, now=now, sleep=sleep, max_runs=2,
        control=control,
    )
    assert n == 2
    recorded = ledger.runs(spark).collect()
    assert {r.pipeline for r in recorded} == {"other"}
    assert all(r.source == "scheduled" for r in recorded)


def test_trigger_now_manual_source_and_conf(spark, tmp_path):
    """trigger_now runs immediately with conf visible in ctx.params and
    ledger-records the run with source='manual' (Airflow
    `dags trigger --conf` parity)."""
    from artemia_airflow_spark.ledger import RunLedger
    from artemia_airflow_spark.schedule import trigger_now

    ledger = RunLedger(str(tmp_path / "ledger"))
    seen = {}
    pipe = Pipeline("manual-pipe", schedule="0 0 * * *", ledger=ledger)
    pipe.add(Stage("t", lambda ctx: seen.update(ctx.params) or "ok"))
    results = trigger_now(pipe, spark, conf={"target": "2026-08-15"})
    assert results["t"].state == "success"
    assert seen["target"] == "2026-08-15"
    rows = ledger.runs(spark).collect()
    assert len(rows) == 1 and rows[0].source == "manual"


def test_scheduler_max_ticks_bounds_fully_paused_loop():
    """max_runs alone cannot terminate an all-paused scheduler (skips
    don't count as executions); max_ticks bounds the loop (r10 review)."""
    from artemia_airflow_spark.schedule import SchedulerControl

    fake = {"now": datetime(2026, 8, 13, 0, 0, 30)}

    def now():
        return fake["now"]

    def sleep(s):
        from datetime import timedelta

        fake["now"] += timedelta(seconds=s)

    pipe = Pipeline("p2", schedule="*/10 * * * *", sleep=sleep)
    pipe.add(Stage("t", lambda ctx: "ok"))
    control = SchedulerControl()
    control.pause("p2")
    n = run_scheduler(
        [pipe], spark=None, now=now, sleep=sleep, max_runs=1,
        control=control, max_ticks=5,
    )
    assert n == 0  # terminated by ticks, nothing executed
