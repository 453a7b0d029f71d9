"""The reference's two DAGs, rebuilt on the engine's pipeline layer.

Behavioral parity targets (SURVEY.md §3.2-3.3):

- ``build_update_pipeline`` <- dags/update_tr_from_ex_dag.py:
  trigger GitHub-Action scraper (:93-105) -> settle + fetch latest run
  id (:42-65, XCom) -> poll run until completed (:118-130, 3-way
  predicate :18-39) -> notify success XOR failure (:132-152, trigger
  rules :139,:150).
- ``build_azure_pipeline`` <- dags/hello_function_dag.py:
  call function with 3 retries / exponential 3->10 min backoff
  (:22-34) -> notify success (all_success :43) / failure (all_failed
  :55); run capped at 2h (:13).

The HTTP transport and clocks are injected so the pipelines run in CI
with zero network and zero real sleeping; production wires
``requests``-backed transports and real clocks.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from typing import Any

from artemia_airflow_spark.pipeline import (
    Connection,
    Pipeline,
    RetryPolicy,
    Stage,
    StageContext,
    http_stage,
    deferrable_sensor_stage,
    sensor_stage,
)

# transport(method, url, body, conn) -> parsed-JSON-ish dict
Transport = Callable[[str, str, str, Connection], Any]


def check_github_action_run_status(response: dict) -> bool:
    """3-way sensor predicate, semantics-equal to the reference's
    check_github_action_run_status (dags/update_tr_from_ex_dag.py:18-39):
    True = completed+success, False = keep polling, raise = failed."""
    status = response.get("status")
    conclusion = response.get("conclusion")
    if status == "completed":
        if conclusion == "success":
            return True
        raise RuntimeError(f"github action concluded {conclusion!r}")
    return False


def build_update_pipeline(
    *,
    transport: Transport,
    settle_sleep_s: float = 15.0,
    poke_interval_s: float = 60.0,
    sensor_timeout_s: float = 3600.0,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
    deferrable: bool = False,
) -> Pipeline:
    """update_tourism_from_exhibition as an engine pipeline (A1-A12).

    ``deferrable=True`` swaps the poke-mode wait stage for its A14
    deferrable twin — the same 3-way predicate contract (truthy =
    done, falsy = keep polling, raise = fail) polled by the shared
    triggerer thread instead of a held worker slot, i.e. the upstream
    ``HttpSensorAsync``/``deferrable=True`` flavor of the reference's
    sensor."""
    from artemia_airflow_spark.pipeline import Triggerer

    pipe = Pipeline(
        "update_tourism_from_exhibition",
        schedule="0 0 * * *",  # daily, reference :82 (tz note: ran in Asia/Seoul)
        tags=("github", "scraper"),
        default_retry=RetryPolicy(retries=1, retry_delay_s=300),  # :72-76
        sleep=sleep,
        # the deferrable wait honors the SAME injected clock/sleep as
        # the poke-mode one (r10 review: the default Triggerer would
        # poll and enforce sensor_timeout_s on REAL time, breaking the
        # module's zero-real-sleeping test contract)
        triggerer=Triggerer(clock=clock, sleep=sleep),
    )
    pipe.connections.register(
        Connection("github_api_conn", base_url="https://api.github.com", password="<token>")
    )
    pipe.connections.register(
        Connection("powerautomate_webhook", base_url="https://webhook.example")
    )

    trigger = pipe.add(
        http_stage(
            "trigger_github_action",  # :93-105
            conn_id="github_api_conn",
            method="POST",
            endpoint="/repos/example-org/data-pipeline/dispatches",
            body=json.dumps({"event_type": "run-scraper-trigger"}),
            transport=transport,
        )
    )

    @pipe.stage("get_latest_run_id")  # :107-116 (callable :42-65)
    def get_latest_run_id(ctx: StageContext) -> int:
        sleep(settle_sleep_s)  # post-trigger settle, reference :44-45
        conn = ctx.connections.get("github_api_conn")
        resp = transport(
            "GET",
            conn.base_url
            + "/repos/example-org/data-pipeline/actions/runs"
            + "?event=repository_dispatch&per_page=1",  # top-1-by-recency, :53
            "",
            conn,
        )
        runs = resp.get("workflow_runs") or []
        if not runs:
            raise RuntimeError("no workflow runs found")  # :60-62
        return runs[0]["id"]  # :63 -> XCom

    def poll_run(ctx: StageContext) -> bool:
        run_id = ctx.xcom_pull("get_latest_run_id")  # :121 template
        conn = ctx.connections.get("github_api_conn")
        resp = transport(
            "GET",
            f"{conn.base_url}/repos/example-org/data-pipeline/actions/runs/{run_id}",
            "",
            conn,
        )
        return check_github_action_run_status(resp)

    if deferrable:
        wait = pipe.add(
            deferrable_sensor_stage(
                "wait_for_github_action",  # :118-130, triggerer mode
                trigger=poll_run,
                poke_interval_s=poke_interval_s,
                timeout_s=sensor_timeout_s,
            )
        )
    else:
        wait = pipe.add(
            sensor_stage(
                "wait_for_github_action",  # :118-130
                predicate=poll_run,
                poke_interval_s=poke_interval_s,
                timeout_s=sensor_timeout_s,
                clock=clock,
                sleep=sleep,
            )
        )

    notify_ok = pipe.add(
        http_stage(
            "notify_success",  # :132-141
            conn_id="powerautomate_webhook",
            method="POST",
            endpoint="/notify",
            body=json.dumps({"message": "Scraper job has been completed successfully"}),
            transport=transport,
            trigger_rule="all_success",  # :139
        )
    )
    notify_fail = pipe.add(
        http_stage(
            "notify_failure",  # :143-152
            conn_id="powerautomate_webhook",
            method="POST",
            endpoint="/notify",
            body=json.dumps({"message": "Scraper job has failed"}),
            transport=transport,
            trigger_rule="one_failed",  # :150
        )
    )

    trigger >> get_latest_run_id >> wait >> [notify_ok, notify_fail]  # :154
    return pipe


def build_azure_pipeline(
    *,
    transport: Transport,
    sleep: Callable[[float], None] = time.sleep,
) -> Pipeline:
    """call_azure_function as an engine pipeline (hello_function_dag.py)."""
    pipe = Pipeline(
        "call_azure_function",
        schedule="@daily",  # :16
        tags=("azure",),
        run_timeout_s=2 * 3600,  # dagrun_timeout, :13
        sleep=sleep,
    )
    pipe.connections.register(
        Connection("azure_function_conn", base_url="https://fn.example", password="<key>")
    )
    pipe.connections.register(
        Connection("powerautomate_webhook", base_url="https://webhook.example")
    )

    call = pipe.add(
        http_stage(
            "call_azure_function",  # :22-34
            conn_id="azure_function_conn",
            method="GET",
            endpoint="/api/hello1?",
            transport=transport,
            retry=RetryPolicy(  # :30-33
                retries=3,
                retry_delay_s=180,
                exponential_backoff=True,
                max_retry_delay_s=600,
            ),
        )
    )
    notify_ok = pipe.add(
        http_stage(
            "notify_success",  # :37-46
            conn_id="powerautomate_webhook",
            method="POST",
            endpoint="/notify",
            body=json.dumps({"message": "Azure Function called successfully"}),
            transport=transport,
            trigger_rule="all_success",  # :43
        )
    )
    notify_fail = pipe.add(
        http_stage(
            "notify_failure",  # :49-58
            conn_id="powerautomate_webhook",
            method="POST",
            endpoint="/notify",
            body=json.dumps({"message": "Azure Function call failed"}),
            transport=transport,
            trigger_rule="all_failed",  # :55
        )
    )
    call >> [notify_ok, notify_fail]  # :61
    return pipe
