"""HTTP JSON-lines source as a Spark 4 Python DataSource (B3).

The "real" engine-grade version of ``sources/http.py``'s driver-side
helper: a custom ``DataSource`` registered with
``spark.dataSource.register(HttpJsonDataSource)`` and used as

    spark.read.format("httpjson")
         .schema("id long, status string, conclusion string")
         .option("url", "https://api.example/runs")
         .option("pages", "4")
         .option("records_key", "workflow_runs")
         .load()

Each page becomes one input partition, so page fetches run ON THE
EXECUTORS in parallel — the scan scales with pages, and nothing flows
through the driver.  This generalizes the reference's paged GitHub API
read (dags/update_tr_from_ex_dag.py:52-59) into a first-class table
source.

Transport injection: CI has no network, so the option
``transport_module`` names a module exposing ``fetch(url) -> str``;
default is urllib.  (An executor-side import keeps the reader
pickle-friendly.)
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


def _default_fetch(url: str) -> str:
    from urllib.request import urlopen  # lazy: executors only

    with urlopen(url, timeout=30) as resp:  # noqa: S310 — URL comes from user options
        return resp.read().decode("utf-8")


class HttpJsonReader(DataSourceReader):
    """Error contract (mirrors the reference's defensive ``.get()``
    handling, dags/update_tr_from_ex_dag.py:59-63, at the right layer
    for a table source):

    - transport failure: retried ``max_retries`` times per page with
      ``retry_backoff_sec`` exponential backoff (the reference retries
      at the Airflow-task layer; a paged scan retries per PAGE so one
      flaky page doesn't re-fetch the whole scan).  Exhausted retries
      raise the last transport error wrapped with the page URL.
    - malformed JSON body: ValueError naming the page URL (never a bare
      json decode traceback from deep inside an executor).
    - ``records_key`` absent from the response: ValueError naming the
      missing key and the keys that ARE present (the reference's
      ``.get(...) -> explicit AirflowException`` move).
    - records not a list: ValueError with the actual type.
    - an EMPTY page yields no rows and is NOT an error: for a table
      source an empty page is a valid (exhausted) pagination tail —
      the reference errors on empty because its function is a sensor
      ("wait for a run to exist"), which maps to HttpSensor/
      sensor-as-stream in this engine, not to the scan.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.url = options.get("url")
        if not self.url:
            raise ValueError("httpjson source requires option 'url'")
        self.pages = int(options.get("pages", "1"))
        self.records_key = options.get("records_key")
        self.transport_module = options.get("transport_module")
        self.max_retries = int(options.get("max_retries", "2"))
        self.retry_backoff_sec = float(options.get("retry_backoff_sec", "1.0"))

    def partitions(self) -> list[InputPartition]:
        # one partition per page -> executor-parallel fetch
        return [_PagePartition(p) for p in range(1, self.pages + 1)]

    def _fetch_with_retry(self, fetch, page_url: str) -> str:
        import time

        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                return fetch(page_url)
            except Exception as e:  # noqa: BLE001 — transport errors are opaque
                last = e
                if attempt < self.max_retries:
                    time.sleep(self.retry_backoff_sec * (2**attempt))
        raise IOError(
            f"httpjson: fetch failed after {self.max_retries + 1} attempts "
            f"for {page_url!r}: {last}"
        ) from last

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        if self.transport_module:
            import importlib

            fetch = importlib.import_module(self.transport_module).fetch
        else:
            fetch = _default_fetch
        sep = "&" if "?" in self.url else "?"
        page_url = f"{self.url}{sep}page={partition.page}"
        body = self._fetch_with_retry(fetch, page_url)
        try:
            doc = json.loads(body)
        except json.JSONDecodeError as e:
            raise ValueError(
                f"httpjson: malformed JSON from {page_url!r}: {e}"
            ) from e
        if self.records_key:
            if not isinstance(doc, dict) or self.records_key not in doc:
                present = sorted(doc) if isinstance(doc, dict) else type(doc).__name__
                raise ValueError(
                    f"httpjson: records_key {self.records_key!r} absent from "
                    f"{page_url!r} response (present: {present})"
                )
            records = doc[self.records_key]
        else:
            records = doc
        if not isinstance(records, list):
            raise ValueError(
                f"httpjson: records at {page_url!r} are "
                f"{type(records).__name__}, expected a list"
            )
        fields = [f.name for f in self.schema.fields]
        for rec in records:
            yield tuple(rec.get(f) for f in fields)


class HttpJsonDataSource(DataSource):
    """format name: ``httpjson``"""

    @classmethod
    def name(cls) -> str:
        return "httpjson"

    def schema(self) -> str:
        # no inference: HTTP sources must declare a schema (scale rule:
        # inference would fetch data twice)
        raise NotImplementedError("httpjson requires an explicit .schema(...)")

    def reader(self, schema: StructType) -> HttpJsonReader:
        return HttpJsonReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(HttpJsonDataSource)
