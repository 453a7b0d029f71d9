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
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.url = options.get("url")
        if not self.url:
            raise ValueError("httpjson source requires option 'url'")
        self.pages = int(options.get("pages", "1"))
        self.records_key = options.get("records_key")
        self.transport_module = options.get("transport_module")

    def partitions(self) -> list[InputPartition]:
        # one partition per page -> executor-parallel fetch
        return [_PagePartition(p) for p in range(1, self.pages + 1)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        if self.transport_module:
            import importlib

            fetch = importlib.import_module(self.transport_module).fetch
        else:
            fetch = _default_fetch
        sep = "&" if "?" in self.url else "?"
        body = fetch(f"{self.url}{sep}page={partition.page}")
        doc = json.loads(body)
        records = doc[self.records_key] if self.records_key else doc
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
