"""HTTP sources & sinks (B3, B5) — the data-plane generalization of the
reference's HTTP operators.

Reference parity:
- paged JSON GET -> DataFrame generalizes the GitHub workflow-runs read
  (dags/update_tr_from_ex_dag.py:52-59: params, ``response.json()``).
- webhook POST sink generalizes the notify tasks
  (dags/update_tr_from_ex_dag.py:132-152, dags/hello_function_dag.py:37-58).

Transport is injectable (``fetch``/``post`` callables) so CI runs with
a canned transport and zero network; production passes
``requests.get``-shaped functions.

Scale design: the *control-plane* fetch (few pages) runs on the driver
and parallelizes into a DataFrame; *data-plane* fan-out (millions of
URLs) goes through ``fetch_partitioned`` (mapInPandas over a URL
DataFrame) so requests issue from executors with bounded concurrency.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from artemia_airflow_spark.catalog import scan
from artemia_airflow_spark.plans.registry import declared
from artemia_airflow_spark.session import ensure_engine_conf

# fetch(url: str) -> str (JSON body); post(url: str, body: str) -> int (status)
Fetch = Callable[[str], str]
Post = Callable[[str, str], int]


def http_json_source(
    spark: SparkSession,
    base_url: str,
    *,
    fetch: Fetch,
    schema: T.StructType,
    pages: int = 1,
    records_key: str | None = None,
) -> DataFrame:
    """B3: paged JSON-lines REST source.

    Driver fetches ``pages`` pages (control-plane volume), concatenates
    the JSON records, and parallelizes them into a DataFrame with an
    explicit schema.  For true big-data HTTP ingest use
    ``fetch_partitioned`` instead.
    """
    rows: list[str] = []
    for page in range(1, pages + 1):
        body = fetch(f"{base_url}?page={page}")
        doc = json.loads(body)
        records = doc[records_key] if records_key else doc
        rows.extend(json.dumps(r) for r in records)
    rdd = spark.sparkContext.parallelize(rows or [], max(1, min(len(rows), 8)))
    return spark.read.schema(schema).json(rdd)


def fetch_partitioned(urls: DataFrame, url_col: str, *, fetch: Fetch) -> DataFrame:
    """Data-plane HTTP fan-out: one request per row, issued from
    executors via mapInPandas (Arrow batches, requests stay off the
    driver).  Returns (url, status, body)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {"url": [], "status": [], "body": []}
            for u in pdf[url_col]:
                try:
                    body = fetch(u)
                    out["status"].append(200)
                    out["body"].append(body)
                except Exception:  # noqa: BLE001 — per-URL fault isolation
                    out["status"].append(-1)
                    out["body"].append(None)
                out["url"].append(u)
            yield pd.DataFrame(out)

    return urls.mapInPandas(run, "url string, status int, body string")


def webhook_sink(df: DataFrame, url: str, *, post: Post, batch_size: int = 500) -> None:
    """B5: POST each partition's rows as JSON batches to a webhook.
    Runs via foreachPartition — executor-side, no driver bottleneck;
    idempotency is the receiver's contract (at-least-once on retry,
    same as the reference's notify semantics)."""

    def send(rows) -> None:
        buf = []
        for row in rows:
            buf.append(row.asDict(recursive=True))
            if len(buf) >= batch_size:
                post(url, json.dumps(buf, default=str))
                buf = []
        if buf:
            post(url, json.dumps(buf, default=str))

    df.foreachPartition(send)


# --------------------------------------------------------------------------
# Declared query (rows-only; CI has no network -> canned transport)
# --------------------------------------------------------------------------

_RUNS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("conclusion", T.StringType()),
    ]
)


def _canned_fetch(url: str) -> str:
    """Deterministic stand-in for the GitHub workflow-runs endpoint
    (shape mirrors dags/update_tr_from_ex_dag.py:59-63)."""
    page = int(url.rsplit("=", 1)[-1])
    runs = [
        {
            "id": page * 100 + i,
            "status": "completed" if i % 3 else "in_progress",
            "conclusion": "success" if i % 2 else "failure",
        }
        for i in range(10)
    ]
    return json.dumps({"workflow_runs": runs})


@declared(
    "q_source_http",
    oracle="""
    WITH runs AS (
      SELECT p * 100 + i AS id,
             CASE WHEN i % 3 <> 0 THEN 'completed' ELSE 'in_progress' END
               AS status
      FROM range(1, 4) t(p), range(10) u(i)
    )
    SELECT status, CAST(MAX(id) AS BIGINT) AS latest_id, COUNT(*) AS n
    FROM runs GROUP BY status
    """,
)
def q_source_http(spark, sf_dir):
    """B3, ORACLE-CHECKED (round-6 upgrade from rows-only): paged HTTP
    JSON source with canned transport — top-1-by-recency per status
    (the reference's per_page=1 pattern,
    dags/update_tr_from_ex_dag.py:53,63).  The canned pages are pure
    arithmetic in (page, i), so the oracle REGENERATES them in SQL and
    the hash match certifies the whole fetch→parse→schema→aggregate
    path against an independent expectation."""
    ensure_engine_conf(spark)
    df = http_json_source(
        spark,
        "https://api.example.test/runs",
        fetch=_canned_fetch,
        schema=_RUNS_SCHEMA,
        pages=3,
        records_key="workflow_runs",
    )
    return df.groupBy("status").agg(
        F.max("id").alias("latest_id"), F.count(F.lit(1)).alias("n")
    )


@declared(
    "q_source_http_ds",
    oracle="""
    WITH runs AS (
      SELECT p * 100 + i AS id,
             CASE WHEN i % 3 <> 0 THEN 'completed' ELSE 'in_progress' END
               AS status,
             CASE WHEN i % 2 <> 0 THEN 'success' ELSE 'failure' END
               AS conclusion
      FROM range(1, 4) t(p), range(10) u(i)
    )
    SELECT status, conclusion, CAST(MAX(id) AS BIGINT) AS latest_id,
           COUNT(*) AS n
    FROM runs GROUP BY status, conclusion
    """,
)
def q_source_http_ds(spark, sf_dir):
    """B3, ORACLE-CHECKED (round-6 upgrade from rows-only): same read
    through the Spark 4 Python DataSource (``format("httpjson")``) —
    page fetches run executor-side, one input partition per page
    (sources/http_datasource.py).  Oracle regenerates the canned pages
    arithmetically, certifying partitions() fan-out + read() parsing
    end-to-end."""
    ensure_engine_conf(spark)
    from artemia_airflow_spark.sources.http_datasource import register

    register(spark)
    df = (
        spark.read.format("httpjson")
        .schema("id long, status string, conclusion string")
        .option("url", "https://api.example.test/runs")
        .option("pages", "3")
        .option("records_key", "workflow_runs")
        .option("transport_module", "artemia_airflow_spark.sources._canned_http")
        .load()
    )
    return df.groupBy("status", "conclusion").agg(
        F.max("id").alias("latest_id"), F.count(F.lit(1)).alias("n")
    )
