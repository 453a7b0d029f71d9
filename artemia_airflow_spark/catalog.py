"""Table catalog: parquet scans over the fixture star schema (B1).

Reference parity: the reference has no table abstraction at all (its
data lives in an external scraper pipeline, dags/update_tr_from_ex_dag.py:88-90);
this catalog is the engine's replacement for "named data the pipeline
operates on".

Scale notes: ``spark.read.parquet`` gives the vectorized parquet reader
with predicate pushdown + column pruning for free — every downstream
operator keeps filters/projections declarative so they reach the scan
(verify with df.explain(): PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scan(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """B1: load one fixture table. Single-file parquet at test SF; at
    100 TB the same call points at a partitioned directory and Spark
    parallelizes by row-group splits (spark.sql.files.maxPartitionBytes).

    Session-conf side effect (engine contract): scanning ``events``
    pins ``spark.sql.session.timeZone=UTC`` (and the parquet
    nanos-as-long legacy flag) for the WHOLE session — the ts
    normalization below is only an identity under UTC.  The engine
    declares UTC globally (session.py/ensure_engine_conf); callers who
    deliberately run a non-UTC session should convert display
    timezones at the edge (from_utc_timestamp) rather than re-setting
    the session zone after touching events.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts has shipped in two physical encodings across fixture
        # generations: parquet TIMESTAMP(NANOS) (which Spark 4 refuses to
        # read as a timestamp — [PARQUET_TYPE_ILLEGAL]) and plain
        # TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ).
        # Normalize both to a session-UTC TimestampType so every
        # downstream operator (watermarks, window(), epoch math) sees one
        # stable type regardless of fixture vintage.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ->TIMESTAMP cast below is a wall-clock identity ONLY
        # under a UTC session tz.  Declared queries pin it via
        # ensure_engine_conf, but direct library/test callers on a
        # non-UTC session would silently get shifted epochs — pin it
        # here too (idempotent with ensure_engine_conf).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # raw nanos; integer `div` (not /): ns-since-epoch > 2^53.
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # TIMESTAMP_NTZ (or already TIMESTAMP): NTZ->TIMESTAMP is a
        # wall-clock identity under the engine's pinned UTC session tz.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: scan(spark, sf_dir, t) for t in TABLES}


# Conf tag recording which sf_dir ALL fixture views currently point at
# ("" = unknown/mixed).  Owned by this module: every view write must go
# through register_views / register_view so the tag can never claim a
# view points somewhere it doesn't (r7 review finding — a single-view
# re-point at another sf_dir must invalidate run_sql's cache).
_VIEWS_TAG = "spark.artemia.registered_views_sf_dir"

# Temp views are session-global, so two pipeline stages registering
# different sf_dirs on a shared SparkSession could interleave
# mid-registration and let a query briefly read mixed-scale views while
# the tag claims one sf_dir (ADVICE r7).  A readers-writer lock makes
# every (register, analyze) pair atomic WITHOUT serializing the steady
# state (r8 review): analyses whose views are already registered at the
# right sf_dir run concurrently in shared mode; only re-registration
# takes the exclusive mode.  It guards driver-side catalog metadata
# only — no data scan ever runs under it.


class _RWLock:
    """Minimal readers-writer lock (no stdlib one) with writer
    preference: once a writer is waiting, new readers block until it
    has run, so a sustained stream of overlapping run_sql readers at
    one sf_dir can never starve a re-registration for another sf_dir
    indefinitely (ADVICE r8).  In-flight readers finish normally —
    the writer waits only for the readers it found, not new ones."""

    def __init__(self) -> None:
        self._cond = threading.Condition()
        self._readers = 0
        self._writing = False
        self._writers_waiting = 0

    def acquire_read(self) -> None:
        with self._cond:
            while self._writing or self._writers_waiting:
                self._cond.wait()
            self._readers += 1

    def release_read(self) -> None:
        with self._cond:
            self._readers -= 1
            if not self._readers:
                self._cond.notify_all()

    def acquire_write(self) -> None:
        with self._cond:
            self._writers_waiting += 1
            try:
                while self._writing or self._readers:
                    self._cond.wait()
            finally:
                self._writers_waiting -= 1
            self._writing = True

    def release_write(self) -> None:
        with self._cond:
            self._writing = False
            self._cond.notify_all()


_VIEWS_RW = _RWLock()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so SQL-surface operators
    (subqueries B38-B39, rollups) can use spark.sql directly."""
    _VIEWS_RW.acquire_write()
    try:
        _register_views_locked(spark, sf_dir)
    finally:
        _VIEWS_RW.release_write()


def _register_views_locked(spark: SparkSession, sf_dir: str) -> None:
    # invalidate FIRST, claim LAST: a failure mid-loop (missing parquet,
    # py4j hiccup) must leave the tag saying "unknown/mixed", never a
    # stale sf_dir over partially re-pointed views (r8 review — the
    # set-after-loop version violated the module's own r7 invariant)
    spark.conf.set(_VIEWS_TAG, "")
    for t in TABLES:
        scan(spark, sf_dir, t).createOrReplaceTempView(t)
    spark.conf.set(_VIEWS_TAG, sf_dir)


def register_view(spark: SparkSession, sf_dir: str, name: str) -> None:
    """Point ONE fixture view at ``sf_dir`` (the single-view face).
    Re-pointing a view at a different sf_dir than the all-views tag
    invalidates the tag, so a later run_sql re-registers instead of
    silently querying mixed scales.

    NOTE: registering a view and then calling ``spark.sql`` yourself is
    NOT atomic — a concurrent re-registration can swap scales between
    your two calls.  Query-builders should use :func:`run_sql`, which
    holds the lock across registration AND analysis (r8 review: the
    subquery faces had exactly that window)."""
    _VIEWS_RW.acquire_write()
    try:
        # invalidate first for the same mid-failure reason as above
        if spark.conf.get(_VIEWS_TAG, "") != sf_dir:
            spark.conf.set(_VIEWS_TAG, "")
        scan(spark, sf_dir, name).createOrReplaceTempView(name)
    finally:
        _VIEWS_RW.release_write()


def register_txtable(
    spark: SparkSession, view: str, table, *,
    version: int | None = None, ranges: dict | None = None,
    distributed: bool = False,
) -> None:
    """Register a transactional table SNAPSHOT as a temp view so raw
    SQL (B97) can query engine-owned tables — with time travel
    (``version``) and optional file-level stats pruning (``ranges``,
    the :meth:`TxTable.snapshot_where_ranges` contract) — not just the
    fixture star schema (VERDICT r8 item 6).

    The view binds the version's EXACT file list at registration time
    (snapshot isolation: concurrent commits never tear a registered
    view), and with ``ranges`` the scan lists only the footer-stat
    surviving files, so SQL over the view keeps the same 100 TB
    pruning story as the DataFrame reader (plan-pinned in
    tests/test_plans.py).  ``distributed=True`` (requires ``ranges``
    and a parquet checkpoint) runs the file pruning as a Spark
    metadata job over the checkpoint instead of the driver loop — the
    SQL face of the >1e6-live-file path (round 9).  Fixture table
    names are reserved — a TxTable shadowing ``orders`` would
    silently change what every other query reads."""
    if view in TABLES:
        raise ValueError(
            f"view name {view!r} shadows a fixture table; pick another"
        )
    if distributed and not ranges:
        raise ValueError("distributed pruning requires ranges")
    snap = (
        table.snapshot_where_ranges(
            ranges, version=version, distributed=distributed
        )
        if ranges
        else table.snapshot(version)
    )
    # a non-fixture view never touches the sf_dir tag, but registration
    # still serializes with run_sql's analysis (exclusive mode) so a
    # concurrent query can't resolve the view mid-replacement
    _VIEWS_RW.acquire_write()
    try:
        snap.createOrReplaceTempView(view)
    finally:
        _VIEWS_RW.release_write()


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Raw-SQL entry point: a user porting SQL text (the closest
    analogue in the reference is its Jinja-templated SQL strings,
    dags/update_tr_from_ex_dag.py:121) runs it verbatim against the
    fixture tables — no DataFrame-API rewrite required.

    Catalyst plans ``spark.sql(text)`` through the SAME optimizer as
    the DataFrame API (one logical plan namespace), so SQL text gets
    identical pushdown/pruning/partial-aggregation — plan-pinned in
    tests/test_plans.py (test_sql_text_plans_like_dataframe_flagship).
    Temp-view registration is catalog metadata (no data scan) but
    costs ~1s of driver-side analysis for 10 tables, so it runs once
    per (session, sf_dir) — the conf tag below re-points the views
    only when sf_dir changes (createOrReplaceTempView makes the
    re-registration itself idempotent)."""
    from artemia_airflow_spark.session import ensure_engine_conf

    ensure_engine_conf(spark)
    # view resolution happens at spark.sql() time, so the analysis must
    # share the lock with registration: shared mode when the views
    # already point at sf_dir (concurrent analyses don't block each
    # other — r8 review), exclusive only to re-register.
    _VIEWS_RW.acquire_read()
    try:
        if spark.conf.get(_VIEWS_TAG, "") == sf_dir:
            return spark.sql(sql)
    finally:
        _VIEWS_RW.release_read()
    _VIEWS_RW.acquire_write()
    try:
        if spark.conf.get(_VIEWS_TAG, "") != sf_dir:
            _register_views_locked(spark, sf_dir)
        return spark.sql(sql)
    finally:
        _VIEWS_RW.release_write()
