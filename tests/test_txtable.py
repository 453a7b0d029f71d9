"""Transactional parquet table (sources/txtable.py, B89): ACID merge,
snapshot isolation, time travel, optimistic concurrency, file pruning,
torn-write invisibility, vacuum.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading

import pytest
from pyspark.sql import functions as F

from artemia_airflow_spark.sources.txtable import CommitConflict, TxTable


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="aas_txtable_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, root, n=100, files=4):
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 10).cast("double").alias("v"),
            F.concat(F.lit("s"), (F.col("id") % 5)).alias("tag"),
        )
        .repartition(files)
    )
    return TxTable.create(spark, df, root, key_col="k")


def test_create_and_snapshot(spark, root):
    t = _mk(spark, root)
    assert t.version() == 0
    snap = t.snapshot()
    assert snap.count() == 100
    assert {f.name for f in snap.schema.fields} == {"k", "v", "tag"}
    assert len(t.files()) >= 1
    # every file carries footer key stats
    assert all(m["key_min"] is not None for m in t.files())


def test_merge_updates_inserts_deletes(spark, root):
    t = _mk(spark, root)
    changes = spark.createDataFrame(
        [(5, 999.0, "upd", False), (200, 1.0, "new", False), (7, 0.0, "x", True)],
        "k long, v double, tag string, is_del boolean",
    )
    v = t.merge(changes, delete_col="is_del")
    assert v == 1
    rows = {r.k: (r.v, r.tag) for r in t.snapshot().collect()}
    assert rows[5] == (999.0, "upd")  # matched -> updated
    assert rows[200] == (1.0, "new")  # unmatched -> inserted
    assert 7 not in rows  # delete applied
    assert len(rows) == 100  # 100 - 1 delete + 1 insert
    # time travel: version 0 still shows the pre-merge state
    old = {r.k: r.v for r in t.snapshot(0).collect()}
    assert old[5] == 50.0 and 7 in old and 200 not in old


def test_merge_rewrites_only_touched_files(spark, root):
    """The 100 TB property: a merge touching keys in ONE file's range
    rewrites that file only; every other file carries forward
    byte-identical (same path in the new snapshot)."""
    t = _mk(spark, root, n=1000, files=8)
    before = {m["path"] for m in t.files()}
    # keys 0..4 land in the file(s) whose range covers them
    changes = spark.createDataFrame(
        [(k, -1.0, "upd") for k in range(5)], "k long, v double, tag string"
    )
    covering = {
        m["path"] for m in t.files() if m["key_min"] <= 4 and m["key_max"] >= 0
    }
    t.merge(changes)
    after = {m["path"] for m in t.files()}
    assert before - after == covering  # exactly the covering files rewritten
    assert before & after == before - covering  # the rest carried forward
    assert t.snapshot().filter("v = -1.0").count() == 5


def test_merge_outside_all_ranges_is_pure_insert(spark, root):
    t = _mk(spark, root, n=100, files=4)
    before = {m["path"] for m in t.files()}
    ch = spark.createDataFrame(
        [(10_000, 1.0, "new")], "k long, v double, tag string"
    )
    t.merge(ch)
    # no existing file covers key 10000 -> nothing rewritten, one file added
    assert before <= {m["path"] for m in t.files()}
    assert t.snapshot().count() == 101


def test_append_and_concurrent_appends_both_land(spark, root):
    t = _mk(spark, root, n=10, files=1)
    errs, versions = [], []

    def add(lo):
        try:
            df = spark.range(lo, lo + 10).select(
                F.col("id").alias("k"),
                F.lit(0.0).alias("v"),
                F.lit("app").alias("tag"),
            )
            versions.append(TxTable(spark, t.root).append(df))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    th = [threading.Thread(target=add, args=(100 * (i + 1),)) for i in range(3)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs
    assert sorted(versions) == [1, 2, 3]  # all rebased onto distinct versions
    assert t.snapshot().count() == 40


def test_rewrite_conflict_detected(spark, root):
    """Two merges from the same snapshot: the loser must raise
    CommitConflict, not silently clobber the winner."""
    t = _mk(spark, root, n=50, files=2)
    ch1 = spark.createDataFrame([(1, -1.0, "a")], "k long, v double, tag string")
    ch2 = spark.createDataFrame([(2, -2.0, "b")], "k long, v double, tag string")
    t.merge(ch1)

    # simulate the loser: a handle that read version 0, then commits after
    # the winner landed — stage its commit at the stale read_version
    stale = TxTable(spark, t.root)
    with pytest.raises(CommitConflict):
        stale._try_commit(
            {
                "operation": "merge",
                "add": [],
                "remove": [t.files()[0]["path"]],
                "schema": stale._commits()[-1]["schema"],
                "key_col": "k",
            },
            read_version=0,
        )
    # winner's state intact
    assert t.snapshot().filter("v = -1.0").count() == 1


def test_delete_predicate(spark, root):
    t = _mk(spark, root, n=100, files=4)
    v = t.delete("tag = 's0'")  # k % 5 == 0 -> 20 rows
    assert v == 1
    assert t.snapshot().count() == 80
    assert t.snapshot().filter("tag = 's0'").count() == 0
    assert t.snapshot(0).count() == 100  # time travel unaffected
    # no-op delete commits nothing
    assert t.delete("tag = 'nope'") == 1
    assert t.version() == 1


def test_torn_writer_is_invisible(spark, root):
    """Data files without a commit (dead writer) never surface; a staged
    _tmp_ commit never surfaces; vacuum sweeps both."""
    t = _mk(spark, root, n=10, files=1)
    # orphan data file (writer died before commit)
    orphan = os.path.join(root, "part-deadbeef.parquet")
    spark.range(5).select(
        F.col("id").alias("k"), F.lit(0.0).alias("v"), F.lit("x").alias("tag")
    ).coalesce(1).write.mode("overwrite").parquet(root + "_stage")
    src = next(
        n for n in os.listdir(root + "_stage") if n.endswith(".parquet")
    )
    shutil.move(os.path.join(root + "_stage", src), orphan)
    shutil.rmtree(root + "_stage", ignore_errors=True)
    # staged commit orphan
    with open(os.path.join(root, "_log", "_tmp_dead.json"), "w") as f:
        json.dump({"operation": "merge", "add": [], "remove": []}, f)

    assert t.snapshot().count() == 10  # orphan invisible
    assert t.version() == 0
    swept = t.vacuum(retention_sec=0)
    assert "part-deadbeef.parquet" in swept
    assert "_log/_tmp_dead.json" in swept
    assert t.snapshot().count() == 10


def test_vacuum_keeps_live_files(spark, root):
    t = _mk(spark, root, n=100, files=4)
    ch = spark.createDataFrame([(1, -1.0, "a")], "k long, v double, tag string")
    t.merge(ch)
    swept = t.vacuum(retention_sec=0)  # rewritten-away files are swept
    assert swept
    assert t.snapshot().count() == 100  # head intact
    with pytest.raises(Exception):
        t.snapshot(0).count()  # time travel to vacuumed version now fails


def test_merge_matches_dataframe_level_merge(spark, root):
    """Differential: storage MERGE == operators/cdc.merge_upsert on the
    same inputs (the txtable path adds atomicity, not new semantics)."""
    from artemia_airflow_spark.operators.cdc import merge_upsert

    t = _mk(spark, root, n=200, files=4)
    base = t.snapshot(0)
    changes = spark.createDataFrame(
        [(k, float(-k), "m", k % 3 == 0) for k in range(150, 260, 7)],
        "k long, v double, tag string, is_del boolean",
    )
    t.merge(changes, delete_col="is_del")
    got = sorted((r.k, r.v, r.tag) for r in t.snapshot().collect())
    want = sorted(
        (r.k, r.v, r.tag)
        for r in merge_upsert(base, changes, "k", delete_col="is_del").collect()
    )
    assert got == want


def test_compact_binpacks_without_changing_rows(spark, root):
    t = _mk(spark, root, n=100, files=1)
    for lo in (1000, 2000, 3000):
        t.append(
            spark.range(lo, lo + 10).select(
                F.col("id").alias("k"),
                F.lit(0.0).alias("v"),
                F.lit("app").alias("tag"),
            )
        )
    assert len(t.files()) >= 4
    before = sorted(r.k for r in t.snapshot().collect())
    v = t.compact(target_files=1)
    assert len(t.files()) == 1
    assert sorted(r.k for r in t.snapshot().collect()) == before
    assert t.history()[-1]["operation"] == "compact"
    # below min_files it is a no-op with no commit
    assert t.compact() == v and t.version() == v


def test_change_feed_incremental_read(spark, root):
    t = _mk(spark, root, n=10, files=1)  # v0: create, keys 0..9
    t.append(
        spark.range(100, 105).select(
            F.col("id").alias("k"), F.lit(1.0).alias("v"), F.lit("a").alias("tag")
        )
    )  # v1: insert 100..104
    t.merge(
        spark.createDataFrame([(3, -3.0, "m")], "k long, v double, tag string")
    )  # v2: rewrite of the file containing key 3
    ch = t.changes(0)
    types = {r._commit_version: r._change_type for r in ch.collect()}
    assert types == {1: "insert", 2: "update_or_insert"}
    # v1 slice carries exactly the appended keys
    assert sorted(
        r.k for r in ch.filter("_commit_version = 1").collect()
    ) == [100, 101, 102, 103, 104]
    # the merge rewrite contains the updated row
    assert ch.filter("_commit_version = 2 AND v = -3.0").count() == 1
    # empty window
    assert t.changes(t.version()).count() == 0
    with pytest.raises(ValueError):
        t.changes(99)


def test_cluster_makes_pruning_effective(spark, root):
    """Range clustering turns footer stats into real pruning: the _mk
    round-robin layout gives every file ~the whole key range (a narrow
    merge touches all of them); after cluster(), file ranges are
    disjoint and the same merge rewrites exactly one file."""
    t = _mk(spark, root, n=1000, files=8)  # round-robin: ranges overlap
    narrow = spark.createDataFrame(
        [(k, -1.0, "u") for k in range(10, 15)], "k long, v double, tag string"
    )
    covering_before = {
        m["path"] for m in t.files() if m["key_min"] <= 14 and m["key_max"] >= 10
    }
    assert len(covering_before) >= 6  # unclustered: ~every file covers 10..14

    t.cluster(num_files=8)
    files = t.files()
    assert len(files) == 8
    # disjoint ranges
    spans = sorted((m["key_min"], m["key_max"]) for m in files)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))
    before = {m["path"] for m in files}
    t.merge(narrow)
    rewritten = before - {m["path"] for m in t.files()}
    assert len(rewritten) == 1  # pruning now touches exactly one file
    assert t.snapshot().filter("v = -1.0").count() == 5
    assert sorted(r.k for r in t.snapshot().collect()) == list(range(1000))


def test_change_feed_drives_incremental_rollup(spark, root):
    """Closing the incremental loop (B64 x B89): a rollup maintained by
    folding ONLY the change feed's new rows equals a full recompute
    over the table head.  Valid for append-only windows — the test
    asserts every consumed commit is an 'insert' (a merge's rewritten
    files mix carried-forward rows and would double-count; consumers
    must re-aggregate touched keys for those, which is what
    _change_type is for)."""
    from artemia_airflow_spark.operators.cdc import merge_rollup

    t = _mk(spark, root, n=100, files=2)

    def partial(df):
        return df.groupBy("tag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("sv"),
        )

    base = partial(t.snapshot()).cache()
    base.count()
    v0 = t.version()
    for lo in (1000, 2000):
        t.append(
            spark.range(lo, lo + 50).select(
                F.col("id").alias("k"),
                (F.col("id") * 2.0).alias("v"),
                F.concat(F.lit("s"), (F.col("id") % 5)).alias("tag"),
            )
        )
    feed = t.changes(v0)
    assert {r._change_type for r in feed.select("_change_type").distinct().collect()} == {"insert"}
    maintained = merge_rollup(base, partial(feed), ["tag"])
    got = sorted(
        (r.tag, r.n, float(r.sv)) for r in maintained.collect()
    )
    want = sorted(
        (r.tag, r.n, float(r.sv)) for r in partial(t.snapshot()).collect()
    )
    assert got == want
    base.unpersist()


def test_checkpoint_resolves_identically(spark, root):
    """A checkpoint changes resolution cost, never results: snapshot,
    files, time travel and post-checkpoint commits all agree with the
    checkpoint-free replay."""
    t = _mk(spark, root, n=50, files=2)
    t.append(
        spark.range(100, 120).select(
            F.col("id").alias("k"), F.lit(1.0).alias("v"), F.lit("a").alias("tag")
        )
    )
    t.merge(spark.createDataFrame([(1, -1.0, "m")], "k long, v double, tag string"))
    pre_files = sorted(m["path"] for m in t.files())
    pre_rows = sorted(r.k for r in t.snapshot().collect())

    cp_v = t.checkpoint()
    assert cp_v == 2
    assert sorted(m["path"] for m in t.files()) == pre_files
    assert sorted(r.k for r in t.snapshot().collect()) == pre_rows
    # time travel BEFORE the checkpoint still replays the raw log
    assert t.snapshot(0).count() == 50
    # commits after the checkpoint replay on top of it
    t.append(
        spark.range(200, 210).select(
            F.col("id").alias("k"), F.lit(2.0).alias("v"), F.lit("b").alias("tag")
        )
    )
    assert t.snapshot().count() == 80
    assert t.snapshot().filter("v = -1.0").count() == 1


def test_schema_evolution_on_append(spark, root):
    t = _mk(spark, root, n=10, files=1)
    wide = spark.range(100, 105).select(
        F.col("id").alias("k"),
        F.lit(0.0).alias("v"),
        F.lit("w").alias("tag"),
        F.lit("extra").alias("note"),
    )
    # unknown column without the flag -> explicit error, no commit
    with pytest.raises(ValueError, match="merge_schema"):
        t.append(wide)
    assert t.version() == 0
    t.append(wide, merge_schema=True)
    snap = t.snapshot()
    assert [f.name for f in snap.schema.fields] == ["k", "v", "tag", "note"]
    # old rows read back with nulls in the new column
    assert snap.filter("note IS NULL").count() == 10
    assert snap.filter("note = 'extra'").count() == 5
    # type change always refuses
    bad = spark.range(1).select(
        F.col("id").alias("k"), F.lit("oops").alias("v"), F.lit("t").alias("tag")
    )
    with pytest.raises(ValueError, match="type change"):
        t.append(bad, merge_schema=True)


def test_stream_to_txtable_exactly_once(spark, root, tmp_path):
    """B82 x B89: checkpointed foreachBatch appends into the
    transactional table deliver each event exactly once across two
    runs over a growing source, and a REDELIVERED batch id (the
    restart contract) commits nothing the second time."""
    from artemia_airflow_spark.catalog import scan
    from artemia_airflow_spark.sources.txtable import stream_to_txtable
    from tests.conftest import SF_SMOKE

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    ev = scan(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    pdf = ev.toPandas()
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half], schema=ev.schema).coalesce(1).write.parquet(
        os.path.join(src, "c0")
    )
    t = TxTable.create(
        spark, ev.limit(0), root, key_col="event_id"
    )
    stream = spark.readStream.schema(ev.schema).parquet(src + "/*")
    stream_to_txtable(stream, t, ckpt, sink_id="ev")
    n1 = t.snapshot().count()
    assert n1 == half
    batches1 = t.committed_stream_batches("ev")
    assert batches1

    # run 2: second half arrives; same checkpoint resumes
    spark.createDataFrame(pdf.iloc[half:], schema=ev.schema).coalesce(1).write.parquet(
        os.path.join(src, "c1")
    )
    stream2 = spark.readStream.schema(ev.schema).parquet(src + "/*")
    stream_to_txtable(stream2, t, ckpt, sink_id="ev")
    ids = [r.event_id for r in t.snapshot().collect()]
    assert len(ids) == len(set(ids)) == len(pdf), "lost or duplicated events"

    # simulate the crash-redelivery: re-commit an already-committed batch id
    dup_batch = max(t.committed_stream_batches("ev"))
    v_before = t.version()
    from artemia_airflow_spark.sources import txtable as _m

    def commit_batch(batch_df, batch_id):
        if batch_id in t.committed_stream_batches("ev"):
            return
        t.append(batch_df, meta={"sink_id": "ev", "batch_id": int(batch_id)})

    commit_batch(t.snapshot().limit(5), dup_batch)
    assert t.version() == v_before, "redelivered batch must be a no-op"
    del _m


def test_delete_keeps_null_predicate_rows(spark, root):
    """Code-review regression (r6): DELETE removes only rows where the
    predicate is TRUE — rows where it evaluates to NULL must survive
    the rewrite (a plain NOT(pred) filter silently dropped them)."""
    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, None, "b"), (3, 20.0, "c")],
        "k long, v double, tag string",
    )
    t = TxTable.create(spark, df, root, key_col="k")
    t.delete("v > 10")
    rows = {r.k for r in t.snapshot().collect()}
    assert rows == {1, 2}, rows  # k=2 (NULL predicate) survives


def test_compact_is_invisible_to_change_feed(spark, root):
    """Code-review regression (r6): compact/cluster are physical-only
    rewrites (data_change=false) — the change feed must skip them, or
    every incremental consumer double-counts the table after each
    compaction."""
    t = _mk(spark, root, n=50, files=4)
    v0 = t.version()
    t.append(
        spark.range(100, 110).select(
            F.col("id").alias("k"),
            F.lit(1.0).alias("v"),
            F.lit("a").alias("tag"),
        )
    )
    t.compact(target_files=1)
    t.cluster(num_files=2)
    feed = t.changes(v0)
    assert feed.count() == 10  # only the appended rows, not 2x60 rewrites
    assert {r._change_type for r in feed.select("_change_type").distinct().collect()} == {"insert"}


def test_zero_prune_merge_conflicts_not_rebases(spark, root):
    """Code-review regression (r6): a merge whose change keys prune ZERO
    files (pure-insert change set) still made its insert decision from
    the snapshot — on collision it must raise CommitConflict, never
    silently rebase past a concurrent commit that may hold those keys."""
    t = _mk(spark, root, n=20, files=1)
    with pytest.raises(CommitConflict):
        t._try_commit(
            {
                "operation": "merge",
                "add": [],
                "remove": [],  # zero files pruned
                "schema": t._commits()[-1]["schema"],
                "key_col": "k",
            },
            read_version=t.version() - 1,  # stale snapshot
        )


def test_overwrite_conflicts_on_concurrent_commit(spark, root):
    """Code-review regression (r6): overwrite captures its read version
    BEFORE writing data files, so a commit landing mid-write surfaces
    as CommitConflict instead of surviving the 'overwrite'."""
    t = _mk(spark, root, n=10, files=1)
    df_new = spark.range(5).select(
        F.col("id").alias("k"), F.lit(9.0).alias("v"), F.lit("o").alias("tag")
    )
    # simulate: another writer commits between overwrite's read and publish
    import artemia_airflow_spark.sources.txtable as mod

    saved = mod._write_data_files
    raced = []

    def racing_write(df, root_, key_col):
        adds = saved(df, root_, key_col)
        if not raced:  # fire the race exactly once (nested append reuses it)
            raced.append(True)
            TxTable(spark, root_).append(
                spark.range(500, 505).select(
                    F.col("id").alias("k"),
                    F.lit(0.0).alias("v"),
                    F.lit("x").alias("tag"),
                )
            )
        return adds

    mod._write_data_files = racing_write
    try:
        with pytest.raises(CommitConflict):
            t.overwrite(df_new)
    finally:
        mod._write_data_files = saved


def test_vacuum_retention_spares_fresh_files(spark, root):
    """Code-review regression (r6): vacuum's retention window spares
    recently-written non-live files — the in-flight-writer guard."""
    t = _mk(spark, root, n=20, files=1)
    ch = spark.createDataFrame([(1, -1.0, "a")], "k long, v double, tag string")
    t.merge(ch)  # old file becomes non-live, but was JUST written
    assert t.vacuum() == []  # default 1h retention: nothing swept
    assert t.vacuum(retention_sec=0) != []  # explicit zero sweeps it


def test_timestamp_time_travel(spark, root):
    """snapshot_at(ts): the table as of a wall-clock instant — resolves
    to the newest commit published at or before ts."""
    import time

    t = _mk(spark, root, n=10, files=1)
    ts_after_create = time.time()
    time.sleep(0.05)
    t.append(
        spark.range(100, 105).select(
            F.col("id").alias("k"), F.lit(1.0).alias("v"), F.lit("a").alias("tag")
        )
    )
    assert t.version_at(ts_after_create) == 0
    assert t.snapshot_at(ts_after_create).count() == 10
    assert t.snapshot_at(time.time()).count() == 15
    with pytest.raises(ValueError, match="created later"):
        t.version_at(0.0)


def test_export_for_training_sharded_with_manifest(spark, tmp_path, root):
    """B95: a committed snapshot exports to the trainer layout — every
    row in exactly one shard, manifest counts match, re-read prunes to
    one shard directory, and the export is version-pinned (a later
    commit does not leak in)."""
    import json as _json

    from artemia_airflow_spark.sources.txtable import export_for_training

    t = _mk(spark, root, n=200, files=2)
    v0 = t.version()
    out = str(tmp_path / "export")
    t.append(
        spark.range(10_000, 10_050).select(
            F.col("id").alias("k"), F.lit(0.0).alias("v"), F.lit("x").alias("tag")
        )
    )  # post-v0 commit must NOT appear in a v0 export
    man = export_for_training(t, out, version=v0, shards=8)
    assert man["version"] == v0 and man["total_rows"] == 200
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.select("k").distinct().count() == 200  # each row once
    assert set(man["shard_rows"]) == {str(i) for i in range(8)}
    assert sum(int(x) for x in man["shard_rows"].values()) == 200
    with open(out + "/_manifest.json") as f:
        assert _json.load(f) == man
    # partition pruning on the trainer's read path
    one = back.filter("shard = 3")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == int(man["shard_rows"]["3"])
    # strict: the filter must reach PartitionFilters (directory pruning),
    # not merely appear as a post-scan Filter on a data column
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters", 1)[1][:120]


def test_export_null_keys_and_collision_guard(spark, tmp_path, root):
    """Code-review regression (r6): NULL keys shard deterministically
    (counted in the manifest, never crash/vanish into the Hive default
    partition); a pre-existing 'shard' column refuses loudly; shards
    not dividing 16 stay balanced via the 2-hex-char fold."""
    from artemia_airflow_spark.sources.txtable import export_for_training

    df = spark.createDataFrame(
        [(1, 1.0, "a"), (None, 2.0, "b"), (3, 3.0, "c")],
        "k long, v double, tag string",
    )
    t = TxTable.create(spark, df, root, key_col="k")
    out = str(tmp_path / "exp_null")
    man = export_for_training(t, out, shards=10)
    assert man["total_rows"] == 3  # NULL key counted, not lost
    assert spark.read.parquet(out).count() == 3

    t2root = str(tmp_path / "t2")
    t2 = TxTable.create(
        spark,
        spark.createDataFrame([(1, 0)], "k long, shard int"),
        t2root,
        key_col="k",
    )
    with pytest.raises(ValueError, match="'shard' column"):
        export_for_training(t2, str(tmp_path / "exp2"))


def test_auto_checkpoint_interval(spark, root):
    """Opt-in auto-checkpointing: every Nth commit writes a log
    checkpoint, so long-lived tables (streaming sinks) stay O(interval)
    to resolve; results identical with and without."""
    t0 = _mk(spark, root, n=10, files=1)
    t = TxTable(spark, root, checkpoint_interval=2)
    for lo in (100, 200, 300, 400):
        t.append(
            spark.range(lo, lo + 5).select(
                F.col("id").alias("k"), F.lit(0.0).alias("v"), F.lit("a").alias("tag")
            )
        )
    cps = [
        n for n in os.listdir(os.path.join(root, "_log"))
        if n.startswith("checkpoint-")
    ]
    assert len(cps) == 2  # versions 2 and 4
    assert t.snapshot().count() == 30
    assert t.snapshot(1).count() == 15  # pre-checkpoint time travel intact


def test_rebased_append_remerges_concurrent_widening(spark, root):
    """ADVICE r6: an append that loses the commit race must re-merge its
    schema against the NEW head before republishing — a plain append
    rebasing past a concurrent widening append must not commit the
    pre-widening schema (silent narrowing), and its OWN widenings must
    survive the rebase (concurrent widenings compose)."""
    t = _mk(spark, root, n=10, files=1)  # version 0, schema (k, v, tag)
    base_schema = t.snapshot().schema

    # writer W lands a widening append at version 1 while our append is
    # in flight (built against version 0)
    widened = spark.createDataFrame([(1000, 1.0, "w", 7)], "k long, v double, tag string, extra_w int")
    assert t.append(widened, merge_schema=True) == 1

    # our append, built against the OLD head (version 0): simulate the
    # in-flight commit exactly as append() constructs it, carrying its
    # own widening column extra_m
    from pyspark.sql.types import IntegerType, StructField, StructType

    mine = StructType(base_schema.fields + [StructField("extra_m", IntegerType())])
    commit = {
        "operation": "append",
        "add": [],
        "remove": [],
        "schema": mine.json(),
        "key_col": "k",
    }
    v = t._try_commit(commit, read_version=0)  # collides at 1, rebases
    assert v == 2
    names = [f.name for f in t.snapshot().schema.fields]
    # both concurrent widenings visible; base columns intact
    assert names == ["k", "v", "tag", "extra_w", "extra_m"]


def test_rebased_append_type_conflict_raises(spark, root):
    """A rebase that would silently fuse a same-name column under two
    different types is a REAL conflict, not a mergeable union."""
    t = _mk(spark, root, n=10, files=1)
    widened = spark.createDataFrame([(1000, 1.0, "w", 7)], "k long, v double, tag string, extra int")
    t.append(widened, merge_schema=True)

    from pyspark.sql.types import StringType, StructField, StructType

    base_schema = StructType(
        [f for f in t.snapshot().schema.fields if f.name != "extra"]
    )
    mine = StructType(base_schema.fields + [StructField("extra", StringType())])
    commit = {
        "operation": "append",
        "add": [],
        "remove": [],
        "schema": mine.json(),
        "key_col": "k",
    }
    with pytest.raises(CommitConflict, match="extra"):
        t._try_commit(commit, read_version=0)


def test_check_constraints_enforced_on_every_write(spark, root):
    """Delta-style CHECK constraints, fixed at create time: violating
    writes are rejected BEFORE any commit, on create/append/overwrite/
    merge alike; delete rows in a merge are exempt (they remove data,
    they don't write rows)."""
    from artemia_airflow_spark.sources.txtable import ConstraintViolation, TxTable

    cons = {"v_nonneg": "v >= 0", "tag_known": "tag IN ('a', 'b')"}
    bad = spark.createDataFrame(
        [(1, -5.0, "a"), (2, 1.0, "zzz")], "k long, v double, tag string"
    )
    with pytest.raises(ConstraintViolation) as ei:
        TxTable.create(spark, bad, root, key_col="k", constraints=cons)
    assert ei.value.counts == {"v_nonneg": 1, "tag_known": 1}

    good = spark.createDataFrame(
        [(1, 5.0, "a"), (2, 1.0, "b")], "k long, v double, tag string"
    )
    t = TxTable.create(spark, good, root, key_col="k", constraints=cons)
    assert t.constraints() == cons

    with pytest.raises(ConstraintViolation):
        t.append(spark.createDataFrame([(3, -1.0, "a")], "k long, v double, tag string"))
    assert t.version() == 0  # nothing committed
    with pytest.raises(ConstraintViolation):
        t.overwrite(spark.createDataFrame([(9, 1.0, "nope")], "k long, v double, tag string"))
    assert t.version() == 0

    # merge: the DELETE row may "violate" (its payload is irrelevant);
    # the upsert row is validated
    ch_ok = spark.createDataFrame(
        [(1, -999.0, "zzz", True), (4, 2.0, "b", False)],
        "k long, v double, tag string, is_del boolean",
    )
    t.merge(ch_ok, delete_col="is_del")
    rows = {r.k: (r.v, r.tag) for r in t.snapshot().collect()}
    assert 1 not in rows and rows[4] == (2.0, "b")

    ch_bad = spark.createDataFrame(
        [(5, -1.0, "a", False)], "k long, v double, tag string, is_del boolean"
    )
    with pytest.raises(ConstraintViolation):
        t.merge(ch_bad, delete_col="is_del")


def test_check_constraints_null_passes_sql_semantics(spark, root):
    """SQL-standard CHECK: NULL predicate result is NOT a violation —
    forbidding nulls needs an explicit IS NOT NULL constraint."""
    from artemia_airflow_spark.sources.txtable import ConstraintViolation, TxTable

    t = TxTable.create(
        spark,
        spark.createDataFrame([(1, 1.0)], "k long, v double"),
        root,
        key_col="k",
        constraints={"v_pos": "v > 0", "v_set": "v IS NOT NULL"},
    )
    # NULL v: passes v_pos (NULL -> pass) but fails the explicit v_set
    with pytest.raises(ConstraintViolation) as ei:
        t.append(spark.createDataFrame([(2, None)], "k long, v double"))
    assert ei.value.counts == {"v_set": 1}


def test_snapshot_where_prunes_files_by_key_stats(spark, root):
    """Data-skipping read: a key-range read on a range-clustered table
    scans only the files whose footer stats intersect the range, and
    the result is exactly snapshot().filter(range)."""
    from artemia_airflow_spark.sources.txtable import TxTable

    df = (
        spark.range(1000)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .repartitionByRange(8, "k")
    )
    t = TxTable.create(spark, df, root, key_col="k")
    assert len(t.files()) == 8

    narrow = t.snapshot_where(100, 150)
    assert len(narrow.inputFiles()) < 8, "no files were pruned"
    want = sorted(
        (r.k, r.v) for r in t.snapshot().filter("k BETWEEN 100 AND 150").collect()
    )
    got = sorted((r.k, r.v) for r in narrow.collect())
    assert got == want and len(got) == 51

    # open ranges + out-of-range -> empty (and no files scanned)
    assert t.snapshot_where(key_min=900).count() == 100
    assert t.snapshot_where(key_max=99).count() == 100
    empty = t.snapshot_where(5000, 6000)
    assert empty.count() == 0


def test_snapshot_where_conservative_without_stats(spark, root):
    """Files whose key stats are missing (all-null keys) are scanned
    conservatively; the residual filter still keeps semantics exact."""
    from artemia_airflow_spark.sources.txtable import TxTable

    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    t = TxTable.create(spark, df, root, key_col="k")
    nulls = spark.createDataFrame([(None, 9.0)], "k long, v double")
    t.append(nulls)
    # range excludes nothing statted, null-key file scanned anyway;
    # residual k >= 1 drops the NULL row (SQL comparison semantics)
    got = sorted(r.v for r in t.snapshot_where(key_min=1).collect())
    assert got == [1.0, 2.0]


def test_constraint_name_must_be_identifier_safe(spark, root):
    from artemia_airflow_spark.sources.txtable import TxTable

    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="identifier-safe"):
        TxTable.create(spark, df, root, key_col="k",
                       constraints={"can't be null": "v IS NOT NULL"})


def test_snapshot_where_prunes_on_non_key_column(spark, root):
    """Multi-column data skipping: every flat primitive column is
    statted at write time, so a range read on a NON-key column prunes
    files when the data is clustered on it — and stays exact when it
    isn't."""
    from artemia_airflow_spark.sources.txtable import TxTable

    df = (
        spark.range(1000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("v"),
            F.concat(F.lit("s"), F.lpad(F.col("id") % 10, 2, "0")).alias("tag"),
        )
        .repartitionByRange(8, "v")  # clustered on v, NOT the key
    )
    t = TxTable.create(spark, df, root, key_col="k")
    assert len(t.files()) == 8
    assert "v" in t.files()[0]["col_stats"]
    assert "tag" in t.files()[0]["col_stats"]

    narrow = t.snapshot_where(100.0, 300.0, column="v")
    assert len(narrow.inputFiles()) < 8, "no files pruned on non-key column"
    want = sorted(r.k for r in t.snapshot().filter("v BETWEEN 100.0 AND 300.0").collect())
    assert sorted(r.k for r in narrow.collect()) == want

    # string column: not clustered -> all files scanned, result exact
    tagged = t.snapshot_where("s03", "s03", column="tag")
    assert sorted(r.k for r in tagged.collect()) == sorted(
        r.k for r in t.snapshot().filter("tag = 's03'").collect()
    )


def test_zorder_cluster_enables_pruning_on_both_columns(spark, root):
    """OPTIMIZE ZORDER: after cluster(by=[x, y]), a narrow range read
    on EITHER column prunes files (single-key clustering can only ever
    serve one), rows are unchanged, and time travel still works."""
    from artemia_airflow_spark.sources.txtable import TxTable

    df = spark.range(4096).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).cast("double").alias("x"),
        F.floor(F.col("id") / 64).cast("double").alias("y"),
    )
    t = TxTable.create(spark, df.repartition(4), root, key_col="k")
    v = t.cluster(num_files=16, by=["x", "y"])
    assert v == 1
    assert t.snapshot().count() == 4096
    files = t.files()
    assert len(files) == 16

    nx = len(t.snapshot_where(0.0, 15.0, column="x").inputFiles())
    ny = len(t.snapshot_where(0.0, 15.0, column="y").inputFiles())
    assert nx < 16, "no pruning on x after z-order"
    assert ny < 16, "no pruning on y after z-order"
    # correctness of the pruned read
    got = sorted(r.k for r in t.snapshot_where(0.0, 15.0, column="x").collect())
    want = sorted(r.k for r in t.snapshot().filter("x BETWEEN 0.0 AND 15.0").collect())
    assert got == want
    # physical rewrite: pre-cluster version still readable
    assert t.snapshot(0).count() == 4096

    with pytest.raises(ValueError, match="not in table"):
        TxTable(spark, root).cluster(by=["x", "nope"])
    with pytest.raises(ValueError, match="not in table"):
        TxTable(spark, root).cluster(by=["nope"])  # single-col path too


def test_export_curriculum_ordering_within_shards(spark, tmp_path, root):
    """order_by writes each shard's rows in curriculum order: a trainer
    reading its shard files in sequence consumes score-ascending rows;
    membership and counts are unchanged vs an unordered export."""
    import pyarrow.parquet as pq

    from artemia_airflow_spark.sources.txtable import TxTable, export_for_training

    df = spark.range(500).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 101).cast("double").alias("difficulty"),
    )
    t = TxTable.create(spark, df, root, key_col="k")
    out = str(tmp_path / "export")
    man = export_for_training(t, out, shards=4, order_by=["difficulty"])
    assert man["order_by"] == ["difficulty"]
    assert man["total_rows"] == 500

    seen = 0
    for d in sorted(os.listdir(out)):
        if not d.startswith("shard="):
            continue
        vals = []
        for fn in sorted(os.listdir(os.path.join(out, d))):
            if fn.endswith(".parquet"):
                vals.extend(
                    pq.read_table(os.path.join(out, d, fn), columns=["difficulty"])
                    .column("difficulty").to_pylist()
                )
        assert vals == sorted(vals), f"{d} not in curriculum order"
        seen += len(vals)
    assert seen == 500

    with pytest.raises(ValueError, match="order_by columns"):
        export_for_training(t, str(tmp_path / "x"), order_by=["nope"])


def test_key_stats_correct_with_nested_column_before_key(spark, root):
    """r7 review fix: row-group column chunks are leaf-indexed — a
    multi-leaf nested column BEFORE the key used to shift the Arrow
    field index off the key's leaf, harvesting the wrong column's
    min/max and making snapshot_where silently drop matching files."""
    from artemia_airflow_spark.sources.txtable import TxTable

    df = spark.range(100).select(
        F.struct(
            (F.col("id") * 1000).alias("a"), F.lit(7).alias("b")
        ).alias("meta"),
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
    ).repartitionByRange(4, "k")
    t = TxTable.create(spark, df, root, key_col="k")
    m = t.files()[0]
    # key stats must be the key's own range (0..99 overall), not
    # meta.a's (0..99000) or meta.b's (7..7)
    assert 0 <= m["key_min"] <= m["key_max"] <= 99
    got = sorted(r.k for r in t.snapshot_where(10, 20).collect())
    assert got == list(range(10, 21)), "pruning dropped matching rows"


def test_snapshot_where_ranges_conjunctive_pruning(spark, root):
    """2-D box query on a z-ordered table prunes the INTERSECTION of
    per-column candidates — at least as tight as either 1-D read —
    and the result equals the filtered snapshot exactly."""
    from artemia_airflow_spark.sources.txtable import TxTable

    df = spark.range(4096).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).cast("double").alias("x"),
        F.floor(F.col("id") / 64).cast("double").alias("y"),
    )
    t = TxTable.create(spark, df.repartition(4), root, key_col="k")
    t.cluster(num_files=16, by=["x", "y"])

    box = t.snapshot_where_ranges({"x": (0.0, 15.0), "y": (0.0, 15.0)})
    n_box = len(box.inputFiles())
    n_x = len(t.snapshot_where(0.0, 15.0, column="x").inputFiles())
    n_y = len(t.snapshot_where(0.0, 15.0, column="y").inputFiles())
    assert n_box <= min(n_x, n_y) < 16
    want = sorted(
        r.k for r in t.snapshot()
        .filter("x BETWEEN 0.0 AND 15.0 AND y BETWEEN 0.0 AND 15.0").collect()
    )
    assert sorted(r.k for r in box.collect()) == want
    # open-ended range + empty result paths
    assert t.snapshot_where_ranges({"x": (None, 15.0)}).count() == 1024
    assert t.snapshot_where_ranges({"x": (999.0, None)}).count() == 0


def test_auto_compact_keeps_file_count_bounded(spark, root):
    """Opt-in auto-compaction: once the live file count reaches the
    threshold a data commit triggers a best-effort bin-pack, so a
    long append history cannot accrete unbounded small files; rows
    and time travel unaffected."""
    from artemia_airflow_spark.sources.txtable import TxTable

    base = spark.createDataFrame([(0, 0.0)], "k long, v double").coalesce(1)
    TxTable.create(spark, base, root, key_col="k")
    t = TxTable(spark, root, auto_compact_files=6)
    for i in range(1, 10):
        t.append(
            spark.createDataFrame([(i, float(i))], "k long, v double").coalesce(1)
        )
    assert len(t.files()) < 6, "auto-compaction never fired"
    assert t.snapshot().count() == 10
    assert sorted(r.k for r in t.snapshot().collect()) == list(range(10))

    with pytest.raises(ValueError, match=">= 2"):
        TxTable(spark, root, auto_compact_files=1)


def test_auto_compact_futile_noop_keeps_counter(spark, root):
    """ADVICE r7: when the threshold trips but compact() no-ops (the
    bin-pack candidates are below min_files — e.g. one big file + one
    small at auto_compact_files=2), the incremental live-count cache
    must SURVIVE — popping it reseeded with a full O(versions) log
    replay on every later commit.  There is deliberately NO futility
    backoff beyond that (r8 review: a count-keyed backoff left tables
    whose rewrites changed the size distribution permanently
    uncompacted), so the next qualifying commit compacts."""
    from artemia_airflow_spark.sources.txtable import TxTable

    df = spark.range(4096).select(
        F.col("id").alias("k"), (F.col("id") % 64).cast("double").alias("x")
    )
    TxTable.create(spark, df.coalesce(1), root, key_col="k")  # 1 big file
    t = TxTable(spark, root, auto_compact_files=2)
    v0 = t.version()
    t.append(spark.createDataFrame([(9001, 1.0)], "k long, x double").coalesce(1))
    # threshold tripped (2 files) but only the small qualifies for the
    # bin-pack (big is above total_rows/acf) -> futile no-op; the
    # cache survives with the exact count the attempt computed
    assert t.version() == v0 + 1, "compact should have no-opped"
    assert t.__dict__.get("_approx_live_count") == 2
    # a delete that rewrites the big file 1->1 keeps the count at the
    # threshold; the re-attempt is a cheap metadata no-op and the
    # cache still survives (never reseeds via full replay)
    t.delete("k = 0")
    assert t.__dict__.get("_approx_live_count") == 2
    # a second small arrives -> candidates reach min_files -> compaction
    # fires, packs the two smalls, carries the big file forward
    t.append(spark.createDataFrame([(9002, 1.0)], "k long, x double").coalesce(1))
    assert "_approx_live_count" not in t.__dict__, "compaction never fired"
    assert t.snapshot().count() == 4096 - 1 + 2
    assert len(t.files()) == 2  # big + one packed small file


def test_auto_compact_preserves_clustered_big_files(spark, root):
    """r7 review fix: auto-compaction bin-packs only SMALL files — the
    big cluster() outputs carry forward untouched, so the z-order
    layout (and its pruning) survives background maintenance."""
    from artemia_airflow_spark.sources.txtable import TxTable

    df = spark.range(4096).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).cast("double").alias("x"),
        F.floor(F.col("id") / 64).cast("double").alias("y"),
    )
    TxTable.create(spark, df.repartition(4), root, key_col="k")
    t = TxTable(spark, root, auto_compact_files=6)
    t.cluster(num_files=4, by=["x", "y"])
    clustered = {m["path"] for m in t.files()}

    # tiny appends push the count past the threshold -> auto-compact
    for i in range(5):
        t.append(
            spark.createDataFrame(
                [(10000 + i, 1.0, 1.0)], "k long, x double, y double"
            ).coalesce(1)
        )
    live = {m["path"] for m in t.files()}
    assert clustered <= live, "auto-compaction rewrote clustered big files"
    assert len(live) < 4 + 5, "small files were not packed"
    # pruning still bites on the clustered portion
    assert len(t.snapshot_where(0.0, 15.0, column="x").inputFiles()) < len(live)
    assert t.snapshot().count() == 4096 + 5


def test_many_file_snapshot_resolution_and_pruning_at_5k_files(spark, root):
    """Log-at-scale pin (VERDICT r7 item 5): with 5k+ live files the
    checkpointed log resolves a snapshot in well under a second and a
    point lookup prunes to O(1) files via the driver-side stats loop.
    The synthetic metas are log-only (no parquet behind them) — the
    pruned read must never touch them, which is itself the assertion
    that pruning happens BEFORE file listing/opening.  SCALE.md
    ('TxTable log at scale') documents the driver-listing threshold
    this pin protects and the log-as-DataFrame design past it."""
    import time

    from artemia_airflow_spark.sources.txtable import (
        _VERSION_DIGITS,
        _log_dir,
    )

    t = _mk(spark, root)  # 4 real files, keys 0..99
    v = t.version()
    live, head = t._live(v)
    # fabricate a checkpoint whose live set carries 5k extra synthetic
    # files with disjoint key ranges (keys >= 10_000): the log layer
    # can't tell them from real ones, so resolution + pruning costs
    # are measured at 5k-file scale without 5k Spark writes
    synth = [
        {
            "path": f"synth-{i:05d}.parquet",
            "key_min": 10_000 + 10 * i,
            "key_max": 10_000 + 10 * i + 9,
            "num_rows": 10,
            "col_stats": {"k": [10_000 + 10 * i, 10_000 + 10 * i + 9]},
        }
        for i in range(5000)
    ]
    cp = {
        "version": v,
        "live": live + synth,
        "schema": head["schema"],
        "key_col": "k",
    }
    with open(
        os.path.join(_log_dir(root), f"checkpoint-{v:0{_VERSION_DIGITS}d}.json"), "w"
    ) as f:
        json.dump(cp, f)

    t2 = TxTable(spark, root)
    t0 = time.time()
    live2, _ = t2._live(v)
    resolve_s = time.time() - t0
    assert len(live2) == len(live) + 5000
    assert resolve_s < 1.0, f"5k-file snapshot resolution took {resolve_s:.2f}s"

    t0 = time.time()
    picked = t2.snapshot_where(10, 20)  # keys live only in the 4 real files
    prune_s = time.time() - t0
    assert prune_s < 2.0, f"5k-file prune took {prune_s:.2f}s"
    files_read = picked.inputFiles()
    assert 0 < len(files_read) <= 4
    assert not any("synth-" in p for p in files_read)
    assert sorted(r.k for r in picked.collect()) == list(range(10, 21))


def test_restore_rolls_head_back_as_new_commit(spark, root):
    """Delta-style RESTORE (B89 extension): head state returns to the
    target version as a NEW commit — rows, schema, and pruning stats
    all match the target; history is preserved (the pre-restore head
    still time-travels); a restore decided from a stale snapshot
    conflicts like any read-set op; vacuumed targets raise."""
    t = _mk(spark, root, n=100, files=4)  # v0
    t.delete("tag = 's0'")                # v1: 80 rows
    t.append(spark.createDataFrame(
        [(500, 1.0, "new")], "k long, v double, tag string"
    ))                                    # v2: 81 rows
    assert t.snapshot().count() == 81

    v = t.restore(0)                      # v3: back to the original 100
    assert v == 3
    assert t.snapshot().count() == 100
    assert sorted(r.k for r in t.snapshot().collect()) == list(range(100))
    # history preserved: the pre-restore head still time-travels
    assert t.snapshot(2).count() == 81
    assert t.history()[-1]["operation"] == "restore"
    # pruning stats ride along with the restored metas
    assert all(m["key_min"] is not None for m in t.files())

    # schema restore: a widening append then restore narrows back
    t.append(
        spark.createDataFrame([(600, 1.0, "x", 9.0)],
                              "k long, v double, tag string, extra double"),
        merge_schema=True,
    )                                     # v4: widened
    assert "extra" in t.snapshot().columns
    t.restore(3)                          # v5
    assert "extra" not in t.snapshot().columns
    assert t.snapshot().count() == 100

    # stale-snapshot restore conflicts (read-set semantics)
    stale = TxTable(spark, root)
    stale_v = stale.version()
    t.append(spark.createDataFrame(
        [(700, 1.0, "y")], "k long, v double, tag string"
    ))
    cur_live, head = stale._live(stale_v)
    with pytest.raises(CommitConflict):
        stale._try_commit(
            {
                "operation": "restore",
                "add": [],
                "remove": [cur_live[0]["path"]],
                "schema": head["schema"],
                "key_col": "k",
            },
            read_version=stale_v,
        )

    # vacuumed target: restore must refuse, not resurrect ghosts
    t.vacuum(retention_sec=0)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.restore(1)


def test_shallow_clone_zero_copy_and_copy_on_write(spark, root):
    """B89 extension (Delta SHALLOW CLONE): commit 0 of the clone
    references the source's files by absolute path — no data copied —
    and every write to the clone is copy-on-write into the clone's own
    root, so the two tables diverge without touching each other and
    the clone's vacuum can never delete source data."""
    src = _mk(spark, root, n=100, files=4)
    dest = root + "_clone"
    try:
        c = src.clone(dest)
        # zero-copy: no parquet landed under the clone root
        assert not [f for f in os.listdir(dest) if f.endswith(".parquet")]
        assert c.snapshot().count() == 100
        assert sorted(r.k for r in c.snapshot().collect()) == list(range(100))
        # key stats carried verbatim (pruning-ready; the hash-split
        # fixture has full-range files, so cluster the SOURCE first to
        # see the clone actually prune)
        assert all(m["key_min"] is not None for m in c.files())

        # copy-on-write: delete on the clone rewrites INTO the clone
        # (this also pins the absolute-path fix in delete's matching —
        # basename matching silently no-ops here)
        v = c.delete("tag = 's0'")
        assert v == 1
        assert c.snapshot().count() == 80
        assert src.snapshot().count() == 100, "clone write touched the source"
        # the rewrite landed under the clone root, not the source
        assert [f for f in os.listdir(dest) if f.endswith(".parquet")]

        # divergence the other way: source append is invisible to clone
        src.append(spark.createDataFrame(
            [(900, 1.0, "s-only")], "k long, v double, tag string"
        ))
        assert c.snapshot().filter("k = 900").count() == 0

        # clone vacuum sweeps only clone-root files: the source files
        # de-referenced by the clone's delete still exist for the source
        c.vacuum(retention_sec=0)
        assert src.snapshot().count() == 101

        # a second clone at the same dest refuses
        with pytest.raises(FileExistsError):
            src.clone(dest)
    finally:
        shutil.rmtree(dest, ignore_errors=True)


def test_clone_of_vacuumed_snapshot_refuses(spark, root):
    """r8 review: cloning a partially-vacuumed historical snapshot must
    refuse up front — publishing a commit 0 over deleted files would
    durably create a broken table."""
    t = _mk(spark, root, n=50, files=2)
    t.overwrite(spark.createDataFrame(
        [(1, 1.0, "x")], "k long, v double, tag string"
    ))
    t.vacuum(retention_sec=0)  # v0's files gone
    dest = root + "_cv"
    try:
        with pytest.raises(FileNotFoundError, match="vacuumed"):
            t.clone(dest, version=0)
        assert not os.path.exists(dest)  # nothing half-created
    finally:
        shutil.rmtree(dest, ignore_errors=True)


def test_restore_mtime_guard_recruits_vacuum_retention(spark, root):
    """r8 review: historical target files have ancient mtimes, so a
    retention vacuum would sweep them mid-restore regardless of the
    window.  restore/clone therefore REFRESH target mtimes before
    committing — the targets land inside vacuum's in-flight-file
    guard, making restore exactly as vacuum-safe as any write."""
    import time

    t = _mk(spark, root, n=50, files=2)           # v0
    t.overwrite(spark.createDataFrame(
        [(1, 111.0, "after")], "k long, v double, tag string"
    ))                                            # v1: v0 files non-live
    v0_paths = [m["path"] for m in t.files(0)]
    ancient = time.time() - 7 * 24 * 3600
    for p in v0_paths:
        os.utime(os.path.join(root, p), (ancient, ancient))
    # sanity: a retention vacuum RIGHT NOW would sweep these targets
    assert all(
        os.path.getmtime(os.path.join(root, p)) < time.time() - 3600
        for p in v0_paths
    )

    v = t.restore(0)
    # the guard refreshed every target mtime before the commit — a
    # vacuum racing the window sees in-retention files and skips them
    assert all(
        os.path.getmtime(os.path.join(root, p)) > time.time() - 60
        for p in v0_paths
    )
    assert t.snapshot(v).count() == 50
    # and a post-restore retention vacuum keeps the (now live) targets
    t.vacuum(retention_sec=3600)
    assert t.snapshot().count() == 50


def test_relative_root_delete_still_matches_files(spark, root):
    """r8 review: with a RELATIVE table root, delete's resolved-path
    matching must still find the hit files (the root is normalized to
    an absolute path at the handle boundary, so Python-side and
    JVM-side resolution agree)."""
    rel = os.path.relpath(root, os.getcwd())
    base = spark.range(20).select(
        F.col("id").alias("k"), F.lit(0.0).alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 2)).alias("tag"),
    )
    created = TxTable.create(spark, base.coalesce(1), rel, key_col="k")
    assert os.path.isabs(created.root)
    t = TxTable(spark, rel)
    assert os.path.isabs(t.root)
    v = t.delete("tag = 's0'")
    assert v == 1
    assert t.snapshot().count() == 10, "relative-root delete no-opped"


def test_change_feed_across_restore_emits_readded_rows(spark, root):
    """CDC semantics of RESTORE at file granularity: the restore commit
    re-adds the target snapshot's files, so an incremental consumer
    sees those rows as update_or_insert at the restore version — the
    rows logically re-entered the table — and never crashes on the
    narrowed schema."""
    t = _mk(spark, root, n=20, files=1)               # v0
    t.overwrite(spark.createDataFrame(
        [(999, 1.0, "only")], "k long, v double, tag string"
    ))                                                # v1
    v = t.restore(0)                                  # v2
    feed = t.changes(1)  # commits (1, head] -> just the restore
    rows = feed.collect()
    assert {r._change_type for r in rows} == {"update_or_insert"}
    assert {r._commit_version for r in rows} == {v}
    assert sorted(r.k for r in rows) == list(range(20))


def test_restore_to_identical_state_is_a_noop(spark, root):
    """ADVICE r8: a restore whose target state already equals the head
    (same live set, schema, key) publishes nothing — the version does
    not bump and history stays noise-free, mirroring delete()'s
    no-op short-circuit.  A restore that only changes SCHEMA (same
    files) must still commit."""
    t = _mk(spark, root, n=30, files=2)               # v0
    assert t.restore(0) == 0                          # head == target
    assert t.version() == 0
    assert t.history()[-1]["operation"] == "create"

    t.delete("tag = 's0'")                            # v1
    v = t.restore(0)                                  # real restore
    assert v == 2
    # restoring to v0 again from the v2 head (identical live state,
    # different version number) is also a no-op
    assert t.restore(0) == 2
    assert t.restore(2) == 2
    assert t.version() == 2


def test_clone_commit0_classified_as_insert_in_change_feed(spark, root):
    """ADVICE r8: a clone's commit 0 is the table's initial population
    — changes(-1) on a clone labels it 'insert', identical to an
    equivalently created table."""
    src = _mk(spark, root, n=10, files=1)
    dest = root + "_cfc"
    try:
        c = src.clone(dest)
        rows = c.changes(-1).collect()
        assert {r._change_type for r in rows} == {"insert"}
        assert {r._commit_version for r in rows} == {0}
        assert sorted(r.k for r in rows) == list(range(10))
    finally:
        shutil.rmtree(dest, ignore_errors=True)


def test_source_vacuum_spares_clone_referenced_files(spark, root):
    """VERDICT r8 wrong#1: the source's vacuum consults the clone
    marker registry and skips non-live source files a still-existing
    clone's head references (with a named warning), so a source
    rewrite + source vacuum no longer breaks the clone.  Once the
    clone is deleted, its marker is pruned and the files sweep."""
    src = _mk(spark, root, n=40, files=2)
    dest = root + "_vg"
    try:
        c = src.clone(dest)
        # source rewrite de-references every original file
        src.overwrite(spark.createDataFrame(
            [(1, 1.0, "x")], "k long, v double, tag string"
        ))
        with pytest.warns(UserWarning, match="shallow clone"):
            removed = src.vacuum(retention_sec=0)
        assert removed == [], "vacuum swept clone-referenced files"
        # the clone still reads its full snapshot through the source root
        assert c.snapshot().count() == 40

        # deleted clone -> marker pruned -> files become sweepable
        shutil.rmtree(dest)
        removed = src.vacuum(retention_sec=0)
        assert len(removed) >= 2
        assert src.snapshot().count() == 1  # live head untouched
    finally:
        shutil.rmtree(dest, ignore_errors=True)


def test_rename_column_is_metadata_only(spark, root):
    """B89 column mapping (VERDICT r8 missing#2): rename is ONE commit,
    zero data rewrite — the physical files are untouched; reads
    project through the mapping; old versions still see the old name;
    later writes keep working; pruning still bites on the renamed
    column."""
    t = _mk(spark, root, n=60, files=3)               # v0
    files_before = sorted(m["path"] for m in t.files())
    v = t.rename_column("v", "score")                 # v1
    assert v == 1
    # metadata only: exactly the same data files
    assert sorted(m["path"] for m in t.files()) == files_before
    snap = t.snapshot()
    assert "score" in snap.columns and "v" not in snap.columns
    assert snap.filter("score = 100.0").count() == 1  # k=10 -> v=100
    # time travel: the pre-rename version still shows the old name
    assert "v" in t.snapshot(0).columns
    # later writes work against the NEW logical name
    t.append(spark.createDataFrame(
        [(1000, 5.5, "s9")], "k long, score double, tag string"
    ))                                                # v2
    assert t.snapshot().filter("k = 1000").collect()[0].score == 5.5
    # and an append still carrying the OLD name refuses (unknown col)
    with pytest.raises(ValueError, match="merge_schema"):
        t.append(spark.createDataFrame(
            [(1001, 1.0, "x")], "k long, v double, tag string"
        ))
    # merge + delete still work (physical translation on both sides)
    t.merge(spark.createDataFrame(
        [(0, 123.0, "upd")], "k long, score double, tag string"
    ))                                                # v3
    assert t.snapshot().filter("k = 0").collect()[0].score == 123.0
    t.delete("score = 123.0")                         # v4
    assert t.snapshot().filter("k = 0").count() == 0
    # stats pruning translates logical -> physical under the hood
    pruned = t.snapshot_where(100.0, 200.0, column="score")
    assert pruned.count() == 11  # v in [100, 200] -> k in 10..20
    # rename guards: key column and duplicate names refuse
    with pytest.raises(ValueError, match="key column"):
        t.rename_column("k", "pk")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("tag", "score")


def test_drop_column_and_no_resurrection_on_readd(spark, root):
    """Metadata-only DROP; a later merge_schema re-add of the SAME
    logical name maps to a fresh physical name, so the dropped
    column's old bytes never leak back (old files read as null)."""
    t = _mk(spark, root, n=20, files=1)               # v0
    v = t.drop_column("v")                            # v1
    assert v == 1
    assert "v" not in t.snapshot().columns
    assert t.snapshot().count() == 20
    # time travel still shows the dropped column's data
    assert t.snapshot(0).filter("v = 100.0").count() == 1
    # re-add the same logical name: old files must read NULL, not the
    # buried physical data
    t.append(
        spark.createDataFrame([(500, "x", 7.0, -1.0)],
                              "k long, tag string, v double, extra double"),
        merge_schema=True,
    )                                                 # v2
    rows = {r.k: r.v for r in t.snapshot().collect()}
    assert rows[500] == 7.0
    assert all(rows[k] is None for k in range(20)), "dropped data resurrected"
    with pytest.raises(ValueError, match="key column"):
        t.drop_column("k")


def test_restore_and_clone_round_trip_column_mapping(spark, root):
    """restore() across a rename puts the OLD logical name back
    (mapping rides the commit); clone of a renamed table carries the
    mapping so the referenced physical files read correctly."""
    t = _mk(spark, root, n=30, files=2)               # v0
    t.rename_column("v", "score")                     # v1
    t.restore(0)                                      # v2: old name back
    assert "v" in t.snapshot().columns
    assert t.snapshot().filter("v = 100.0").count() == 1
    t.rename_column("tag", "label")                   # v3
    dest = root + "_cmclone"
    try:
        c = t.clone(dest)
        assert "label" in c.snapshot().columns
        assert c.snapshot().filter("label = 's0'").count() == 6
        # change feed on the renamed table uses head names throughout
        feed = t.changes(-1)
        assert "label" in feed.columns and "tag" not in feed.columns
    finally:
        shutil.rmtree(dest, ignore_errors=True)


def test_rename_refuses_constraint_referenced_column(spark, root):
    """A CHECK constraint referencing the column pins its name: rename
    or drop would make every later write fail at enforcement, so the
    schema change refuses up front."""
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"),
        F.lit("a").alias("tag"),
    )
    t = TxTable.create(
        spark, df, root, key_col="k",
        constraints={"v_nonneg": "v >= 0"},
    )
    with pytest.raises(ValueError, match="v_nonneg"):
        t.rename_column("v", "score")
    with pytest.raises(ValueError, match="v_nonneg"):
        t.drop_column("v")
    # unreferenced columns still rename freely
    assert t.rename_column("tag", "label") == 1


def test_concurrent_rename_conflicts_append_rebase(spark, root):
    """An append racing a rename must NOT rebase (its files carry the
    pre-rename physical layout decision): the mapping-change check in
    _try_commit raises CommitConflict instead of silently composing."""
    t = _mk(spark, root, n=10, files=1)               # v0
    stale = TxTable(spark, root)
    # build the append commit against v0, then land a rename first
    df = spark.createDataFrame([(99, 1.0, "x")], "k long, v double, tag string")
    t.rename_column("v", "score")                     # v1
    with pytest.raises(CommitConflict, match="column mapping"):
        stale_v = 0
        from artemia_airflow_spark.sources.txtable import _write_data_files
        adds = _write_data_files(df, stale.root, "k")
        stale._try_commit(
            {
                "operation": "append", "add": adds, "remove": [],
                "schema": df.schema.json(), "key_col": "k",
            },
            read_version=stale_v,
        )


def test_register_txtable_sql_view_time_travel_and_pruning(spark, root):
    """B97 x B89 (VERDICT r8 item 6): raw SQL over a registered
    TxTable snapshot — the view pins an exact version (head writes
    stay invisible), ``ranges`` keeps file-level stats pruning through
    the SQL face, a residual filter still pushes to the parquet scan,
    and fixture names are reserved."""
    from artemia_airflow_spark.catalog import register_txtable

    df = (
        spark.range(1000)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .repartitionByRange(8, "k")
    )
    t = TxTable.create(spark, df, root, key_col="k")          # v0
    t.delete("k >= 500")                                      # v1 = head

    # time travel through SQL: v0 sees all 1000 rows, head sees 500
    register_txtable(spark, "tt_v0", t, version=0)
    register_txtable(spark, "tt_head", t)
    assert spark.sql("SELECT COUNT(*) AS n FROM tt_v0").collect()[0].n == 1000
    assert spark.sql("SELECT COUNT(*) AS n FROM tt_head").collect()[0].n == 500

    # stats pruning through the view: ranges prunes the FILE LIST the
    # view binds; the residual range filter pushes to the parquet scan
    register_txtable(spark, "tt_narrow", t, version=0,
                     ranges={"k": (100, 150)})
    narrow = spark.table("tt_narrow")
    assert len(narrow.inputFiles()) < 8, "no file-level pruning via view"
    rows = spark.sql(
        "SELECT CAST(SUM(k) AS BIGINT) AS s, COUNT(*) AS n FROM tt_narrow"
    ).collect()[0]
    assert (rows.s, rows.n) == (sum(range(100, 151)), 51)
    plan = spark.sql("SELECT * FROM tt_narrow WHERE k >= 120")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(k,120)" in plan

    # fixture names are reserved
    with pytest.raises(ValueError, match="shadows a fixture table"):
        register_txtable(spark, "orders", t)

    for v in ("tt_v0", "tt_head", "tt_narrow"):
        spark.catalog.dropTempView(v)


# ---------------------------------------------------------------------------
# Parquet checkpoints + distributed pruning (B101 scale exit, VERDICT r8
# missing #4): the checkpoint-as-data format and the Spark-job prune path
# ---------------------------------------------------------------------------


def test_parquet_checkpoint_resolution_and_format_interop(spark, root):
    """A parquet checkpoint resolves _live identically to raw JSON
    replay, carries column mapping, interops with JSON checkpoints
    (newest wins regardless of format), and time travel below the
    checkpoint still raw-replays."""
    from artemia_airflow_spark.sources.txtable import _log_dir

    t = _mk(spark, root)                                   # v0
    t.delete("k >= 90")                                    # v1: 90 rows
    t.rename_column("tag", "label")                        # v2: mapping
    live_replay, head_replay = t._live(2)                  # pure JSON replay
    assert t.checkpoint(format="parquet") == 2
    names = os.listdir(_log_dir(root))
    assert "checkpoint-00000000000000000002.parquet" in names

    t2 = TxTable(spark, root)  # fresh handle resolves via the parquet cp
    live_cp, head_cp = t2._live(2)
    assert {m["path"] for m in live_cp} == {m["path"] for m in live_replay}
    assert head_cp["schema"] == head_replay["schema"]
    assert head_cp.get("column_mapping") == head_replay.get("column_mapping")
    snap = t2.snapshot()
    assert snap.count() == 90
    assert "label" in snap.columns and "tag" not in snap.columns
    # time travel to a version BELOW the checkpoint raw-replays
    assert t2.snapshot(0).count() == 100
    # a LATER json checkpoint wins over the older parquet one
    t2.append(spark.createDataFrame(
        [(500, 1.0, "new")], "k long, v double, label string"))  # v3
    assert t2.checkpoint(format="json") == 3
    t3 = TxTable(spark, root)
    assert t3.snapshot().count() == 91
    cp = t3._latest_checkpoint(3)
    assert cp["version"] == 3


def test_auto_checkpoint_format_parquet(spark, root):
    """checkpoint_format='parquet' makes the auto-checkpoint hook (and
    format-less checkpoint()) write parquet; bad formats refuse."""
    from artemia_airflow_spark.sources.txtable import _log_dir

    _mk(spark, root)
    t = TxTable(spark, root, checkpoint_interval=2,
                checkpoint_format="parquet")
    t.append(spark.createDataFrame([(200, 1.0, "a")],
                                   "k long, v double, tag string"))  # v1
    t.append(spark.createDataFrame([(201, 1.0, "a")],
                                   "k long, v double, tag string"))  # v2 -> cp
    assert "checkpoint-00000000000000000002.parquet" in os.listdir(_log_dir(root))
    with pytest.raises(ValueError, match="checkpoint_format"):
        TxTable(spark, root, checkpoint_format="csv")
    with pytest.raises(ValueError, match="format"):
        t.checkpoint(format="orc")


def test_distributed_prune_matches_driver_loop(spark, root):
    """snapshot_where_ranges(distributed=True) is row- and file-
    identical to the driver-side stats loop, across a commit tail
    (append + delete after the checkpoint), on key, non-key string,
    and conjunctive 2-column ranges; without a parquet checkpoint it
    refuses with guidance."""
    t = _mk(spark, root, n=200, files=8)
    with pytest.raises(ValueError, match="parquet checkpoint"):
        t.snapshot_where_ranges({"k": (0, 5)}, distributed=True)
    t.checkpoint(format="parquet")
    # tail commits the distributed path must replay
    t.append(spark.createDataFrame(
        [(300, 5.0, "s9"), (301, 6.0, "s9")],
        "k long, v double, tag string"))
    t.delete("k = 300")
    for ranges in (
        {"k": (10, 30)},
        {"k": (250, 400)},          # only the tail-added file
        {"tag": ("s1", "s1")},      # non-key string stats
        {"k": (0, 120), "v": (500.0, 900.0)},  # conjunctive
        {"k": (10_000, 20_000)},    # empty pick
    ):
        a = t.snapshot_where_ranges(ranges)
        b = t.snapshot_where_ranges(ranges, distributed=True)
        ra = sorted(tuple(r) for r in a.collect())
        rb = sorted(tuple(r) for r in b.collect())
        assert ra == rb, ranges
        assert sorted(a.inputFiles()) == sorted(b.inputFiles()), ranges
    # the tail delete is invisible, the tail append visible
    assert [r.k for r in
            t.snapshot_where_ranges({"k": (250, 400)},
                                    distributed=True).collect()] == [301]


def test_distributed_prune_at_50k_files_never_lists_excluded(spark, root):
    """Scale pin for the checkpoint-as-data exit: with 50k live files
    in a parquet checkpoint, the prune runs as a Spark job (the live
    list never materializes on the driver) and a point lookup reads
    only the O(1) real files — the synthetic metas have no parquet
    behind them, so touching one would throw."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from artemia_airflow_spark.sources.txtable import (
        _CP_HEADER_KEY,
        _VERSION_DIGITS,
        _log_dir,
    )

    t = _mk(spark, root)  # 4 real files, keys 0..99
    v = t.version()
    live, head = t._live(v)
    synth = [
        {
            "path": f"synth-{i:05d}.parquet",
            "key_min": 10_000 + 10 * i,
            "key_max": 10_000 + 10 * i + 9,
            "num_rows": 10,
            "col_stats": {"k": [10_000 + 10 * i, 10_000 + 10 * i + 9]},
        }
        for i in range(50_000)
    ]
    allm = live + synth
    header = {"version": v, "schema": head["schema"], "key_col": "k"}
    tbl = pa.table({
        "path": pa.array([m["path"] for m in allm], pa.string()),
        "meta_json": pa.array([json.dumps(m) for m in allm], pa.string()),
    }).replace_schema_metadata({_CP_HEADER_KEY: json.dumps(header)})
    pq.write_table(tbl, os.path.join(
        _log_dir(root), f"checkpoint-{v:0{_VERSION_DIGITS}d}.parquet"))

    t2 = TxTable(spark, root)
    t0 = time.time()
    picked = t2.snapshot_where_ranges({"k": (10, 20)}, distributed=True)
    rows = sorted(r.k for r in picked.collect())
    prune_s = time.time() - t0
    assert rows == list(range(10, 21))
    files_read = picked.inputFiles()
    assert 0 < len(files_read) <= 4
    assert not any("synth-" in p for p in files_read)
    # generous bound: one small metadata Spark job + a 4-file read
    assert prune_s < 15.0, f"50k-file distributed prune took {prune_s:.2f}s"


def test_distributed_prune_translates_column_mapping(spark, root):
    """Distributed pruning on a RENAMED column: the executor-side
    predicate must look stats up by PHYSICAL name (the JSON metas
    predate the rename), exactly like the driver loop."""
    t = _mk(spark, root, n=200, files=8)
    t.rename_column("v", "value")
    t.checkpoint(format="parquet")
    for ranges in ({"value": (500.0, 900.0)}, {"k": (10, 30)}):
        a = t.snapshot_where_ranges(ranges)
        b = t.snapshot_where_ranges(ranges, distributed=True)
        assert sorted(tuple(r) for r in a.collect()) == sorted(
            tuple(r) for r in b.collect()
        ), ranges
        assert sorted(a.inputFiles()) == sorted(b.inputFiles()), ranges
        assert "value" in b.columns and "v" not in b.columns


def test_register_txtable_distributed_prune_sql_face(spark, root):
    """The SQL face of the checkpoint-as-data path: a view registered
    with distributed=True serves the same rows as the driver-loop
    view, reads only stat-surviving files, and refuses without
    ranges."""
    from artemia_airflow_spark.catalog import register_txtable

    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).cast("double").alias("v"),
    ).repartitionByRange(8, "k")  # disjoint key ranges -> pruning bites
    t = TxTable.create(spark, df, root, key_col="k")
    t.checkpoint(format="parquet")
    with pytest.raises(ValueError, match="requires ranges"):
        register_txtable(spark, "tx_dp_bad", t, distributed=True)
    try:
        register_txtable(spark, "tx_dp", t, ranges={"k": (10, 30)},
                         distributed=True)
        register_txtable(spark, "tx_dl", t, ranges={"k": (10, 30)})
        a = spark.sql("SELECT k, v FROM tx_dp ORDER BY k").collect()
        b = spark.sql("SELECT k, v FROM tx_dl ORDER BY k").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert [r.k for r in a] == list(range(10, 31))
        files = spark.table("tx_dp").inputFiles()
        assert 0 < len(files) < 8
    finally:
        for v in ("tx_dp", "tx_dl"):
            try:
                spark.catalog.dropTempView(v)
            except Exception:  # noqa: BLE001 — view may not exist if
                pass           # the first registration raised

