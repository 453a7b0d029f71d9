"""MERGE/upsert semantics tests (B62, operators/cdc.py)."""

from __future__ import annotations

from artemia_airflow_spark.operators.cdc import merge_upsert


def test_merge_upsert_semantics(spark):
    """update / delete / insert / untouched rows in one merge."""
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k: long, s: string, v: double",
    )
    changes = spark.createDataFrame(
        [(2, "B", 99.0, False), (3, None, 0.0, True), (4, "d", 40.0, False)],
        "k: long, s: string, v: double, is_del: boolean",
    )
    got = sorted(
        map(tuple, merge_upsert(target, changes, "k", delete_col="is_del").collect())
    )
    assert got == [(1, "a", 10.0), (2, "B", 99.0), (4, "d", 40.0)]


def test_merge_upsert_no_delete_col(spark):
    target = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k: long, v: double")
    changes = spark.createDataFrame([(2, 5.0), (9, 9.0)], "k: long, v: double")
    got = sorted(map(tuple, merge_upsert(target, changes, "k").collect()))
    assert got == [(1, 1.0), (2, 5.0), (9, 9.0)]


def test_merge_delete_of_absent_key_is_noop(spark):
    target = spark.createDataFrame([(1, 1.0)], "k: long, v: double")
    changes = spark.createDataFrame([(7, 0.0, True)], "k: long, v: double, d: boolean")
    got = sorted(map(tuple, merge_upsert(target, changes, "k", delete_col="d").collect()))
    assert got == [(1, 1.0)]
