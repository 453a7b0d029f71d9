"""Physical-plan regression tests: the scale properties SCALE.md claims
must stay true as the engine evolves (pushdown, pruning, broadcast,
top-k, subquery rewrite — checked by plan inspection, not timing)."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE


def _formatted_plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_ORACLE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_is_pushed_to_parquet(spark):
    p = _formatted_plan(spark, "q_filter")
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(l_quantity", p)
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(l_returnflag,R\)", p)


def test_projection_prunes_columns(spark):
    p = _formatted_plan(spark, "q_project")
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"c_custkey", "c_name", "c_nationkey", "c_acctbal"}


def test_dimension_join_broadcasts(spark):
    assert "BroadcastHashJoin" in _formatted_plan(spark, "q_join_broadcast")


def test_topk_uses_take_ordered(spark):
    assert "TakeOrderedAndProject" in _formatted_plan(spark, "q_topk")


def test_in_subquery_rewrites_to_semi_join(spark):
    assert "LeftSemi" in _formatted_plan(spark, "q_subq_in")


def test_flagship_has_partial_aggregation(spark):
    p = _formatted_plan(spark, "q_agg_group")
    # partial + final HashAggregate pair around the exchange
    assert len(re.findall(r"HashAggregate", p)) >= 2
    assert "Exchange" in p


def test_no_cartesian_in_equi_joins(spark):
    for name in ("q_join_inner", "q_join_left", "q_join_range", "q_join_asof"):
        p = _formatted_plan(spark, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
