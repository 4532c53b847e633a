"""Cluster-readiness plan checks: the load-bearing plan shapes must hold
with Adaptive Query Execution ENABLED (the cluster configuration —
engine.session.tune turns AQE off locally for sub-second latency, on for
clusters via SPARK_GRAFT_CLUSTER). A plan that only broadcasts or prunes
with AQE disabled would pass every other test and still regress at scale."""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_DIR


@pytest.fixture()
def aqe(spark):
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", old)


def _plan(spark, key: str) -> str:
    from engine.registry import collect

    queries, _ = collect()
    # bypass the memoized wrapper: its cached DataFrame was analyzed under
    # the non-AQE conf; a fresh build picks up the AQE session conf
    fn = getattr(queries[key], "__wrapped__", queries[key])
    df = fn(spark, SF_DIR)
    df.count()  # executes so AdaptiveSparkPlan reports the FINAL plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_under_aqe(aqe):
    plan = _plan(aqe, "join_star_multiway")
    assert "AdaptiveSparkPlan" in plan, plan
    assert plan.count("BroadcastHashJoin") == 4, plan
    assert "SortMergeJoin" not in plan, plan


def test_filter_pushdown_survives_aqe(aqe):
    plan = _plan(aqe, "filter_compound")
    assert re.search(r"PushedFilters: \[[^\]]", plan), plan


def test_window_topk_group_limit_under_aqe(aqe):
    plan = _plan(aqe, "win_row_number_topk")
    assert "WindowGroupLimit" in plan, plan


def test_bloom_prune_probe_side_under_aqe(aqe):
    plan = _plan(aqe, "join_bloom_prune")
    assert "shiftleft" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
