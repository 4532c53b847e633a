"""Unit tests for the r04 catalog keys (engine/catalogops.py)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_cache_table_scans_in_memory(spark):
    """The cached-view query must read an InMemoryTableScan, not parquet."""
    from engine.registry import collect

    queries, _ = collect()
    plan = (
        queries["sql_cache_table"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert ("InMemoryTableScan" in plan or "In-memory table" in plan), plan


def test_ddl_table_idempotent_recreate(spark):
    """Re-running the DDL key must converge on identical state (no
    double-append from the INSERT). Uses __wrapped__ so the second call
    genuinely re-executes the DDL instead of returning the registry
    wrapper's memoized plan."""
    from engine.catalogops import sql_ddl_insert_view

    fn = getattr(sql_ddl_insert_view, "__wrapped__", sql_ddl_insert_view)
    a = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    b = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    assert a == b and len(a) == 2


def test_parameterized_exec_matches_inlined_literals(spark):
    """Named-marker binding must be semantically invisible: identical rows
    to the same query with literals inlined."""
    from engine.registry import collect
    from engine.tables import load

    queries, _ = collect()
    got = sorted(
        tuple(r) for r in queries["sql_parameterized_exec"](spark, SF_DIR).collect()
    )
    load(spark, SF_DIR, "lineitem").createOrReplaceTempView("sg_li_lit_test")
    exp = sorted(
        tuple(r)
        for r in spark.sql(
            """SELECT l_returnflag, count(*) AS n,
                      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
               FROM sg_li_lit_test
               WHERE l_quantity >= 25 AND l_discount BETWEEN 0.02 AND 0.08
               GROUP BY l_returnflag ORDER BY l_returnflag"""
        ).collect()
    )
    assert got == exp and len(got) > 0
