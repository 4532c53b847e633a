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
    double-append from the INSERT)."""
    from engine.catalogops import sql_ddl_insert_view

    a = [tuple(r) for r in sql_ddl_insert_view(spark, SF_DIR).collect()]
    b = [tuple(r) for r in sql_ddl_insert_view(spark, SF_DIR).collect()]
    assert a == b and len(a) == 2
