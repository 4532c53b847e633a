"""Named tests for engine/extras19.py: DPP plan pin, stats exactness, and
ReusedExchange plan pin."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_dpp_plan_and_values(spark):
    """The fact scan's partition filter carries a dynamicpruning
    expression (injected from the dim side at runtime), and the result
    equals a direct recompute."""
    from engine.tables import load
    from pyspark.sql import functions as F

    df = _q("join_dynamic_partition_prune")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    got = {r["o_orderpriority"]: (r["n"], r["rev"]) for r in df.collect()}
    src = {
        r["o_orderpriority"]: (r["n"], r["rev"])
        for r in load(spark, SF_DIR, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
        .collect()
    }
    assert got == src and set(got) == {"1-URGENT", "2-HIGH"}


def test_analyze_stats_exact(spark):
    row = _q("plan_analyze_stats")(spark, SF_DIR).collect()[0]
    assert row["stats_row_count_exact"] is True
    assert row["has_size_bytes"] is True
    assert row["n_rows_stat"] == row["n_rows_actual"] > 0


def test_exchange_reuse_plan_and_peers(spark):
    df = _q("plan_exchange_reuse")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    rows = df.collect()
    assert rows
    by_n: dict[int, int] = {}
    for r in rows:
        by_n[r["n"]] = by_n.get(r["n"], 0) + 1
    for r in rows:
        assert r["peers"] == by_n[r["n"]]
