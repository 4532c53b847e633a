"""Named tests for engine/extras15.py: dynamic-SQL equivalence, EXCEPT
projection pruning, format round-trip totality, native-vs-composed listagg
agreement, quality-rule conjunction, and drawdown monotonicity."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_execute_immediate_equals_static_twin(spark):
    """The bound EXECUTE IMMEDIATE statement returns exactly what the
    static query returns — binding changes nothing semantically."""
    dyn = {
        r["o_orderpriority"]: (r["n"], r["rev"])
        for r in _q("sql_execute_immediate")(spark, SF_DIR).collect()
    }
    from engine.tables import load
    from pyspark.sql import functions as F

    static = {
        r["o_orderpriority"]: (r["n"], r["rev"])
        for r in load(spark, SF_DIR, "orders")
        .filter(F.col("o_totalprice") >= 1000.0)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
        .collect()
    }
    assert dyn == static and dyn


def test_star_except_prunes_scan_and_orders_totally(spark):
    """EXCEPT leaves exactly the 3 surviving columns, the parquet scan
    reads only those (column pruning through the sugar), the top-100 is a
    TakeOrderedAndProject (no global sort), and rows come back in full
    ORDER BY ALL order."""
    df = _q("sql_star_except_order_all")(spark, SF_DIR)
    assert df.columns == ["c_custkey", "c_name", "c_nationkey"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "c_acctbal" not in scan_line and "c_mktsegment" not in scan_line
    rows = df.collect()
    assert len(rows) == 100
    keys = [r["c_custkey"] for r in rows]
    assert keys == sorted(keys)


def test_to_char_roundtrip_total_and_zero_padded(spark):
    rows = _q("fn_to_char_number")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["roundtrip_ok"] is True
        assert len(r["padded"]) == 10 and "." in r["padded"]
        assert r["padded"].replace(".", "").isdigit()  # positive, zero-filled
        assert abs(float(r["padded"]) - r["parsed_back"]) < 1e-9


def test_listagg_native_agrees_with_composed_form(spark):
    """The native Spark 4 listagg WITHIN GROUP must produce exactly what
    the array_sort(collect_list) composition produces on the same distinct
    relation — two implementations, one semantics."""
    from engine.tables import load
    from pyspark.sql import functions as F

    native = {
        r["c_nationkey"]: (r["segments"], r["n_segments"])
        for r in _q("agg_listagg_native")(spark, SF_DIR).collect()
    }
    composed = {
        r["c_nationkey"]: (r["segments"], r["n_segments"])
        for r in load(spark, SF_DIR, "customer")
        .select("c_nationkey", F.col("c_mktsegment").alias("seg"))
        .distinct()
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("seg")), "|").alias("segments"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .collect()
    }
    assert native == composed and native
    for segs, n in native.values():
        parts = segs.split("|")
        assert parts == sorted(parts) and len(parts) == n


def test_gopher_rules_keep_is_conjunction(spark):
    rows = _q("text_gopher_quality_rules")(spark, SF_DIR).collect()
    assert rows
    kept = 0
    for r in rows:
        expect = (
            5 <= r["n_words"] <= 100000
            and 2.0 <= r["mean_word_len"] <= 12.0
            and r["symbol_ratio"] <= 0.30
            and r["has_stopword"]
        )
        assert r["keep"] == expect, r
        kept += bool(r["keep"])
    # the synthetic corpus is clean English-ish text: most docs survive
    assert kept > len(rows) * 0.5


def test_drawdown_zero_on_monotone_series(spark):
    """All order amounts are positive, so the cumulative series is
    monotone and every max_drawdown must be exactly 0.0 — any other value
    means the window composition diverged."""
    rows = _q("win_drawdown_max")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_orders"] >= 3
        assert r["max_drawdown"] == 0.0
