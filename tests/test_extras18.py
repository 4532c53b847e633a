"""Named tests for engine/extras18.py: partition pruning on the hive
sink, HTML strip round-trip totality, RFM quintile balance, and drift
null accounting."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_hive_sink_prunes_partitions(spark):
    """The read-back plan prunes by directory (PartitionFilters carries
    event_type), and counts match a direct source recompute."""
    from engine.tables import load
    from pyspark.sql import functions as F

    df = _q("sink_hive_partitioned")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in pf_line
    got = {r["event_type"]: r["n"] for r in df.collect()}
    src = {
        r["event_type"]: r["n"]
        for r in load(spark, SF_DIR, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == src and set(got) == {"click", "purchase"}


def test_html_strip_roundtrip_total(spark):
    rows = _q("text_html_strip")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["strip_roundtrip_ok"] is True
        # the fixed markup contributes 77 tag characters (doc_id digits
        # sit in text, outside the tags)
        assert r["tag_chars"] == 77
        assert len(r["clean_hash"]) == 32


def test_rfm_quintiles_balanced_and_composed(spark):
    rows = _q("agg_rfm_segmentation")(spark, SF_DIR).collect()
    assert rows
    n = len(rows)
    for dim in ("r", "f", "m"):
        counts: dict[int, int] = {}
        for r in rows:
            assert 1 <= r[dim] <= 5
            counts[r[dim]] = counts.get(r[dim], 0) + 1
        # ntile balance: bucket sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1
        assert sum(counts.values()) == n
    for r in rows:
        assert r["segment"] == r["r"] * 100 + r["f"] * 10 + r["m"]


def test_schema_drift_null_accounting(spark):
    from engine.tables import load
    from pyspark.sql import functions as F

    row = _q("scan_csv_schema_drift")(spark, SF_DIR).collect()[0]
    c = load(spark, SF_DIR, "customer")
    total = c.count()
    n_new = c.filter(F.col("c_custkey") % 2 == 0).count()
    assert row["n_rows"] == total
    assert row["n_with_balance"] == n_new
    assert row["n_drifted"] == total - n_new > 0
    expect_sum = (
        c.filter(F.col("c_custkey") % 2 == 0)
        .agg(F.round(F.sum("c_acctbal"), 2))
        .first()[0]
    )
    assert row["balance_sum"] == expect_sum
