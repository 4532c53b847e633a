"""Named tests for engine/pipeline6.py (capstone #7, incremental
refresh): conservation, old-side immunity, and gate precedence."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_incremental_refresh_accounting(spark):
    from engine.tables import load
    from pyspark.sql import functions as F

    rows = _q("pipeline_incremental_refresh")(spark, SF_DIR).collect()
    assert rows
    d = load(spark, SF_DIR, "documents")
    new = d.filter(F.col("doc_id") % 5 == 0)
    per_source = {
        r["source"]: r["n"]
        for r in new.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total_dropped = 0
    for r in rows:
        # every arrival classified exactly once
        assert (
            r["drop_exact_vs_old"]
            + r["drop_near_vs_old"]
            + r["drop_within_new"]
            + r["n_accepted"]
            == r["n_arrived"]
        )
        assert r["n_arrived"] == per_source[r["source"]]
        assert r["n_accepted"] >= 0
        total_dropped += (
            r["drop_exact_vs_old"] + r["drop_near_vs_old"] + r["drop_within_new"]
        )
    # the corpus has planted near-dups spanning the old/new split, so the
    # near-vs-old gate must actually fire somewhere
    assert sum(r["drop_near_vs_old"] for r in rows) > 0
    # no exact dups exist in this corpus (500 distinct texts), so the
    # exact gate correctly drops nothing
    assert sum(r["drop_exact_vs_old"] for r in rows) == 0
    # and most arrivals are accepted
    assert sum(r["n_accepted"] for r in rows) > total_dropped
