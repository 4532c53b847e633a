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


def test_within_new_losers_distributed_matches_union_find(spark):
    """r06 hardening: a pathological 10k-pair batch must route through the
    distributed Pregel path with keepers identical to the union-find path.
    Graph: 1000 chains of 10 nodes (9 edges each) + 1000 extra random
    intra-chain edges + a 100-node clique (4950 pairs) — 14,950 pairs,
    components with nontrivial diameter, min-id keeper per component."""
    from pyspark.sql import functions as F

    from engine.pipeline6 import _UNION_FIND_MAX_PAIRS, _within_new_losers

    chain = spark.range(1000 * 9).select(
        (F.col("id") % F.lit(9) + (F.col("id") / 9).cast("long") * 10).alias("a_id"),
        (F.col("id") % F.lit(9) + (F.col("id") / 9).cast("long") * 10 + 1).alias(
            "b_id"
        ),
    )
    extra = spark.range(1000).select(
        (F.col("id") * 10).alias("a_id"),
        (F.col("id") * 10 + 1 + F.pmod(F.xxhash64("id"), F.lit(9))).alias("b_id"),
    )
    base = 100_000
    clique = (
        spark.range(100)
        .select((F.col("id") + base).alias("a_id"))
        .join(spark.range(100).select((F.col("id") + base).alias("b_id")))
        .filter(F.col("a_id") < F.col("b_id"))
    )
    nn = chain.union(extra).union(clique).localCheckpoint()
    n_pairs = nn.count()
    assert n_pairs > 10_000  # genuinely a large batch
    got_uf = sorted(
        r["doc_id"] for r in _within_new_losers(spark, nn).collect()
    )
    got_dist = sorted(
        r["doc_id"]
        for r in _within_new_losers(spark, nn, force_distributed=True).collect()
    )
    assert got_uf == got_dist
    # ground truth: chains of 10 lose 9 of 10 per chain; clique loses 99
    assert len(got_dist) == 1000 * 9 + 99
    # with the guard lowered the SAME call takes the distributed path —
    # prove the threshold actually gates (monkeypatch-free: count check)
    assert n_pairs < _UNION_FIND_MAX_PAIRS  # default path was union-find
