"""Named tests for extras batch 9 (engine/extras9.py): Gini bounds and
hand-computed cross-check, DAU≤MAU, Jaccard symmetry/bounds, VALUES-join
completeness, and the moving median vs a driver-side recomputation."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_gini_bounds_and_bruteforce(spark):
    """0 ≤ G < 1 for every nation, and the closed form must match a
    driver-side recomputation from the per-customer revenues."""
    rows = _q("agg_gini_concentration")(spark, SF_DIR).collect()
    assert rows
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"), "o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .collect()
    )
    by_nation: dict[int, list[float]] = {}
    for r in rev:
        by_nation.setdefault(r["nation"], []).append(r["rev"])
    for row in rows:
        xs = sorted(by_nation[row["nation"]])
        n, tot = len(xs), sum(xs)
        g = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (n + 1) / n
        assert abs(row["gini"] - g) < 1e-5, (row, g)
        assert 0 <= row["gini"] < 1


def test_dau_never_exceeds_mau(spark):
    rows = _q("agg_dau_mau")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["dau"] <= r["mau"], r
        assert 0 < r["stickiness"] <= 1


def test_vocab_jaccard_bounds(spark):
    """0 < J ≤ 1; n_common ≤ min(n_a, n_b); every source pair with shared
    vocabulary appears exactly once with a < b."""
    rows = _q("text_source_vocab_jaccard")(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert (r["src_a"], r["src_b"]) not in seen
        seen.add((r["src_a"], r["src_b"]))
        assert r["n_common"] <= min(r["n_a"], r["n_b"])
        assert 0 < r["jaccard"] <= 1


def test_values_join_covers_all_statuses(spark):
    """The three VALUES codes cover every o_orderstatus in the corpus, so
    the grouped counts must sum to the full table count."""
    rows = _q("sql_values_inline_table")(spark, SF_DIR).collect()
    total = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r["n_orders"] for r in rows) == total
    assert {r["label"] for r in rows} <= {"open", "finalized", "pending"}


def test_moving_median_matches_statistics_median(spark):
    """Every med5 equals statistics.median of the ≤5-row trailing frame
    recomputed driver-side in the same (ts, event_id) order."""
    rows = _q("win_moving_median")(spark, SF_DIR).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        hist = by_user.setdefault(r["user_id"], [])
        hist.append(r["value"])
        frame = hist[-5:]
        assert abs(r["med5"] - statistics.median(frame)) < 1e-12, r
