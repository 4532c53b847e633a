"""Named tests for engine/extras11.py: semi-join plan shape for the tuple
IN, rolling-distinct bounds, frame-energy byte math vs Python, and the
interval audit's predictable corruption counts."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_multicol_in_is_semi_join(spark):
    """The tuple IN must compile to a LEFT SEMI join, and every result row
    must be linenumber 1 of an urgent order."""
    df = _q("subq_multicol_in")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan or "left_semi" in plan.lower(), plan
    rows = df.collect()
    assert rows
    urgent = {
        r["o_orderkey"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .collect()
    }
    for r in rows:
        assert r["l_linenumber"] == 1
        assert r["l_orderkey"] in urgent


def test_moving_distinct_bounds(spark):
    """1 ≤ rolling distinct ≤ min(10, 5 event types); the first event of
    each user is exactly 1."""
    rows = _q("win_moving_distinct_count")(spark, SF_DIR).collect()
    assert rows
    firsts = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        firsts.setdefault(r["user_id"], r)
        assert 1 <= r["distinct_types_10"] <= 5
    for r in firsts.values():
        assert r["distinct_types_10"] == 1


def test_signal_energy_matches_python(spark):
    """RMS energy and peak recomputed in Python from the same byte frames."""
    rows = _q("multimodal_signal_energy")(spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert rows
    for r in rows[:200]:
        text = docs[r["doc_id"]]
        frame = text[r["frame_idx"] * 32 : r["frame_idx"] * 32 + 32]
        codes = [ord(c) for c in frame]
        assert r["flen"] == len(codes)
        assert r["peak"] == max(codes)
        assert abs(
            r["energy"] - round(math.sqrt(sum(c * c for c in codes) / len(codes)), 4)
        ) < 1e-9


def test_interval_audit_corruption_is_predictable(spark):
    """Every 3rd closed version is stretched ⇒ n_overlaps equals the count
    of rn%3==0 non-final versions; gaps are impossible (stretch only
    lengthens); overlaps + exact == closed versions."""
    rows = _q("etl_interval_audit")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        closed = r["n_versions"] - 1  # final version is open-ended
        expected_overlaps = sum(1 for rn in range(1, closed + 1) if rn % 3 == 0)
        assert r["n_overlaps"] == expected_overlaps, r
        assert r["n_gaps"] == 0, r
        assert r["n_overlaps"] + r["n_exact"] == closed, r
