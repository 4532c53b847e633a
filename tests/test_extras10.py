"""Named tests for extras batch 10 (engine/extras10.py): growth-series null
contract, chunk coverage/overlap algebra, weighted-moment bounds, and the
DISTRIBUTE BY plan shape (content tested by the oracle; the clause's effect
is physical)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_period_over_period_null_contract(spark):
    """First month has NULL MoM; the first 12 months have NULL YoY; every
    later month has both; months are distinct."""
    rows = sorted(
        _q("win_period_over_period")(spark, SF_DIR).collect(),
        key=lambda r: r["month"],
    )
    assert len(rows) == len({r["month"] for r in rows})
    assert rows[0]["mom_growth"] is None
    for r in rows[:12]:
        assert r["yoy_growth"] is None
    for r in rows[12:]:
        assert r["mom_growth"] is not None
        assert r["yoy_growth"] is not None


def test_chunk_fingerprint_covers_and_overlaps(spark):
    """Per doc: chunk count = ceil-ish by the 192 stride, indexes are
    contiguous from 0, every full chunk is 256 long, the last chunk ends
    exactly at the text end, and md5 matches hashlib on the same slice."""
    rows = _q("multimodal_chunk_fingerprint")(spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, rs in by_doc.items():
        text = docs[doc_id]
        n = len(text)
        rs.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        assert len(rs) == (n - 1) // 192 + 1
        for r in rs:
            start = r["chunk_idx"] * 192
            expected = text[start : start + 256]
            assert r["chunk_len"] == len(expected)
            assert r["chunk_md5"] == hashlib.md5(expected.encode()).hexdigest()
        last = rs[-1]
        assert last["chunk_idx"] * 192 + last["chunk_len"] == n


def test_weighted_moments_bounds(spark):
    """Weighted mean within the discount domain; variance non-negative and
    below the domain's max possible (0.1²/4 for a bounded variable)."""
    rows = _q("agg_weighted_moments")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["wmean_disc"] <= 0.1, r
        assert 0 <= r["wvar_disc"] <= 0.0025 + 1e-9, r


def test_distribute_by_plan_has_hash_exchange_and_local_sort(spark):
    """DISTRIBUTE BY must produce a hashpartitioning Exchange on
    c_nationkey and SORT BY a non-global sort."""
    df = _q("sql_distribute_by")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(c_nationkey" in plan, plan
    # physical Sort prints "Sort [keys], <global>, 0" — SORT BY must be
    # the non-global (per-partition) variant
    assert "Sort [" in plan and ", false, 0" in plan, plan


def test_group_by_all_matches_explicit(spark):
    """GROUP BY ALL must equal the explicitly-keyed aggregate."""
    got = {
        (r["o_orderpriority"], r["o_orderstatus"]): (r["n"], r["rev"])
        for r in _q("sql_group_by_all")(spark, SF_DIR).collect()
    }
    exp = {
        (r["o_orderpriority"], r["o_orderstatus"]): (r["n"], r["rev"])
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
        .collect()
    }
    assert got == exp
