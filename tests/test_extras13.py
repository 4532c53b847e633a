"""Named tests for engine/extras13.py: grouping-set algebra, epoch
round-trips vs Python, attribution correctness vs brute force, lateral-view
fan-out, and the join-hint plan contract."""

from __future__ import annotations

from datetime import timedelta, timezone

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_grouping_id_partitions(spark):
    """gid partitions the output: gid=0 detail rows, gid=1/2 the two
    subtotal axes, gid=3 the single grand total; counts at each level sum
    to the table count."""
    rows = _q("agg_grouping_id")(spark, SF_DIR).collect()
    total = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    by_gid: dict[int, list] = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    assert len(by_gid[3]) == 1 and by_gid[3][0]["n"] == total
    for gid in (0, 1, 2):
        assert sum(r["n"] for r in by_gid[gid]) == total
    for r in rows:
        assert r["gid"] == r["g_prio"] * 2 + r["g_st"]


def test_unix_epoch_matches_python(spark):
    """epoch_s renders back to the same wall time in UTC (the corpus is
    naive, session tz pinned UTC), and the ms column is exactly ×1000."""
    import datetime

    rows = _q("fn_unix_epoch")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        rendered = datetime.datetime.fromtimestamp(
            r["epoch_s"], tz=timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")
        assert r["rendered"] == rendered
        assert r["epoch_ms"] == r["epoch_s"] * 1000


def test_attribution_last_touch_bruteforce(spark):
    """Recompute attribution driver-side for a sample of purchases."""
    rows = {r["event_id"]: r for r in _q("etl_attribution_last_touch")(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    purchases = [e for e in ev if e["event_type"] == "purchase"]
    touches = [e for e in ev if e["event_type"] in ("click", "view")]
    assert len(rows) == len(purchases)
    for p in purchases[:100]:
        cands = [
            t
            for t in touches
            if t["user_id"] == p["user_id"]
            and t["ts"] <= p["ts"]
            and t["ts"] > p["ts"] - timedelta(hours=24)
        ]
        got = rows[p["event_id"]]
        if not cands:
            assert got["channel"] is None
        else:
            best = max(cands, key=lambda t: (t["ts"], t["event_id"]))
            assert got["channel"] == best["event_type"], (p, best, got)
            assert got["touch_ts"] == best["ts"]


def test_lateral_view_fanout(spark):
    """One output row per token; pos contiguous from 0 per doc."""
    rows = _q("sql_lateral_view")(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for doc_id, rs in by_doc.items():
        toks = docs[doc_id].split(" ")
        rs.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rs] == list(range(len(toks)))
        assert [r["tok"] for r in rs] == toks


def test_join_hints_take_effect(spark):
    """The hinted plan must carry BOTH strategies: a broadcast join for
    nation and a sort-merge join for customer."""
    df = _q("sql_join_hints")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" in plan, plan
