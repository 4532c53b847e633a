"""Named tests for engine/extras25.py: seasonal index mean-one property,
fanout sink agreement, new/returning conservation, and TWAP vs a Python
recompute."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_seasonality_index_mean_one(spark):
    rows = _q("agg_seasonality_index")(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 7
    mean_idx = sum(r["seasonal_index"] * 1 for r in rows) / len(rows)
    # count-weighted construction: the UNWEIGHTED mean of indices is 1
    # exactly when each dow's count is divided by the mean count
    assert abs(mean_idx - 1.0) < 0.01
    assert all(r["seasonal_index"] > 0 for r in rows)


def test_multi_sink_fanout_sinks_agree(spark):
    rows = {r["sink"]: (r["n"], r["total"]) for r in _q("etl_multi_sink_fanout")(spark, SF_DIR).collect()}
    assert set(rows) == {"csv", "parquet"}
    assert rows["csv"] == rows["parquet"]
    assert rows["csv"][0] > 0


def test_new_vs_returning_conservation(spark):
    from engine.tables import load
    from pyspark.sql import functions as F

    rows = _q("agg_new_vs_returning")(spark, SF_DIR).collect()
    assert rows
    e = load(spark, SF_DIR, "events")
    # every user is new exactly once across all days
    total_new = sum(r["new_users"] for r in rows)
    assert total_new == e.select("user_id").distinct().count()
    # per day, new + returning == distinct active users that day
    dau = {
        r["day"]: r["n"]
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["new_users"] + r["returning_users"] == dau[r["day"]]
    # the first day has zero returning users
    first = min(r["day"] for r in rows)
    r0 = next(r for r in rows if r["day"] == first)
    assert r0["returning_users"] == 0


def test_twap_matches_python(spark):
    from engine.tables import load

    rows = {r["user_id"]: r for r in _q("win_time_weighted_avg")(spark, SF_DIR).collect()}
    assert rows
    ev = load(spark, SF_DIR, "events").select("user_id", "ts", "event_id", "value").collect()
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    checked = 0
    for uid, es in list(by_user.items())[:10]:
        es.sort(key=lambda e: (e["ts"], e["event_id"]))
        num = den = 0.0
        for a, b in zip(es, es[1:]):
            dur = (b["ts"] - a["ts"]).total_seconds() * 1e6
            num += a["value"] * dur
            den += dur
        if den <= 0:
            continue
        r = rows[uid]
        assert r["n_segments"] == len(es) - 1
        assert abs(r["twap"] - round(num / den, 4)) <= 0.0005
        checked += 1
    assert checked >= 5
