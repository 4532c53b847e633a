"""Named tests for engine/streaming2.py: both timeout waves present, the
data-path suppression (file-2 users survive wave 1), and the end-of-stream
non-emission of still-active sessions."""

from __future__ import annotations

import datetime

from tests.conftest import SF_DIR

_SPLIT = datetime.datetime(2024, 1, 30)


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_event_time_timeout_waves(spark):
    from engine.tables import load

    rows = {
        r["user_id"]: (r["n_events"], r["last_ts"])
        for r in _q("stream_event_time_timeout")(spark, SF_DIR).collect()
    }
    assert rows
    ev = load(spark, SF_DIR, "events").select("user_id", "ts").collect()
    f1: dict[int, list] = {}
    allv: dict[int, list] = {}
    for e in ev:
        allv.setdefault(e["user_id"], []).append(e["ts"])
        if e["ts"] < _SPLIT:
            f1.setdefault(e["user_id"], []).append(e["ts"])
    wm1 = max(t for ts in f1.values() for t in ts) - datetime.timedelta(hours=1)
    wm2 = max(t for ts in allv.values() for t in ts) - datetime.timedelta(hours=1)
    idle = datetime.timedelta(hours=2)
    f2_users = {u for u, ts in allv.items() if any(t >= _SPLIT for t in ts)}
    e1 = {
        u: (len(ts), max(ts))
        for u, ts in f1.items()
        if max(ts) + idle < wm1 and u not in f2_users
    }
    e2 = {
        u: (len(ts), max(ts))
        for u, ts in allv.items()
        if u not in e1 and max(ts) + idle < wm2
    }
    expect = {**e1, **e2}
    assert rows == expect
    # wave 2 exists (the closing no-data batch) and wave-1-suppressed
    # file-2 users appear only with their FULL counts
    assert e2
    for u in e2:
        if u in f2_users:
            assert rows[u][0] == len(allv[u]) > len(f1.get(u, []))
    # still-active sessions (last event within 2h of wm2) are NOT emitted
    active = [u for u, ts in allv.items() if max(ts) + idle >= wm2]
    assert active and all(u not in rows for u in active)
