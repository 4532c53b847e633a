"""Named test for engine/extras36.py: id format, uniqueness, and the
lexicographic == temporal ordering property."""

from __future__ import annotations

import hashlib

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_ulid_sortable_ids(spark):
    from engine.tables import load

    rows = _q("fn_ulid_sortable_id")(spark, SF_DIR).collect()
    assert rows
    sids = [r["sid"] for r in rows]
    assert len(set(sids)) == len(sids)  # globally unique
    for r in rows[:20]:
        pre, suf = r["sid"].split("-")
        # 16 hex digits of sign-bit-flipped epoch-µs (r14): constant width
        # over the FULL int64 range, so pre-1970 and year-9999 stamps
        # sort correctly too
        assert len(pre) == 16 and len(suf) == 8
        assert int(pre, 16) > 0
        expect_suf = hashlib.md5(f"evt|{r['event_id']}".encode()).hexdigest()[:8]
        assert suf == expect_suf
    # lexicographic order of ids == temporal order of events
    ev = {
        r["event_id"]: r["ts"]
        for r in load(spark, SF_DIR, "events").select("event_id", "ts").collect()
    }
    by_sid = sorted(rows, key=lambda r: r["sid"])
    times = [ev[r["event_id"]] for r in by_sid]
    assert times == sorted(times)
