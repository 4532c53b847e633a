"""Named tests for engine/extras24.py: Morton-code round-trip + locality,
and the multi-char CSV audit."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def _deinterleave(z: int) -> tuple[int, int]:
    x = y = 0
    for b in range(8):
        x |= ((z >> (2 * b)) & 1) << b
        y |= ((z >> (2 * b + 1)) & 1) << b
    return x, y


def test_zorder_roundtrip_and_locality(spark):
    rows = _q("fn_zorder_encode")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["z"] < 1 << 16
        assert _deinterleave(r["z"]) == (r["gx"], r["gy"])
    # locality: sort by z and check consecutive points are near in 2-D
    # far more often than a random order would be (Morton guarantees
    # bounded jumps except at quadrant seams)
    srt = sorted(rows, key=lambda r: r["z"])
    near = sum(
        max(abs(a["gx"] - b["gx"]), abs(a["gy"] - b["gy"])) <= 16
        for a, b in zip(srt, srt[1:])
    )
    assert near / (len(srt) - 1) >= 0.8


def test_multichar_delim_roundtrip(spark):
    from engine.tables import load
    from pyspark.sql import functions as F

    row = _q("scan_csv_multichar_delim")(spark, SF_DIR).collect()[0]
    s = load(spark, SF_DIR, "supplier")
    assert row["n"] == s.count()
    assert row["n_nations"] == s.select("s_nationkey").distinct().count()
    assert row["total_bal"] == s.agg(F.round(F.sum("s_acctbal"), 2)).first()[0]
