"""Named test for engine/extras35.py: frontier equals the brute-force
dominance definition."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_skyline_matches_bruteforce_dominance(spark):
    from engine.tables import load

    rows = _q("agg_skyline_pareto_frontier")(spark, SF_DIR).collect()
    assert rows
    pts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load(spark, SF_DIR, "part").collect()
    ]
    def dominated(key, price, size):
        for k2, p2, s2 in pts:
            if k2 == key:
                continue
            if p2 <= price and s2 >= size and (p2 < price or s2 > size):
                return True
        return False

    brute = {
        (k, round(p, 2), s) for k, p, s in pts if not dominated(k, p, s)
    }
    got = {(r["p_partkey"], r["price"], r["size"]) for r in rows}
    # the key's keep-one policy admits only the first of fully-equal
    # (price, size) pairs; the brute-force set keeps all of them — got
    # must be a subset covering every distinct frontier POINT
    assert got <= brute
    assert {(p, s) for _, p, s in got} == {(p, s) for _, p, s in brute}
    # frontier is strictly decreasing-price => increasing... check shape:
    srt = sorted(got, key=lambda t: t[1])
    for (k1, p1, s1), (k2, p2, s2) in zip(srt, srt[1:]):
        assert s2 > s1 or (p2 == p1 and s2 == s1)
