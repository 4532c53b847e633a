"""Named tests for engine/extras14.py: rank-shift zero-sum property and
grouped top-k shape."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_rank_shift_zero_sum_per_year_pair(spark):
    """Within any year every rank 1..n appears once; when consecutive
    years contain the same nation set, rank gains sum to zero (movement
    is zero-sum); first year has NULL gains."""
    rows = _q("win_rank_shift_yoy")(spark, SF_DIR).collect()
    by_year: dict[int, list] = {}
    for r in rows:
        by_year.setdefault(r["yr"], []).append(r)
    years = sorted(by_year)
    assert len(years) >= 2
    for yr, rs in by_year.items():
        assert sorted(r["rnk"] for r in rs) == list(range(1, len(rs) + 1))
    first = min(years)
    assert all(r["rank_gain"] is None for r in by_year[first])
    for prev, cur in zip(years, years[1:]):
        if {r["nation"] for r in by_year[prev]} == {
            r["nation"] for r in by_year[cur]
        }:
            gains = [r["rank_gain"] for r in by_year[cur]]
            assert all(g is not None for g in gains)
            assert sum(gains) == 0, (cur, gains)


def test_top_bigrams_shape(spark):
    """Exactly ≤5 per lang, ranks contiguous from 1, counts non-increasing
    in rank order."""
    rows = _q("text_top_bigrams_per_lang")(spark, SF_DIR).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        cnts = [r["cnt"] for r in rs]
        assert cnts == sorted(cnts, reverse=True)
        assert all(" " in r["bigram"] for r in rs)
