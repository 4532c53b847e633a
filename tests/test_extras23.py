"""Named tests for engine/extras23.py: t-test vs a NumPy recompute, IQR
outlier recount, and the shrinkage ordering property."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_ab_ttest_matches_numpy(spark):
    import numpy as np

    from engine.tables import load

    row = _q("agg_ab_ttest")(spark, SF_DIR).collect()[0]
    ev = load(spark, SF_DIR, "events").select("event_type", "value").collect()
    a = np.array([e["value"] for e in ev if e["event_type"] == "click"])
    b = np.array([e["value"] for e in ev if e["event_type"] == "purchase"])
    assert row["n1"] == len(a) and row["n2"] == len(b)
    se2 = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    df = se2**2 / (
        (a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
        + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1)
    )
    assert abs(row["t_stat"] - round(float(t), 3)) <= 0.001
    assert abs(row["welch_df"] - round(float(df), 1)) <= 0.1
    # Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
    assert min(len(a), len(b)) - 1 <= row["welch_df"] <= len(a) + len(b) - 2


def test_iqr_fences_recount(spark):
    import numpy as np

    from engine.tables import load

    rows = _q("etl_anomaly_iqr_fences")(spark, SF_DIR).collect()
    assert rows
    cust = load(spark, SF_DIR, "customer").select("c_mktsegment", "c_acctbal").collect()
    by_seg: dict[str, list] = {}
    for c in cust:
        by_seg.setdefault(c["c_mktsegment"], []).append(c["c_acctbal"])
    for r in rows:
        vals = np.array(by_seg[r["c_mktsegment"]])
        q1 = np.sort(vals)[int(np.ceil(0.25 * len(vals))) - 1]
        q3 = np.sort(vals)[int(np.ceil(0.75 * len(vals))) - 1]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        assert r["n"] == len(vals)
        assert abs(r["q1"] - round(float(q1), 2)) <= 0.01
        assert r["n_outliers"] == int(((vals < lo) | (vals > hi)).sum())
        assert r["fence_lo"] < r["q1"] <= r["q3"] < r["fence_hi"]


def test_rate_smoothing_shrinks_toward_global(spark):
    rows = _q("agg_rate_smoothing")(spark, SF_DIR).collect()
    assert rows
    total_b = sum(r["buys"] for r in rows)
    total_v = sum(r["views"] for r in rows)
    g = total_b / total_v
    for r in rows:
        if r["views"] == 0:
            assert r["raw_rate"] is None
            continue
        raw, sm = r["raw_rate"], r["smoothed_rate"]
        # smoothed lies between raw and the global rate (inclusive with
        # rounding slack)
        lo, hi = sorted((raw, g))
        assert lo - 0.001 <= sm <= hi + 0.001, (r, g)
    # heavier exposure => smaller shrinkage FRACTION: shift/|raw-g| =
    # prior/(views+prior), monotone in views (absolute shift alone also
    # scales with distance-to-global, so it is not comparable across
    # segments)
    big = max(rows, key=lambda r: r["views"])
    small = min((r for r in rows if r["views"] > 0), key=lambda r: r["views"])
    for r in (big, small):
        if r["raw_rate"] is None or abs(r["raw_rate"] - g) < 0.005:
            return
    frac_big = abs(big["smoothed_rate"] - big["raw_rate"]) / abs(big["raw_rate"] - g)
    frac_small = abs(small["smoothed_rate"] - small["raw_rate"]) / abs(
        small["raw_rate"] - g
    )
    assert frac_big <= frac_small + 0.05
