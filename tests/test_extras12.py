"""Named tests for engine/extras12.py: MAD vs numpy, hapax bounds,
covariance symmetry vs numpy, decimal exactness digits, CSV dialect
round-trip fidelity."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_mad_matches_numpy(spark):
    rows = _q("agg_mad_robust")(spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    by_flag: dict[str, list[float]] = {}
    for r in li:
        by_flag.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    assert rows
    for r in rows:
        xs = np.array(by_flag[r["l_returnflag"]])
        med = np.percentile(xs, 50, method="linear")
        mad = np.percentile(np.abs(xs - med), 50, method="linear")
        assert abs(r["median_price"] - round(med, 4)) < 1e-6, r
        assert abs(r["mad_price"] - round(mad, 4)) < 1e-6, r
        assert r["mad_price"] >= 0


def test_hapax_ratio_bounds(spark):
    rows = _q("text_hapax_ratio")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hapax"] <= r["vocab"]
        assert 0 <= r["hapax_ratio"] <= 1


def test_covariance_matches_numpy(spark):
    rows = {(r["m1"], r["m2"]): r for r in _q("agg_covariance_matrix")(spark, SF_DIR).collect()}
    assert len(rows) == 6
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    ).toPandas()
    r = rows[("quantity", "extendedprice")]
    cov = np.cov(li["l_quantity"], li["l_extendedprice"], bias=True)[0, 1]
    cor = np.corrcoef(li["l_quantity"], li["l_extendedprice"])[0, 1]
    assert abs(r["cov"] - round(cov, 4)) < 1e-3
    assert abs(r["corr"] - round(cor, 6)) < 1e-6
    for rr in rows.values():
        assert -1 - 1e-9 <= rr["corr"] <= 1 + 1e-9


def test_decimal_sums_are_exact_digits(spark):
    """Each decimal string re-parses to exactly the integer-cents sum
    computed in Python (no float error at all)."""
    from decimal import Decimal

    rows = _q("agg_decimal_exact")(spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_quantity"
    ).collect()
    cents: dict[str, Decimal] = {}
    for r in li:
        q = Decimal(f"{r['l_quantity']:.2f}")
        cents[r["l_returnflag"]] = cents.get(r["l_returnflag"], Decimal(0)) + q
    assert rows
    for r in rows:
        assert Decimal(r["sum_qty"]) == cents[r["l_returnflag"]], r


def test_csv_dialect_roundtrip_identity(spark):
    got = sorted(
        map(tuple, _q("scan_csv_dialect")(spark, SF_DIR).collect())
    )
    src = sorted(
        map(
            tuple,
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .filter(F.col("event_id") % 50 == 0)
            .select("event_id", "event_type", "value", "props")
            .collect(),
        )
    )
    assert got == src and got
