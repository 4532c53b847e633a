"""Named tests for engine/extras22.py: resolution equivalence to the
explicit form, cont/disc contrast properties, and wholetext row-per-file
semantics."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_ordinal_alias_equals_explicit_form(spark):
    from engine.tables import load
    from pyspark.sql import functions as F

    got = [tuple(r) for r in _q("sql_ordinal_alias_resolution")(spark, SF_DIR).collect()]
    explicit = [
        tuple(r)
        for r in load(spark, SF_DIR, "orders")
        .groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .filter(F.col("n") >= 10)
        .orderBy(F.col("n").desc(), "prio")
        .collect()
    ]
    assert got == explicit and got


def test_percentile_cont_disc_contrast(spark):
    """disc returns an actual member; cont lies between the straddling
    members; p90 >= median; group counts positive."""
    from engine.tables import load

    rows = _q("agg_percentile_cont_disc")(spark, SF_DIR).collect()
    assert rows
    cust = load(spark, SF_DIR, "customer").select("c_mktsegment", "c_acctbal").collect()
    by_seg: dict[str, list] = {}
    for c in cust:
        by_seg.setdefault(c["c_mktsegment"], []).append(round(c["c_acctbal"], 2))
    for r in rows:
        vals = sorted(by_seg[r["c_mktsegment"]])
        assert r["n"] == len(vals)
        # disc member-ship (rounded to the same 2dp)
        assert r["median_disc"] in vals
        assert vals[0] <= r["median_cont"] <= vals[-1]
        assert r["p90_cont"] >= r["median_cont"]


def test_wholetext_one_row_per_file(spark):
    from engine.tables import load

    row = _q("scan_text_wholefile")(spark, SF_DIR).collect()[0]
    n = load(spark, SF_DIR, "nation")
    n_regions = n.select("n_regionkey").distinct().count()
    n_nations = n.count()
    assert row["n_files"] == n_regions
    assert row["total_lines"] == n_nations
    # chars = sum of name lengths + one newline per non-terminal line
    from pyspark.sql import functions as F

    name_chars = n.agg(F.sum(F.length("n_name"))).first()[0]
    assert row["total_chars"] == name_chars + (n_nations - n_regions)
