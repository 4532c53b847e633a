"""Named tests for engine/extras28.py: pointer-read isolation and the
parse cascade's totality."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_atomic_publish_reads_v2_keeps_v1(spark):
    from engine.tables import load
    from pyspark.sql import functions as F

    row = _q("sink_atomic_publish")(spark, SF_DIR).collect()[0]
    assert row["current_version"] == 2
    assert row["previous_version_retained"] is True
    o = load(spark, SF_DIR, "orders")
    v2 = o.filter(F.col("o_orderstatus").isin("O", "F"))
    assert row["n_rows"] == v2.count()
    v1 = o.filter(F.col("o_orderstatus") == "O").count()
    assert row["n_rows"] > v1  # the pointer really moved past v1


def test_multiformat_parse_total_and_exact(spark):
    from engine.tables import load
    from pyspark.sql import functions as F

    rows = {r["fmt"]: r for r in _q("fn_timestamp_multiformat_parse")(spark, SF_DIR).collect()}
    assert set(rows) == {0, 1, 2}
    e = load(spark, SF_DIR, "events")
    per_fmt = {
        r["fmt"]: r["n"]
        for r in e.groupBy((F.col("event_id") % 3).cast("int").alias("fmt"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for fmt, r in rows.items():
        assert r["n"] == per_fmt[fmt]
        assert r["n_parsed"] == r["n"]  # cascade parses every dialect
        assert r["n_exact"] == r["n"]  # and round-trips to the second
