"""Named tests for extras batch 8 (engine/extras8.py) — invariants beyond
the generic oracle compare: point-in-time uniqueness and as-was correctness,
pivot/unpivot row-count algebra, confusion-matrix symmetry bounds, and the
Pareto cut's minimality."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_scd2_pointintime_exactly_one_row_per_purchase(spark):
    """Intervals partition time per user ⇒ the left join must emit exactly
    one row per purchase; every matched state_from ≤ purchase ts; purchases
    before the user's first signup have NULL state."""
    rows = _q("join_scd2_pointintime")(spark, SF_DIR).collect()
    n_purch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert len(rows) == n_purch
    assert len({r["event_id"] for r in rows}) == n_purch
    matched = [r for r in rows if r["state_value"] is not None]
    assert matched, "expected at least one as-was match"
    for r in matched:
        assert r["state_from"] <= r["ts"], r


def test_pivot_unpivot_row_algebra(spark):
    """PIVOT emits one row per remaining grouping value (5 priorities);
    UNPIVOT emits exactly 4× its filtered source rows."""
    piv = _q("sql_pivot_clause")(spark, SF_DIR)
    assert piv.count() == 5
    assert set(piv.columns) == {
        "prio",
        "open_rev",
        "open_cnt",
        "fin_rev",
        "fin_cnt",
        "part_rev",
        "part_cnt",
    }
    unp = _q("sql_unpivot_clause")(spark, SF_DIR)
    src = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(F.col("l_orderkey") % 100 == 0)
        .count()
    )
    assert unp.count() == 4 * src


def test_centroid_confusion_shape_and_positivity(spark):
    """n_labels choose 2 rows, all distances > 0 (distinct label centroids),
    and the pair (a, b) always has a < b."""
    rows = _q("emb_centroid_confusion")(spark, SF_DIR).collect()
    n_labels = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("label")
        .distinct()
        .count()
    )
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert r["dist"] > 0


def test_pareto_cut_minimal_and_sufficient(spark):
    """Per nation: kept rows reach ≥ 80% cumulative share (sufficient) and
    dropping the last-admitted customer falls below 80% (minimal)."""
    rows = _q("win_pareto_cut")(spark, SF_DIR).collect()
    by_nation: dict[int, list] = {}
    for r in rows:
        by_nation.setdefault(r["nation"], []).append(r)
    assert by_nation
    for nation, rs in by_nation.items():
        total = sum(r["share"] for r in rs)
        assert total >= 0.8 - 1e-9 or len(rs) == _nation_cust_count(
            spark, nation
        ), (nation, total)
        last = max(rs, key=lambda r: r["cum_before"])
        assert last["cum_before"] < 0.8


def _nation_cust_count(spark, nation):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .filter(F.col("c_nationkey") == nation)
        .select("o_custkey")
        .distinct()
        .count()
    )


def test_regexp_extract_all_matches_python_re(spark):
    """Match count must equal Python re.findall on the same text."""
    import re

    rows = _q("fn_regexp_extract_all")(spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert rows
    for r in rows:
        found = re.findall(r"b[a-z]+", docs[r["doc_id"]])
        assert r["n_matches"] == len(found), r
        assert r["first5"] == ",".join(found[:5])
