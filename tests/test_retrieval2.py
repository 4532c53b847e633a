"""Named tests for engine/retrieval2.py: RRF fusion algebra, variance-rank
ordering, novelty telescoping (first doc fully novel, totals conserve),
share-of-parent summing to 1 per region, and k-fold disjoint-complete."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_rrf_fusion_bounds_and_order(spark):
    """RRF ∈ (0, 2/61]; results sorted desc; a doc present in both lists
    must outscore a doc holding the same single-list rank alone."""
    rows = _q("sim_hybrid_rrf_fusion")(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    vals = [r["rrf"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert 0 < r["rrf"] <= round(1 / 61 + 1 / 61, 6) + 1e-9
        assert r["r_lex"] is not None or r["r_vec"] is not None


def test_dim_variance_rank_is_sorted_topk(spark):
    rows = _q("emb_dim_variance_rank")(spark, SF_DIR).collect()
    assert len(rows) == 16
    assert [r["rank"] for r in rows] == list(range(1, 17))
    vs = [r["variance"] for r in rows]
    assert vs == sorted(vs, reverse=True)
    assert all(v >= 0 for v in vs)


def test_ngram_novelty_telescopes(spark):
    """The lowest doc_id is 100% novel; novelty ∈ [0,1]; Σ n_novel equals
    the corpus's distinct trigram count (each gram novel exactly once)."""
    rows = _q("text_ngram_novelty")(spark, SF_DIR).collect()
    assert rows
    first = min(rows, key=lambda r: r["doc_id"])
    assert first["novelty"] == 1.0
    for r in rows:
        assert 0 <= r["novelty"] <= 1
        assert r["n_novel"] <= r["n_grams"]
    total_novel = sum(r["n_novel"] for r in rows)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    distinct_grams = (
        d.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(text,' ')) - 3), "
                    "i -> concat_ws(' ', split(text,' ')[i], "
                    "split(text,' ')[i+1], split(text,' ')[i+2]))"
                )
            ).alias("g")
        )
        .select("g")
        .distinct()
        .count()
    )
    assert total_novel == distinct_grams


def test_share_of_parent_sums_to_one(spark):
    rows = _q("agg_share_of_parent")(spark, SF_DIR).collect()
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(r)
    assert by_region
    for region, rs in by_region.items():
        assert abs(sum(r["share_of_region"] for r in rs) - 1.0) < 1e-4, region
        ranks = sorted(r["rank_in_region"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))


def test_kfold_disjoint_and_complete(spark):
    rows = _q("sample_kfold_assign")(spark, SF_DIR).collect()
    assert {r["fold"] for r in rows} <= set(range(5))
    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == total
    assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-4
