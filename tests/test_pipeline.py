"""Unit tests for the r04 capstone key (engine/pipeline.py)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_datasheet_stage_counts_monotone(spark):
    """Each stage can only shrink the pool: raw >= unique >= quality >=
    clean, and the token budget is positive wherever docs survive."""
    from engine.registry import collect

    queries, _ = collect()
    rows = queries["pipeline_corpus_datasheet"](spark, SF_DIR).collect()
    assert len(rows) == 5  # one per language
    for r in rows:
        assert r["n_raw"] >= r["n_unique"] >= r["n_quality"] >= r["n_clean"] >= 0
        assert (r["tokens_clean"] > 0) == (r["n_clean"] > 0)
    # stages must actually fire somewhere on this corpus (non-vacuous)
    assert any(r["n_raw"] > r["n_unique"] for r in rows)
    assert any(r["n_unique"] > r["n_quality"] for r in rows)


def test_datasheet_excludes_eval_split(spark):
    """n_raw must count only the training candidates (eval split held out)."""
    from pyspark.sql import functions as F

    from engine.pipeline import _EVAL_MOD
    from engine.registry import collect
    from engine.tables import load

    queries, _ = collect()
    rows = queries["pipeline_corpus_datasheet"](spark, SF_DIR).collect()
    d = load(spark, SF_DIR, "documents")
    expected = {
        r["lang"]: r["n"]
        for r in d.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r["lang"]: r["n_raw"] for r in rows} == expected
