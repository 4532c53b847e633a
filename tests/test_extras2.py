"""Unit tests for engine/extras2.py: the guarantees the oracle can't see —
Misra-Gries exactness vs the plain aggregate, and foreachBatch's multi-batch
merge equaling the batch answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_heavy_hitters_equals_plain_aggregate(spark):
    """The sketch->recount pipeline must produce EXACTLY the rows a plain
    groupBy + HAVING produces (no false positives, no false negatives)."""
    from engine.extras2 import agg_heavy_hitters
    from engine.tables import load

    got = {
        (r["t"], r["cnt"]) for r in agg_heavy_hitters(spark, SF_DIR).collect()
    }
    tok = load(spark, SF_DIR, "documents").select(
        F.explode(F.split("text", " ")).alias("t")
    )
    n = tok.count()
    want = {
        (r["t"], r["cnt"])
        for r in tok.groupBy("t")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * 50 > F.lit(n))
        .collect()
    }
    assert got == want and len(want) > 0


def test_foreachbatch_upsert_equals_batch(spark):
    """Three replayed micro-batches merged through foreachBatch must equal
    the one-shot batch aggregate."""
    from engine.extras2 import stream_foreachbatch_upsert
    from engine.tables import load

    got = {
        (r["user_id"], r["cnt"])
        for r in stream_foreachbatch_upsert(spark, SF_DIR).collect()
    }
    want = {
        (r["user_id"], r["cnt"])
        for r in load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want and len(want) > 0
