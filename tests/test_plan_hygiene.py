"""Repo-wide plan hygiene: build the physical plan of EVERY registered key
at sf0.001 and assert the global scale invariants — no cartesian product and
no broadcast-nested-loop join outside the keys that are bounded by design,
and no row-at-a-time Python eval outside the declared UDF surface.

This is the net under the per-key plan-shape tests: a new key (or a
regression in an old one) that silently plans a cartesian or drags a Python
eval into a hot path fails here without anyone having written a named test
for it.

Keys that execute side effects at build time (streaming harnesses, sink
round-trips, DDL/catalog keys, iterative algorithms that materialize
intermediates) are exercised by their own tests and skipped here — plan
construction alone would run their jobs, and this test is about static
shape, not execution.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

# Families whose query function executes work at call time (streams, writes,
# DDL, iterative materialization, python-datasource registration) — their
# plans are asserted in their own named tests instead.
_SKIP_PREFIXES = (
    "stream_",
    "sink_",
    "scan_csv",  # write-then-read round-trips
    "scan_orc",
    "scan_xml",
    "scan_json",  # writes a JSONL copy first
    "scan_text",
    "scan_merge",
    "scan_python",
    "scan_recursive_glob",
    "scan_binary",
    "scan_partition_prune",
    "sql_ddl",
    "sql_cache",
    "etl_compact_small_files",
    "etl_partition_overwrite_dynamic",
    "graph_pagerank",  # iterative: builds via materialized loop
    "emb_kmeans",
    "dedup_semdedup",
    "emb_pca_project",
    "sql_recursive_cte",
    "agg_hll_sketch_merge",  # persists sketch tables at build
    "pipeline_",
    "join_bucketed",  # bucketed-table write at build
    "multimodal_decode",
)

# Keys whose contract IS Python execution. This list is EXACT in both
# directions (r11, tightened twice): test_python_eval_only_in_declared_surface
# forbids ANY Python eval marker outside it — not just BatchEvalPython — and
# test_python_surface_waivers_are_exact asserts every entry actually plans a
# Python eval node (a stale waiver would let a future regression hide behind
# it). Pruned r11: multimodal_frame_sample, multimodal_binary_meta,
# multimodal_join, text_lang_id, emb_scalar_quantize, dedup_near_minhash,
# fn_variant_shred — all pure-JVM since their lit_table / built-in-function
# rewrites. Added r11 (full-marker forward check): the three Arrow-batched
# blocked-matmul kernels and the heavy-hitters SpaceSaving merge, whose
# purpose at gated sizes IS the vectorized Python kernel.
_PYTHON_SURFACE = {
    "udf_python_scalar",
    "udf_python_arrow_scalar",
    "udf_pandas_vectorized",
    "udaf_pandas_group",
    "udaf_arrow_group",
    "udtf_python",
    "udtf_arrow_expand",
    "udtf_table_argument",
    "udf_mapinpandas_stream",
    "sim_ann_rp_lsh",
    "sim_ann_ivf",
    "sim_topk_pairs",
    "dedup_embedding_cosine",
    "agg_heavy_hitters",
}

# Every physical-plan marker Spark uses for a Python execution boundary.
# "MapInArrow" also covers "PythonMapInArrow" as a substring; Spark 4's
# mapInArrow node prints as plain `MapInArrow` (verified on sim_topk_pairs).
_PYTHON_EVAL_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInArrow",
    "MapGroupsInPandas",
    "PythonUDTF",
)

# Bounded-by-design cross/BNLJ keys.
_CARTESIAN_OK = {
    "join_cross",  # region × nation, definitionally bounded
}

# BNLJ with a documented bounded broadcast side (the docstrings carry the
# 100 TB replacement: band-join bucketing or index probes).
_BNLJ_OK = {
    "join_cross",  # region × nation
    "join_theta_range",  # supplier (≤1k, catalog-sized) broadcast band join
    "sim_knn_query",  # 1-row probe broadcast
    "sim_hybrid_rrf_fusion",  # same probe pattern on the vector side
    "emb_binary_quantize",  # 1-row global-threshold relation broadcast
}


def _all_keys():
    from engine.registry import collect

    queries, _ = collect()
    return queries


@pytest.fixture(scope="module")
def plans(spark):
    queries = _all_keys()
    out = {}
    for key, fn in queries.items():
        if key.startswith(_SKIP_PREFIXES):
            continue
        df = fn(spark, SF_DIR)
        out[key] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_unbounded_cartesian(plans):
    bad = []
    for key, plan in plans.items():
        if key in _CARTESIAN_OK:
            continue
        if "CartesianProduct" in plan:
            bad.append(key)
    assert not bad, f"cartesian product in: {bad}"


def test_bnlj_only_with_bounded_sides(plans):
    """BroadcastNestedLoopJoin is acceptable ONLY when one side is a
    bounded relation (1-row scalar aggregates, ≤dims-sized inputs). Flag
    keys where a BNLJ appears without any broadcast-bounded marker."""
    bad = []
    for key, plan in plans.items():
        if "BroadcastNestedLoopJoin" not in plan or key in _BNLJ_OK:
            continue
        # Structural bounded markers: a scalar/grouped aggregate in the
        # plan (the 1-row global-stat broadcast pattern: tfidf N, KS
        # totals, watermark scalar, per-day count tables, ...) or a
        # LocalTableScan (VALUES/literal relation). Keys whose broadcast
        # side is bounded WITHOUT either marker go in _BNLJ_OK with a
        # comment.
        if (
            "HashAggregate" in plan
            or "SortAggregate" in plan
            or "ObjectHashAggregate" in plan
            or "LocalTableScan" in plan
        ):
            continue
        bad.append(key)
    assert not bad, f"unbounded BNLJ in: {bad}"


def test_python_eval_only_in_declared_surface(plans):
    bad = []
    for key, plan in plans.items():
        if key in _PYTHON_SURFACE:
            continue
        hits = [m for m in _PYTHON_EVAL_MARKERS if m in plan]
        if hits:
            bad.append((key, hits))
    assert not bad, f"Python eval leaked outside the declared surface: {bad}"


def test_python_surface_waivers_are_exact(plans):
    """Reverse direction of the waiver list: every _PYTHON_SURFACE entry must
    actually plan at least one Python eval node. A waived key that went
    pure-JVM (good!) must be pruned from the list, or a later regression that
    re-introduces Python eval there would be invisible to the leak test."""
    stale = []
    for key in sorted(_PYTHON_SURFACE):
        plan = plans.get(key)
        if plan is None:  # skipped family — exercised by its own named test
            continue
        if not any(m in plan for m in _PYTHON_EVAL_MARKERS):
            stale.append(key)
    assert not stale, f"stale _PYTHON_SURFACE waivers (pure-JVM plans): {stale}"


def test_every_nonskipped_key_has_a_plan(plans):
    assert len(plans) >= 200, len(plans)
