"""Operator registry: maps SURVEY.md §2 keys to (spark, sf_dir) -> DataFrame
builders and their DuckDB oracle SQL.

Every operator module registers via the ``@query`` decorator; ``collect()``
imports all operator modules and returns the populated maps. Keys without an
oracle get the driver's weaker rows-only check (none since the r06
graduations — every registered key now carries a FULL oracle).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Which keys the driver's capped 50-entry CORRECTNESS window checks is
# controlled by _ATTEST_FIRST below (it pins the head of the returned dict
# in key-name terms) — module order here only sets the order of everything
# AFTER that list. History: r01 attested relational+aggs; r02
# llmops/textops/simsearch/multimodal/windows/functions; r03
# udfs/trainext/etl/extras/analytics/tpch_more (50/50 green); r04 fronts
# the 36 never/stale-attested keys + 4 oracle promotions + 10 of the 28
# r04-new keys. The sf0.001 pytest oracle layer covers every key every
# round regardless of the window.
_OPERATOR_MODULES = [
    "engine.pipeops",
    "engine.vecops",
    "engine.extras2",
    "engine.streaming",
    "engine.curation",
    "engine.sketches",
    "engine.extras3",
    "engine.multimodal",
    "engine.functions",
    "engine.udfs",
    "engine.trainext",
    "engine.etl",
    "engine.extras",
    "engine.analytics",
    "engine.tpch_more",
    "engine.relational",
    "engine.aggs",
    "engine.llmops",
    "engine.textops",
    "engine.simsearch",
    "engine.windows",
    # r04 additions register BELOW the 50-key attestation window on purpose
    # (window is full this round); the sf0.001 pytest oracle covers them
    # until the r05 rotation fronts them.
    "engine.datapipe",
    "engine.scaleops",
    "engine.sql4",
    "engine.timeseries",
    "engine.extras4",
    "engine.extras5",
    "engine.pipeline",
    "engine.catalogops",
    "engine.governance",
    # r05 additions (graphops/curation2/extras6 fronted by the r05 window;
    # retrieval/sql5/sinks2 registered late-round AFTER the window — the
    # r06 rotation fronts them, mirroring how the r04 batch was handled)
    "engine.graphops",
    "engine.curation2",
    "engine.extras6",
    "engine.retrieval",
    "engine.sql5",
    "engine.sinks2",
    "engine.extras7",
    "engine.extras8",
    "engine.extras9",
    "engine.extras10",
    "engine.retrieval2",
    "engine.pipeline2",
    "engine.extras11",
    "engine.extras12",
    "engine.udfs2",
    "engine.extras13",
    "engine.extras14",
    "engine.extras15",
    "engine.extras16",
    "engine.pipeline3",
    "engine.extras17",
    "engine.extras18",
    "engine.extras19",
    "engine.extras20",
    "engine.pipeline4",
    "engine.extras21",
    "engine.streaming2",
    "engine.extras22",
    "engine.extras23",
    "engine.extras24",
    "engine.pipeline5",
    "engine.extras25",
    "engine.extras26",
    "engine.extras27",
    "engine.extras28",
    "engine.extras29",
    "engine.extras30",
    "engine.extras31",
    "engine.extras32",
    "engine.extras33",
    "engine.extras34",
    "engine.pipeline6",
    "engine.extras35",
    "engine.extras36",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under SURVEY §2 key ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        plan_cache: dict[tuple, "DataFrame"] = {}

        def wrapped(spark: "SparkSession", sf_dir: str) -> "DataFrame":
            # The driver harness owns its SparkSession; make sure the
            # runtime confs we rely on (ns-parquet, UTC, AQE) are applied.
            from engine.session import tune

            tune(spark)
            # Memoize the built logical plan per (session, sf_dir): plans are
            # lazy and immutable, so a repeat call (bench warm runs, repeated
            # driver checks) skips Py4J plan construction + re-analysis.
            ck = (spark, sf_dir)
            df = plan_cache.get(ck)
            if df is None:
                df = fn(spark, sf_dir)
                plan_cache[ck] = df
            return df

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        # Unmemoized original, for callers that need a genuinely fresh
        # plan build + execution per invocation (bench.py's n-run sweep
        # medians — the memoized wrapper would make run 2+ of a one-shot
        # streaming key just re-count its memory sink).
        wrapped.__wrapped__ = fn
        if name in QUERIES:
            raise ValueError(f"duplicate operator key: {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


# Keys fronted in collect()'s returned dict — the driver's capped 50-entry
# CORRECTNESS window checks keys in dict order, so this list pins exactly
# which keys get attested regardless of module/registration order.
# History: r01 relational+aggs; r02 llmops/textops/simsearch/multimodal/
# windows/functions; r03 udfs/trainext/etl/extras/analytics/tpch_more;
# r04 the 36 never/stale keys + 4 oracle promotions + 10 sql4/datapipe/
# scaleops keys — every r01-r04 window came back green. r05 (this list):
# the 26 r04-registered keys never in any driver window, which completes
# 220/220 cumulative attestation, plus re-attests of the oldest r01
# greens filling the remaining slots.
# r06 window: 48 of the 129 keys that have never appeared in any driver
# CORRECTNESS file (VERDICT r05 item 1 — rotation coverage IS the round's
# deliverable), prioritized exactly as the r05 registry comment planned:
# all six pipeline capstones, the streaming state keys, the DECIMAL-exact
# key, the UDF/UDTF batch, the optimizer trio, the PIVOT/UNPIVOT clauses,
# the five adapted TPC-H shapes, then the largest never-attested families
# (text analysis, dedup/embedding, scans). The final 2 slots attest the
# r06 ROWS->FULL graduations (multimodal_decode_pipeline,
# scan_binary_files) so their first hash-match rows land on driver record.
# r07 window: the first 50 of the 81-key never-attested remainder — aggs
# (20), emb (3), etl (14), fn (8), join (3), and 2 of the 3 sample keys.
# Came back 50/50 green (CORRECTNESS_r07.json), bringing cumulative driver
# attestation to 333/364.
# r08 window: the remaining 31 never-attested keys — with that round,
# EVERY key in the inventory has a driver CORRECTNESS row — plus the
# first 19 staleness-rotation slots (oldest r01 greens, alphabetical).
# Came back 50/50 green (CORRECTNESS_r08.json): cumulative attestation
# 364/364 complete.
# Staleness policy: a green attestation AT LEAST 4 rounds older than the
# window's target round is eligible for a rotation slot once all keys
# have a first attestation (the boundary scripts/next_window.py encodes:
# newest_green <= target - 4); first-time attestation always outranks
# re-attestation.
#
# Window history: r08 completed first-attestation coverage (364/364);
# r09/r10 fronted the r01/r02-stale tiers; r11 fronted the 16 r02-stale
# + 34 oldest r03 greens (50/50 green, CORRECTNESS_r11.json).
#
# r12 window (this list): continued pure staleness rotation — the 16
# remaining r03 greens (the TPC-H q1..q22 core plus udaf/udf/udtf/unpivot
# keys whose newest green is r03) then the 34 oldest r04 greens,
# alphabetical within each staleness tier. Derived by `python
# scripts/next_window.py 12` against the on-disk CORRECTNESS_r01..r11
# evidence at r12 open (r11 came back 50/50 green, so the real
# derivation equals the r11-close rehearsal verbatim — verified by
# re-running the script, not by pasting).
# tests/test_registry_window.py::test_window_equals_policy_output pins
# this list == policy output; a hand-edit that diverges fails the suite.
# r13 expectation: next_window.py 13 → the remaining 14 r04 greens plus
# the 36 oldest r05 greens (re-run the script at the boundary, don't
# paste — a red r12 key re-enters and displaces rotation slots).
#
# r13 rehearsal (r12, simulated all-green r12 evidence): the derivation
# yields the 14 remaining r04 greens (stream_session_30m …
# win_pattern_match, alphabetical) then the 36 oldest r05 greens
# (agg_bitmap_distinct … scan_parquet). Paste-from-rehearsal is still
# wrong if any r12 window key comes back red — re-run the script
# against the REAL CORRECTNESS_r12.json at the boundary.
_WINDOW_ROUND = 12  # CORRECTNESS_r{N}.json this window is aimed at

_ATTEST_FIRST = [
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q1_pricing",
    "tpch_q22_idle_balance",
    "tpch_q3_shipping",
    "tpch_q4_priority_exists",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast",
    "tpch_q7_volume",
    "tpch_q8_market_share",
    "tpch_q9_profit_rollup",
    "udaf_pandas_group",
    "udf_pandas_vectorized",
    "udf_python_scalar",
    "udtf_python",
    "unpivot_long",
    "agg_approx_distinct",
    "agg_approx_median",
    "agg_approx_top_k",
    "agg_cms_estimate",
    "agg_heavy_hitters",
    "agg_hll_sketch_merge",
    "agg_sketch_intersection",
    "data_split_stratified",
    "dedup_near_minhash",
    "doc_length_histogram",
    "emb_centroid_by_label",
    "emb_pca_project",
    "emb_scalar_quantize",
    "etl_dq_profile",
    "etl_funnel_stages",
    "etl_incremental_watermark",
    "etl_snapshot_diff",
    "fn_array_set_ops",
    "fn_collation_group",
    "fn_variant_shred",
    "join_asof_nearest",
    "join_bloom_prune",
    "join_range_binned",
    "plan_observe_metrics",
    "sample_balanced_lang",
    "sample_source_mix",
    "scan_python_datasource",
    "scan_text_lines",
    "sim_ann_ivf",
    "sim_ann_rp_lsh",
    "sql_pipe_syntax",
    "sql_recursive_cte_chain",
    "stream_foreachbatch_upsert",
    "stream_late_data",
]


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    missing = [k for k in _ATTEST_FIRST if k not in QUERIES]
    if missing:
        raise KeyError(f"_ATTEST_FIRST names unregistered keys: {missing}")
    q = {k: QUERIES[k] for k in _ATTEST_FIRST}
    q.update(QUERIES)
    o = {k: ORACLES[k] for k in _ATTEST_FIRST if k in ORACLES}
    o.update(ORACLES)
    return q, o
