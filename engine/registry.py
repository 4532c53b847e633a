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
# r11 window (this list): pure staleness rotation — all 364 keys have a
# first attestation, so every slot goes to the oldest greens: the 16
# remaining r02-stale keys, then the 34 oldest r03 greens, alphabetical
# within each staleness tier. Derived by `python scripts/next_window.py
# 11` against the on-disk CORRECTNESS_r01..r10 evidence. (The r10 round
# missed its rotation — the driver re-checked the r09 window — so this
# list is exactly what the r09 rehearsal predicted for r10, now one
# round later; r10's 50/50 green on the repeat window displaced
# nothing.) tests/test_registry_window.py::test_window_equals_policy_output
# pins this list == policy output; a hand-edit that diverges fails the
# suite. r12 expectation: next_window.py 12 → the remaining r03 greens
# plus the oldest r04 greens (re-run the script at the boundary, don't
# paste — a red r11 key re-enters and displaces rotation slots).
#
# r12 rehearsal (r11 close, simulated all-green r11 evidence): the
# derivation yields the 16 remaining r03 greens (tpch_q18_large_orders
# … unpivot_long, alphabetical) then the 34 oldest r04 greens
# (agg_approx_distinct … stream_late_data). Paste-from-rehearsal is
# still wrong if any r11 window key comes back red — re-run the script
# against the REAL CORRECTNESS_r11.json at the boundary.
_WINDOW_ROUND = 11  # CORRECTNESS_r{N}.json this window is aimed at

_ATTEST_FIRST = [
    # --- 16 remaining r02-stale keys (latest green r02, 9 rounds old) ---
    "text_ngram_freq",
    "text_quality_score",
    "text_sentiment_lexicon",
    "text_tfidf",
    "text_token_counts",
    "text_token_stats",
    "win_distribution",
    "win_lag_lead",
    "win_moving_avg",
    "win_nav_ignore_nulls",
    "win_ntile_first_last",
    "win_range_frame",
    "win_rank_dense",
    "win_row_number_topk",
    "win_running_distinct",
    "win_running_sum",
    # --- 34 oldest r03 greens, alphabetical ---
    "agg_mode_tiebreak",
    "agg_topk_collect",
    "dedup_cluster_components",
    "dedup_fuzzy_edit",
    "dedup_minhash_signature",
    "etl_clean_coerce",
    "etl_merge_cdc",
    "etl_scd2_intervals",
    "etl_sessionize_path",
    "etl_upsert_keyed",
    "etl_validate_quarantine",
    "fn_bitwise",
    "join_bucketed_colocate",
    "join_salted_skew",
    "pivot_wide",
    "sample_hash_repro",
    "scan_csv_malformed",
    "scan_merge_schema",
    "scan_orc_roundtrip",
    "sink_sorted_clustered",
    "stream_rollup_cascade",
    "subq_exists_correlated",
    "subq_not_in_null_semantics",
    "subq_scalar",
    "text_chunk_overlap",
    "text_normalize_stopwords",
    "text_tfidf_cosine_docs",
    "topk_argmax_group",
    "tpch_q10_returned",
    "tpch_q13_cust_dist",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue",
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
