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
# The remaining 81 never-attested keys go to the r07 window (50) and the
# r08 window head (31) — all of them stay covered every round by the
# sf0.001 pytest oracle layer and scripts/driver_sim.py at sf0.01.
# Exact remainder, for the mechanical r07/r08 swap (recompute with
# set(queries) − union(CORRECTNESS_r*.json keys) if r06's file diverges):
# aggs (20): ab_ttest benford_digit_audit covariance_matrix dau_mau
#   gini_concentration grouping_id histogram_2d hour_dow_heatmap
#   listagg_native mad_robust markov_transitions new_vs_returning
#   percentile_cont_disc rate_smoothing rfm_segmentation seasonality_index
#   share_of_parent skyline_pareto_frontier top_paths weighted_moments
# emb (3): centroid_confusion cosine_histogram dim_variance_rank
# etl (14): anomaly_iqr_fences attribution_last_touch checksum_reconcile
#   conversion_latency golden_record incremental_agg_merge interval_audit
#   multi_sink_fanout ohlc_resample partition_overwrite_dynamic
#   retention_cohort shard_manifest surrogate_hash_keys targeted_erasure
# fn (8): binary_base64 regexp_extract_all round_half_even
#   timestamp_multiformat_parse to_char_number ulid_sortable_id unix_epoch
#   zorder_encode
# join (3): asof_tolerance scd2_pointintime spatial_grid
# sample (3): bootstrap_poisson kfold_assign negative_pairs
# scan (5): csv_dialect csv_multichar_delim recursive_glob text_wholefile
#   xml_roundtrip
# sink (3): atomic_publish hive_partitioned parquet_bloom_filter
# sql (12): distribute_by execute_immediate group_by_all join_hints
#   lateral_view named_window_clause ordinal_alias_resolution
#   session_variable star_except_order_all tvf_date_spine udf_sql_function
#   values_inline_table
# subq (1): multicol_in
# win (9): concurrency_sweep drawdown_max moving_distinct_count
#   moving_median pareto_cut period_over_period rank_shift_yoy
#   rolling_corr time_weighted_avg
_ATTEST_FIRST = [
    # pipeline capstones (none ever windowed)
    "pipeline_pretrain_mix",
    "pipeline_dedup_cascade",
    "pipeline_ann_index_build",
    "pipeline_rag_index",
    "pipeline_stream_serving",
    "pipeline_incremental_refresh",
    # streaming state machines
    "stream_event_time_timeout",
    "stream_checkpoint_exactly_once",
    # exact-decimal aggregation
    "agg_decimal_exact",
    # UDF/UDTF surface
    "udtf_table_argument",
    "udf_mapinpandas_stream",
    "udf_python_arrow_scalar",
    # optimizer trio
    "join_dynamic_partition_prune",
    "plan_analyze_stats",
    "plan_exchange_reuse",
    # SQL PIVOT/UNPIVOT clauses
    "sql_pivot_clause",
    "sql_unpivot_clause",
    # adapted TPC-H shapes (q1-q22 closure keys registered late-r05)
    "tpch_q2_min_cost_adapted",
    "tpch_q11_important_stock_adapted",
    "tpch_q12_late_shipping_adapted",
    "tpch_q20_excess_supplier_adapted",
    "tpch_q21_waiting_adapted",
    # text-analysis family
    "text_bm25_rank",
    "text_ngram_novelty",
    "text_cooccurrence_pmi",
    "text_gopher_quality_rules",
    "text_html_strip",
    "text_top_bigrams_per_lang",
    "text_chat_template_render",
    "text_hapax_ratio",
    "text_source_vocab_jaccard",
    "text_eval_token_f1",
    # dedup / embedding family
    "dedup_pair_explain",
    "dedup_exact_embedding",
    "emb_random_projection_jl",
    "emb_norm_profile",
    "emb_outlier_distance",
    "emb_isotropy_audit",
    # similarity-search evaluation
    "sim_hybrid_rrf_fusion",
    "sim_eval_ndcg",
    # iterative graph
    "graph_bfs_hops",
    # multimodal
    "multimodal_chunk_fingerprint",
    "multimodal_signal_energy",
    # source-format coverage
    "scan_parquet_nested_pushdown",
    "scan_metadata_columns",
    "scan_json_corrupt_permissive",
    "scan_csv_schema_drift",
    # Python DataSource writer
    "sink_python_datasource",
    # r06 ROWS -> FULL graduations (attested r04 as rows-only; first
    # hash-match attestation happens this round)
    "multimodal_decode_pipeline",
    "scan_binary_files",
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
