"""Composite analytic queries (TPC-H-shaped) + relational coverage add-ons.

These keys prove the engine end-to-end on multi-operator analytic plans, the
shape a reference user actually runs — filter → multi-join → agg → top-k —
rather than one operator at a time (SURVEY §2 tables A–H are the unit pieces;
these compose them). Each stays within the hash-match discipline of §5.3:
JVM-side F.round on every double aggregate, explicit BIGINT casts where
DuckDB widens.

Scale notes are per-query; the common invariants (SCALE.md): filters sit
directly on the scans so parquet row-group pruning applies, dimension sides
are broadcast, and every aggregate is partial+final (map-side combine).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load

_TMP = tempfile.gettempdir()


@query(
    "tpch_q3_shipping",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): segment-filtered customers' orders not
    yet shipped at the cutoff, top-10 by revenue.

    Plan shape at 100 TB: both date filters push to the parquet scans;
    customer (smallest side post-filter) broadcasts into orders, and the
    orders⋈lineitem join shuffles on orderkey only for rows surviving the
    pushed filters. Top-10 is TakeOrderedAndProject — per-partition heap,
    no global sort."""
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q6_forecast",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan→filter→global-agg.

    The canonical pushdown benchmark: all four predicates reach the parquet
    reader (PushedFilters), the projection reads 3 columns, and the aggregate
    is a two-phase partial/final with no grouping key — the minimum-shuffle
    plan (one row per partition exchanged)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q14_promo_share",
    oracle="""
    SELECT round(sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo_rev,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev,
           round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional-aggregate share over a
    fact⋈dim join. part is the dim side → broadcast; the date filter pushes
    to the lineitem scan so only one quarter of the fact table is read."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part")
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(F.sum(promo), 2).alias("promo_rev"),
        F.round(F.sum(rev), 2).alias("total_rev"),
        F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_share_pct"),
    )


@query(
    "topk_argmax_group",
    oracle="""
    SELECT c_mktsegment,
           arg_max(c_custkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) * 1000000000 + c_custkey)
             AS top_custkey,
           round(max(c_acctbal), 2) AS top_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def topk_argmax_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmax via max_by — the single-shuffle alternative to the
    row_number window for top-1-per-group (win_row_number_topk is the top-k
    generalization). Determinism across engines: the ordering key linearizes
    (cents, custkey) into one BIGINT — cents*1e9 + custkey is order-isomorphic
    to the lexicographic pair because custkey < 1e9 — so ties in acctbal are
    broken identically everywhere. At 100 TB this is a partial+final
    aggregate (max_by combines map-side); no window sort at all."""
    key = (F.round(F.col("c_acctbal") * 100).cast("long") * F.lit(1000000000).cast("long")
           + F.col("c_custkey"))
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.max_by("c_custkey", key).alias("top_custkey"),
            F.round(F.max("c_acctbal"), 2).alias("top_acctbal"),
        )
    )


@query(
    "agg_mode_tiebreak",
    oracle="""
    SELECT l_returnflag, l_quantity AS mode_quantity, cnt
    FROM (
      SELECT l_returnflag, l_quantity, count(*) AS cnt,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY count(*) DESC, l_quantity ASC) AS rn
      FROM lineitem
      GROUP BY l_returnflag, l_quantity
    ) WHERE rn = 1
    """,
)
def agg_mode_tiebreak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: Spark's F.mode is tie-nondeterministic,
    so the mode is computed as count-per-value then rank with an explicit
    (count DESC, value ASC) tie-break — identical semantics in any engine.
    The first groupBy collapses the data to |flags|×|distinct qty| rows, so
    the window sees a tiny input regardless of fact-table size."""
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("l_quantity"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_quantity"), "cnt")
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT)            AS k,
           CAST(n_nationkey & 5 AS BIGINT)        AS k_and,
           CAST(n_nationkey | 9 AS BIGINT)        AS k_or,
           CAST(xor(n_nationkey, 12) AS BIGINT)   AS k_xor,
           CAST(n_nationkey << 3 AS BIGINT)       AS k_shl,
           CAST(n_nationkey >> 1 AS BIGINT)       AS k_shr,
           CAST(bit_count(CAST(n_nationkey AS BIGINT)) AS BIGINT) AS k_bits
    FROM nation
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface: AND/OR/XOR, shifts, popcount — used by the
    hash/bucketing idioms elsewhere (LSH band packing, salting). Pure
    narrow projection, whole-stage codegen, zero shuffle."""
    n = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(
        k.cast("long").alias("k"),
        F.expr("n_nationkey & 5").cast("long").alias("k_and"),
        F.expr("n_nationkey | 9").cast("long").alias("k_or"),
        F.expr("n_nationkey ^ 12").cast("long").alias("k_xor"),
        F.shiftleft(k, 3).cast("long").alias("k_shl"),
        F.shiftright(k, 1).cast("long").alias("k_shr"),
        F.bit_count(k.cast("long")).cast("long").alias("k_bits"),
    )


@query(
    "sample_hash_repro",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           (l_orderkey * 1000003 + l_linenumber) % 97 AS bucket
    FROM lineitem
    WHERE (l_orderkey * 1000003 + l_linenumber) % 97 < 10
    """,
)
def sample_hash_repro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample by deterministic key-hash bucketing — the
    training-pipeline sampling primitive (df.sample is seed-dependent AND
    partition-layout-dependent; this is neither). The multiplier-mod
    arithmetic stays in BIGINT range up to orderkey ~9e12, is engine-agnostic,
    and — unlike xxhash64 — reproducible outside Spark, so a sample drawn
    here can be re-drawn byte-identically by any downstream system."""
    li = load(spark, sf_dir, "lineitem")
    bucket = (F.col("l_orderkey") * 1000003 + F.col("l_linenumber")) % 97
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", bucket.alias("bucket"))
        .filter(F.col("bucket") < 10)
    )


@query(
    "scan_merge_schema",
    oracle="""
    SELECT p_partkey, p_name, CAST(NULL AS DOUBLE) AS p_retailprice
    FROM part WHERE p_partkey % 2 = 0
    UNION ALL
    SELECT p_partkey, p_name, p_retailprice
    FROM part WHERE p_partkey % 2 = 1
    """,
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution: two batches written with different schemas
    (the second adds p_retailprice), read back with mergeSchema=true — the
    unioned schema null-extends the old batch. This is the append-only data
    lake pattern: adding a column never rewrites history. At 100 TB, keep
    mergeSchema OFF for steady-state reads (footer sampling costs a listing
    pass) and declare the evolved schema explicitly; it's enabled here to
    prove the reconciliation semantics."""
    part = load(spark, sf_dir, "part")
    base = f"{_TMP}/spark_graft_merge_schema"
    old = part.filter(F.col("p_partkey") % 2 == 0).select("p_partkey", "p_name")
    new = part.filter(F.col("p_partkey") % 2 == 1).select("p_partkey", "p_name", "p_retailprice")
    old.write.mode("overwrite").parquet(f"{base}/batch=0")
    new.write.mode("overwrite").parquet(f"{base}/batch=1")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{base}/batch=0", f"{base}/batch=1")
        .select("p_partkey", "p_name", "p_retailprice")
    )
