"""Aggregations: SURVEY.md §2.D.

All aggregates are groupBy().agg() → Catalyst plans partial (map-side) +
final HashAggregate around a single hash-partitioned shuffle; AQE coalesces
post-shuffle partitions. Float discipline per SURVEY §5.3: aggregates are
rounded identically on both engine and oracle sides (summation order is
partition-dependent); pure min/max/count pass through raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load


@query(
    "agg_global",
    oracle="""
    SELECT count(*) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-group aggregate: partial aggregation reduces each partition to one
    row before the single-row exchange — no full-table shuffle at any scale."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@query(
    "agg_group_hash",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (the bench headline aggregate).

    100 TB: 6 distinct groups → partial agg collapses ~everything map-side;
    the shuffle moves O(partitions × groups) rows, not O(data).
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS cnt,
           count(DISTINCT o_custkey) AS cust_cnt,
           count(DISTINCT o_orderpriority) AS prio_cnt
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts (planned via Expand + two-phase
    aggregate — exact, unlike the HLL path below)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.count_distinct("o_custkey").alias("cust_cnt"),
        F.count_distinct("o_orderpriority").alias("prio_cnt"),
    )


@query(
    "agg_approx_distinct",
    # FULL oracle (r04): HLL sketch values are engine-specific, so the raw
    # approx count can never hash-match — instead the Spark side emits the
    # exact count plus a *verified tolerance flag* (|approx−exact| ≤ 5%·exact;
    # Spark's HLL++ is deterministic, so the flag is stable), and the oracle
    # asserts the flag is TRUE with the exact count. An HLL regression now
    # flips the flag and fails the driver hash check.
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           count(*) AS cnt,
           TRUE AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct count per group, self-validated against the
    exact distinct count (≤5% relative error, 2.5× the rsd=0.02 setting;
    tests/test_properties.py pins the same bound). The approx value itself
    stays out of the output (sketch estimates are engine-specific).

    100 TB: approx_count_distinct is the *right* distinct-count at scale —
    fixed-size sketch per group, mergeable map-side, no Expand blow-up. The
    exact count_distinct here exists only to validate; production use drops
    it (and the oracle demotes to ROWS)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.count_distinct("l_partkey").alias("exact_parts"),
            F.count("*").alias("cnt"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "cnt",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("approx_ok"),
        )
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile`, not the KLL-sketch
    percentile_approx, which could never hash-match an oracle).

    100 TB note: exact percentile sorts each group's values; for hot groups
    switch to percentile_approx and a ROWS check."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           count(*) AS cust_cnt,
           round(sum(c_acctbal), 2) AS bal_sum
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtotal hierarchy region → nation → grand total. Group keys are
    coalesced to 'ALL' so subtotal rows are distinguishable and hash-stable
    (neither key is nullable in the data)."""
    df = _cust_geo(spark, sf_dir)
    return (
        df.rollup("r_name", "n_name")
        .agg(F.count("*").alias("cust_cnt"), F.round(F.sum("c_acctbal"), 2).alias("bal_sum"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "cust_cnt",
            "bal_sum",
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT coalesce(c_mktsegment, 'ALL') AS segment,
           coalesce(o_orderstatus, 'ALL') AS status,
           count(*) AS order_cnt,
           round(sum(o_totalprice), 2) AS price_sum
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY CUBE (c_mktsegment, o_orderstatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations (4 sets). 100 TB: CUBE expands input ×2ⁿ
    before the shuffle — keep n small or pre-aggregate on the full key first."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .cube("c_mktsegment", "o_orderstatus")
        .agg(F.count("*").alias("order_cnt"), F.round(F.sum("o_totalprice"), 2).alias("price_sum"))
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "order_cnt",
            "price_sum",
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           count(*) AS cust_cnt,
           round(sum(c_acctbal), 2) AS bal_sum
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL surface (§3.3 textual path)."""
    _cust_geo(spark, sf_dir).createOrReplaceTempView("sg_cust_geo")
    return spark.sql(
        """
        SELECT coalesce(r_name, 'ALL') AS region_name,
               coalesce(n_name, 'ALL') AS nation_name,
               count(*) AS cust_cnt,
               round(sum(c_acctbal), 2) AS bal_sum
        FROM sg_cust_geo
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT c_nationkey,
           count(*) AS cust_cnt,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group collected list, deterministically sorted then stringified
    (collect_list order is partition-dependent; sort_array + array_join makes
    it total-ordered and hash-stable)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count("*").alias("cust_cnt"),
        F.array_join(F.sort_array(F.collect_list("c_mktsegment")), ",").alias("segments"),
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT l_linestatus,
           round(sum(l_quantity) FILTER (WHERE l_returnflag = 'A'), 2) AS qty_returned,
           count(*) FILTER (WHERE l_discount > 0.05) AS hi_disc_cnt,
           round(avg(l_extendedprice) FILTER (WHERE l_tax = 0), 6) AS avg_notax_price
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-style conditional aggregates via sum(when(...)) — evaluated in
    the same partial/final pipeline as plain aggregates."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.sum(F.when(F.col("l_returnflag") == "A", F.col("l_quantity"))), 2).alias(
            "qty_returned"
        ),
        F.count(F.when(F.col("l_discount") > 0.05, True)).alias("hi_disc_cnt"),
        F.round(F.avg(F.when(F.col("l_tax") == 0, F.col("l_extendedprice"))), 6).alias(
            "avg_notax_price"
        ),
    )


def _cust_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )


@query(
    "agg_stats_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_p,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s,
           round(stddev_pop(l_discount), 6) AS sd_disc,
           round(var_samp(l_tax), 6) AS var_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covariance / stddev / variance) — all
    single-pass partial-aggregable moments, same shuffle profile as sum()."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_p"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_s"),
        F.round(F.stddev_pop("l_discount"), 6).alias("sd_disc"),
        F.round(F.var_samp("l_tax"), 6).alias("var_tax"),
    )


@query(
    "agg_bool_bitagg",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(bit_and(o_orderkey) AS BIGINT) AS key_bit_and,
           CAST(bit_or(o_orderkey) AS BIGINT) AS key_bit_or,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS key_bit_xor
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_bool_bitagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and bitwise aggregates: bool_and/bool_or (ANSI EVERY/ANY) and
    bit_and/bit_or/bit_xor — set-membership summaries and bitmap-style
    rollups. All five are associative+commutative, so Spark runs them
    partial+final with map-side combine: constant-size state per group at
    any scale."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bit_and("o_orderkey").cast("long").alias("key_bit_and"),
        F.bit_or("o_orderkey").cast("long").alias("key_bit_or"),
        F.bit_xor("o_orderkey").cast("long").alias("key_bit_xor"),
    )


@query(
    "agg_regr_native",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regr_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native linear-regression aggregates (regr_slope/intercept/r2/count) —
    the JVM-side complement to udaf_pandas_group's Python implementation of
    the same statistic: one partial+final aggregate, constant state (six
    moments) per group, no Arrow transfer. At 100 TB this is the difference
    between a shuffle of six doubles per group and shipping group data into
    Python workers."""
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 4).alias("r2"),
        F.regr_count(y, x).alias("n"),
    )


@query(
    "agg_approx_median",
    # FULL oracle (r04): GK-sketch outputs are engine-internal and can never
    # hash-match DuckDB's exact quantile — so the Spark side emits verified
    # tolerance flags (|approx−exact_interpolated| ≤ 1%·exact; the GK sketch
    # is deterministic, so the flags are stable) and the oracle asserts TRUE
    # alongside the group cardinality. A sketch regression flips a flag and
    # fails the driver hash check.
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           TRUE AS median_ok,
           TRUE AS p90_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate median + p90 per group via percentile_approx (GK sketch,
    accuracy 10000), self-validated against Spark's exact interpolated
    percentile within 1% relative error (same bound unit-tested in
    tests/test_trainops.py). This is the scale path of agg_percentile
    (exact): the sketch is mergeable, so it's partial+final with bounded
    state, while exact percentile must sort each group — the exact side here
    exists only to validate; production use drops it."""
    li = load(spark, sf_dir, "lineitem")

    def ok(approx: F.Column, exact: F.Column) -> F.Column:
        return F.abs(approx - exact) <= 0.01 * F.abs(exact)

    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("am"),
            F.percentile_approx("l_extendedprice", 0.9, 10000).alias("ap"),
            F.percentile("l_extendedprice", 0.5).alias("em"),
            F.percentile("l_extendedprice", 0.9).alias("ep"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "n",
            ok(F.col("am"), F.col("em")).alias("median_ok"),
            ok(F.col("ap"), F.col("ep")).alias("p90_ok"),
        )
    )


@query(
    "agg_string_agg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ', ' ORDER BY n_name) AS nations,
           count(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): Spark has no ordered
    collect, so determinism comes from array_sort before the join — same
    technique as agg_collect_sorted but producing the delimited-string form
    reports expect. Per-group state is the value list; bound group size at
    scale or switch to the array form + slice."""
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ", ").alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )
