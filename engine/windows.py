"""Window functions: SURVEY.md §2.E.

Every window has an explicit deterministic ORDER BY (unique tie-break
column) so ranks/offsets are reproducible across engines and partitionings.
100 TB: window exchanges hash-partition on the partition keys; the only
dangerous shape is a near-global window (single hot partition) — the one
global window here (sort_multi_nulls in §2.F) is over dim-sized data only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load


@query(
    "win_row_number_topk",
    oracle="""
    SELECT c_mktsegment, c_name, c_acctbal, rn FROM (
      SELECT c_mktsegment, c_name, c_acctbal, c_custkey,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      FROM customer
    ) WHERE rn <= 5
    """,
)
def win_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 per segment (bench headline). 100 TB: rank-then-filter pushes a
    WindowGroupLimit in Spark ≥3.5 — per-partition top-k before the shuffle,
    so the exchange carries ≤ k·segments rows."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_mktsegment", "c_name", "c_acctbal", "rn")
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk,
           dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk
    FROM lineitem
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank with real ties (l_quantity has 50 distinct values) —
    peers get identical ranks in both engines, so no tie-break is needed.

    r11 rewrite: the textbook per-row window (partitionBy(l_returnflag))
    serializes the corpus into THREE single-threaded sorts — the same
    low-cardinality-partition bottleneck agg_weighted_percentile had
    (its 100× wall exponent was 0.98). Because the rank of a row depends
    only on its (flag, quantity) pair, ranks are computed on the 3×50
    per-value COUNT table instead: rank = 1 + exclusive cumulative count
    of higher quantities, dense_rank = row_number over the distinct
    values — then broadcast-joined back. Identical output (peers share a
    (flag, qty) cell by definition), and the fact table is never
    shuffled or sorted: one map-side-combined count agg + a broadcast
    map join, scale-safe at any corpus size."""
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wv = Window.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    ranks = counts.select(
        "l_returnflag",
        "l_quantity",
        (
            F.coalesce(
                F.sum("cnt").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
            + 1
        )
        .cast("int")
        .alias("rnk"),
        F.row_number().over(wv).cast("int").alias("drnk"),
    )
    return (
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .join(F.broadcast(ranks), ["l_returnflag", "l_quantity"])
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_quantity",
            "rnk",
            "drnk",
        )
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - prev).alias("delta"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer in a deterministic frame order."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id, value,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg3
    FROM events
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.round(F.avg("value").over(w), 6).alias("mavg3"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL '30 days' PRECEDING AND CURRENT ROW), 2) AS sum_30d
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame: 30-day trailing sum per customer. Spark range
    frames need a numeric sort key → order by epoch seconds with literal
    second offsets; RANGE includes all peers on both engines, so rows sharing
    an o_orderdate agree."""
    o = load(spark, sf_dir, "orders")
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_30d"),
    )


@query(
    "win_ntile_first_last",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           ntile(4) OVER w AS quartile,
           first_value(c_name) OVER w AS top_name,
           last_value(c_name) OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING) AS bottom_name
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def win_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + first/last value; last_value gets an explicit full frame (the
    default frame ends at CURRENT ROW, which would make it the current row)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.first("c_name").over(w).alias("top_name"),
        F.last("c_name").over(w_full).alias("bottom_name"),
    )


@query(
    "win_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(cume_dist() OVER w, 6) AS cd,
           round(percent_rank() OVER w, 6) AS pr,
           nth_value(c_name, 3) OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS third_name
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: cume_dist, percent_rank, nth_value
    (explicit full frame — the default frame would truncate nth_value at the
    current row). One shuffle on the partition key, sort within."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.nth_value("c_name", 3).over(w_full).alias("third_name"),
    )


@query(
    "win_running_distinct",
    oracle="""
    SELECT event_id, user_id, ts, CAST(run_distinct AS BIGINT) AS run_distinct
    FROM (
      SELECT event_id, user_id, ts,
             sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_distinct
      FROM (
        SELECT event_id, user_id, ts,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE user_id < 40))
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — not directly supported by any
    SQL engine's window frames, so it's composed: flag each value's first
    occurrence per (user, value) with row_number, then running-sum the flags
    per user. Two windows, both partitioned on user_id → ONE shuffle (the
    second window reuses the first's hash partitioning; only the sort key
    changes). The standard idiom for 'distinct items seen so far' funnels."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("is_first"),
    )
    return flagged.select(
        "event_id",
        "user_id",
        "ts",
        F.sum("is_first").over(w_run).cast("long").alias("run_distinct"),
    )


@query(
    "win_nav_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           first_value(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS first_nonnull,
           last_value(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_nonnull
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
          FROM events WHERE user_id < 40)
    """,
)
def win_nav_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS navigation — last_value(... ignorenulls) over a running
    frame is the gap-fill / last-observation-carried-forward idiom for
    sparse time series (sensor readings, slowly-updating attributes). The
    nullable column is derived (event_id % 3) so the null pattern is
    deterministic in both engines. One shuffle on user_id."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    v = F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = e.select("event_id", "user_id", "ts", v.alias("v"))
    return d.select(
        "event_id",
        "user_id",
        F.first("v", ignorenulls=True).over(w).alias("first_nonnull"),
        F.last("v", ignorenulls=True).over(w).alias("last_nonnull"),
    )
