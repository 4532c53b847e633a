"""Extras batch 10 (r05 continuation): GROUP BY ALL surface, period-over-
period growth, overlapping chunk fingerprints, weighted moments, and the
DISTRIBUTE BY / SORT BY physical-layout clause.

SURVEY §2 families extended: §2.M (GROUP BY ALL / ORDER BY ALL,
DISTRIBUTE BY), §2.E (MoM/YoY growth over a pre-aggregated month spine),
§2.N (multimodal chunk fingerprints — the text twin of binary chunking),
§2.D (frequency-weighted mean/variance).

Determinism discipline (SURVEY §5.3): weighted moments use a small-magnitude
measure (discount ∈ [0, 0.1]) so the order-sensitive Σw·x² stays ~1e4 and
6-dp rounding absorbs association noise with ~11 digits of headroom; growth
ratios divide two already-rounded month aggregates; chunk hashing is
byte-exact (md5 over identical UTF-8 slices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load


@query(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n, round(sum(o_totalprice), 2) AS rev
    FROM orders
    GROUP BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL: the analyst-ergonomics clause that derives the
    grouping keys from the non-aggregate select items — identical plan to
    spelling them out (one partial+final hash aggregate), purely a parser
    surface, exercised textually on both engines.

    Plan: identical to an explicit GROUP BY — partial aggregation then one
    shuffle on the two low-cardinality keys (15 output groups)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba_src")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n, round(sum(o_totalprice), 2) AS rev
        FROM orders_gba_src
        GROUP BY ALL
        """
    )


@query(
    "win_period_over_period",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY 1
    )
    SELECT month, rev,
           round((rev - lag(rev, 1) OVER w) / lag(rev, 1) OVER w, 6)
             AS mom_growth,
           round((rev - lag(rev, 12) OVER w) / lag(rev, 12) OVER w, 6)
             AS yoy_growth
    FROM monthly
    WINDOW w AS (ORDER BY month)
    """,
)
def win_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth: lag(1) and
    lag(12) over the monthly revenue series (NULL where no prior period
    exists — the first month / first year keep NULLs by contract).

    Plan: the fact-sized work is the month aggregate (one shuffle, partial
    agg, ~80 output rows); the growth window runs over that pre-aggregated
    calendar-bounded series, so its single-partition sort is O(months) at
    any SF — the unpartitioned window is deliberate and safe BECAUSE the
    aggregate collapsed first (the rule: never window an unaggregated
    fact table without a partition key)."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    w = Window.orderBy("month")
    lag1 = F.lag("rev", 1).over(w)
    lag12 = F.lag("rev", 12).over(w)
    return monthly.select(
        "month",
        "rev",
        F.round((F.col("rev") - lag1) / lag1, 6).alias("mom_growth"),
        F.round((F.col("rev") - lag12) / lag12, 6).alias("yoy_growth"),
    )


@query(
    "multimodal_chunk_fingerprint",
    oracle="""
    WITH docs AS (
      SELECT doc_id, text, length(text) AS n
      FROM documents WHERE doc_id % 4 = 0
    ),
    chunks AS (
      SELECT doc_id, n, CAST(k AS INT) AS chunk_idx,
             substr(text, k * 192 + 1, 256) AS chunk
      FROM docs, unnest(range(0, ((n - 1) // 192) + 1)) AS t(k)
    )
    SELECT doc_id, chunk_idx,
           CAST(length(chunk) AS INT) AS chunk_len,
           md5(chunk) AS chunk_md5,
           (chunk_idx = 0) AS is_first
    FROM chunks
    """,
)
def multimodal_chunk_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping chunk fingerprints: 256-byte windows with a 192-byte
    stride (64-byte overlap) over each payload, one md5 per chunk — the
    shingling step for payload-level near-dup detection and content-
    addressed chunk storage (CDC-style indexing). Runs on the text bytes
    here because the DuckDB oracle lacks BLOB substring/md5; the Spark
    plan is type-generic — substring and md5 accept BinaryType unchanged
    (the corpus is ASCII, so char offsets ARE byte offsets).

    Plan: chunk offsets come from explode(sequence(...)) — codegen fan-out
    with no shuffle at all; per-row output is ceil(n/192) chunks. At
    100 TB this is embarrassingly parallel; the downstream group-by-md5
    (not part of this key) would be the first shuffle."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    n = F.length("text")
    d = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), ((n - 1) / 192).cast("int"))).alias(
            "chunk_idx"
        ),
    )
    chunk = F.substring(
        F.col("text"), F.col("chunk_idx") * 192 + 1, 256
    )
    return d.select(
        "doc_id",
        "chunk_idx",
        F.length(chunk).cast("int").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
        (F.col("chunk_idx") == 0).alias("is_first"),
    )


@query(
    "agg_weighted_moments",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS total_w,
           round(sum(l_quantity * l_discount) / sum(l_quantity), 6)
             AS wmean_disc,
           round(sum(l_quantity * l_discount * l_discount) / sum(l_quantity)
                 - (sum(l_quantity * l_discount) / sum(l_quantity))
                   * (sum(l_quantity * l_discount) / sum(l_quantity)), 6)
             AS wvar_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_weighted_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-weighted mean and variance of the discount, weighted by
    quantity — the importance-weighted statistics a resampled/weighted
    training corpus needs (plain avg() answers the wrong question when
    rows carry weights).

    Plan: three weighted sums, all partial-aggregable in one pass — the
    same single-shuffle profile as agg_global. The measure is bounded
    (discount ≤ 0.1), so Σw·x² stays ~1e4 and the 6-dp rounding has ~11
    digits of headroom over float-association noise (the reason discount,
    not extendedprice, is the demonstration column — see module
    docstring)."""
    li = load(spark, sf_dir, "lineitem")
    w, x = F.col("l_quantity"), F.col("l_discount")
    sw, swx, swx2 = F.sum(w), F.sum(w * x), F.sum(w * x * x)
    return li.groupBy("l_returnflag").agg(
        F.round(sw, 2).alias("total_w"),
        F.round(swx / sw, 6).alias("wmean_disc"),
        F.round(swx2 / sw - (swx / sw) * (swx / sw), 6).alias("wvar_disc"),
    )


@query(
    "sql_distribute_by",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer WHERE c_acctbal > 0
    """,
)
def sql_distribute_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY + SORT BY: the textual physical-layout clauses —
    hash-partition the output on c_nationkey, sort within each partition —
    whose RESULT CONTENT is identical to the plain selection (the oracle
    states exactly that; the driver's hash is order-insensitive). What the
    clauses change is the plan: an explicit hash Exchange plus an intra-
    partition (non-global) sort, pinned in tests/test_plan_shape.py.

    100 TB: this is the write-side preparation idiom — distribute on the
    downstream join/bucket key and sort within partitions so the sink
    produces co-located, min/max-indexable files (the textual twin of
    sink_sorted_clustered)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_dist_src")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer_dist_src WHERE c_acctbal > 0
        DISTRIBUTE BY c_nationkey SORT BY c_nationkey, c_custkey
        """
    )
