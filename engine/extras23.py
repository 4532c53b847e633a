"""Extras batch 23 module (r05 continuation): the experimentation /
data-quality statistics trio — Welch's t-test, IQR outlier fences, and
Beta-smoothed rates.

SURVEY §2 families extended: §2.D gains the A/B-testing primitive
(two-sample unequal-variance t), the robust-fences outlier screen (the
box-plot rule at corpus scale), and empirical-Bayes rate shrinkage (the
correct way to rank segments by conversion when exposure counts differ by
orders of magnitude).

Determinism discipline (SURVEY §5.3): every statistic is closed-form over
partial-aggregable sums (count/avg/var_samp/exact percentile); one final
round on both sides; no per-row float output derived from aggregates
except the bounded per-segment rows (rule 8 scope: thousands of rows —
these keys emit ≤ a handful per group domain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load


@query(
    "agg_ab_ttest",
    oracle="""
    WITH g AS (
      SELECT event_type,
             count(*) AS n,
             avg(value) AS m,
             var_samp(value) AS v
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type
    ),
    ab AS (
      SELECT
        (SELECT n FROM g WHERE event_type = 'click') AS n1,
        (SELECT m FROM g WHERE event_type = 'click') AS m1,
        (SELECT v FROM g WHERE event_type = 'click') AS v1,
        (SELECT n FROM g WHERE event_type = 'purchase') AS n2,
        (SELECT m FROM g WHERE event_type = 'purchase') AS m2,
        (SELECT v FROM g WHERE event_type = 'purchase') AS v2
    )
    SELECT n1, n2,
           round(m1, 4) AS mean_a,
           round(m2, 4) AS mean_b,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 3) + 0.0 AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)),
                 1) AS welch_df
    FROM ab
    """,
)
def agg_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between click and purchase event values:
    group means, the unequal-variance t statistic, and the
    Welch–Satterthwaite degrees of freedom — the A/B-experimentation
    primitive, computed entirely from partial-aggregable sums (count /
    avg / var_samp all merge map-side).

    Determinism: the statistic is a closed-form scalar over group
    aggregates, computed identically in both engines and rounded once
    (t gets the +0.0 negative-zero collapse, rule 11). 100 TB: one
    partial-agg pass per arm regardless of volume — the experiment
    readout costs one scan; thousands of simultaneous experiments fold
    into the same pass with (experiment_id, arm) keys."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    a = g.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n1"), F.col("m").alias("m1"), F.col("v").alias("v1")
    )
    b = g.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n2"), F.col("m").alias("m2"), F.col("v").alias("v2")
    )
    ab = a.crossJoin(b)  # 1x1 rows: the two experiment arms
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    t = (F.col("m1") - F.col("m2")) / F.sqrt(se2)
    df_w = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return ab.select(
        "n1",
        "n2",
        F.round("m1", 4).alias("mean_a"),
        F.round("m2", 4).alias("mean_b"),
        (F.round(t, 3) + F.lit(0.0)).alias("t_stat"),
        F.round(df_w, 1).alias("welch_df"),
    )


@query(
    "etl_anomaly_iqr_fences",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment,
             quantile_disc(c_acctbal, 0.25) AS q1,
             quantile_disc(c_acctbal, 0.75) AS q3
      FROM customer GROUP BY c_mktsegment
    ),
    fenced AS (
      SELECT c.c_mktsegment,
             q.q1, q.q3,
             q.q1 - 1.5 * (q.q3 - q.q1) AS lo,
             q.q3 + 1.5 * (q.q3 - q.q1) AS hi,
             c.c_acctbal
      FROM customer c JOIN q ON c.c_mktsegment = q.c_mktsegment
    )
    SELECT c_mktsegment,
           round(min(q1), 2) AS q1,
           round(min(q3), 2) AS q3,
           round(min(lo), 2) AS fence_lo,
           round(min(hi), 2) AS fence_hi,
           count(*) AS n,
           CAST(count(*) FILTER (WHERE c_acctbal < lo OR c_acctbal > hi)
                AS BIGINT) AS n_outliers
    FROM fenced GROUP BY c_mktsegment
    """,
)
def etl_anomaly_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR outlier fences per market segment: exact quartiles, Tukey
    fences at 1.5×IQR, and the count of account balances outside them —
    the box-plot rule as a data-quality screen. Two passes by necessity
    (fences are order statistics of the same relation they filter): one
    percentile aggregate, one broadcast join back, one counting
    aggregate.

    100 TB: swap the exact quartiles for approx_percentile (GK sketch,
    mergeable) and the shape is a single-scan screen; the exact form
    here keeps the oracle bit-checkable. Quartiles are DISCRETE
    (percentile_disc — actual member values, exact 2-dp money) rather
    than interpolated: cont interpolation lands mid-cent and its 2-dp
    rounding straddled a boundary between engines at sf0.01 (ULP drift
    in (1−f)·a+f·b, rule 2's residual risk made real); with member
    quartiles every fence is exact arithmetic on exact inputs."""
    c = load(spark, sf_dir, "customer")
    q = c.groupBy("c_mktsegment").agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY c_acctbal)"
        ).alias("q1"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY c_acctbal)"
        ).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    q = q.withColumn("lo", F.col("q1") - 1.5 * iqr).withColumn(
        "hi", F.col("q3") + 1.5 * iqr
    )
    joined = c.join(F.broadcast(q), "c_mktsegment")
    out_pred = (F.col("c_acctbal") < F.col("lo")) | (F.col("c_acctbal") > F.col("hi"))
    return joined.groupBy("c_mktsegment").agg(
        F.round(F.min("q1"), 2).alias("q1"),
        F.round(F.min("q3"), 2).alias("q3"),
        F.round(F.min("lo"), 2).alias("fence_lo"),
        F.round(F.min("hi"), 2).alias("fence_hi"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(out_pred, 1).otherwise(0)).cast("long").alias("n_outliers"),
    )


@query(
    "agg_rate_smoothing",
    oracle="""
    WITH seg AS (
      SELECT user_id % 25 AS segment,
             count(*) FILTER (WHERE event_type = 'view') AS views,
             count(*) FILTER (WHERE event_type = 'purchase') AS buys
      FROM events GROUP BY 1
    ),
    prior AS (
      SELECT sum(buys) AS b, sum(views) AS v FROM seg
    )
    SELECT s.segment,
           s.views, s.buys,
           round(CAST(s.buys AS DOUBLE) / nullif(s.views, 0), 4) AS raw_rate,
           round((s.buys + 10.0 * (p.b / CAST(p.v AS DOUBLE)))
                 / (s.views + 10.0), 4) AS smoothed_rate
    FROM seg s, prior p
    """,
)
def agg_rate_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes rate smoothing: per-segment purchase-per-view
    rates shrunk toward the global rate with a pseudo-count prior of 10
    views — the standard fix for ranking segments by conversion when
    exposure counts differ wildly (a 1/1 segment must not outrank
    500/10000). Emits raw and smoothed side by side so the shrinkage is
    auditable.

    Plan: one conditional aggregate to segment grain, one global sum over
    the segment relation (segment-cardinality, broadcast back as a
    1-row cross join) — the fact table is scanned once. 100 TB: identical
    shape; the prior strength (10) trades bias for variance and is the
    only tunable."""
    e = load(spark, sf_dir, "events")
    seg = e.groupBy((F.col("user_id") % 25).alias("segment")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("views"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("buys"),
    )
    prior = seg.agg(
        F.sum("buys").alias("b"), F.sum("views").alias("v")
    )
    joined = seg.crossJoin(F.broadcast(prior))  # 1-row global prior
    # nullif: a zero-view corpus slice must smooth to NULL (the oracle's
    # p.b / 0.0 is NULL in DuckDB), not crash under ANSI division
    g_rate = F.col("b") / F.nullif(F.col("v").cast("double"), F.lit(0.0))
    return joined.select(
        "segment",
        "views",
        "buys",
        F.round(
            F.col("buys").cast("double") / F.nullif(F.col("views"), F.lit(0)), 4
        ).alias("raw_rate"),
        F.round(
            (F.col("buys") + 10.0 * g_rate) / (F.col("views") + 10.0), 4
        ).alias("smoothed_rate"),
    )
