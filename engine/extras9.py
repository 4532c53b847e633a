"""Extras batch 9 (r05 continuation): Gini concentration, DAU/MAU
stickiness, source-vocabulary Jaccard similarity, inline VALUES lookup
tables, and moving-window median.

SURVEY §2 families extended: §2.D (Gini, DAU/MAU), §2.I/§2.L (corpus-level
source similarity), §2.M (VALUES-derived inline dimension in SQL), §2.E
(median as a window aggregate over a sliding frame).

Determinism discipline (SURVEY §5.3): rank-weighted sums and ratios are
rounded on both sides; the moving median's frame order carries the
(ts, event_id) tie-break so the frame contents are identical cross-engine;
token sets go through DISTINCT before any counting, making Jaccard integer
arithmetic until the final rounded division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load


@query(
    "agg_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT c_nationkey AS nation, o_custkey AS cust,
             round(sum(o_totalprice), 2) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT nation, rev,
             row_number() OVER (PARTITION BY nation ORDER BY rev, cust) AS rn
      FROM rev
    )
    SELECT nation,
           count(*) AS n_cust,
           round(sum(rev), 2) AS total_rev,
           round(2.0 * sum(rn * rev) / (count(*) * sum(rev))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked GROUP BY nation
    """,
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini coefficient per nation over customer
    revenue — 0 = perfectly equal customers, →1 = one whale. Uses the
    rank-weighted closed form G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    ascending revenue, with (rev, cust) as the total rank order so ties
    are deterministic.

    Plan: one (nation, cust) aggregate shuffle, one window shuffle on
    nation for the rank, one final nation aggregate — all keys
    low-cardinality or naturally sharded. The rank-weighted sum is the
    only order-sensitive float; its relative error is ~1e-15 of the
    total, absorbed by the 6-dp rounding on both sides."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nation"), F.col("o_custkey").alias("cust")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = Window.partitionBy("nation").orderBy("rev", "cust")
    ranked = rev.withColumn("rn", F.row_number().over(w))
    n = F.count("*")
    return ranked.groupBy("nation").agg(
        n.alias("n_cust"),
        F.round(F.sum("rev"), 2).alias("total_rev"),
        F.round(
            F.lit(2.0) * F.sum(F.col("rn") * F.col("rev")) / (n * F.sum("rev"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


@query(
    "agg_dau_mau",
    oracle="""
    WITH dau AS (
      SELECT date_trunc('day', ts) AS day,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ),
    mau AS (
      SELECT date_trunc('month', ts) AS month,
             count(DISTINCT user_id) AS mau
      FROM events GROUP BY 1
    )
    SELECT CAST(dau.day AS TIMESTAMP) AS day, dau.dau, mau.mau,
           round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
    FROM dau JOIN mau ON date_trunc('month', dau.day) = mau.month
    """,
)
def agg_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness: daily distinct users over the calendar month's
    distinct users — the engagement ratio every product dashboard tracks.

    Plan: two distinct-count aggregates over the same scan (Spark runs
    count(DISTINCT) via a two-stage expand + partial agg, user_id-sharded),
    then a broadcast join of the ≤12-row month relation onto the day
    relation. At 100 TB both distincts shuffle on (bucket, user_id); the
    join side stays bounded by calendar size."""
    e = load(spark, sf_dir, "events")
    dau = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    mau = e.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        dau.join(
            F.broadcast(mau), F.date_trunc("month", F.col("day")) == F.col("month")
        )
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            "dau",
            "mau",
            F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
    )


@query(
    "text_source_vocab_jaccard",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    sizes AS (SELECT source, count(*) AS n FROM vocab GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
      FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_common,
           sa.n AS n_a, sb.n AS n_b,
           round(CAST(i.n_common AS DOUBLE)
                 / (sa.n + sb.n - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.src_a = sa.source
    JOIN sizes sb ON i.src_b = sb.source
    """,
)
def text_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level vocabulary overlap: Jaccard similarity of the distinct
    token sets of every source pair — the corpus-composition diagnostic
    that flags near-identical crawls before any document-level dedup.

    Plan: the corpus collapses to distinct (source, token) in one shuffle
    (partial distinct map-side); the pairwise intersection is a token-keyed
    equi-join over that deduplicated relation — pair partials collapse per
    token, so shuffle volume is O(vocab × source-pairs-sharing-a-token),
    never O(docs²). Sizes are broadcast (≤ sources rows). Jaccard stays in
    integer arithmetic until one rounded division."""
    d = load(spark, sf_dir, "documents")
    vocab = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count("*").alias("n"))
    a = vocab.select(F.col("source").alias("src_a"), "tok")
    b = vocab.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "sql_values_inline_table",
    oracle="""
    SELECT m.label, count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN (VALUES ('O', 'open'), ('F', 'finalized'), ('P', 'pending'))
         AS m(code, label)
      ON o.o_orderstatus = m.code
    GROUP BY m.label
    """,
)
def sql_values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES-derived lookup table in SQL: a three-row decode
    dimension declared in the query text itself, joined and aggregated —
    the quick-mapping idiom that avoids shipping a reference file for
    trivial code→label translations.

    Plan: the VALUES relation is a LocalRelation — Catalyst broadcasts it
    (or constant-folds, post-AQE) so the orders scan never reshuffles for
    the join; one aggregate shuffle on the 3-value label."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_values_src")
    return spark.sql(
        """
        SELECT m.label, count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS revenue
        FROM orders_values_src o
        JOIN (VALUES ('O', 'open'), ('F', 'finalized'), ('P', 'pending'))
             AS m(code, label)
          ON o.o_orderstatus = m.code
        GROUP BY m.label
        """
    )


@query(
    "win_moving_median",
    oracle="""
    SELECT event_id, user_id, ts, value,
           median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             AS med5
    FROM events WHERE user_id < 30
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 5-row median of value per user — the robust smoother that
    shrugs off the spikes a moving average chases. Exercises an exact
    ordered-statistic aggregate as a WINDOW function over a sliding frame
    (not just as a group aggregate).

    Plan: Spark refuses ordered-statistic aggregates over explicit frames
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the median is composed
    from primitives it does allow there: collect_list over the 5-row frame
    → array_sort → middle element (odd) or mean of the two middles (even).
    Still one shuffle on user_id with constant ≤5-row per-frame state; the
    (ts, event_id) tie-break pins the frame contents, and the even-count
    interpolation is a single IEEE averaging both engines do identically,
    so no rounding is needed."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    med = F.when(
        n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(arr, (n / 2).cast("int"))
            + F.element_at(arr, (n / 2 + 1).cast("int"))
        )
        / 2
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        med.alias("med5"),
    )
