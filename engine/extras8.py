"""Extras batch 8 (r05 continuation): SCD2 point-in-time join, textual
PIVOT/UNPIVOT clause surface, centroid confusion matrix, regexp_extract_all,
and Pareto (ABC) cut analysis.

SURVEY §2 families extended: §2.C (point-in-time interval join), §2.G/§2.M
(PIVOT / UNPIVOT as SQL clauses — the API variants are pivot_wide /
unpivot_long), §2.L (label-confusion distances), §2.H (regexp_extract_all),
§2.E (windowed cumulative-share cut).

Determinism discipline (SURVEY §5.3): running sums are computed over
pre-rounded shares in an identical total order (so the sequential fold is
bit-identical across engines); cross-dim distance sums are rounded after the
sqrt; interval joins carry the (ts, event_id) tie-break from the SCD2 build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load


@query(
    "join_scd2_pointintime",
    oracle="""
    WITH dim AS (
      SELECT user_id, value AS state_value, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM events WHERE event_type = 'signup'
    ),
    fact AS (
      SELECT event_id, user_id, ts, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.ts, f.purchase_value,
           d.state_value, d.valid_from AS state_from
    FROM fact f
    LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join of a fact stream against SCD2 validity intervals:
    every purchase is enriched with the signup-state version that was
    current AT its timestamp (purchases before the first signup keep NULL
    state — the left join's null path is part of the contract). This is
    the consumption side of etl_scd2_intervals: CDC log → intervals →
    as-was enrichment, the pattern every warehouse dimension lookup needs.

    Plan: the interval build is one window shuffle on user_id; the join is
    an equi-join on user_id with the interval predicate as a residual
    filter — correct because intervals partition time per user (lead()
    guarantees no overlap), so each fact row survives in ≤1 interval. At
    100 TB both sides shuffle-partition on user_id and per-user version
    counts stay bounded, so the residual never explodes a partition."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        e.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("value").alias("state_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    fact = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    f, d = fact.alias("f"), dim.alias("d")
    cond = (
        (F.col("f.user_id") == F.col("d.user_id"))
        & (F.col("f.ts") >= F.col("d.valid_from"))
        & (F.col("d.valid_to").isNull() | (F.col("f.ts") < F.col("d.valid_to")))
    )
    return f.join(d, cond, "left").select(
        F.col("f.event_id").alias("event_id"),
        F.col("f.user_id").alias("user_id"),
        F.col("f.ts").alias("ts"),
        "purchase_value",
        "state_value",
        F.col("d.valid_from").alias("state_from"),
    )


@query(
    "sql_pivot_clause",
    oracle="""
    SELECT o_orderpriority AS prio,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2)
             AS open_rev,
           count(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS open_cnt,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)
             AS fin_rev,
           count(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS fin_cnt,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2)
             AS part_rev,
           count(o_totalprice) FILTER (WHERE o_orderstatus = 'P') AS part_cnt
    FROM orders
    GROUP BY 1
    """,
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textual PIVOT clause (the API twin is pivot_wide): order status
    pivoted to columns with two aggregates per pivot value — revenue and
    count — over order priority rows. The oracle states the same contract
    as conditional FILTER aggregation, which is also exactly how Spark
    executes PIVOT with explicit IN values: one pass, one shuffle, no
    per-value scans.

    Plan: Catalyst rewrites PIVOT into a single HashAggregate with
    count×values conditional expressions — listing the IN values (required
    by the parser here) is what keeps it one-pass; value discovery would
    need an extra distinct job."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_pivot_src")
    p = spark.sql(
        """
        SELECT * FROM (
          SELECT o_orderpriority AS prio, o_orderstatus AS st, o_totalprice
          FROM orders_pivot_src
        )
        PIVOT (
          round(sum(o_totalprice), 2) AS rev, count(o_totalprice) AS cnt
          FOR st IN ('O' AS open, 'F' AS fin, 'P' AS part)
        )
        """
    )
    # Spark's PIVOT emits NULL for a cell with no input rows — even for
    # count — where the oracle's FILTERed count is 0; coalesce the count
    # columns so a priority missing a status matches (r12, 1-row sweep)
    return p.select(
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c) if c.endswith("_cnt") else F.col(c)
            for c in p.columns
        ]
    )


@query(
    "sql_unpivot_clause",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax
      FROM lineitem WHERE l_orderkey % 100 = 0
    )
    SELECT l_orderkey, l_linenumber, 'qty' AS metric, l_quantity AS val
    FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'disc', l_discount FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM src
    """,
)
def sql_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textual UNPIVOT clause (the API twin is unpivot_long): four
    lineitem measures melted to (metric, val) rows. The oracle states the
    semantics as the equivalent UNION ALL stack.

    Plan: UNPIVOT is a zero-shuffle Expand node — each input row emits 4
    output rows inside whole-stage codegen, with the modulo filter pushed
    below the expand so pruning happens at the scan. (UNPIVOT drops NULL
    measures by default; these four columns are NOT NULL in the corpus,
    so the UNION ALL oracle is exact.)"""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_unpivot_src")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, metric, val
        FROM (
          SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax
          FROM lineitem_unpivot_src
          WHERE l_orderkey % 100 = 0
        )
        UNPIVOT (
          val FOR metric IN (l_quantity AS qty, l_extendedprice AS price,
                             l_discount AS disc, l_tax AS tax)
        )
        """
    )


@query(
    "emb_centroid_confusion",
    oracle="""
    WITH dims AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS dim,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings
    ),
    cent AS (
      SELECT label, dim, round(avg(x), 6) AS c
      FROM dims GROUP BY label, dim
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(sqrt(sum((a.c - b.c) * (a.c - b.c))), 3) AS dist
    FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
    GROUP BY 1, 2
    """,
)
def emb_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-label centroid distance matrix (long form, label_a < label_b):
    which classes sit close together in embedding space — the confusion /
    merge-candidate diagnostic that pairs with emb_outlier_distance's
    within-class audit.

    Plan: centroids collapse the corpus to labels × dims rows (KB) in one
    (label, dim) shuffle; the pairwise stage runs entirely on that bounded
    relation — a dim-keyed self-join producing labels² × dims intermediate
    rows, still KB. At any corpus scale the only fact-sized work is the
    centroid partial aggregation; pairwise cost depends on label count
    alone. Centroids rounded to 6 before the distance, distance to 3, on
    both sides — the cross-dim sum order is the only float divergence and
    rounding absorbs it."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select("label", F.col("pos").alias("dim"), F.col("col").alias("x"))
    cent = dims.groupBy("label", "dim").agg(F.round(F.avg("x"), 6).alias("c"))
    a = cent.select(
        F.col("label").alias("label_a"), F.col("dim").alias("dim"), F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), F.col("dim").alias("dim"), F.col("c").alias("cb")
    )
    return (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))),
                3,
            ).alias("dist")
        )
    )


@query(
    "fn_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           coalesce(array_to_string(regexp_extract_all(text, 'b[a-z]+')[1:5],
                                    ','), '') AS first5,
           CAST(len(regexp_extract_all(text, 'b[a-z]+')) AS INT) AS n_matches
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: every match of a pattern per document (not just
    the first — that's fn_string_regex's job), with the first five joined
    for a scalar compare plus the total match count.

    Plan: row-local regex inside codegen over a pruned two-column scan
    with the modulo filter pushed down; zero shuffles. The [a-z]+ class
    behaves identically in Java and RE2-style engines — no
    locale-dependent classes (\\w, \\b) are used, per §5.3."""
    d = load(spark, sf_dir, "documents")
    matches = F.regexp_extract_all("text", F.lit("b[a-z]+"), 0)
    # coalesce mirrors the oracle's: a NULL text has a NULL match list,
    # and first5 renders as '' on both engines (r12 NULL-text parity)
    return d.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.coalesce(F.array_join(F.slice(matches, 1, 5), ","), F.lit("")).alias(
            "first5"
        ),
        F.size(matches).cast("int").alias("n_matches"),
    )


@query(
    "win_pareto_cut",
    oracle="""
    WITH rev AS (
      SELECT c_nationkey AS nation, o_custkey AS cust,
             round(sum(o_totalprice), 2) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT nation, round(sum(rev), 2) AS tot FROM rev GROUP BY 1),
    shares AS (
      SELECT r.nation, r.cust, r.rev, round(r.rev / t.tot, 6) AS share
      FROM rev r JOIN tot t ON r.nation = t.nation
    ),
    cum AS (
      SELECT nation, cust, rev, share,
             round(sum(share) OVER (PARTITION BY nation
                                    ORDER BY rev DESC, cust
                                    ROWS UNBOUNDED PRECEDING) - share, 6)
               AS cum_before
      FROM shares
    )
    SELECT nation, cust, rev, share, cum_before
    FROM cum WHERE cum_before < 0.8
    """,
)
def win_pareto_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC cut: per nation, keep the top customers whose revenue
    is needed to reach 80% of the nation's total — customers are admitted
    while the cumulative share BEFORE them is under the threshold, so the
    crossing customer is included and the cut set is minimal.

    Plan: one (nation, cust) aggregate, a broadcast-sized per-nation total
    joined back, then a single window shuffle on nation for the running
    share. Determinism: shares are rounded to 6 BEFORE the running sum,
    and the window's (rev DESC, cust) order fixes the sequential fold, so
    both engines add identical doubles in an identical order — the
    cumulative is bit-identical, not just close (§5.3)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nation"), F.col("o_custkey").alias("cust")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    tot = rev.groupBy("nation").agg(F.round(F.sum("rev"), 2).alias("tot"))
    shares = rev.join(F.broadcast(tot), "nation").select(
        "nation",
        "cust",
        "rev",
        F.round(F.col("rev") / F.col("tot"), 6).alias("share"),
    )
    w = (
        Window.partitionBy("nation")
        .orderBy(F.col("rev").desc(), F.col("cust"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = shares.withColumn(
        "cum_before", F.round(F.sum("share").over(w) - F.col("share"), 6)
    )
    return cum.filter(F.col("cum_before") < 0.8)
