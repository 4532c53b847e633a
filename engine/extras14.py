"""Extras batch 14 module (r05 continuation): rank-shift analytics and
grouped top-k over generated features — keys 299 and 300.

SURVEY §2 families extended: §2.E (rank within one dimension, lag across
another — the two-axis window composition), §2.I (per-language top
bigrams — grouped top-k over exploded n-grams, the corpus-reporting shape).

Determinism discipline (SURVEY §5.3): ranks order by pre-rounded revenue
with a name tie-break; bigram top-k orders by (count DESC, bigram) — total
orders everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load


@query(
    "win_rank_shift_yoy",
    oracle="""
    WITH yearly AS (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS yr,
             round(sum(o.o_totalprice), 2) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT nation, yr, rev,
             CAST(row_number() OVER (PARTITION BY yr
                                     ORDER BY rev DESC, nation) AS INT)
               AS rnk
      FROM yearly
    )
    SELECT nation, yr, rev, rnk,
           CAST(lag(rnk) OVER (PARTITION BY nation ORDER BY yr) - rnk
                AS INT) AS rank_gain
    FROM ranked
    """,
)
def win_rank_shift_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-shift analytics: each nation's revenue rank within its year,
    and how many places it climbed (+) or fell (−) versus the previous
    year — the league-table movement view. Composes two windows on
    DIFFERENT axes: rank partitioned by year, lag partitioned by nation.

    Plan: the fact table aggregates once to (nation × year) — bounded by
    catalog × calendar — then both windows run over that ~175-row
    relation; two small sorts, no further fact-sized work. Dims
    broadcast into the aggregate as usual."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    yearly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w_rank = Window.partitionBy("yr").orderBy(F.col("rev").desc(), "nation")
    w_lag = Window.partitionBy("nation").orderBy("yr")
    ranked = yearly.withColumn(
        "rnk", F.row_number().over(w_rank).cast("int")
    )
    return ranked.withColumn(
        "rank_gain", (F.lag("rnk").over(w_lag) - F.col("rnk")).cast("int")
    )


@query(
    "text_top_bigrams_per_lang",
    oracle="""
    WITH toks AS (
      SELECT lang, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT lang, t[k] || ' ' || t[k+1] AS bigram
      FROM toks, unnest(range(1, len(t))) AS u(k)
      WHERE len(t) >= 2
    ),
    counts AS (
      SELECT lang, bigram, count(*) AS cnt FROM bg GROUP BY lang, bigram
    )
    SELECT lang, bigram, cnt, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY cnt DESC, bigram) AS rnk
          FROM counts)
    WHERE rnk <= 5
    """,
)
def text_top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-5 bigrams — the corpus-reporting shape behind
    datasheet 'most common phrases' tables: explode generated features,
    count per group, grouped top-k with a total order (count DESC,
    bigram).

    Plan: tokenize ONCE in a projection (r06 — Catalyst does not CSE a
    repeated split(text) across lambda scopes, so the old inline
    expression re-split every row three times), bigram fan-out inside
    codegen (transform over a sequence, no shuffle), one (lang, bigram)
    count with map-side partial aggregation, then the rank window runs
    per lang over the counted relation — vocabulary-sized, not
    corpus-sized. WindowGroupLimit prunes rank state to k rows per
    partition (same plan shape win_row_number_topk pins)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("lang", F.split("text", " ").alias("t"))
    bg = toks.select(
        "lang",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(0, size(t) - 2), "
                    "i -> concat_ws(' ', t[i], t[i+1]))"
                ),
            ).otherwise(F.array(F.lit(None).cast("string")))
        ).alias("bigram"),
    ).filter(F.col("bigram").isNotNull())
    counts = bg.groupBy("lang", "bigram").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "bigram")
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
    )
