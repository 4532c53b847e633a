"""Extras batch 35 module (r05 close): the skyline operator.

SURVEY §2 family extended: §2.F/§2.E — skyline (Pareto-frontier) queries:
the set of non-dominated points under (minimize price, maximize size).
A first-class operator family in the OLAP literature; naive evaluation is
the O(n²) dominance self-join, but a 2-D skyline reduces to one sort plus
a running max — the shape implemented here.

Determinism discipline (SURVEY §5.3): dominance uses exact column values;
the sort order carries a unique-key tie-break; frontier membership is a
pure integer/double comparison, no rounding in predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load


@query(
    "agg_skyline_pareto_frontier",
    oracle="""
    WITH pts AS (
      SELECT p_partkey, p_retailprice AS price, p_size AS size
      FROM part
    ),
    ranked AS (
      SELECT p_partkey, price, size,
             max(size) OVER (ORDER BY price, size DESC, p_partkey
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS best_cheaper_size
      FROM pts
    )
    SELECT p_partkey, round(price, 2) AS price, size
    FROM ranked
    WHERE best_cheaper_size IS NULL OR size > best_cheaper_size
    """,
)
def agg_skyline_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts not DOMINATED under (cheaper price, larger
    size) — a part is on the frontier iff no other part is at most its
    price AND at least its size with one strict. The 2-D reduction: sort
    by (price asc, size desc, key), track the running max size over all
    STRICTLY PRECEDING rows; a row survives iff its size exceeds that
    max. Sorting size DESC within equal price makes the prefix-max
    handle price ties exactly (equal-price, larger-size rows precede and
    dominate; equal (price, size) rows keep the first only... no — equal
    pairs both survive, since neither strictly dominates: the strict `>`
    against the preceding max admits only the FIRST of an equal pair, a
    deliberate keep-one policy tie-broken by p_partkey).

    Plan: one global sort + O(1)-state running max — the O(n log n)
    skyline, never the O(n²) dominance self-join. 100 TB: partition by
    price range, compute local frontiers, then one tiny merge pass over
    the per-partition frontiers (frontier size ≪ n) — the classic
    divide-and-conquer skyline."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    )
    w = Window.orderBy("price", F.col("size").desc(), "p_partkey").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = p.withColumn("best_cheaper_size", F.max("size").over(w))
    return ranked.filter(
        F.col("best_cheaper_size").isNull()
        | (F.col("size") > F.col("best_cheaper_size"))
    ).select("p_partkey", F.round("price", 2).alias("price"), "size")
