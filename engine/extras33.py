"""Extras batch 33 module (r05 continuation): NDCG ranking evaluation,
rounding-mode semantics, and sweep-line concurrency.

SURVEY §2 families extended: §2.I (NDCG@5 over label-relevance for the
ANN query set — the ranking-quality metric retrieval stacks report),
§2.H (round vs bround: HALF_UP vs HALF_EVEN on exact .5 ties — the
financial-rounding contract, aligned engine-by-engine), §2.E (the
sweep-line: interval starts/ends as ±1 events, running sum = concurrent
sessions, per-day peak — max-concurrency without interval self-joins).

Determinism discipline (SURVEY §5.3): tie values are exact dyadic
numbers (k + 0.5 is representable); NDCG's log2 discounts are identical
closed forms rounded once; sweep events order by (ts, delta, event_id)
so starts/ends at the same instant resolve identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load

_NDCG_QUERIES = [0, 50, 100, 150, 200]


@query(
    "sim_eval_ndcg",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = (SELECT len(embedding) FROM embeddings WHERE embedding IS NOT NULL GROUP BY 1 ORDER BY count(*) DESC, len(embedding) LIMIT 1)
    ),
    q AS (
      SELECT vec_id AS query_id, embedding, label FROM v
      WHERE vec_id IN ({", ".join(str(i) for i in _NDCG_QUERIES)})
    ),
    ranked AS (
      SELECT q.query_id, q.label AS q_label, e.label AS n_label,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_dot_product(q.embedding::DOUBLE[],
                                         e.embedding::DOUBLE[]) DESC,
                        e.vec_id) AS rnk
      FROM q JOIN v e ON e.vec_id != q.query_id
    ),
    top5 AS (SELECT * FROM ranked WHERE rnk <= 5),
    dcg AS (
      SELECT query_id,
             sum(CASE WHEN n_label = q_label THEN 1.0 ELSE 0.0 END
                 / log2(rnk + 1)) AS dcg,
             sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS n_rel
      FROM top5 GROUP BY query_id
    ),
    ideal AS (
      SELECT query_id, sum(1.0 / log2(k + 1)) AS idcg
      FROM dcg, UNNEST(range(1, 6)) AS t(k)
      WHERE k <= greatest(n_rel, 1)
      GROUP BY query_id
    )
    SELECT d.query_id,
           CAST(d.n_rel AS BIGINT) AS n_relevant,
           round(CASE WHEN d.n_rel = 0 THEN 0.0 ELSE d.dcg / i.idcg END, 4)
             AS ndcg5
    FROM dcg d JOIN ideal i ON i.query_id = d.query_id
    """,
)
def sim_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 for the standard ANN query set: neighbors ranked by exact
    cosine (sim tie-broken by vec_id), binary relevance = the neighbor
    shares the query's cluster label, DCG discounted by log2(rank+1) and
    normalized by the ideal ordering of the relevant items actually
    retrieved. The ranking-quality readout every retrieval deployment
    tracks next to recall (sim_ann_* keys) — recall says WHETHER the
    right items surfaced, NDCG says how HIGH.

    Plan: the query side is 5 rows (broadcast); scoring is one pass over
    the corpus per the brute-force contract (sim_knn_query's shape), the
    metric itself runs over 25 ranked rows. 100 TB: swap the scorer for
    the stored-index serve path (pipeline_ann_index_build) and the
    metric stage is unchanged — eval math never touches corpus scale."""
    from engine.tables import vectors

    emb = vectors(spark, sf_dir)
    q = emb.filter(F.col("vec_id").isin(_NDCG_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    dot = F.aggregate(
        F.zip_with(
            "q_emb", "embedding", lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = emb.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "q_label",
        F.col("label").alias("n_label"),
        dot.alias("sim"),
        "vec_id",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "vec_id")
    top5 = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 5
    )
    rel = F.when(F.col("n_label") == F.col("q_label"), 1.0).otherwise(0.0)
    dcg = top5.groupBy("query_id").agg(
        F.sum(rel / F.log2(F.col("rnk") + 1)).alias("dcg"),
        F.sum(rel).cast("long").alias("n_rel"),
    )
    ks = spark.range(1, 6).select(F.col("id").alias("k"))
    ideal = (
        dcg.join(F.broadcast(ks), F.col("k") <= F.greatest("n_rel", F.lit(1)))
        .groupBy("query_id")
        .agg(F.sum(1.0 / F.log2(F.col("k") + 1)).alias("idcg"))
    )
    return dcg.join(ideal, "query_id").select(
        "query_id",
        F.col("n_rel").alias("n_relevant"),
        F.round(
            F.when(F.col("n_rel") == 0, 0.0).otherwise(
                F.col("dcg") / F.col("idcg")
            ),
            4,
        ).alias("ndcg5"),
    )


@query(
    "fn_round_half_even",
    oracle="""
    WITH ties AS (
      SELECT o_orderkey, (o_orderkey % 10) + 0.5 AS v
      FROM orders WHERE o_orderkey <= 200
    )
    SELECT o_orderkey, v,
           CAST(round(v, 0) AS DOUBLE) AS half_up,
           CAST(round_even(v, 0) AS DOUBLE) AS half_even,
           (CAST(round(v, 0) AS DOUBLE) != CAST(round_even(v, 0) AS DOUBLE))
             AS modes_differ
    FROM ties
    """,
)
def fn_round_half_even(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-mode semantics on EXACT ties: values k + 0.5 (dyadic —
    representable, so the tie is real, not float noise) rounded under
    both contracts side by side: round() = HALF_UP (away from zero:
    2.5→3) vs bround() = HALF_EVEN (banker's: 2.5→2, 3.5→4). The
    modes_differ flag marks exactly the rows where the ambient mode
    changes the answer — even k, where HALF_EVEN rounds down.

    Engine alignment (the point of the key): Spark round ↔ DuckDB round
    (both away-from-zero on .5), Spark bround ↔ DuckDB round_even.
    Financial aggregation at 100 TB standardizes on HALF_EVEN precisely
    because HALF_UP biases sums upward by ~0.5 per tie — across billions
    of rows that bias is material (§5.3 rule 6's formal sibling)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    v = (F.col("o_orderkey") % 10) + 0.5
    return o.select(
        "o_orderkey",
        v.alias("v"),
        F.round(v, 0).cast("double").alias("half_up"),
        F.bround(v, 0).cast("double").alias("half_even"),
        (F.round(v, 0).cast("double") != F.bround(v, 0).cast("double")).alias(
            "modes_differ"
        ),
    )


@query(
    "win_concurrency_sweep",
    oracle="""
    WITH ev AS (
      SELECT ts, 1 AS delta, event_id FROM events
      UNION ALL
      SELECT ts + INTERVAL 30 MINUTE, -1, event_id FROM events
    ),
    run AS (
      SELECT date_trunc('day', ts) AS day,
             sum(delta) OVER (ORDER BY ts, delta, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS concurrent
      FROM ev
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(max(concurrent) AS BIGINT) AS peak_concurrent
    FROM run GROUP BY day
    """,
)
def win_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: each event opens a 30-minute session;
    starts become +1 events, ends −1, and the running sum over the
    merged timeline IS the number of concurrent sessions at every
    instant — reported as the per-day peak. The classic 'max concurrent
    users' question WITHOUT an interval self-join (which is O(n²) in the
    overlap density; the sweep is O(n log n) in the one sort).

    Tie policy is explicit: at the same instant, ends (−1) sort before
    starts (+1) via the delta sort key, so a back-to-back session chain
    never double-counts. Plan: one union, one global ordered running
    sum — at 100 TB partition the sweep by day (sessions can't span the
    boundary here) and it parallelizes per day."""
    e = load(spark, sf_dir, "events")
    starts = e.select(F.col("ts"), F.lit(1).alias("delta"), "event_id")
    ends = e.select(
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("ts"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    ev = starts.union(ends)
    w = Window.orderBy("ts", "delta", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    run = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.sum("delta").over(w).alias("concurrent"),
    )
    return run.groupBy("day").agg(
        F.max("concurrent").cast("long").alias("peak_concurrent")
    )
