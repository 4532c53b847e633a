"""Mergeable-sketch aggregates (r03): Datasketches HLL cardinality sketches
with a persisted round-trip, and approx_top_k frequent items.

SURVEY §2.D/I extensions (the reference at /root/reference is an empty
directory; SURVEY §2 is the operative spec). The sketch keys are the
100 TB cardinality answer the exact-NDV keys (agg_count_distinct,
etl_dq_profile) deliberately avoid: a sketch is a small mergeable state —
partial-aggregates combine map-side, persisted per-batch sketches merge
across days without re-reading history, and the union is associative, so
the 100 TB rollup is O(sketch bytes × partitions), never a re-scan.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag

_TMP = tempfile.gettempdir()


@query("agg_hll_sketch_merge")  # ROWS: DuckDB has no Datasketches-HLL twin
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct-customer counting with HLL sketches, proven
    through a persisted round-trip: (1) build one HLL sketch of c_custkey
    PER NATION and write the 25 sketch binaries to parquet — the stored
    per-shard state of an incremental pipeline; (2) read them back, join the
    broadcast nation dim, and ``hll_union_agg`` up to region level;
    (3) estimate. Output: (r_name, est_customers) + a global ALL row from
    merging the same stored sketches — no second scan of the base table.

    Estimate error at the default lgK=12 is ~1.6% (unit-tested ≤5% vs exact
    in tests/test_sketches.py). The sketch column is binary and the estimate
    is a deterministic function of the input SET (union is order-blind), so
    the rows-only driver check is stable.

    100 TB: this is THE pattern for daily-active/distinct-id metrics —
    per-partition sketches persist once per batch; any grouping rollup
    (nation→region→ALL here) is a union over kilobyte blobs. Compare
    agg_count_distinct (exact, full shuffle of the id domain every query)
    and agg_approx_distinct (one-shot HLL, no persisted mergeable state)."""
    c = load(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(
        F.expr("hll_sketch_agg(c_custkey)").alias("sk")
    )
    path = f"{_TMP}/spark_graft_hll_nation_{sftag(sf_dir)}"
    per_nation.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)

    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    per_region = (
        stored.join(
            F.broadcast(nation), stored.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_customers")
        )
    )
    overall = stored.agg(
        F.lit("ALL").alias("r_name"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_customers"),
    )
    return per_region.unionByName(overall).orderBy("r_name")


@query(
    "agg_approx_top_k",
    oracle="""
    SELECT event_type AS item, count(*) AS cnt
    FROM events GROUP BY 1 ORDER BY cnt DESC, event_type LIMIT 3
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items top-3 event types via ``approx_top_k`` — the
    space-saving sketch behind heavy-hitter dashboards. FULL-oracle by a
    domain argument: the tracked-item budget (10,000) exceeds the column's
    5-value domain, so the sketch degenerates to exact counts and must
    match plain GROUP BY/ORDER BY/LIMIT — and the corpus's per-type counts
    are tie-free at every SF (checked 0.001/0.01/0.1), so the cut is
    deterministic. The struct array is unpacked to scalar columns per the
    result convention.

    100 TB: approx_top_k is a partial-aggregable sketch (SpaceSaving-style);
    when the true domain exceeds the budget the counts become ±ε estimates
    but the shuffle stays O(budget) per partition instead of O(domain) —
    the graceful degradation exact heavy-hitters (agg_heavy_hitters) lacks."""
    e = load(spark, sf_dir, "events")
    topk = e.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
    flat = topk.select(F.explode("tk").alias("s")).select(
        F.col("s.item").alias("item"), F.col("s.count").alias("cnt")
    )
    return flat.orderBy(F.col("cnt").desc(), "item")
