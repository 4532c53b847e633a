"""Extras batch 19 module (r05 continuation): the optimizer-infrastructure
surfaces — dynamic partition pruning, catalog statistics via ANALYZE, and
shuffle-exchange reuse.

SURVEY §2 families extended: §4's optimizer story gains three first-class,
plan-pinned demonstrations (until now DPP/stats/exchange-reuse were only
design notes): §2.C (DPP — the star-join accelerator), §2.A+§4 (ANALYZE
TABLE statistics feeding the CBO), §2.D+§4 (one shuffle reused by two
consumers via ReusedExchange).

Determinism discipline (SURVEY §5.3): stats values are integers (row
counts); the DPP and reuse keys return plain relational results whose
oracles recompute from source — the OPTIMIZATION is asserted by plan pins
in tests, the VALUES by the driver hash.
"""

from __future__ import annotations

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag


@query(
    "join_dynamic_partition_prune",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n, round(sum(o.o_totalprice), 2) AS rev
    FROM orders o
    JOIN (VALUES ('1-URGENT', 'expedite'), ('2-HIGH', 'expedite'),
                 ('3-MEDIUM', 'standard'), ('4-NOT SPECIFIED', 'standard'),
                 ('5-LOW', 'standard'))
         AS dim(prio, tier)
      ON o.o_orderpriority = dim.prio
    WHERE dim.tier = 'expedite'
    GROUP BY o.o_orderpriority
    """,
)
def join_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is laid out partitioned
    by the join key (o_orderpriority directories), the dimension side
    carries a selective filter (tier = 'expedite' → 2 of 5 priorities),
    and the optimizer injects the dim's surviving keys as a RUNTIME
    partition filter on the fact scan — only 2 of 5 directories are
    read, though the query text never names them. The plan pin (tests)
    asserts `dynamicpruning` inside the fact scan's PartitionFilters.

    Trigger subtlety (measured in this build): DPP's selective-predicate
    detector requires a COMPARISON on the dim (tier = 'expedite'); a
    bare boolean column filter (WHERE d.expedite) is NOT considered
    selective and no pruning subquery is inserted — model dims with
    attribute equality, not pre-computed flags.

    100 TB: DPP is THE star-schema accelerator — a date-dim filter like
    `d_year = 2025` prunes a decade of fact partitions at runtime,
    without the user copying the filter onto the fact table. Requires
    (a) fact partitioned on the join key, (b) broadcastable dim;
    both are layout decisions this repo's sink keys demonstrate."""
    base = scratch_dir(prefix=f"sg-dpp-{sftag(sf_dir)}-")
    o = load(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(base)
    # explicit schema: no inference pass, robust to a zero-row write
    fact = spark.read.schema(o.schema).parquet(base)
    dim = spark.createDataFrame(
        [
            ("1-URGENT", "expedite"),
            ("2-HIGH", "expedite"),
            ("3-MEDIUM", "standard"),
            ("4-NOT SPECIFIED", "standard"),
            ("5-LOW", "standard"),
        ],
        "prio string, tier string",
    )
    return (
        fact.join(
            F.broadcast(dim.filter(F.col("tier") == "expedite")),
            fact["o_orderpriority"] == F.col("prio"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )


@query(
    "plan_analyze_stats",
    oracle="""
    SELECT count(*) AS n_rows_actual,
           count(*) AS n_rows_stat,
           TRUE AS stats_row_count_exact,
           TRUE AS has_size_bytes
    FROM orders
    """,
)
def plan_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog statistics: CTAS a managed table, run `ANALYZE TABLE ...
    COMPUTE STATISTICS`, and read the recorded stats back out of the
    catalog (DESCRIBE EXTENDED's Statistics line). The output proves the
    analyzer's row count equals the actual count and a byte size was
    recorded — the numbers the cost-based optimizer uses for join
    reordering and broadcast decisions.

    The DESCRIBE parse is a driver-side collect of TABLE METADATA (a few
    dozen rows), not data — bounded at any scale. 100 TB: ANALYZE after
    every large load is what turns the CBO on in practice; without stats
    Spark falls back to size-on-disk heuristics, which mis-rank
    compressed/filtered relations. Column-level stats (ndv, min/max) add
    selectivity estimates — same statement with FOR COLUMNS."""
    tag = sftag(sf_dir)
    tbl = f"sg_stats_orders_{tag}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(f"sg_stats_src_{tag}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
    spark.sql(
        f"CREATE TABLE {tbl} USING parquet AS SELECT * FROM sg_stats_src_{tag}"
    )
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
    stats_line = next(r["data_type"] for r in desc if r["col_name"] == "Statistics")
    # format: "<bytes> bytes, <rows> rows"
    parts = stats_line.replace(",", "").split()
    size_bytes = int(parts[0])
    n_stat = int(parts[parts.index("rows") - 1])
    actual = spark.table(tbl).count()
    return spark.createDataFrame(
        [(actual, n_stat, n_stat == actual, size_bytes > 0)],
        "n_rows_actual long, n_rows_stat long, "
        "stats_row_count_exact boolean, has_size_bytes boolean",
    )


@query(
    "plan_exchange_reuse",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, n,
           CAST(count(*) OVER (PARTITION BY n) AS BIGINT) AS peers
    FROM per_cust
    """,
)
def plan_exchange_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-exchange reuse: the per-customer order count feeds TWO
    consumers — the output rows themselves and a per-count group size
    (how many customers share your order count) joined back on. Both
    consumers need the same aggregated subtree; Catalyst plans it ONCE
    and the second reference becomes a ReusedExchange node (plan-pinned
    in tests) — the shuffle's map output is read twice, the aggregation
    work is never repeated.

    The oracle expresses the identical semantics as a window over the
    CTE — one relation, counted two ways. 100 TB: exchange reuse is why
    expressing self-referential analytics as a self-join of ONE
    DataFrame object (not two separately-built plans) matters: identical
    subtrees deduplicate only when they're structurally equal."""
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    sizes = per_cust.groupBy("n").agg(F.count(F.lit(1)).alias("peers"))
    return per_cust.join(sizes, "n").select("o_custkey", "n", "peers")
