"""Extras batch 13 module (r05 continuation): grouping_id bitmasks, epoch
conversions, last-touch attribution, Hive-style LATERAL VIEW, and textual
join hints.

SURVEY §2 families extended: §2.D (grouping() / grouping-id bitmask over
GROUPING SETS), §2.H (epoch seconds/millis round-trip), §2.M (marketing
attribution — the as-of join specialized with a channel dimension and a
lookback horizon), §2.M (LATERAL VIEW OUTER textual generator syntax),
§2.C (per-join hint surface: BROADCAST + SHUFFLE_MERGE, plan-pinned).

Determinism discipline (SURVEY §5.3): epoch math is integer (session tz
pinned UTC by engine.session.tune, naive timestamps); attribution picks
carry the (ts, event_id) total-order tie-break; grouping masks are exact
integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load


@query(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           CAST(grouping(o_orderstatus) AS INT) AS g_st,
           CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
                AS INT) AS gid,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS rev
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping() indicator columns and the grouping-id bitmask over
    explicit GROUPING SETS — the disambiguation machinery that lets a
    consumer tell a real NULL key from a subtotal row (the companion to
    agg_rollup/agg_cube/agg_grouping_sets, which pinned the set algebra;
    this key pins the indicator surface). The bitmask is spelled
    grouping(a)*2 + grouping(b) on both sides because the engines'
    native GROUPING_ID bit orders differ while grouping() is standard.

    Plan: one Expand (×4 grouping sets) feeding a single partial+final
    hash aggregate — same single-shuffle profile as a plain group-by at
    4× the pre-aggregation row count."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gid_src")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               CAST(grouping(o_orderstatus) AS INT) AS g_st,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
                    AS INT) AS gid,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS rev
        FROM orders_gid_src
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "fn_unix_epoch",
    oracle="""
    SELECT o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS epoch_ms,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS rendered,
           CAST(epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01')
                AS BIGINT) // 86400 AS days_since_95
    FROM orders WHERE o_orderkey % 30 = 0
    """,
)
def fn_unix_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch conversions: seconds and milliseconds since the Unix epoch,
    a formatted render, and day arithmetic on the epoch numbers — the
    serialization surface every event pipeline crosses. Valid because the
    corpus is timezone-naive and the session timezone is pinned UTC
    (engine.session.tune), so 'wall time' and 'epoch time' agree in both
    engines.

    Plan: row-local codegen over a pruned scan, modulo filter pushed,
    zero shuffle. Integer arithmetic end-to-end."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 30 == 0)
    ts = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.unix_timestamp(ts).alias("epoch_s"),
        (F.unix_timestamp(ts) * 1000).alias("epoch_ms"),
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("rendered"),
        (
            (
                F.unix_timestamp(ts)
                - F.unix_timestamp(F.lit("1995-01-01").cast("timestamp"))
            )
            / 86400
        )
        .cast("bigint")
        .alias("days_since_95"),
    )


@query(
    "etl_attribution_last_touch",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, ts AS touch_ts, event_id AS touch_id, event_type AS channel
      FROM events WHERE event_type IN ('click', 'view')
    ),
    cand AS (
      SELECT p.event_id, p.user_id, p.ts, t.channel, t.touch_ts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY t.touch_ts DESC, t.touch_id DESC)
               AS rn
      FROM purchases p
      JOIN touches t
        ON p.user_id = t.user_id
       AND t.touch_ts <= p.ts
       AND t.touch_ts > p.ts - INTERVAL 24 HOURS
    )
    SELECT p.event_id, p.user_id, p.ts, c.channel, c.touch_ts
    FROM purchases p
    LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c ON p.event_id = c.event_id
    """,
)
def etl_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    most recent click/view by the same user within a 24-hour lookback
    (ties broken by event_id; purchases with no touch keep NULL channel).
    The as-of join specialized with a channel dimension and horizon — the
    attribution query every growth team runs.

    Plan: equi-join on user_id with the time band as a residual, then the
    per-purchase argmax collapses via max_by partial aggregation (no
    row_number sort buffer on the Spark side — the oracle spells it with
    a window because DuckDB lacks struct-ordered max_by). The 24 h
    horizon bounds candidates per purchase, so the join output is
    O(purchases × touches-per-day), not O(n²); at 100 TB pre-bucketing
    both sides by (user_id, day) keeps the band join co-located."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("touch_ts"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
    )
    cand = purchases.join(
        touches,
        (purchases["user_id"] == touches["t_user"])
        & (touches["touch_ts"] <= purchases["ts"])
        & (touches["touch_ts"] > purchases["ts"] - F.expr("INTERVAL 24 HOURS")),
    )
    att = cand.groupBy("event_id").agg(
        F.max_by(
            F.struct("channel", "touch_ts"), F.struct("touch_ts", "touch_id")
        ).alias("pick")
    )
    return purchases.join(att, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.col("pick.channel").alias("channel"),
        F.col("pick.touch_ts").alias("touch_ts"),
    )


@query(
    "sql_lateral_view",
    # the UNION ALL branch states OUTER's contract: a NULL token array
    # still emits one (NULL, NULL) row — DuckDB's unnest(NULL) emits
    # nothing, so the oracle adds the row explicitly (r12 NULL-text parity)
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1
                AS INT) AS pos,
           unnest(string_split(text, ' ')) AS tok
    FROM documents WHERE doc_id % 25 = 0 AND text IS NOT NULL
    UNION ALL
    SELECT doc_id, CAST(NULL AS INT) AS pos, CAST(NULL AS VARCHAR) AS tok
    FROM documents WHERE doc_id % 25 = 0 AND text IS NULL
    """,
)
def sql_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style LATERAL VIEW OUTER posexplode — the textual generator
    syntax (the API twin is the §2.H explode family): one row per token
    with its position. OUTER keeps empty-array rows (none in this corpus,
    but the clause is the surface under test).

    Plan: Generate node inside codegen, zero shuffle, filter pushed below
    the generator to the scan."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_lv_src")
    return spark.sql(
        """
        SELECT doc_id, CAST(pos AS INT) AS pos, tok
        FROM docs_lv_src
        LATERAL VIEW OUTER posexplode(split(text, ' ')) t AS pos, tok
        WHERE doc_id % 25 = 0
        """
    )


@query(
    "sql_join_hints",
    oracle="""
    SELECT n.n_name, count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS rev
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def sql_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-join hint surface: /*+ BROADCAST(n), SHUFFLE_MERGE(c) */ forces
    the nation join to broadcast AND the customer join to sort-merge in
    one statement — result content identical to the unhinted query (the
    oracle), while the physical plan must show BOTH strategies
    (plan-pinned in tests). Hints are the manual override when statistics
    mislead the optimizer — the 100 TB escape hatch for mis-estimated
    dimension sizes.

    Plan: BroadcastHashJoin(nation) + SortMergeJoin(customer) + one
    aggregate shuffle."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("o_hint_src")
    load(spark, sf_dir, "customer").createOrReplaceTempView("c_hint_src")
    load(spark, sf_dir, "nation").createOrReplaceTempView("n_hint_src")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n), SHUFFLE_MERGE(c) */
               n.n_name, count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS rev
        FROM o_hint_src o
        JOIN c_hint_src c ON o.o_custkey = c.c_custkey
        JOIN n_hint_src n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
