"""Extras batch 25 module (r05 continuation): weekday seasonality index,
one-pass multi-sink fanout, new-vs-returning decomposition, and
time-weighted averaging.

SURVEY §2 families extended: §2.D (seasonal index — the ratio-to-overall
normalization behind staffing/capacity curves; new-vs-returning — the
growth-accounting split every product dashboard leads with), §2.A (one
scan fanned out to two sinks via an explicit persist), §2.E (TWAP — the
duration-weighted mean that de-biases irregular sampling).

Determinism discipline (SURVEY §5.3): seasonal indices divide two
pre-rounded aggregates; first-seen derivation uses min(ts) with exact
timestamp equality; TWAP weights are exact integer epoch differences and
the division is rounded once.
"""

from __future__ import annotations

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load, sftag


@query(
    "agg_seasonality_index",
    oracle="""
    WITH per_dow AS (
      SELECT isodow(ts) - 1 AS dow, count(*) AS cnt
      FROM events GROUP BY 1
    ),
    tot AS (SELECT sum(cnt) AS n, count(*) AS days FROM per_dow)
    SELECT p.dow, p.cnt,
           round(CAST(p.cnt AS DOUBLE) / (t.n / CAST(t.days AS DOUBLE)), 4)
             AS seasonal_index
    FROM per_dow p, tot t
    """,
)
def agg_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality index: each weekday's event count divided by
    the mean weekday count — index > 1 means a busier-than-average day.
    The normalization behind staffing curves, capacity planning, and
    seasonal adjustment of any daily metric (divide a day's value by its
    index to de-season it). Weekday normalized 0=Monday (the
    engine-neutral convention).

    Plan: the fact table collapses to ≤7 rows in one partial-agg
    shuffle; the global mean is a 1-row broadcast back onto those 7.
    100 TB: identical two-step shape — the index relation stays
    calendar-bounded no matter the volume."""
    e = load(spark, sf_dir, "events")
    per = e.groupBy(F.weekday("ts").alias("dow")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = per.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("days")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "dow",
        "cnt",
        F.round(
            F.col("cnt").cast("double")
            / (F.col("n") / F.col("days").cast("double")),
            4,
        ).alias("seasonal_index"),
    )


@query(
    "etl_multi_sink_fanout",
    oracle="""
    SELECT 'csv' AS sink, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT 'parquet', count(*), round(sum(o_totalprice), 2)
    FROM orders WHERE o_orderstatus = 'O'
    ORDER BY sink
    """,
)
def etl_multi_sink_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass multi-sink fanout: the filtered relation is persisted
    ONCE and written to two sinks (parquet for downstream jobs, CSV for
    the legacy consumer) — then both sinks are read back and audited
    against each other. Without the explicit persist, each `.write`
    re-plans and re-SCANS the source: two sinks = two full scans; with
    it, the second write reads the materialized partitions.

    100 TB: the fanout pattern for serving the same curated slice to
    heterogeneous consumers — persist (or checkpoint to a staging table)
    before the first sink, and size StorageLevel to MEMORY_AND_DISK so
    wide slices spill instead of failing. The audit (counts + sums per
    sink) is the cheap invariant that catches a half-written sink."""
    from pyspark import StorageLevel

    base = scratch_dir(prefix=f"sg-fanout-{sftag(sf_dir)}-")
    sl = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        sl.write.mode("overwrite").parquet(f"{base}/pq")
        sl.write.mode("overwrite").option("header", "true").csv(f"{base}/csv")
    finally:
        sl.unpersist()
    pq = spark.read.parquet(f"{base}/pq")
    cs = spark.read.schema("o_orderkey long, o_totalprice double").option(
        "header", "true"
    ).csv(f"{base}/csv")
    return (
        cs.agg(
            F.lit("csv").alias("sink"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .unionByName(
            pq.agg(
                F.lit("parquet").alias("sink"),
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
        )
        .orderBy("sink")
    )


@query(
    "agg_new_vs_returning",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    ),
    tagged AS (
      SELECT CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS day,
             e.user_id,
             (date_trunc('day', e.ts) = date_trunc('day', f.first_ts))
               AS is_new_user
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT day,
           CAST(count(DISTINCT CASE WHEN is_new_user THEN user_id END)
                AS BIGINT) AS new_users,
           CAST(count(DISTINCT CASE WHEN NOT is_new_user THEN user_id END)
                AS BIGINT) AS returning_users
    FROM tagged GROUP BY day
    """,
)
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning decomposition: per day, distinct users whose
    FIRST-ever event falls on that day vs distinct users seen before —
    the growth-accounting split (is traffic growth acquisition or
    retention?). A user active on their first day counts as new that day
    and returning on every later active day.

    Plan: one shuffle derives first_seen (user-grain, partial-agg min),
    joined back on user_id (user-grain broadcast at small scale, hash
    join at large), then one conditional distinct-count per day. 100 TB:
    first_seen is the incrementally-maintainable relation (min is
    monotone under appends — merge new days in, never recompute
    history); the daily aggregate reads it, not the full history."""
    e = load(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    tagged = e.join(first, "user_id").select(
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
        (
            F.date_trunc("day", "ts") == F.date_trunc("day", "first_ts")
        ).alias("is_new_user"),
    )
    return tagged.groupBy("day").agg(
        F.countDistinct(
            F.when(F.col("is_new_user"), F.col("user_id"))
        ).alias("new_users"),
        F.countDistinct(
            F.when(~F.col("is_new_user"), F.col("user_id"))
        ).alias("returning_users"),
    )


@query(
    "win_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, value,
             CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT)
               AS dur_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(dur_us) AS BIGINT) AS n_segments,
           CAST(sum(dur_us) AS BIGINT) AS total_us,
           round(sum(value * dur_us) / sum(dur_us), 4) AS twap
    FROM seg
    WHERE dur_us IS NOT NULL
    GROUP BY user_id
    HAVING sum(dur_us) > 0
    """,
)
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation holds until the
    next one, so its weight is the exact microsecond duration to the
    next event — the estimator that de-biases irregular sampling (a
    value held for 6 hours counts 6×60× more than one held a minute; the
    naive mean treats them equally). Per user: segment count, total held
    time, and the duration-weighted mean.

    Determinism: weights are exact INTEGER epoch-microsecond differences
    (lead over a (ts, event_id) total order); the single division is
    rounded once. Plan: one user-keyed shuffle serves the lead window
    and the aggregate. 100 TB: the standard irregular-time-series
    reduction — linear, one shuffle, O(1) window state."""
    e = load(spark, sf_dir, "events").withColumn(
        # unix_micros needs a zoned timestamp; session tz is pinned UTC so
        # the ntz -> timestamp cast is value-preserving
        "ts", F.col("ts").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("dur_us").cast("long").alias("n_segments"),
            F.sum("dur_us").cast("long").alias("total_us"),
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 4
            ).alias("twap"),
        )
        .filter(F.col("total_us") > 0)
    )
