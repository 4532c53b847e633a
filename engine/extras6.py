"""Extras batch 6 (r05): statistical anomaly detection, multiline-quoted
CSV ingest, and bitmap-based exact distinct aggregation.

Three unrelated surfaces a reference-parity engine still owed:
- z-score outlier detection over time-bucketed counts (the ops-monitoring
  shape: deviation from a per-series baseline computed in the same pass);
- the CSV corner every production ingest eventually hits — quoted fields
  containing embedded newlines and quote characters (multiLine parse);
- Spark's bitmap aggregate family (3.5+): exact COUNT DISTINCT as a
  two-level mergeable bitmap rollup — the exact-answer sibling of the HLL
  sketch keys, with state O(domain/8 bits) instead of O(domain) hashes.
"""

from __future__ import annotations

import os

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag


@query(
    "win_anomaly_zscore",
    oracle="""
    WITH h AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hr,
                      count(*) AS c
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, CAST(sum(c) AS DOUBLE) AS s1,
                 CAST(sum(c * c) AS DOUBLE) AS s2,
                 CAST(count(*) AS DOUBLE) AS n
          FROM h GROUP BY 1)
    SELECT h.event_type, h.hr AS hour_start, h.c AS cnt,
           round((h.c - s.s1 / s.n)
                 / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)), 4) AS z
    FROM h JOIN s ON h.event_type = s.event_type
    WHERE abs((h.c - s.s1 / s.n)
              / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n))) > 2
    """,
)
def win_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-count anomalies per event type: hours whose count is more
    than 2 population standard deviations from that type's mean. The
    moments are computed from EXACT integer sums (Σc, Σc², n) and only
    then combined in identical double expressions on both engines —
    never via the engines' own stddev aggregates, whose internal
    update algorithms (Welford vs textbook) differ below the ulp.
    sqrt is IEEE-correctly-rounded, so z is bit-comparable; rounded to
    4 dp at the boundary for the |z| > 2 cut. 138 anomalous hours at
    sf0.01.

    100 TB: two cascaded aggs (hour×type, then type) + a broadcast join
    of the per-type moments back onto the hourly relation — no window
    sort anywhere; the baseline table is O(|types|)."""
    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count("*").alias("cnt"))
    s = h.groupBy("event_type").agg(
        F.sum("cnt").cast("double").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("double").alias("s2"),
        F.count("*").cast("double").alias("n"),
    )
    mean = F.col("s1") / F.col("n")
    # nullif: a single-hour type has zero variance — its z is NULL on
    # both engines (the oracle's x / 0.0 is NULL in DuckDB) and the
    # |z| > 2 cut drops it, instead of an ANSI divide-by-zero error
    z = (F.col("cnt") - mean) / F.nullif(
        F.sqrt(F.col("s2") / F.col("n") - mean * mean), F.lit(0.0)
    )
    return (
        h.join(F.broadcast(s), "event_type")
        .filter(F.abs(z) > 2)
        .select("event_type", "hour_start", "cnt", F.round(z, 4).alias("z"))
    )


@query(
    "scan_csv_multiline_quoted",
    oracle="""
    SELECT doc_id,
           lang || chr(10) || substr(text, 1, 40) || '"q"' AS payload,
           CAST(1 + length(lang || chr(10) || substr(text, 1, 40) || '"q"')
                  - length(replace(
                      lang || chr(10) || substr(text, 1, 40) || '"q"',
                      chr(10), '')) AS INT) AS n_lines
    FROM documents
    """,
)
def scan_csv_multiline_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip with embedded newlines AND embedded quotes inside a
    quoted field — the multiLine parse path (scan_csv_roundtrip covers
    the plain path, scan_csv_malformed the corrupt-row path; this is the
    third CSV contract: a record spanning physical lines). A payload with
    a real LF and a double-quoted substring is written by Spark's CSV
    sink (quote-escaping applied) and read back with multiLine=true +
    matching escape; the oracle recomputes the payload directly, so any
    write- or read-side mangling (naive line splitting, double-escaping)
    breaks the hash.

    100 TB caveat (documented trade-off): multiLine CSV files are NOT
    splittable — each file parses as one unit because record boundaries
    can't be found mid-file. Keep files small at the sink (this writer
    emits one shard per input partition) or land multiline data as
    parquet instead."""
    d = load(spark, sf_dir, "documents")
    payload = F.concat(
        F.col("lang"), F.lit("\n"), F.substring("text", 1, 40), F.lit('"q"')
    )
    src = d.select("doc_id", payload.alias("payload"))
    out = os.path.join(
        scratch_dir(prefix=f"sg-csvml-{sftag(sf_dir)}-"), "data"
    )
    src.write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(out)
    back = (
        spark.read.schema("doc_id long, payload string")
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(out)
    )
    n_lines = (
        1
        + F.length("payload")
        - F.length(F.regexp_replace("payload", "\n", ""))
    ).cast("int")
    return back.select("doc_id", "payload", n_lines.alias("n_lines"))


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY 1
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT DISTINCT via Spark's bitmap aggregate family: keys
    bucketed by bitmap_bucket_number, per-(group, bucket) bitmaps built
    with bitmap_construct_agg(bitmap_bit_position(key)), then per-group
    distinct = Σ bitmap_count — the exact-answer, mergeable alternative
    to approx HLL (agg_hll_sketch_merge) when the key domain is dense
    integers. Oracle is the plain COUNT(DISTINCT).

    100 TB: both levels partial-aggregate map-side (bitmap OR is
    associative+commutative); state per group is |domain|/32768 bitmaps
    of 4 KB — for a 1.5B-customer domain that is ~180 MB per group worst
    case, so this shape suits dense-domain groups; sparse domains go to
    HLL. The two-level split keeps any single bitmap bounded regardless
    of key spread."""
    o = load(spark, sf_dir, "orders")
    inner = o.groupBy(
        "o_orderpriority",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias(
            "bm"
        )
    )
    return inner.groupBy("o_orderpriority").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_customers")
    )


@query(
    "agg_ks_drift",
    oracle="""
    WITH v AS (SELECT value,
                      CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS i1,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i2
               FROM events WHERE event_type IN ('view', 'purchase')),
    g AS (SELECT value, CAST(sum(i1) AS BIGINT) AS c1,
                 CAST(sum(i2) AS BIGINT) AS c2
          FROM v GROUP BY 1),
    c AS (SELECT sum(c1) OVER (ORDER BY value) AS cum1,
                 sum(c2) OVER (ORDER BY value) AS cum2
          FROM g),
    n AS (SELECT CAST(sum(c1) AS DOUBLE) AS n1,
                 CAST(sum(c2) AS DOUBLE) AS n2 FROM g)
    SELECT CAST((SELECT n1 FROM n) AS BIGINT) AS n_view,
           CAST((SELECT n2 FROM n) AS BIGINT) AS n_purchase,
           max(abs(CAST(cum1 AS DOUBLE) / (SELECT n1 FROM n)
                   - CAST(cum2 AS DOUBLE) / (SELECT n2 FROM n))) AS d_stat
    FROM c
    """,
)
def agg_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the value
    distributions of 'view' and 'purchase' events: D = max |F₁(v) − F₂(v)|
    over the pooled support — the standard drift test between two corpus
    snapshots or two pipeline stages. Computed from EXACT per-value integer
    counts and cumulative sums; the divisions and the max are then
    bit-identical across engines, so D needs no rounding.

    100 TB: the per-value agg collapses the stream first; the cumulative
    window then runs over |distinct values| rows. That window is a single
    global sort here (documented local-scale shortcut) — at scale,
    range-partition by value and carry per-partition offset sums (the
    standard distributed prefix-sum), or bin values to a fixed grid first
    (KS on quantized support bounds the error by the bin width)."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    g = e.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "c2"
        ),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        F.sum("c1").over(w).alias("cum1"), F.sum("c2").over(w).alias("cum2")
    )
    n = g.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
    )
    return (
        c.join(F.broadcast(n))
        .agg(
            F.min("n1").cast("bigint").alias("n_view"),
            F.min("n2").cast("bigint").alias("n_purchase"),
            F.max(
                F.abs(
                    F.col("cum1").cast("double") / F.col("n1")
                    - F.col("cum2").cast("double") / F.col("n2")
                )
            ).alias("d_stat"),
        )
    )


@query(
    "etl_validate_fk_staging",
    oracle="""
    WITH staging AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 1000000
                  ELSE o_custkey END AS o_custkey
      FROM orders),
    fk1 AS (SELECT count(*) AS n_total,
                   CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violations
            FROM staging s LEFT JOIN customer c ON s.o_custkey = c.c_custkey),
    fk2 AS (SELECT count(*) AS n_total,
                   CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violations
            FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT 'staging_orders->customer' AS fk, n_total, n_violations FROM fk1
    UNION ALL
    SELECT 'lineitem->orders' AS fk, n_total, n_violations FROM fk2
    """,
)
def etl_validate_fk_staging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity gate before a merge: an incoming staging batch
    (orders with a deterministic 1-in-97 corrupted customer key, standing
    in for a CDC feed with upstream damage) is audited against the
    customer dimension, alongside the steady-state lineitem→orders check
    (expected 0). The per-FK violation counts are what a pipeline asserts
    on before letting etl_merge_cdc touch the warehouse — one nonzero and
    one zero row, so both the detecting and the passing path are
    exercised (no vacuous all-zeros audit).

    100 TB: each check is one left join probing a dimension (broadcast
    when small, shuffled hash otherwise) aggregated to two numbers —
    audit cost is one pass per FK, and the checks are independent jobs
    that can share the staging scan."""
    o = load(spark, sf_dir, "orders")
    staging = o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.col("o_custkey") + 1000000
        ).otherwise(F.col("o_custkey")).alias("o_custkey"),
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    fk1 = staging.join(
        F.broadcast(cust), staging.o_custkey == cust.c_custkey, "left"
    ).agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias(
            "n_violations"
        ),
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    ok = o.select("o_orderkey")
    fk2 = li.join(ok, li.l_orderkey == ok.o_orderkey, "left").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "n_violations"
        ),
    )
    return fk1.select(
        F.lit("staging_orders->customer").alias("fk"), "n_total", "n_violations"
    ).unionAll(
        fk2.select(F.lit("lineitem->orders").alias("fk"), "n_total", "n_violations")
    )


@query(
    "etl_conversion_latency",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS view_ts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'purchase' AND e.ts > v.view_ts
          GROUP BY e.user_id),
    lat AS (SELECT epoch(p.purchase_ts - v.view_ts) AS s
            FROM v JOIN p ON v.user_id = p.user_id)
    SELECT count(*) AS n_converted,
           round(min(s), 1) AS min_s,
           round(quantile_cont(s, 0.5), 4) AS median_s,
           round(quantile_cont(s, 0.9), 4) AS p90_s,
           round(avg(s), 1) AS avg_s
    FROM lat
    """,
)
def etl_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, seconds from first 'view'
    to the first 'purchase' AFTER it (the funnel's latency companion —
    etl_funnel_stages reports WHO converts, this reports HOW FAST),
    summarized as count / min / exact median / p90 / mean. Exact
    interpolated percentiles (agg_percentile's discipline), aggregate
    rounding on both engines.

    100 TB: two min-aggregations keyed on user collapse the stream before
    any join; the summary is a single global agg over |converted users|
    rows. Exact percentiles sort that one column — switch to
    percentile_approx past memory, as agg_percentile documents."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    lat = v.join(p, "user_id").select(
        (
            (
                F.unix_micros(F.col("purchase_ts").cast("timestamp"))
                - F.unix_micros(F.col("view_ts").cast("timestamp"))
            )
            / 1e6
        ).alias("s")
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.round(F.min("s"), 1).alias("min_s"),
        F.round(F.percentile("s", 0.5), 4).alias("median_s"),
        F.round(F.percentile("s", 0.9), 4).alias("p90_s"),
        F.round(F.avg("s"), 1).alias("avg_s"),
    )
