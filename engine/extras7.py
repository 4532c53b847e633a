"""Extras batch 7 (r05 continuation): cohort retention, OHLC resampling,
2-D histograms, embedding outlier audit, date-spine TVF SQL, binary
encode/decode roundtrip, and deterministic contrastive negative sampling.

SURVEY §2 families extended: §2.M (retention, OHLC, date spine), §2.D
(2-D histogram), §2.L (embedding outlier audit, negative pairs), §2.H
(base64/hex binary codec surface).

Determinism discipline (SURVEY §5.3): every order-dependent float sum is
rounded on both sides; argmax/first-last picks always carry an explicit
total-order tie-break (ts, event_id) / (dist, vec_id); "random" choices are
hash-deterministic (md5 over the pair key), never rand().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load


@query(
    "etl_retention_cohort",
    oracle="""
    WITH cohort AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             CAST(date_diff('day', c.cohort_week,
                            date_trunc('week', e.ts)) // 7 AS INT)
               AS week_offset
      FROM events e JOIN cohort c ON e.user_id = c.user_id
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
           count(*) AS n_users
    FROM activity GROUP BY 1, 2
    """,
)
def etl_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by the week of their
    first event; n_users counts how many of each cohort were active k weeks
    later. The classic product-analytics triangle.

    Plan: one shuffle on user_id computes the cohort via a window min (no
    self-join — the per-user first-event week rides the same exchange the
    distinct needs), then a distinct + count on the bounded
    (cohort_week, week_offset) grid. 100 TB: the user_id shuffle is the
    only fact-sized exchange; the output grid is O(weeks²) regardless of
    row count, and the distinct collapses map-side per user partition."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    wk = F.date_trunc("week", F.col("ts"))
    cohort = F.date_trunc("week", F.min("ts").over(w))
    return (
        e.select(
            "user_id",
            cohort.cast("timestamp_ntz").alias("cohort_week"),
            (F.datediff(wk, cohort) / 7).cast("int").alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "etl_ohlc_resample",
    oracle="""
    SELECT event_type, date_trunc('hour', ts) AS bucket,
           first(value ORDER BY ts, event_id, value) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY ts, event_id, value) AS close,
           count(*) AS n,
           round(sum(value), 4) AS volume
    FROM events
    GROUP BY 1, 2
    """,
)
def etl_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to hourly OHLC bars per event_type —
    open/close are the first/last values in (ts, event_id, value) order.
    The event_id tie-break makes equal-timestamp buckets deterministic;
    the trailing value term keeps the order TOTAL even when an event_id
    collides at the identical timestamp with a different payload (r14
    dup-id axis: a replayed id at the same microsecond made open/close
    an arbitrary pick on both engines). High/low are plain min/max,
    volume is the rounded sum.

    Plan: single hash shuffle on (event_type, hour). min_by/max_by over a
    (ts, event_id) struct are associative — Spark computes them with
    map-side partial aggregation, so per-group state is one (ord, value)
    pair, never a sorted buffer. At 100 TB the output is bounded by
    types × hours, not event count."""
    e = load(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    ord_ = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return e.groupBy("event_type", bucket.alias("bucket")).agg(
        F.min_by("value", ord_).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ord_).alias("close"),
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("volume"),
    )


@query(
    "agg_histogram_2d",
    oracle="""
    SELECT CAST(hour(ts) AS INT) AS hr,
           CAST(least(floor(value / 50), 9) AS INT) AS vbucket,
           count(*) AS n,
           round(sum(value), 4) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (heatmap aggregation): hour-of-day × value bucket
    (50-wide bins, top bin clamped) with count and rounded mass per cell.
    The workhorse behind density heatmaps and drift dashboards.

    Plan: pure groupBy on two derived low-cardinality keys — 24×10 output
    cells — so partial aggregation collapses nearly everything map-side;
    the shuffle moves ≤ 240 rows per task at any scale."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.hour("ts").cast("int").alias("hr"),
            F.least(F.floor(F.col("value") / 50), F.lit(9))
            .cast("int")
            .alias("vbucket"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
    )


@query(
    "emb_outlier_distance",
    oracle="""
    WITH dims AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS dim,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings
    ),
    cent AS (
      SELECT label, dim, round(avg(x), 6) AS c
      FROM dims GROUP BY label, dim
    ),
    dist AS (
      SELECT d.vec_id, d.label,
             round(sqrt(sum((d.x - cent.c) * (d.x - cent.c))), 3) AS dist
      FROM dims d JOIN cent ON d.label = cent.label AND d.dim = cent.dim
      GROUP BY d.vec_id, d.label
    )
    SELECT label,
           count(*) AS n,
           round(avg(dist), 3) AS avg_dist,
           round(max(dist), 3) AS max_dist,
           first(vec_id ORDER BY dist DESC, vec_id DESC) AS farthest_vec
    FROM dist GROUP BY label
    """,
)
def emb_outlier_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outlier audit (mislabel detection): distance of
    every vector to its own label centroid, summarized per label with the
    farthest vector identified (tie-break on vec_id). Vectors far from
    their class centroid are label-noise candidates — the curation pass
    that precedes SemDeDup-style pruning.

    Plan: centroids via posexplode + avg — one shuffle keyed
    (label, dim), output bounded at labels × dims. Distances re-use the
    same exploded relation joined to the broadcast-sized centroid table
    (labels × dims rows — KB at any corpus scale), then one shuffle keyed
    vec_id for the per-vector sum and one keyed label for the summary.
    Both engines round the centroid to 6 before the distance and the
    distance to 3 before the summary, so cross-engine float-association
    noise (~1e-15) cannot flip any reported digit."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "xf"),
    ).withColumn("x", F.col("xf").cast("double"))
    cent = dims.groupBy("label", "dim").agg(F.round(F.avg("x"), 6).alias("c"))
    dist = (
        dims.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))),
                3,
            ).alias("dist")
        )
    )
    return dist.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg("dist"), 3).alias("avg_dist"),
        F.round(F.max("dist"), 3).alias("max_dist"),
        F.max_by("vec_id", F.struct("dist", "vec_id")).alias("farthest_vec"),
    )


@query(
    "sql_tvf_date_spine",
    oracle="""
    WITH spine AS (
      SELECT CAST(DATE '1995-01-01' + CAST(i AS INT) AS TIMESTAMP) AS d
      FROM range(92) t(i)
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             count(*) AS cnt,
             round(sum(o_totalprice), 2) AS rev
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-04-03'
      GROUP BY 1
    )
    SELECT spine.d,
           coalesce(daily.cnt, 0) AS n_orders,
           coalesce(daily.rev, 0.0) AS revenue
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
)
def sql_tvf_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill via the range() table-valued function in SQL:
    generate a contiguous 92-day calendar with `FROM range(92)`, left-join
    daily order aggregates onto it, zero-fill the gaps. The canonical
    "report every day even if empty" pattern, expressed textually so the
    TVF-in-FROM surface is exercised.

    Plan: range() is a leaf that parallelizes by slicing the id space (no
    data read); the daily aggregate prunes to the 92-day window at the
    parquet scan (pushed filter) before one small shuffle; the spine side
    is 92 rows, so AQE turns the join into a broadcast on a cluster."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_spine_src")
    return spark.sql(
        """
        WITH spine AS (
          SELECT CAST(date_add(DATE '1995-01-01', CAST(id AS INT))
                      AS TIMESTAMP_NTZ) AS d
          FROM range(92)
        ),
        daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 count(*) AS cnt,
                 round(sum(o_totalprice), 2) AS rev
          FROM orders_spine_src
          WHERE o_orderdate >= TIMESTAMP_NTZ '1995-01-01'
            AND o_orderdate < TIMESTAMP_NTZ '1995-04-03'
          GROUP BY 1
        )
        SELECT spine.d,
               coalesce(daily.cnt, 0L) AS n_orders,
               coalesce(daily.rev, 0.0D) AS revenue
        FROM spine LEFT JOIN daily ON spine.d = daily.d
        """
    )


@query(
    "fn_binary_base64",
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 24))) AS b64,
           hex(encode(substr(text, 1, 24))) AS hx,
           CAST(octet_length(encode(substr(text, 1, 24))) AS INT) AS nbytes,
           (decode(from_base64(to_base64(encode(substr(text, 1, 24)))))
              = substr(text, 1, 24)) AS b64_roundtrip
    FROM documents
    WHERE doc_id % 7 = 0
    """,
)
def fn_binary_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec surface: base64 / hex encode of a text prefix's UTF-8
    bytes plus an unbase64 roundtrip proof and the byte length. The
    encode-for-transport functions every export pipeline leans on.

    Plan: row-local codegen expressions over a pruned 2-column scan with
    the modulo filter pushed to the reader — zero shuffles."""
    d = load(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, 24)
    pbin = prefix.cast("binary")
    return d.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.base64(pbin).alias("b64"),
        F.hex(pbin).alias("hx"),
        F.octet_length(prefix).cast("int").alias("nbytes"),
        (F.unbase64(F.base64(pbin)).cast("string") == prefix).alias(
            "b64_roundtrip"
        ),
    )


@query(
    "sample_negative_pairs",
    oracle="""
    WITH cand AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             b.vec_id AS neg_id, b.label AS neg_label,
             md5(CAST(a.vec_id AS VARCHAR) || ':' || CAST(b.vec_id AS VARCHAR))
               AS h
      FROM embeddings a
      JOIN embeddings b
        ON a.vec_id % 16 = b.vec_id % 16 AND a.label <> b.label
    )
    SELECT anchor_id, anchor_label, neg_id, neg_label
    FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                                       ORDER BY h, neg_id,
                                                anchor_label, neg_label) AS rn
          FROM cand)
    WHERE rn = 1
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling: for every anchor
    vector, pick one negative (different label) from its hash bucket,
    chosen by the md5 of the pair key — reproducible across runs and
    engines, no rand(). The negative-pair generator a contrastive /
    embedding-training data pipeline needs.

    Plan: the candidate space is bucketed (vec_id % 16) so the self-join
    is an equi-join shuffle — per-bucket work is (n/B)² instead of a
    global n² cross join; the per-anchor argmin collapses via min_by
    partial aggregation (no row_number sort buffer). At 100 TB you raise
    B so buckets stay ~constant-size; the join never materializes the
    full pair space. Tie-break (h, neg_id, anchor_label, neg_label) is
    total even when a vec_id COLLIDES with two different labels (r14
    dup-id axis: h depends only on the id pair, so a replayed id made
    the winning row's labels an arbitrary pick) — and the anchor label
    is taken from the WINNING candidate row, never an independent
    first()."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        (F.col("vec_id") % 16).alias("b"),
    )
    b = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        (F.col("vec_id") % 16).alias("b"),
    )
    cand = a.join(b, "b").filter(F.col("anchor_label") != F.col("neg_label"))
    h = F.md5(
        F.concat_ws(":", F.col("anchor_id").cast("string"), F.col("neg_id").cast("string"))
    )
    return (
        cand.withColumn("h", h)
        .groupBy("anchor_id")
        .agg(
            F.min_by(
                F.struct("anchor_label", "neg_id", "neg_label"),
                F.struct("h", "neg_id", "anchor_label", "neg_label"),
            ).alias("pick"),
        )
        .select(
            "anchor_id",
            F.col("pick.anchor_label").alias("anchor_label"),
            F.col("pick.neg_id").alias("neg_id"),
            F.col("pick.neg_label").alias("neg_label"),
        )
    )
