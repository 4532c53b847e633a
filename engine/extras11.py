"""Extras batch 11 module (r05 continuation): multi-column IN subquery,
rolling distinct counts, byte-signal frame energy, and interval-consistency
auditing.

SURVEY §2 families extended: §2.C/§2.M (row-value IN subquery — the
multi-key semi join), §2.E (rolling distinct over a frame), §2.N
(multimodal signal-frame features with a FULL oracle — integer byte math),
§2.M (interval overlap/gap audit on SCD2-style tables).

Determinism discipline (SURVEY §5.3): frame energies stay in integer
arithmetic until one sqrt+round; rolling distinct is an exact integer;
the interval corruption is a deterministic function of the version rank,
identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load


@query(
    "subq_multicol_in",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_orderpriority = '1-URGENT'
                    AND o_orderkey = l_orderkey AND l_linenumber = 1)
    """,
)
def subq_multicol_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-value (multi-column) IN subquery: first line items of urgent
    orders — `(a, b) IN (SELECT x, y ...)` compares the column tuple
    against the subquery rows, completing the subquery family beside the
    single-column NOT IN / EXISTS keys.

    Plan: Catalyst rewrites the tuple IN to a LEFT SEMI join on BOTH
    columns — one equi-join shuffle (or broadcast when the subquery side
    is small), never a per-row subquery execution. Null semantics don't
    bite here (both key columns are non-null), which is what makes the
    rewrite a plain semi join rather than the null-aware anti variant.
    (The oracle states the same semantics via correlated EXISTS — DuckDB's
    binder rejects the tuple-IN-subquery spelling.)"""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("li_mc_src")
    load(spark, sf_dir, "orders").createOrReplaceTempView("o_mc_src")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM li_mc_src
        WHERE (l_orderkey, l_linenumber) IN
              (SELECT o_orderkey, 1 FROM o_mc_src
               WHERE o_orderpriority = '1-URGENT')
        """
    )


@query(
    "win_moving_distinct_count",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(len(list_distinct(
             list(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
           )) AS INT) AS distinct_types_10
    FROM events WHERE user_id < 30
    """,
)
def win_moving_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct count: how many distinct event types each user's
    last 10 events span — the rolling-engagement-diversity metric. Window
    aggregates refuse DISTINCT in both engines, so the count is composed
    from primitives they do allow: collect the frame, dedup, measure.

    Plan: one shuffle on user_id; the frame buffer is ≤10 values per row.
    The composition (collect_list → array_distinct → size) is row-local
    after the window, so the only cost over a plain frame sum is the
    10-element array per row — constant state, any scale."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("int")
        .alias("distinct_types_10"),
    )


@query(
    "multimodal_signal_energy",
    oracle="""
    WITH docs AS (
      -- rid: the oracle explodes to per-sample rows and must re-aggregate
      -- per SOURCE ROW, not per doc_id — a colliding id carrying two
      -- different payloads (r14 dup-id axis) would otherwise merge two
      -- frames' samples into one garbage energy
      SELECT row_number() OVER (ORDER BY doc_id, text) AS rid,
             doc_id, text, length(text) AS n
      FROM documents WHERE doc_id % 6 = 0
    ),
    frames AS (
      SELECT rid, doc_id, text, CAST(k AS INT) AS frame_idx,
             CAST(k * 32 AS INT) AS off,
             CAST(least(32, n - k * 32) AS INT) AS flen
      FROM docs, unnest(range(0, ((n - 1) // 32) + 1)) AS t(k)
    ),
    samples AS (
      SELECT rid, doc_id, frame_idx, flen,
             ascii(substr(text, off + CAST(j AS INT), 1)) AS code
      FROM frames, unnest(range(1, flen + 1)) AS u(j)
    )
    SELECT doc_id, frame_idx, flen,
           CAST(max(code) AS INT) AS peak,
           round(sqrt(CAST(sum(code * code) AS DOUBLE) / flen), 4) AS energy
    FROM samples GROUP BY rid, doc_id, frame_idx, flen
    """,
)
def multimodal_signal_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal-frame feature extraction over an opaque byte payload: the
    payload is framed into 32-byte windows and each frame yields RMS
    energy and peak amplitude — the audio-feature shape (treating bytes as
    samples) with a FULL oracle because the math is integer until one
    sqrt. The real-codec twin (multimodal_decode_pipeline) stays
    ROWS-gated; this key proves the framing/feature plumbing exactly.

    Plan: Spark computes each frame's Σcode² with transform+aggregate —
    a sequential in-array fold, zero row explosion and zero shuffle (the
    oracle explodes to per-sample rows because DuckDB lacks the fold; both
    reduce to identical integer sums). Output is one row per frame:
    ceil(n/32) per doc."""
    # r13 long-doc fix: the old shape exploded frame indices FIRST, copied
    # the full text into every frame row, and substring'd per sample —
    # substring(text, off + j, 1) is an O(offset) scan, so a long payload
    # cost O(len²) per doc. The per-char code array is now bound ONCE per
    # doc, each frame folds over an O(32) slice of it, and only the small
    # (frame_idx, flen, peak, sumsq) structs are exploded.
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 6 == 0)
    # frame windows via O(1) element access, not slice() — slice inside a
    # lambda runs interpreted and copies the whole code array per frame
    frames = F.expr(
        "transform(sequence(0, cast((size(cd) - 1) / 32 as int)),"
        " k -> named_struct("
        "   'frame_idx', k,"
        "   'flen', cast(least(32, size(cd) - k * 32) as int),"
        "   'peak', cast(array_max(transform("
        "     sequence(k * 32, least(size(cd), k * 32 + 32) - 1),"
        "     j -> cd[j])) as int),"
        "   'sumsq', aggregate(transform("
        "     sequence(k * 32, least(size(cd), k * 32 + 32) - 1),"
        "     j -> cd[j]), 0L, (acc, x) -> acc + CAST(x AS BIGINT) * x)))"
    )
    return (
        d.select(
            "doc_id",
            # empty text has NO frames (the oracle's range(0, (-1//32)+1)
            # is empty); split('','') would be [''] (size 1), so gate to
            # NULL — transform/sequence/explode of NULL emit nothing
            F.expr(
                "CASE WHEN text IS NULL OR length(text) = 0"
                " THEN cast(NULL as array<int>)"
                " ELSE transform(split(text, ''), c -> ascii(c)) END"
            ).alias("cd"),
        )
        .select("doc_id", F.explode(frames).alias("fr"))
        .select(
            "doc_id",
            F.col("fr.frame_idx").alias("frame_idx"),
            F.col("fr.flen").alias("flen"),
            F.col("fr.peak").alias("peak"),
            F.round(
                F.sqrt(F.col("fr.sumsq").cast("double") / F.col("fr.flen")), 4
            ).alias("energy"),
        )
    )


@query(
    "etl_interval_audit",
    oracle="""
    WITH base AS (
      SELECT user_id, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events WHERE event_type = 'signup'
    ),
    corrupted AS (
      SELECT user_id, valid_from,
             CASE WHEN rn % 3 = 0 AND valid_to IS NOT NULL
                  THEN valid_to + INTERVAL 1 HOUR ELSE valid_to END
               AS valid_to,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from) AS next_from
      FROM base
    )
    SELECT user_id,
           count(*) AS n_versions,
           CAST(sum(CASE WHEN valid_to IS NOT NULL AND next_from IS NOT NULL
                          AND valid_to > next_from THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlaps,
           CAST(sum(CASE WHEN valid_to IS NOT NULL AND next_from IS NOT NULL
                          AND valid_to < next_from THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gaps,
           CAST(sum(CASE WHEN valid_to = next_from THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact
    FROM corrupted GROUP BY user_id
    """,
)
def etl_interval_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-consistency audit for SCD2-style tables: per key, count
    overlapping intervals (valid_to beyond the next version's start), gaps
    (coverage holes), and exact handoffs. The corruption being audited is
    injected deterministically (every 3rd version's valid_to is stretched
    +1h in BOTH engines), so overlap counts are exactly predictable —
    what the audit would catch on a real warehouse table after a bad
    backfill.

    Plan: two windows on the same user_id partitioning (Spark reuses the
    single sort+shuffle for both — lead of ts, then lead of valid_from),
    one final per-user aggregate on the same key. At 100 TB this is the
    standard dimension-health check: one shuffle, counters per key."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("rn"),
    )
    stretched = F.when(
        (F.col("rn") % 3 == 0) & F.col("valid_to").isNotNull(),
        F.col("valid_to") + F.expr("INTERVAL 1 HOUR"),
    ).otherwise(F.col("valid_to"))
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    corrupted = base.select(
        "user_id",
        "valid_from",
        stretched.alias("valid_to"),
    ).withColumn("next_from", F.lead("valid_from").over(w2))
    both = F.col("valid_to").isNotNull() & F.col("next_from").isNotNull()
    return corrupted.groupBy("user_id").agg(
        F.count("*").alias("n_versions"),
        F.sum((both & (F.col("valid_to") > F.col("next_from"))).cast("bigint")).alias(
            "n_overlaps"
        ),
        F.sum((both & (F.col("valid_to") < F.col("next_from"))).cast("bigint")).alias(
            "n_gaps"
        ),
        # when/otherwise, not a bare cast: a single-version user has NULL
        # valid_to AND next_from → NULL comparison → sum(NULL) = NULL,
        # where the oracle's CASE..ELSE 0 yields 0
        F.sum(
            F.when(F.col("valid_to") == F.col("next_from"), 1).otherwise(0)
        ).cast("bigint").alias("n_exact"),
    )
