"""Round-4 batch 19a: time-series smoothing and gap repair (SURVEY §2
extensions; the reference at /root/reference is an empty directory —
SURVEY §2 is the operative spec).

- ``win_ewma_smoothing``: exponentially-weighted moving average over the
  per-type hourly series. The recursive EWMA definition is restated as a
  BOUNDED offset-join (12 taps of (1−α)^j weights): the exact-rewrite
  trick (pow(1−α, −rn) cumulative sums) overflows double precision past a
  few hundred steps, while the bounded form is deterministic, engine-
  portable, and loses only the 0.5^12 ≈ 0.02% tail mass.
- ``etl_gap_fill_interpolate``: densify the hourly grid and linearly
  interpolate missing buckets from the nearest non-null neighbors via
  IGNORE NULLS window navigation — the standard repair step before any
  fixed-step model consumes an event-derived series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load

_ALPHA = 0.5  # (1-alpha) = 0.5: powers/products/sums stay dyadic-EXACT doubles
_TAPS = 12
# gap-fill densification limit, in grid hours (30 days): gaps wider than
# this are discontinuities — no rows are synthesized across them. Must
# match the literal in etl_gap_fill_interpolate's oracle.
_MAX_FILL_GAP_HOURS = 720


@query(
    "win_ewma_smoothing",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hr,
             CAST(count(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    taps AS (
      SELECT a.event_type, a.hr,
             sum(b.v * power(1 - {_ALPHA}, CAST(j AS INT))) AS num,
             sum(power(1 - {_ALPHA}, CAST(j AS INT))) AS den
      FROM hourly a, UNNEST(range(0, {_TAPS})) AS t(j)
      JOIN hourly b
        ON b.event_type = a.event_type
       AND b.hr = a.hr - CAST(j AS INT) * INTERVAL '1 hour'
      GROUP BY 1, 2
    )
    SELECT event_type, hr, round(num / den, 4) AS ewma
    FROM taps ORDER BY event_type, hr
    """,
)
def win_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α=0.5, 12 taps) over each event type's hourly event-count
    series. Counts (exact integers) and α=0.5 (dyadic weights) make every
    intermediate double bit-identical across engines — float-summed
    averages differ by ULPs between engines and flip round() ties (the
    r04 lesson; SURVEY §5.3). The textbook recursive form S_t = αv_t + (1−α)S_{t−1} is not
    window-expressible and its closed-form rewrite overflows doubles, so
    the filter runs as an explicit 12-tap offset join: each output hour
    joins its 12 predecessors with (1−α)^j weights and normalizes by the
    weight sum actually present (adjusted EWMA — series heads and gap
    edges weight correctly for free). Missing buckets contribute nothing
    rather than propagating nulls.

    100 TB: the 12× fan-out happens on the POST-aggregation hourly table
    (bounded by types × horizon hours, not by raw events), and the tap
    join hash-partitions on event_type — so the expensive table is
    touched once and the filter cost is O(series length × taps)."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    taps = spark.range(_TAPS).select(F.col("id").cast("int").alias("j"))
    a = hourly.select("event_type", "hr").crossJoin(F.broadcast(taps))
    b = hourly.select(
        F.col("event_type").alias("b_type"),
        F.col("hr").alias("b_hr"),
        F.col("v").alias("b_v"),
    )
    joined = a.join(
        b,
        (F.col("b_type") == F.col("event_type"))
        & (
            F.col("b_hr")
            == F.col("hr") - F.col("j") * F.expr("INTERVAL 1 HOUR")
        ),
    )
    w = F.pow(F.lit(1 - _ALPHA), F.col("j"))
    return (
        joined.groupBy("event_type", "hr")
        .agg(
            F.round(F.sum(F.col("b_v") * w) / F.sum(w), 4).alias("ewma"),
        )
        .orderBy("event_type", "hr")
    )


@query(
    "etl_gap_fill_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hr,
             CAST(count(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    -- fill-limit semantics (r14 adversarial-timestamp axis): densify only
    -- gaps of <= 720 grid hours between CONSECUTIVE observations — a
    -- pandas-interpolate 'limit', not an unconditional min..max grid.
    -- The old bounds/grid CTE generated the full [min, max] span, so ONE
    -- year-9999 sentinel row expanded the grid to ~70M hours per type
    -- (OOM on the engine, ~GBs on this oracle). A gap wider than the
    -- limit is a discontinuity: no rows are synthesized across it.
    seg AS (
      SELECT event_type, hr,
             lag(hr) OVER (PARTITION BY event_type ORDER BY hr) AS prev_hr
      FROM hourly
    ),
    fills AS (
      SELECT event_type,
             unnest(generate_series(prev_hr + INTERVAL '1 hour',
                                    hr - INTERVAL '1 hour',
                                    INTERVAL '1 hour')) AS hr
      FROM seg
      WHERE prev_hr IS NOT NULL
        AND date_diff('hour', prev_hr, hr) > 1
        AND date_diff('hour', prev_hr, hr) <= 720
    ),
    joined AS (
      SELECT event_type, hr, v FROM hourly
      UNION ALL
      SELECT event_type, hr, NULL AS v FROM fills
    ),
    nav AS (
      SELECT event_type, hr, v,
             last_value(v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
               OVER w_prev AS ph,
             first_value(v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
               OVER w_next AS nh
      FROM joined
      WINDOW w_prev AS (PARTITION BY event_type ORDER BY hr
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_next AS (PARTITION BY event_type ORDER BY hr
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hr,
           (v IS NULL) AS was_gap,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN ph IS NULL THEN nv
             WHEN nh IS NULL THEN pv
             ELSE pv + (nv - pv)
                  * (CAST(date_diff('hour', ph, hr) AS DOUBLE)
                     / CAST(date_diff('hour', ph, nh) AS DOUBLE))
           END, 4) AS v_filled
    FROM nav ORDER BY event_type, hr
    """,
)
def etl_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series densification + linear interpolation with a FILL LIMIT:
    synthesize hourly rows only inside gaps of <= _MAX_FILL_GAP_HOURS
    between consecutive observed hours (exact integer counts —
    float-summed averages differ by ULPs across engines and flip round()
    ties), then fill each synthesized row from its nearest non-null
    neighbors — IGNORE NULLS last_value looking back and first_value
    looking forward, with the interpolation weighted by time distance
    (edges clamp to the available neighbor). `was_gap` marks synthesized
    rows. This is the repair step before resampling/EWMA/model-ingest
    consumes an event-derived series at a fixed step.

    The limit IS the operator contract, not an optimization (r14
    adversarial-timestamp axis): the previous shape densified the full
    [min, max] span per type via one sequence() call, so a single
    year-9999 sentinel stamp built a ~70M-element array in one task and
    OOM'd the executor — the classic way one rogue row kills a
    densification job. A gap wider than the limit is a discontinuity:
    interpolating across it is statistically meaningless anyway (pandas
    interpolate(limit=...) draws the same line), so no rows are
    synthesized and the observed rows on both rims stay untouched.

    100 TB: per-pair sequence() arrays are bounded by the limit (720), the
    explode distributes over the observation shuffle partitioning, and
    output is bounded by observed + gaps·limit — no unconditional
    min..max grid anywhere. The nav windows and the lag segmentation all
    partition on event_type, reusing one shuffle. Gap-fill never touches
    raw events after the first aggregate."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    wlag = Window.partitionBy("event_type").orderBy("hr")
    gap_h = (
        (F.unix_micros("hr") - F.unix_micros("prev_hr"))
        / F.lit(3_600_000_000)
    ).cast("long")
    fills = (
        hourly.select(
            "event_type", "hr", F.lag("hr").over(wlag).alias("prev_hr")
        )
        .filter(
            F.col("prev_hr").isNotNull()
            & (gap_h > 1)
            & (gap_h <= _MAX_FILL_GAP_HOURS)
        )
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.col("prev_hr") + F.expr("INTERVAL 1 HOUR"),
                    F.col("hr") - F.expr("INTERVAL 1 HOUR"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hr"),
            F.lit(None).cast("double").alias("v"),
        )
    )
    joined = hourly.unionByName(fills)
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    vh = F.when(F.col("v").isNotNull(), F.col("hr"))
    nav = joined.select(
        "event_type",
        "hr",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(vh, ignorenulls=True).over(wp).alias("ph"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(vh, ignorenulls=True).over(wn).alias("nh"),
    )
    # The lerp fraction is a ratio of exact integer HOUR counts (the grid
    # is hourly) — both engines divide the same two small integers, so the
    # double result is bit-identical. A micros/micros or seconds/seconds
    # formulation differs by ULPs between engines (each side's unit
    # conversion rounds differently), which flips round(,4) ties.
    def hours_between(a: str, b: str) -> F.Column:
        return (
            (
                F.unix_micros(F.col(b).cast("timestamp"))
                - F.unix_micros(F.col(a).cast("timestamp"))
            )
            / F.lit(3_600_000_000)
        ).cast("long")

    frac = hours_between("ph", "hr").cast("double") / hours_between(
        "ph", "nh"
    ).cast("double")
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("ph").isNull(), F.col("nv"))
        .when(F.col("nh").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return nav.select(
        "event_type",
        "hr",
        F.col("v").isNull().alias("was_gap"),
        F.round(filled, 4).alias("v_filled"),
    ).orderBy("event_type", "hr")
