"""Extras batch 17 module (r05 continuation): malformed-JSON permissive
ingest, deterministic Poisson bootstrap resampling, rolling trend
correlation, and hash surrogate keys.

SURVEY §2 families extended: §2.A (the JSON scan grows the PERMISSIVE
corrupt-record contract — ingest robustness, the mirror of
scan_csv_malformed), §2.I (Poisson bootstrap — the distributed resampling
primitive behind confidence intervals on corpus statistics), §2.E
(windowed co-moment correlation computed from explicit sums so both
engines evaluate the identical formula), §2.M (data-vault-style hash
surrogate keys with a collision audit).

Determinism discipline (SURVEY §5.3): bootstrap draws come from the
multiplier-mod integer idiom (sample_hash_repro's engine-agnostic hash);
the rolling correlation avoids engine-internal corr() — large-magnitude
co-moment cancellation AND algorithm differences — by using the
small-integer row position as the x series and spelling out the formula;
md5 is identical hex in both engines.
"""

from __future__ import annotations

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load, sftag


@query(
    "scan_json_corrupt_permissive",
    oracle="""
    SELECT count(*) FILTER (WHERE event_id % 7 != 0) AS n_good,
           count(*) FILTER (WHERE event_id % 7 = 0) AS n_corrupt,
           round(sum(value) FILTER (WHERE event_id % 7 != 0), 2) AS value_good
    FROM events
    """,
)
def scan_json_corrupt_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON ingest with a corrupt-record column: events are
    serialized to JSON lines, every 7th record (event_id % 7 == 0) is
    deliberately truncated mid-object, and the reader ingests the file
    anyway — clean rows parse, broken rows land whole in
    `_corrupt_record` with NULL data fields. The query audits the split:
    good count, corrupt count, value sum over good rows; the oracle
    recomputes all three from the source relation, proving PERMISSIVE
    loses nothing it shouldn't and quarantines exactly the broken 1/7th.

    100 TB: PERMISSIVE + corrupt-column is the only ingest posture that
    survives real crawl dumps — FAILFAST kills a 10-hour job on one bad
    byte, DROPMALFORMED silently biases the corpus. Quarantined raw
    strings stay queryable for repair. Per-file work is embarrassingly
    parallel; the audit aggregate is one partial-agg pass."""
    base = scratch_dir(prefix=f"sg-json-corrupt-{sftag(sf_dir)}-")
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    line = F.to_json(F.struct("event_id", "user_id", "value"))
    # Truncate every 7th line: drop the closing brace and tail — guaranteed
    # invalid JSON, deterministic in content and in which rows break.
    broken = F.when(
        F.col("event_id") % 7 == 0, F.expr("substring(js, 1, length(js) - 5)")
    ).otherwise(F.col("js"))
    e.select("event_id", line.alias("js")).select(
        broken.alias("value")
    ).write.mode("overwrite").text(base)
    back = (
        spark.read.schema("event_id long, user_id long, value double, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(base)
    )
    return back.agg(
        F.count(F.col("event_id")).alias("n_good"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        F.round(F.sum("value"), 2).alias("value_good"),
    )


# Poisson(1) CDF thresholds scaled to the [0, 100000) integer hash range:
# P(X<=k) for k = 0..4; draws above the last threshold clamp to 5.
_POIS_CDF = [36788, 73576, 91970, 98101, 99634]


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 5 END"


@query(
    "sample_bootstrap_poisson",
    oracle=f"""
    WITH draws AS (
      SELECT o_orderpriority, o_totalprice,
             {_pois_case_sql("(o_orderkey * 2654435761 + 12345) % 100000")} AS k
      FROM orders
    )
    SELECT o_orderpriority,
           count(*) AS n_orig,
           CAST(sum(k) AS BIGINT) AS n_resampled,
           round(sum(o_totalprice), 2) AS sum_orig,
           round(sum(k * o_totalprice), 2) AS sum_resampled
    FROM draws GROUP BY o_orderpriority
    """,
)
def sample_bootstrap_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap: each row receives a deterministic Poisson(1)
    replication count k (inverse-CDF over the engine-agnostic
    multiplier-mod hash), and the per-priority aggregate is computed on
    both the original and the resampled weighting — one bootstrap
    replicate of the group sums. Repeating with other hash constants
    yields the replicate distribution that turns corpus statistics into
    confidence intervals.

    Why Poisson instead of multinomial resampling: the draw is row-LOCAL
    (no global n needed, no shuffle, no coordination), which is what
    makes bootstrap feasible on a 100 TB table — k rides along as a
    weight column and every aggregate downstream just multiplies by it.
    E[Σk] = n, so n_resampled ≈ n_orig per group (asserted in tests
    within 3σ). Zero Python, zero extra passes."""
    o = load(spark, sf_dir, "orders")
    u = (F.col("o_orderkey") * F.lit(2654435761).cast("long") + 12345) % 100000
    k = F.expr(_pois_case_sql("((o_orderkey * CAST(2654435761 AS BIGINT) + 12345) % 100000)"))
    _ = u  # documented twin of the SQL-side expression
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orig"),
            F.sum(k).alias("n_resampled"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_orig"),
            F.round(F.sum(k * F.col("o_totalprice")), 2).alias("sum_resampled"),
        )
    )


@query(
    "win_rolling_corr",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, value,
             CAST(row_number() OVER w AS DOUBLE) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_user
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sums AS (
      SELECT user_id, event_id, n_user,
             count(*) OVER f AS n,
             sum(rn) OVER f AS sx,
             sum(value) OVER f AS sy,
             sum(rn * value) OVER f AS sxy,
             sum(rn * rn) OVER f AS sxx,
             sum(value * value) OVER f AS syy
      FROM seq
      WINDOW f AS (PARTITION BY user_id ORDER BY rn
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 3) + 0.0 AS trend_corr
    FROM sums
    WHERE n = 20 AND n_user >= 40
    """,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling trend correlation: over each user's event sequence, the
    Pearson correlation between value and its position in a trailing
    20-row frame — the windowed drift detector (corr near ±1 = steady
    trend, near 0 = noise). Emitted only for full frames on users with
    ≥40 events.

    The correlation is spelled out from six windowed co-moment sums
    ((nΣxy−ΣxΣy)/√(nΣxx−Σx²)√(nΣyy−Σy²)) instead of calling the
    engines' corr(): the explicit formula makes both engines execute the
    IDENTICAL arithmetic on the identical operand sequence, and using
    the small-integer row position as x keeps nΣxx−Σx² far from
    catastrophic cancellation (epoch-seconds x values would put the
    subtraction 15 digits up). §5.3 in action: determinism comes from
    formula control, then ONE final round(3).

    Plan note: one user_id shuffle serves the sequence window, all six
    frame sums (same window spec → one Window operator), and the filter;
    frame state is O(20) per row. 100 TB: the standard sliding-metric
    shape — linear, skew-tolerant via AQE."""
    e = load(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        "value",
        F.row_number().over(w_seq).cast("double").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_user"),
    )
    f = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(-19, Window.currentRow)
    )
    sums = seq.select(
        "user_id",
        "event_id",
        "n_user",
        F.count(F.lit(1)).over(f).alias("n"),
        F.sum("rn").over(f).alias("sx"),
        F.sum("value").over(f).alias("sy"),
        F.sum(F.col("rn") * F.col("value")).over(f).alias("sxy"),
        F.sum(F.col("rn") * F.col("rn")).over(f).alias("sxx"),
        F.sum(F.col("value") * F.col("value")).over(f).alias("syy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        sums.filter((F.col("n") == 20) & (F.col("n_user") >= 40))
        # + 0.0 collapses IEEE negative zero (round(-1e-5, 3) -> -0.0): the
        # driver canonicalizer compares FORMATTED floats, where '-0.0e+00'
        # != '0.0e+00'; both engines normalize identically.
        .select(
            "user_id",
            "event_id",
            (F.round(corr, 3) + F.lit(0.0)).alias("trend_corr"),
        )
    )


@query(
    "etl_surrogate_hash_keys",
    oracle="""
    WITH hub AS (
      SELECT c_custkey, md5('cust|' || CAST(c_custkey AS VARCHAR)) AS hub_key
      FROM customer
    )
    SELECT c_custkey, hub_key,
           CAST(row_number() OVER (ORDER BY hub_key) AS BIGINT) AS sk,
           (SELECT count(*) - count(DISTINCT hub_key) FROM hub) AS n_collisions
    FROM hub
    """,
)
def etl_surrogate_hash_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-vault-style surrogate keys: each business key gets a
    deterministic 128-bit hub key (md5 over a typed, delimited business
    key string), a dense integer sk assigned by hash order, and the
    output carries the hub-wide collision count (must be 0 — asserted by
    the oracle comparison AND unit test). Hash keys, not sequences: the
    mapping is stable across reruns, engines, and partition layouts.

    100 TB notes: md5-as-identity is the pattern that REPLACES
    monotonically_increasing_id (whose values depend on partition layout
    — non-reproducible) and sequence generators (a global bottleneck).
    The dense sk via row_number-over-hash is a DELIBERATE single-sort
    demonstration — at cluster scale you keep the 128-bit key as the
    join identity and skip dense ids entirely, or assign them per
    partition (id = partition_offset + local rank) when a warehouse
    demands integers. Collision audit on 128 bits is paranoia-grade but
    free in the same pass."""
    c = load(spark, sf_dir, "customer")
    hub = c.select(
        "c_custkey",
        F.md5(F.concat(F.lit("cust|"), F.col("c_custkey").cast("string"))).alias(
            "hub_key"
        ),
    )
    w = Window.orderBy("hub_key")
    counts = hub.agg(
        (F.count(F.lit(1)) - F.countDistinct("hub_key")).alias("n_collisions")
    )
    return hub.withColumn("sk", F.row_number().over(w).cast("long")).crossJoin(
        F.broadcast(counts)
    )
