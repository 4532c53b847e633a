"""Extras batch 28 module (r05 continuation): atomic snapshot publishing
and multi-format timestamp ingest.

SURVEY §2 families extended: §2.A (the publish pattern under every
"table" abstraction: write a full snapshot to a versioned directory, then
flip one tiny pointer — readers see old or new, never a half-written
mix), §2.H (the try_to_timestamp cascade — parsing the three date
dialects one feed inevitably contains, quarantining what no format
matches).

Determinism discipline (SURVEY §5.3): versions and pointer contents are
fixed strings; the format cascade's per-row outcome is a pure function of
the synthesized string; timestamps compare in UTC microseconds.
"""

from __future__ import annotations

import os

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag


@query(
    "sink_atomic_publish",
    oracle="""
    SELECT CAST(2 AS INT) AS current_version,
           count(*) AS n_rows,
           round(sum(o_totalprice), 2) AS total,
           TRUE AS previous_version_retained
    FROM orders WHERE o_orderstatus IN ('O', 'F')
    """,
)
def sink_atomic_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic snapshot publishing: each publish writes a COMPLETE
    snapshot to its own versioned directory (v1, v2, ...) and then
    atomically rewrites a one-line pointer file naming the current
    version — the reader resolves the pointer first, so it always sees
    exactly one committed snapshot (old or new, never a mix), and
    superseded versions remain on disk for time travel / rollback. Two
    publishes run here (v1 = open orders, v2 = open+finished); the audit
    reads THROUGH the pointer and proves it sees v2 while v1 is
    retained.

    100 TB: this pointer-swap is the core of every table format's commit
    protocol (Delta's _last_checkpoint + log, Iceberg's version-hint /
    catalog pointer) — the data write is big and non-atomic, the COMMIT
    is one tiny atomic rename. Readers pay one extra small read; writers
    never block readers."""
    base = scratch_dir(prefix=f"sg-pub-{sftag(sf_dir)}-")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def publish(version: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(f"{base}/v{version}")
        tmp = f"{base}/.pointer.tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.rename(tmp, f"{base}/POINTER")  # atomic commit

    publish(1, o.filter(F.col("o_orderstatus") == "O"))
    publish(2, o.filter(F.col("o_orderstatus").isin("O", "F")))

    with open(f"{base}/POINTER") as fh:
        current = int(fh.read().strip())
    snap = spark.read.parquet(f"{base}/v{current}")
    v1_retained = os.path.isdir(f"{base}/v1") and any(
        f.endswith(".parquet") for f in os.listdir(f"{base}/v1")
    )
    return snap.agg(
        F.lit(current).cast("int").alias("current_version"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.lit(v1_retained).alias("previous_version_retained"),
    )


@query(
    "fn_timestamp_multiformat_parse",
    oracle="""
    WITH raw AS (
      SELECT event_id, ts,
             CASE event_id % 3
               WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
               WHEN 1 THEN strftime(ts, '%d/%m/%Y %H:%M:%S')
               ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S')
             END AS raw_str
      FROM events
    ),
    parsed AS (
      SELECT event_id, ts, raw_str,
             coalesce(
               try_strptime(raw_str, '%Y-%m-%d %H:%M:%S'),
               try_strptime(raw_str, '%d/%m/%Y %H:%M:%S'),
               try_strptime(raw_str, '%Y-%m-%dT%H:%M:%S')
             ) AS parsed_ts
      FROM raw
    )
    SELECT CAST(event_id % 3 AS INT) AS fmt,
           count(*) AS n,
           CAST(count(parsed_ts) AS BIGINT) AS n_parsed,
           CAST(count(CASE WHEN parsed_ts = date_trunc('second', ts)
                      THEN 1 END) AS BIGINT) AS n_exact
    FROM parsed GROUP BY 1
    """,
)
def fn_timestamp_multiformat_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-format timestamp cascade: one feed, three date dialects
    (ISO space-separated, European d/m/Y, ISO 'T') — each row rendered
    in the dialect its id selects, then parsed back through a
    coalesce(try_to_timestamp...) chain that tries formats in order and
    yields NULL only if none match. The audit proves every row parses
    and round-trips to its (second-truncated) source timestamp, per
    dialect.

    try_to_timestamp, not to_timestamp: under ANSI mode a parse failure
    in to_timestamp kills the JOB; the try_ cascade turns it into a
    quarantine-able NULL (same posture as scan_json_corrupt_permissive).
    Plan: row-local format/parse codegen, zero shuffles before the final
    3-row aggregate. 100 TB: format sniffing per-ROW (not per-file) is
    what survives feeds that mix dialects within one file."""
    e = load(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    raw = e.withColumn(
        "raw_str",
        F.when(
            F.col("event_id") % 3 == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
        )
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "dd/MM/yyyy HH:mm:ss"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")),
    )
    parsed = raw.withColumn(
        "parsed_ts",
        F.coalesce(
            F.try_to_timestamp(F.col("raw_str"), F.lit("yyyy-MM-dd HH:mm:ss")),
            F.try_to_timestamp(F.col("raw_str"), F.lit("dd/MM/yyyy HH:mm:ss")),
            F.try_to_timestamp(F.col("raw_str"), F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        ),
    )
    return parsed.groupBy((F.col("event_id") % 3).cast("int").alias("fmt")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("parsed_ts").cast("long").alias("n_parsed"),
        F.sum(
            F.when(
                F.col("parsed_ts") == F.date_trunc("second", "ts"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_exact"),
    )
