"""SparkSession factory + runtime tuning.

Two entry points:

- ``get_spark()``: build a tuned local session (tests / bench own the session).
- ``tune(spark)``: idempotently apply the *runtime-settable* subset of our
  tuning to a session we did NOT build (the driver's harness owns its session
  and constructs it with unknown confs). Called from every table loader so
  driver-run queries still get nanosAsLong + sane shuffle parallelism.

Scale notes (100 TB): these confs are the local-mode projection of a cluster
config. On a real cluster the same code runs with AQE coalescing/skew-join,
`spark.sql.shuffle.partitions` sized to ~2-3× total cores, and
`spark.sql.files.maxPartitionBytes` at its 128 MB default so a 100 TB scan
fans out to ~800k input splits; nothing in the engine assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))


# Confs that can be flipped on a live session (verified runtime-settable on
# Spark 4.1.2). Keys we must have for correctness come first:
#  - nanosAsLong: the events table is parquet timestamp[ns], which the
#    vectorized reader otherwise rejects (PARQUET_TYPE_ILLEGAL). We read the
#    raw int64 nanos and convert to timestamp_ntz in engine.tables.
#  - session timeZone UTC: all timestamps in the corpus are naive; UTC makes
#    TimestampType<->NTZ casts the identity.
_RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def _aqe() -> str:
    # AQE's per-stage materialization + re-planning costs ~100-150 ms per
    # shuffle — pure overhead on sub-second local queries (measured: TPC-H
    # Q1-ish 233 ms with AQE vs 59 ms without at sf0.1). On a real cluster
    # AQE is mandatory (runtime broadcast, skew-join split, partition
    # coalescing at 100 TB) — flip SPARK_GRAFT_AQE=true there.
    return os.environ.get("SPARK_GRAFT_AQE", "false")


_TUNED: "set[SparkSession]" = set()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to any session; safe to call repeatedly.

    Cached per session object (strong ref, so a dead session's slot can't be
    reused) — each conf get/set is a Py4J round-trip, and tune() sits on the
    per-query hot path via the table loaders."""
    if spark in _TUNED:
        return spark
    confs = dict(_RUNTIME_CONFS)
    confs["spark.sql.shuffle.partitions"] = _cpus()
    confs["spark.sql.adaptive.enabled"] = _aqe()
    for k, v in confs.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build — leave session default
    _TUNED.add(spark)
    return spark


def get_spark(app: str = "spark-graft", cpus: str | None = None) -> SparkSession:
    cpus = cpus or _cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
