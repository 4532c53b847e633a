"""Capstone #6: the streaming serving pipeline — ingest → quality gate →
windowed aggregation → foreachBatch merge → serving table, end to end.

The batch capstones (#1 datasheet, #3 pretrain mix, #4 dedup cascade,
#5 ANN index) cover the offline side; this one is the ONLINE side every
product analytics stack runs: a stream of events lands in micro-batches,
bad rows are gated out, per-window aggregates are maintained
incrementally in a keyed serving table, and dashboards read that table —
never the raw stream.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag

# pipeline_stream_serving's deterministic replay fixture, one dir per
# (events path, mtime_ns) per process (r15; the _LATE_SRC_CACHE /
# _FB_SRC_CACHE precedent). Dirs come from scratch_dir, so the
# process-exit sweep removes them.
_SRV_SRC_CACHE: dict[tuple, str] = {}


@query(
    "pipeline_stream_serving",
    # FULL oracle: the 3-batch replay's merges are associative per
    # (window, type) key and the batch order is fixed, so the final
    # serving table equals the one-shot filtered batch aggregate.
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS cnt,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE event_type != 'error' AND value >= 0
    GROUP BY 1, 2
    """,
)
def pipeline_stream_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming serving capstone: events replayed as three micro-batches
    (event_id % 3 split, so every hourly window receives contributions
    from EVERY batch and the merge genuinely sums); each batch is
    quality-gated (drop 'error' events and negative values — the
    row-local filter runs before any state), aggregated to
    (hour, event_type) deltas, and MERGED into a keyed parquet serving
    table via foreachBatch (insert-new / sum-existing, atomic
    write-then-swap). The returned relation is what a dashboard reads:
    the serving table after the final merge — provably equal to the
    one-shot batch aggregate (the oracle).

    100 TB/day: this is THE incremental-analytics contract —
    (a) gate rows BEFORE stateful work (rejected rows never shuffle),
    (b) aggregate the batch to delta grain before touching the state
    (merge IO is O(windows), not O(events)), (c) keep the merge
    associative + idempotent-per-batch so replays and retries converge,
    (d) serve reads from the compact keyed table, never the stream.
    foreachBatch's per-batch transactionality caveat (and the
    table-format upgrade path) is documented at
    stream_foreachbatch_upsert."""
    state_dir = f"{tempfile.gettempdir()}/sg_serving_{sftag(sf_dir)}"
    shutil.rmtree(state_dir, ignore_errors=True)
    # Replay fixture built once per (corpus, mtime) per process (r15, the
    # _LATE_SRC_CACHE / stream_foreachbatch_upsert precedent): the three
    # batch files are a deterministic function of the corpus — prep, not
    # the demonstrated semantic. Every timed run still executes a real
    # streaming query: fresh checkpoint, fresh serving table, real merges.
    st = os.stat(f"{sf_dir}/events.parquet")
    srv_key = (os.path.realpath(f"{sf_dir}/events.parquet"), st.st_mtime_ns)
    src = _SRV_SRC_CACHE.get(srv_key)
    if src is None or not os.path.isdir(src):
        src = scratch_dir(prefix=f"sg-srv-src-{sftag(sf_dir)}-")
        e = load(spark, sf_dir, "events").select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
            "value",
        )
        for i in range(3):
            part = e.filter(F.col("event_id") % 3 == i)
            sub = scratch_dir(prefix=f"sg-srv-part{i}-")
            part.coalesce(1).write.mode("overwrite").parquet(sub)
            name = next(f for f in os.listdir(sub) if f.endswith(".parquet"))
            dest = f"{src}/batch{i}.parquet"
            os.rename(f"{sub}/{name}", dest)
            os.utime(dest, (1_000_000 + i * 1000,) * 2)  # replay order
        _SRV_SRC_CACHE[srv_key] = src

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        delta = (
            batch_df.filter((F.col("event_type") != "error") & (F.col("value") >= 0))
            .groupBy(
                F.date_trunc("hour", "ts").alias("window_start"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv"))
        )
        if os.path.exists(f"{state_dir}/cur"):
            cur = sp.read.parquet(f"{state_dir}/cur")
            merged = (
                cur.unionByName(delta)
                .groupBy("window_start", "event_type")
                .agg(F.sum("cnt").alias("cnt"), F.sum("sv").alias("sv"))
            )
        else:
            merged = delta
        # Bound the serving table's file count (guide §6 small-files; same
        # rationale as stream_foreachbatch_upsert): merged sits just past
        # the groupBy shuffle, so the narrow coalesce only merges reduce
        # outputs — otherwise every merge wrote shuffle-partition-many
        # tiny files the next merge and every dashboard read re-opened.
        merged.coalesce(4).write.mode("overwrite").parquet(f"{state_dir}/next")
        shutil.rmtree(f"{state_dir}/cur", ignore_errors=True)
        os.rename(f"{state_dir}/next", f"{state_dir}/cur")

    s = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(src)
    ckpt = scratch_dir(prefix="sg-srv-ckpt-")
    q = (
        s.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .option("maxFilesPerTrigger", "1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{state_dir}/cur").select(
        "window_start",
        "event_type",
        "cnt",
        F.round(F.col("sv"), 2).alias("total_value"),
    )
