"""Refresh-cost rehearsal for pipeline_incremental_refresh (r07): hold the
ACCEPTED corpus fixed (sf0.1's old split, index built once) and scale only
the ARRIVING batch — the exponent that matters for an incremental system
is cost vs batch size, not corpus size.

Batch replication is key-shifted (doc_id + i*1M) but text-identical, so a
replicated batch is deliberately clone-dense: every clone group collides
in all 16 bands (a recrawl-of-a-mirror shape), which is the adversarial
case for the within-batch gate and exercises the >100k-pair distributed
components fallback at high replication.

exponent = log(t_Rx / t_1x) / log(R); refresh-only time (build excluded).

Usage: python scripts/refresh_rehearsal.py [replication ...]  (default 1 5 25)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    reps = [int(a) for a in sys.argv[1:]] or [1, 5, 25]
    from pyspark.sql import functions as F

    from engine.pipeline6 import build_refresh_index, refresh_against_index
    from engine.session import get_spark
    from engine.tables import load

    spark = get_spark(
        "sg-refresh-rehearsal", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    d = load(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    is_new = F.col("doc_id") % 5 == 0
    base = tempfile.mkdtemp(prefix="sg-refresh-rehearsal-idx-")
    t0 = time.monotonic()
    build_refresh_index(spark, d.filter(~is_new), base)
    print(f"index build (once, {SF_DIR} old split): {time.monotonic() - t0:.2f} s")

    batch1 = d.filter(is_new)
    times: dict[int, float] = {}
    print("| replication | batch docs | refresh s | exponent vs 1x |")
    print("|---|---|---|---|")
    for r in reps:
        parts = [batch1]
        for i in range(1, r):
            parts.append(batch1.withColumn("doc_id", F.col("doc_id") + i * 1_000_000))
        batch = parts[0]
        for p in parts[1:]:
            batch = batch.unionByName(p)
        # Materialize the batch as parquet and refresh from the READ: a
        # real arriving batch is a file, not an N-way union plan — at
        # 100× the union shape made every gate re-scan the corpus once
        # per branch (100 scans/execution, driver OOM), which measures
        # the synthetic plan, not the refresh.
        bdir = tempfile.mkdtemp(prefix=f"sg-refresh-batch-{r}x-")
        batch.write.mode("overwrite").parquet(f"{bdir}/batch.parquet")
        batch = spark.read.parquet(f"{bdir}/batch.parquet")
        n = batch.count()
        # Each replication level is a DISTINCT batch plan, so its
        # signature/band cache entries are dead weight once the level is
        # timed — clear between levels (the engine deliberately leaves
        # same-plan caches live for warm reuse; see refresh_against_index).
        spark.catalog.clearCache()
        # warm once (plan/code paths), then time
        refresh_against_index(spark, batch, base).count()
        t0 = time.monotonic()
        refresh_against_index(spark, batch, base).count()
        times[r] = time.monotonic() - t0
        exp = (
            math.log(times[r] / times[reps[0]]) / math.log(r / reps[0])
            if r != reps[0]
            else float("nan")
        )
        print(f"| {r}x | {n} | {times[r]:.2f} | {exp if exp == exp else '—'} |"
              if r == reps[0]
              else f"| {r}x | {n} | {times[r]:.2f} | {exp:.2f} |")
        # The materialized batch (up to GBs at 100×) is only needed until
        # its level is timed; leaking it would fill /tmp across repeated
        # rehearsals and fail later spill/checkpoint writes.
        shutil.rmtree(bdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
