"""Sink/source batch 2 (r05, registered after the attestation window):
dynamic partition overwrite and recursive globbed directory ingest — the
two layout-level contracts every warehouse-shaped pipeline relies on.
"""

from __future__ import annotations

import os

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag

# Deterministic per-corpus source trees for scan_recursive_glob (built once;
# rebuilding per sweep run would be pure setup overhead — same policy as
# engine/streaming's replay-file cache).
_GLOB_SRC_CACHE: dict[str, str] = {}


@query(
    "etl_partition_overwrite_dynamic",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice * 2.0 ELSE o_totalprice END), 2)
             AS total
    FROM orders GROUP BY 1
    """,
)
def etl_partition_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: a priority-partitioned orders table is
    fully written, then ONE partition ('1-URGENT', with doubled prices) is
    rewritten with mode=overwrite + partitionOverwriteMode=dynamic — and
    the read-back proves the other partitions survived untouched. Under
    the default STATIC mode the second write would have deleted every
    other partition; dynamic mode replaces only partitions present in the
    incoming data, which is THE idempotent daily-reload idiom (re-run a
    day, never touch the rest).

    100 TB: partition replacement is a metadata swap per touched
    partition — cost scales with the reloaded slice, not the table. The
    write shuffles nothing beyond the incoming slice; readers prune
    untouched partitions as before."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    path = os.path.join(
        scratch_dir(prefix=f"sg-dynpart-{sftag(sf_dir)}-"), "orders_t"
    )
    o.write.partitionBy("o_orderpriority").mode("overwrite").parquet(path)
    upd = o.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2.0
    )
    (
        upd.write.partitionBy("o_orderpriority")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    # explicit schema: no inference pass, robust to a zero-row write
    back = spark.read.schema(o.schema).parquet(path)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "scan_recursive_glob",
    oracle="""
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def scan_recursive_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive directory ingest with a glob filter: the documents table
    split across a nested tree (top level + two levels deep) with a
    non-parquet decoy file alongside, read back via recursiveFileLookup +
    pathGlobFilter='*.parquet' — the lake-layout contract for ingesting
    arbitrarily nested vendor drops without a partition scheme. The
    oracle aggregates the original table; equality proves nothing was
    missed (deep files), duplicated, or wrongly included (the decoy).

    100 TB: file listing is driver/metastore work proportional to file
    count — the reason real lakes either register partitions or compact
    (etl_compact_small_files); the scan itself parallelizes per file
    split as usual."""
    src = _GLOB_SRC_CACHE.get(sf_dir)
    if src is None:
        d = load(spark, sf_dir, "documents")
        src = scratch_dir(prefix=f"sg-globsrc-{sftag(sf_dir)}-")
        os.makedirs(f"{src}/a/b", exist_ok=True)
        d.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{src}/a/even.parquet")
        d.filter(F.col("doc_id") % 2 == 1).write.parquet(f"{src}/a/b/odd.parquet")
        with open(f"{src}/a/decoy.json", "w") as fh:
            fh.write('{"not": "parquet"}\n')
        _GLOB_SRC_CACHE[sf_dir] = src
    back = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .schema(load(spark, sf_dir, "documents").schema)
        .parquet(src)
    )
    return back.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@query(
    "sink_python_datasource",
    oracle="""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python DataSource WRITER API — the write-side sibling of
    scan_python_datasource's reader: a custom `DataSourceWriter` whose
    `write(iterator)` receives each partition's rows in Python, persists
    them as JSON-lines shards (one per partition, named by
    TaskContext.partitionId), and returns a commit message the driver's
    `commit()` sees — the full two-phase write protocol (write per task →
    driver commit/abort). The key writes per-language aggregates through
    the custom sink, reads the shards back with the native JSON reader,
    and re-aggregates; the oracle recomputes from the source table, so a
    dropped shard, duplicated task output, or mangled row breaks the
    hash.

    100 TB: each task writes its own shard and reports via commit
    messages; nothing funnels through the driver except the O(#tasks)
    commit metadata — the same contract parquet committers implement. A
    real connector adds abort() cleanup + idempotent task retries (write
    to temp, rename on commit)."""
    import json as _json

    from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

    out_dir = scratch_dir(prefix=f"sg-pyds-sink-{sftag(sf_dir)}-")

    class JsonShardWriter(DataSourceWriter):
        def __init__(self, options):
            self.path = options.get("path")

        def write(self, iterator):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            n = 0
            shard = f"{self.path}/part-{pid:05d}.jsonl"
            with open(shard, "w") as fh:
                for row in iterator:
                    fh.write(
                        _json.dumps(
                            {"lang": row["lang"], "n_docs": row["n_docs"],
                             "total_chars": row["total_chars"]}
                        )
                        + "\n"
                    )
                    n += 1
            return WriterCommitMessage()

    class JsonShardSink(DataSource):
        @classmethod
        def name(cls):
            return "sg_jsonl_sink"

        def writer(self, schema, overwrite):
            return JsonShardWriter(self.options)

    try:
        spark.dataSource.register(JsonShardSink)
    except Exception:
        pass  # already registered in this session

    agg = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        # shard count should track data volume, not the shuffle-partition
        # conf: 32 near-empty Python writer tasks cost ~4 s of worker forks
        # for a |languages|-row relation.
        .coalesce(4)
    )
    agg.write.format("sg_jsonl_sink").option("path", out_dir).mode("append").save()
    back = spark.read.schema("lang string, n_docs long, total_chars long").json(
        out_dir
    )
    return back.select("lang", "n_docs", "total_chars")
