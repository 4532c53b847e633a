"""Training-data pipeline operations, batch 2 (r02): reproducible dataset
splitting, directed containment near-dup, data-quality profiling, the text
line source, and the incremental-load watermark pattern.

These round out SURVEY §2.I/L/M from the curation side: everything a corpus
build needs between "raw documents landed" and "training shards written" that
wasn't already covered by the dedup/similarity/quality keys. All FULL-oracle.
Registered after the attestation window (engine.registry order) so the
driver's 50-key CORRECTNESS cap keeps sampling round 1's never-attested
families.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag

_TMP = tempfile.gettempdir()


@query(
    "data_split_stratified",
    oracle="""
    SELECT lang, split, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
    FROM (
      SELECT lang, n_chars,
             CASE WHEN (doc_id * 1000003 + 17) % 100 < 80 THEN 'train'
                  WHEN (doc_id * 1000003 + 17) % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) s
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def data_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split with per-language audit
    counts. The split key is the same engine-agnostic multiplicative hash as
    sample_hash_repro (engine/analytics.py) — NOT df.randomSplit, which is
    seed- and partition-layout-dependent and therefore unreproducible across
    runs, engines, or cluster sizes. Any downstream system can re-derive the
    exact membership from doc_id alone.

    100 TB: the split column is a pure projection (zero shuffle); the audit
    agg groups on ~15 (lang, split) cells, fully map-side collapsed. The
    same expression tags shard writes via partitionBy('split')."""
    d = load(spark, sf_dir, "documents")
    b = (F.col("doc_id") * 1000003 + 17) % 100
    return (
        d.select(
            "lang",
            "n_chars",
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang", "split")
    )


@query(
    "text_containment",
    oracle="""
    WITH sh AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
               i -> string_split(text, ' ')[i] || ' ' ||
                    string_split(text, ' ')[i+1] || ' ' ||
                    string_split(text, ' ')[i+2])) AS s
      FROM documents),
    inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
    co AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id <> b.doc_id
           GROUP BY a.doc_id, b.doc_id)
    SELECT a_id, b_id, round(c::DOUBLE / len(x.s), 4) AS containment
    FROM co JOIN sh x ON x.doc_id = a_id
    WHERE c::DOUBLE / len(x.s) >= 0.5
    """,
)
def text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed 3-gram containment C(A→B) = |A∩B| / |A| ≥ 0.5: the near-dup
    measure for SUBSET duplication (a doc quoted inside a larger one), which
    symmetric Jaccard misses — |A∩B|/|A∪B| shrinks as B grows while |A∩B|/|A|
    stays at 1. Directed, so (a,b) and (b,a) carry different scores.

    Same count-aggregated inverted-index join as dedup_ngram_jaccard: the
    gram equi-join emits (pair, shared-gram) rows, one groupBy counts them
    into |A∩B| (grams per-doc distinct), one size join divides by |A|.

    100 TB: shuffle volume is O(candidate pairs) after map-side partial agg;
    hot grams get the df-cap treatment (dedup_near_minhash) when thresholds
    allow — a gram in f docs contributes f² pair rows, so capping f bounds
    the worst case without touching recall above the cap's support."""
    d = load(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)),"
                " i -> concat_ws(' ', split(text, ' ')[i-1],"
                " split(text, ' ')[i], split(text, ' ')[i+1]))"
            )
        ).alias("s"),
    )
    inv = sh.select("doc_id", F.explode("s").alias("g"))
    a = inv.select(F.col("doc_id").alias("a_id"), "g")
    b = inv.select(F.col("doc_id").alias("b_id"), "g")
    co = (
        a.join(b, "g")
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("c"))
    )
    sizes = sh.select(F.col("doc_id").alias("a_id"), F.size("s").alias("na"))
    cont = F.col("c").cast("double") / F.col("na")
    return (
        co.join(sizes, "a_id")
        .filter(cont >= 0.5)
        .select("a_id", "b_id", F.round(cont, 4).alias("containment"))
    )


@query(
    "etl_dq_profile",
    oracle="""
    SELECT 'o_orderkey' AS col, count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS vmin,
           CAST(max(o_orderkey) AS VARCHAR) AS vmax FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(CAST(round(min(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(round(max(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate),
           CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority), min(o_orderpriority),
           max(o_orderpriority)
    FROM orders
    """,
)
def etl_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the orders table: per-column null count, exact
    distinct count, and stringified min/max — the pre-ingest audit every
    pipeline runs before trusting a new drop. Numeric extremes go through
    DECIMAL so the string form is engine-stable ('123.45', never '1.2345E2').

    One pass over the table: a single agg computes all 6×4 metrics, then a
    stack() unpivots the one wide row into the (col, metric...) long form —
    the table is scanned once, not once per column. Multiple exact
    count-distincts make Catalyst plan an Expand (×6 row multiply before the
    shuffle); at 100 TB swap approx_count_distinct into the same slot and the
    Expand disappears — the code keeps exact NDV here because the oracle
    must match bit-for-bit."""
    o = load(spark, sf_dir, "orders")
    dec = lambda c: F.round(c, 2).cast("decimal(18,2)").cast("string")  # noqa: E731
    wide = o.agg(
        (F.count("*") - F.count("o_orderkey")).alias("null_1"),
        F.countDistinct("o_orderkey").alias("ndv_1"),
        F.min("o_orderkey").cast("string").alias("min_1"),
        F.max("o_orderkey").cast("string").alias("max_1"),
        (F.count("*") - F.count("o_custkey")).alias("null_2"),
        F.countDistinct("o_custkey").alias("ndv_2"),
        F.min("o_custkey").cast("string").alias("min_2"),
        F.max("o_custkey").cast("string").alias("max_2"),
        (F.count("*") - F.count("o_orderstatus")).alias("null_3"),
        F.countDistinct("o_orderstatus").alias("ndv_3"),
        F.min("o_orderstatus").alias("min_3"),
        F.max("o_orderstatus").alias("max_3"),
        (F.count("*") - F.count("o_totalprice")).alias("null_4"),
        F.countDistinct("o_totalprice").alias("ndv_4"),
        dec(F.min("o_totalprice")).alias("min_4"),
        dec(F.max("o_totalprice")).alias("max_4"),
        (F.count("*") - F.count("o_orderdate")).alias("null_5"),
        F.countDistinct("o_orderdate").alias("ndv_5"),
        F.min("o_orderdate").cast("string").alias("min_5"),
        F.max("o_orderdate").cast("string").alias("max_5"),
        (F.count("*") - F.count("o_orderpriority")).alias("null_6"),
        F.countDistinct("o_orderpriority").alias("ndv_6"),
        F.min("o_orderpriority").alias("min_6"),
        F.max("o_orderpriority").alias("max_6"),
    )
    names = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    stack = ", ".join(
        f"'{n}', null_{i}, ndv_{i}, min_{i}, max_{i}" for i, n in enumerate(names, 1)
    )
    return wide.selectExpr(
        f"stack(6, {stack}) AS (col, n_null, n_distinct, vmin, vmax)"
    )


@query(
    "scan_text_lines",
    oracle="SELECT doc_id, text FROM documents",
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text source: documents written as one `doc_id\\ttext`
    line each (spark.write.text), read back with spark.read.text and
    re-parsed — the raw-corpus ingestion format (a .txt/.jsonl sibling of the
    csv/json/orc/parquet sources already covered). Corpus text is
    space-separated words, so the tab delimiter is collision-free.

    100 TB: text is splittable by line, so a directory of .txt shards fans
    out like any other source; parsing is per-row projection (zero shuffle).
    The tab-split uses instr+substring, not split(), to keep any tabs INSIDE
    the payload intact."""
    path = f"{_TMP}/spark_graft_text_lines_{sftag(sf_dir)}"
    d = load(spark, sf_dir, "documents")
    d.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("text"))
    ).coalesce(1).write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    tab = F.instr(F.col("value"), "\t")
    return lines.select(
        F.substring(F.col("value"), F.lit(1), tab - 1).cast("long").alias("doc_id"),
        F.col("value").substr(tab + 1, F.length("value")).alias("text"),
    )


@query(
    "etl_incremental_watermark",
    oracle="""
    SELECT event_type, count(*) AS n_new, min(ts) AS first_ts, max(ts) AS last_ts
    FROM events
    WHERE ts > (SELECT max(ts) FROM events WHERE event_id % 10 < 8)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def etl_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch incremental load: the high-watermark pattern. The "already
    loaded" snapshot (here: the deterministic 80% slice event_id % 10 < 8 —
    a stand-in for the previous run's bookmark table) yields max(ts); only
    rows strictly past it are ingested, summarized per type for the load
    audit.

    100 TB: the watermark is a one-row agg broadcast into the filter —
    `ts > wm` then prunes parquet row groups via min/max statistics, so an
    incremental run reads only the tail files of a time-partitioned layout,
    not the table. This is the batch twin of streaming's watermark keys
    (engine/streaming.py)."""
    ev = load(spark, sf_dir, "events")
    wm = ev.filter(F.col("event_id") % 10 < 8).agg(F.max("ts").alias("wm"))
    return (
        ev.join(F.broadcast(wm))
        .filter(F.col("ts") > F.col("wm"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_new"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("event_type")
    )
