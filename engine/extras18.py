"""Extras batch 18 module (r05 continuation): hive-partitioned sink with
partition discovery + pruning, HTML tag stripping (C4-style cleaning),
RFM quintile segmentation, and schema-drift CSV ingest.

SURVEY §2 families extended: §2.A (partitionBy layout writing, partition
discovery on read-back, and a second schema-evolution ingest shape for
CSV), §2.I (HTML stripping — the first transform every web-crawl corpus
runs), §2.D+§2.E (RFM: three windowed quintiles over one per-entity
aggregate — the classic customer-analytics composition).

Determinism discipline (SURVEY §5.3): ntile runs over total orders
(metric + unique key tie-break); the synthetic HTML wrapper is built from
the document text itself so the strip step's correctness is checkable
row-by-row; drift nulls are counted, never silently dropped.
"""

from __future__ import annotations

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load, sftag


@query(
    "sink_hive_partitioned",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
)
def sink_hive_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout partitioned sink: events written `partitionBy
    (event_type)` into key=value directories, re-discovered on read-back
    (the partition column comes from the PATH, not the files), and
    queried with a partition-pruning filter. The oracle recomputes from
    the source — the layout round-trip loses nothing, and the read plan
    touches only the two matching directories (PartitionFilters, pinned
    in tests).

    100 TB: directory partitioning is the coarsest and cheapest pruning
    layer — a filter on the partition key skips entire directories at
    PLANNING time, before any file IO. Rule of thumb: partition on
    low-cardinality operational keys (date, source, type), never on
    high-cardinality ones (file-per-value explosion — the small-files
    problem etl_compact_small_files handles)."""
    base = scratch_dir(prefix=f"sg-hivepart-{sftag(sf_dir)}-")
    slim = load(spark, sf_dir, "events").select(
        "event_id", "value", "event_type"
    )
    slim.write.mode("overwrite").partitionBy("event_type").parquet(base)
    # explicit schema: no inference pass, robust to a zero-row write
    back = spark.read.schema(slim.schema).parquet(base)
    return (
        back.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@query(
    "text_html_strip",
    oracle="""
    WITH wrapped AS (
      SELECT doc_id,
             '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR)
               || '</h1><p class="body">' || text
               || '</p><br/><footer>&copy; corpus</footer></body></html>'
               AS html,
             text
      FROM documents
    )
    SELECT doc_id,
           len(html) - len(regexp_replace(html, '<[^>]*>', '', 'g'))
             AS tag_chars,
           regexp_replace(
             replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
                     '&copy;', ' '),
             ' +', ' ', 'g') = ' Doc ' || CAST(doc_id AS VARCHAR) || ' '
               || regexp_replace(text, ' +', ' ', 'g') || ' corpus '
             AS strip_roundtrip_ok,
           md5(trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
                                   ' +', ' ', 'g'))) AS clean_hash
    FROM wrapped
    """,
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML stripping, the first transform of every web-crawl pipeline:
    each document is deterministically wrapped in markup (tags + an HTML
    entity), then the C4-style cleaner removes tags (replacing with a
    space so adjacent text doesn't fuse), decodes the entity, and
    collapses whitespace. Output: tag-character count, a row-level flag
    proving strip(wrap(text)) recovers exactly the expected cleaned
    string, and the md5 of the cleaned text (the content fingerprint a
    downstream dedup stage would key on).

    Synthetic wrapping, on purpose: the corpus has no real HTML [DATA],
    and building the markup from the text itself makes the cleaner
    verifiable per-row instead of spot-checkable. Plan: pure row-local
    regex codegen, zero shuffles — at 100 TB this runs at scan speed
    alongside the quality rules (text_gopher_quality_rules)."""
    d = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit('</h1><p class="body">'),
        F.col("text"),
        F.lit("</p><br/><footer>&copy; corpus</footer></body></html>"),
    )
    detagged = F.regexp_replace(html, "<[^>]*>", " ")
    decoded = F.regexp_replace(detagged, "&copy;", " ")
    collapsed = F.regexp_replace(decoded, " +", " ")
    expected = F.concat(
        F.lit(" Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" "),
        F.regexp_replace(F.col("text"), " +", " "),
        F.lit(" corpus "),
    )
    clean_for_hash = F.trim(
        F.regexp_replace(F.regexp_replace(html, "<[^>]*>", " "), " +", " ")
    )
    return d.select(
        "doc_id",
        (
            F.length(html) - F.length(F.regexp_replace(html, "<[^>]*>", ""))
        ).alias("tag_chars"),
        (collapsed == expected).alias("strip_roundtrip_ok"),
        F.md5(clean_for_hash).alias("clean_hash"),
    )


@query(
    "agg_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(ntile(5) OVER (ORDER BY last_order, o_custkey) AS INT) AS r,
           CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS INT) AS f,
           CAST(ntile(5) OVER (ORDER BY monetary, o_custkey) AS INT) AS m,
           CAST(ntile(5) OVER (ORDER BY last_order, o_custkey) * 100
                + ntile(5) OVER (ORDER BY frequency, o_custkey) * 10
                + ntile(5) OVER (ORDER BY monetary, o_custkey) AS INT)
             AS segment
    FROM rfm
    """,
)
def agg_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, quintile ranks of recency (last
    order date), frequency (order count), and monetary (lifetime value),
    composed into the classic 3-digit segment code (555 = best). Each
    ntile orders by (metric, custkey) — the unique-key tie-break makes
    quintile boundaries deterministic even where thousands of customers
    share a frequency of 10 (§5.3 rule 5).

    Plan note: the fact table collapses to one row per customer first
    (one shuffle, partial-agg), then three ntile windows run over the
    customer-sized relation. Unpartitioned ntile = a single-partition
    sort of CUSTOMERS (not orders) — fine into the tens of millions; at
    true 100 TB entity counts swap ntile for percent_rank-over-
    approx-quantile boundaries, which keeps the quintile assignment
    distributed (the agg_quantile_bins shape)."""
    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    w_r = Window.orderBy("last_order", "o_custkey")
    w_f = Window.orderBy("frequency", "o_custkey")
    w_m = Window.orderBy("monetary", "o_custkey")
    r, f_, m = (
        F.ntile(5).over(w_r).cast("int"),
        F.ntile(5).over(w_f).cast("int"),
        F.ntile(5).over(w_m).cast("int"),
    )
    return rfm.select(
        "o_custkey",
        r.alias("r"),
        f_.alias("f"),
        m.alias("m"),
        (r * 100 + f_ * 10 + m).cast("int").alias("segment"),
    )


@query(
    "scan_csv_schema_drift",
    oracle="""
    SELECT count(*) AS n_rows,
           count(c_acctbal) AS n_with_balance,
           count(*) - count(c_acctbal) AS n_drifted,
           round(sum(c_acctbal), 2) AS balance_sum
    FROM (
      SELECT c_acctbal FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT NULL AS c_acctbal FROM customer WHERE c_custkey % 2 = 1
    )
    """,
)
def scan_csv_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift CSV ingest: two CSV batches of the same feed — an old
    export missing the c_acctbal column and a new export carrying it —
    each read with ITS OWN explicit schema and aligned by
    `unionByName(allowMissingColumns=True)`, which materializes the
    missing column as NULL instead of shifting neighbors (CSV is
    positional: one shared 3-column schema over 2-column files is a
    read error, not a NULL — Spark refuses rather than guessing, and
    the per-batch-schema union is the idiomatic drift pattern). The
    audit counts total rows, populated vs drifted rows, and the balance
    sum over rows that have one; the oracle rebuilds the same split
    from the source relation.

    100 TB: feeds drift — schema-per-batch + name-based union survives a
    column added upstream without rewriting history, and it generalizes
    to any number of generations (fold unionByName over the batch list).
    Per-file parse stays embarrassingly parallel; the union is a plan
    concat, not a shuffle."""
    base = scratch_dir(prefix=f"sg-drift-{sftag(sf_dir)}-")
    c = load(spark, sf_dir, "customer")
    c.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_name"
    ).write.mode("overwrite").option("header", "true").csv(f"{base}/old")
    c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", "c_acctbal"
    ).write.mode("overwrite").option("header", "true").csv(f"{base}/new")
    old = (
        spark.read.schema("c_custkey long, c_name string")
        .option("header", "true")
        .csv(f"{base}/old")
    )
    new = (
        spark.read.schema("c_custkey long, c_name string, c_acctbal double")
        .option("header", "true")
        .csv(f"{base}/new")
    )
    back = old.unionByName(new, allowMissingColumns=True)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("c_acctbal").alias("n_with_balance"),
        (F.count(F.lit(1)) - F.count("c_acctbal")).alias("n_drifted"),
        F.round(F.sum("c_acctbal"), 2).alias("balance_sum"),
    )
