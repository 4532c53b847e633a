"""Extras batch 22 module (r05 continuation): SQL resolution ergonomics
(ordinals + aliases), ANSI percentile_cont/percentile_disc WITHIN GROUP,
and whole-file text ingest.

SURVEY §2 families extended: §2.B/§2.D (the resolution rules every ported
query relies on: GROUP BY ordinal, HAVING over a SELECT alias, ORDER BY
ordinal), §2.D (the ANSI ordered-set aggregates percentile_cont /
percentile_disc — the standard's WITHIN GROUP form of the §2.D percentile
row, with the cont-vs-disc contrast made explicit), §2.A (wholetext reads
— one row per FILE, the document-ingest mode for file-per-document
corpora).

Determinism discipline (SURVEY §5.3): percentiles are computed per group
over unique-valued orderings; disc picks an actual member (exact compare),
cont interpolates (rounded once, both sides); wholetext file contents are
derived deterministically and audited by length + hash, not by filename.
"""

from __future__ import annotations

import os

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag


@query(
    "sql_ordinal_alias_resolution",
    oracle="""
    SELECT o_orderpriority AS prio,
           count(*) AS n,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1
    HAVING n >= 10
    ORDER BY 2 DESC, 1
    """,
)
def sql_ordinal_alias_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL resolution ergonomics in one statement: GROUP BY 1 resolves
    against the SELECT list position, HAVING references the aggregate's
    SELECT alias (n), and ORDER BY mixes an ordinal with a column — the
    three conveniences ANSI leaves implementation-defined and both
    engines resolve identically. Ported analyst SQL leans on all three;
    an engine claiming compatibility must bind them the same way.

    Plan note: resolution is parse/analysis-time only — the physical
    plan is the same hash aggregate + TakeOrdered the explicit form
    produces. Zero runtime cost, pure front-end surface."""
    tag = sftag(sf_dir)
    vw = f"sg_ord_orders_{tag}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(vw)
    return spark.sql(
        f"""
        SELECT o_orderpriority AS prio,
               count(*) AS n,
               round(avg(o_totalprice), 2) AS avg_price
        FROM {vw}
        GROUP BY 1
        HAVING n >= 10
        ORDER BY 2 DESC, 1
        """
    )


@query(
    "agg_percentile_cont_disc",
    oracle="""
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.5), 2) AS median_cont,
           round(quantile_disc(c_acctbal, 0.5), 2) AS median_disc,
           round(quantile_cont(c_acctbal, 0.9), 2) AS p90_cont,
           count(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_percentile_cont_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI ordered-set aggregates: percentile_cont (interpolates
    between the two straddling members) vs percentile_disc (returns an
    actual member — the smallest whose cumulative distribution reaches
    p), both in the standard WITHIN GROUP (ORDER BY ...) syntax, grouped
    by market segment. cont ≠ disc whenever the percentile falls between
    members — reports that quote a 'median account balance' should say
    which one they mean; this key puts both side by side.

    Plan note: exact percentiles sort within each group (state = the
    group's values). At 100 TB swap cont for percentile_approx's GK
    sketch (agg_approx_median's mergeable, bounded-state shape) and keep
    disc only where an actual member value is contractually required."""
    tag = sftag(sf_dir)
    vw = f"sg_pcd_customer_{tag}"
    load(spark, sf_dir, "customer").createOrReplaceTempView(vw)
    return spark.sql(
        f"""
        SELECT c_mktsegment,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY c_acctbal), 2)
                 AS median_cont,
               round(percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal), 2)
                 AS median_disc,
               round(percentile_cont(0.9) WITHIN GROUP (ORDER BY c_acctbal), 2)
                 AS p90_cont,
               count(*) AS n
        FROM {vw}
        GROUP BY c_mktsegment
        """
    )


@query(
    "scan_text_wholefile",
    oracle="""
    WITH parts AS (
      SELECT n_regionkey,
             string_agg(n_name, chr(10) ORDER BY n_name) AS body
      FROM nation GROUP BY n_regionkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(len(body)) AS BIGINT) AS total_chars,
           CAST(sum(len(body) - len(replace(body, chr(10), '')) + 1) AS BIGINT)
             AS total_lines
    FROM parts
    """,
)
def scan_text_wholefile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file text ingest: one document per region (its nations, one
    per line) written as individual .txt files, read back with the
    `wholetext` option — ONE ROW PER FILE, newlines preserved — and
    audited by file count, total characters, and total line count
    against a source recompute. Contrast scan_text_lines (default mode:
    one row per LINE, file identity lost).

    100 TB: wholetext is the ingest mode for file-per-document corpora
    (web pages, transcripts, source files) where a document must stay
    one record. Caveat at scale: each file must fit in one task's memory
    — it is deliberately NOT splittable; shard oversized documents
    upstream or switch to line/offset framing."""
    base = scratch_dir(prefix=f"sg-whole-{sftag(sf_dir)}-")
    n = load(spark, sf_dir, "nation")
    parts = (
        n.groupBy("n_regionkey")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), "\n").alias("body"))
        .collect()
    )
    for r in parts:
        with open(f"{base}/region_{r['n_regionkey']}.txt", "w") as fh:
            fh.write(r["body"])
    back = spark.read.text(base, wholetext=True)
    return back.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.length("value")).cast("long").alias("total_chars"),
        F.sum(
            F.length("value")
            - F.length(F.regexp_replace("value", "\n", ""))
            + 1
        )
        .cast("long")
        .alias("total_lines"),
    )
