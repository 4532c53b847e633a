"""Extras batch 24 module (r05 continuation): Z-order (Morton) curve
encoding for multi-dimensional clustering, and multi-character-delimiter
CSV ingest.

SURVEY §2 families extended: §2.A+§4 (Z-ordering — the layout technique
behind multi-dimensional file skipping: sorting by the interleaved curve
clusters BOTH dimensions, where a lexicographic sort clusters only the
leading one), §2.A (the `sep="||"` CSV dialect legacy feeds emit).

Determinism discipline (SURVEY §5.3): bit interleaving is pure BIGINT
shift/mask arithmetic, identical in both engines; the CSV round-trip is
audited by counts and sums, not file bytes.
"""

from __future__ import annotations

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag

_ZBITS = 8  # 8 bits per dimension -> 16-bit z codes over a 256x256 grid


def _interleave_sql(x: str, y: str) -> str:
    """SQL expression interleaving the low _ZBITS bits of x (even
    positions) and y (odd positions) — plain shifts/masks/adds."""
    parts = []
    for b in range(_ZBITS):
        parts.append(f"((({x} >> {b}) & 1) << {2 * b})")
        parts.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(parts)


@query(
    "fn_zorder_encode",
    oracle=f"""
    WITH pts AS (
      SELECT o_orderkey,
             CAST(o_custkey % 256 AS BIGINT) AS gx,
             CAST((o_orderkey // 7) % 256 AS BIGINT) AS gy
      FROM orders
    )
    SELECT o_orderkey, gx, gy,
           CAST({_interleave_sql("gx", "gy")} AS BIGINT) AS z
    FROM pts
    """,
)
def fn_zorder_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve encoding: each order's 2-D grid cell
    (customer bucket × synthetic second dimension, 256×256) is mapped to
    a single integer by interleaving the coordinate bits — the curve
    that makes ONE sort cluster BOTH dimensions. Locality (unit-tested):
    points close in z are close in (gx, gy), so a z-sorted file's
    row-group min/max stats prune 2-D range predicates that a
    lexicographic (gx, gy) sort can only prune on gx.

    Plan note: pure shift/mask codegen, zero shuffles for the encode;
    the payoff step (sort-by-z before writing, as sink_sorted_clustered
    does for 1-D) turns 2-D range scans into row-group skipping. 100 TB:
    this is the standard multi-dimensional clustering layout (Delta
    OPTIMIZE ZORDER, Iceberg sort orders) expressed as plain integer
    arithmetic + one global sort at write time."""
    o = load(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).cast("long").alias("gx"),
        ((F.col("o_orderkey") / 7).cast("long") % 256).cast("long").alias("gy"),
    )
    return pts.withColumn("z", F.expr(_interleave_sql("gx", "gy")).cast("long"))


@query(
    "scan_csv_multichar_delim",
    oracle="""
    SELECT count(*) AS n,
           count(DISTINCT s_nationkey) AS n_nations,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier
    """,
)
def scan_csv_multichar_delim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-character delimiter CSV: the supplier table round-tripped
    through a `||`-separated file — the dialect legacy mainframe/ERP
    feeds actually emit (single-char delimiters collide with free-text
    name fields; a 2-char sep is the usual fix). Explicit schema on
    read-back; the audit (count, distinct keys, balance sum) must equal
    a direct source scan.

    100 TB: multi-char-sep parsing runs in the uniVocity parser like any
    CSV — splittable by line, embarrassingly parallel per file; the
    dialect costs nothing at scale, unlike non-splittable gzip
    (sink_compression_codecs' caveat)."""
    base = scratch_dir(prefix=f"sg-mcd-{sftag(sf_dir)}-")
    load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    ).write.mode("overwrite").option("sep", "||").option("header", "true").csv(base)
    back = (
        spark.read.schema(
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
        )
        .option("sep", "||")
        .option("header", "true")
        .csv(base)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("s_nationkey").alias("n_nations"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )
