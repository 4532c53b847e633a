"""Extras batch 21 module (r05 continuation): the named WINDOW clause and
copy-fidelity checksum reconciliation.

SURVEY §2 families extended: §2.E (the textual `WINDOW w AS (...)` clause
— one definition shared by several window functions, the SQL-standard
form of the API's reused WindowSpec), §2.M (ETL reconciliation: prove a
copy equals its source with per-bucket integer checksums instead of a
row-by-row join).

Determinism discipline (SURVEY §5.3): checksums are pure BIGINT
multiplier-mod arithmetic over (key, line, cents) — order-free modular
sums identical in both engines; the windowed running sum pre-rounds its
operand and orders by a unique key pair.
"""

from __future__ import annotations

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag


@query(
    "sql_named_window_clause",
    oracle="""
    SELECT user_id, event_id,
           round(sum(round(value, 2)) OVER w_run, 2) AS running_value,
           CAST(rank() OVER w_rank AS INT) AS value_rank,
           CAST(row_number() OVER w_run AS INT) AS seq
    FROM events
    WHERE user_id < 20
    WINDOW
      w_run AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_rank AS (PARTITION BY user_id ORDER BY round(value, 2) DESC, event_id)
    """,
)
def sql_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard named WINDOW clause: two window definitions
    declared once at the end of the query and referenced by name from
    three window functions — the textual twin of reusing a WindowSpec
    object in the DataFrame API. Same-name windows collapse to one
    Window operator (one sort per distinct spec, not per function).

    Plan note: both engines plan w_run's three consumers over a single
    user-keyed sort; w_rank adds the second sort on the same shuffle.
    100 TB: the WINDOW clause isn't sugar only — repeating inline OVER
    specs that differ by a typo silently plans EXTRA sorts; naming the
    spec makes reuse structural."""
    tag = sftag(sf_dir)
    vw = f"sg_nw_events_{tag}"
    load(spark, sf_dir, "events").createOrReplaceTempView(vw)
    return spark.sql(
        f"""
        SELECT user_id, event_id,
               round(sum(round(value, 2)) OVER w_run, 2) AS running_value,
               CAST(rank() OVER w_rank AS INT) AS value_rank,
               CAST(row_number() OVER w_run AS INT) AS seq
        FROM {vw}
        WHERE user_id < 20
        WINDOW
          w_run AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_rank AS (PARTITION BY user_id ORDER BY round(value, 2) DESC, event_id)
        """
    )


_CK_P = 1000000007


@query(
    "etl_checksum_reconcile",
    oracle=f"""
    SELECT l_orderkey % 16 AS bucket,
           count(*) AS n_src,
           count(*) AS n_copy,
           CAST(sum(((l_orderkey * 1000003 + l_linenumber) * 31
                     + CAST(round(l_extendedprice * 100) AS BIGINT))
                    % {_CK_P}) AS BIGINT) AS checksum_src,
           CAST(sum(((l_orderkey * 1000003 + l_linenumber) * 31
                     + CAST(round(l_extendedprice * 100) AS BIGINT))
                    % {_CK_P}) AS BIGINT) AS checksum_copy,
           TRUE AS reconciled
    FROM lineitem
    GROUP BY 1
    """,
)
def etl_checksum_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-fidelity reconciliation: lineitem is copied through a parquet
    round-trip, and source vs copy are compared by per-bucket integer
    checksums — row count plus a modular sum over (orderkey, linenumber,
    price-in-cents) — with a per-bucket `reconciled` verdict. The oracle
    recomputes the source checksums and asserts TRUE, so a copy that
    drops, duplicates, or corrupts ANY row flips a flag into a driver
    hash mismatch.

    Why checksums, not joins: reconciling a 100 TB copy row-by-row is a
    full shuffle join of two 100 TB relations; per-bucket modular sums
    are one partial-agg pass over EACH side (order-free, mergeable,
    engine-agnostic integer math) and ship only n_buckets rows to
    compare. Bucketing by key range localizes any mismatch for targeted
    re-copy — the standard migration-validation pattern."""
    src = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    base = scratch_dir(prefix=f"sg-ckrec-{sftag(sf_dir)}-")
    src.write.mode("overwrite").parquet(base)
    copy = spark.read.parquet(base)

    def side(df, n_name, ck_name):
        term = (
            (F.col("l_orderkey") * 1000003 + F.col("l_linenumber")) * 31
            + F.round(F.col("l_extendedprice") * 100).cast("long")
        ) % F.lit(_CK_P).cast("long")
        return df.groupBy((F.col("l_orderkey") % 16).alias("bucket")).agg(
            F.count(F.lit(1)).alias(n_name),
            F.sum(term).cast("long").alias(ck_name),
        )
    s = side(src, "n_src", "checksum_src")
    c = side(copy, "n_copy", "checksum_copy")
    return (
        s.join(c, "bucket")
        .select(
            "bucket",
            "n_src",
            "n_copy",
            "checksum_src",
            "checksum_copy",
            (
                (F.col("n_src") == F.col("n_copy"))
                & (F.col("checksum_src") == F.col("checksum_copy"))
            ).alias("reconciled"),
        )
    )
