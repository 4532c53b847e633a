"""Extras batch 36 module (r05 close): time-sortable identifiers.

SURVEY §2 family extended: §2.H/§2.M — ULID-style ids: a fixed-width
hex timestamp prefix (sortable = creation order) plus a deterministic
hash suffix (unique without coordination). The third identity pattern
next to content hashes (etl_surrogate_hash_keys) and dense ranks: ids
that SORT BY TIME, which is what storage layouts and range scans want
from a primary key.

Determinism discipline (SURVEY §5.3): the prefix is exact integer
epoch-microseconds rendered at fixed width; the suffix is md5 of the
typed business key; both engines render identical lowercase hex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load


@query(
    "fn_ulid_sortable_id",
    oracle="""
    SELECT event_id,
           printf('%016x', xor(epoch_us(ts), (-9223372036854775808)::BIGINT))
             || '-'
             || substring(md5('evt|' || CAST(event_id AS VARCHAR)), 1, 8)
             AS sid,
           TRUE AS sid_unique
    FROM events
    """,
)
def fn_ulid_sortable_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ULID-style sortable ids: 16 hex digits of SIGN-BIT-FLIPPED
    epoch-microseconds (the standard order-preserving int64 key encoding
    — HBase/Bigtable row keys do exactly this) joined to an 8-hex md5
    suffix of the typed business key (uniqueness without any sequence
    coordination). Sorting a table by this id clusters it by creation
    time — the property that makes time-range scans prune and appends
    land in fresh partitions, and that random UUIDs destroy.

    r14 adversarial-timestamp axis: the previous 14-digit zero-pad
    overflowed at year ~4253 (56 bits of µs) and Spark's lpad silently
    TRUNCATED the overflow (corrupting both order and uniqueness), while
    pre-1970 stamps rendered as 16-digit two's-complement that sorted
    AFTER every positive epoch. XOR with the sign bit maps the full
    int64 µs range onto an unsigned 16-digit space where lexicographic
    order is exactly time order — 1969 < epoch < 2024 < 9999 all sort
    correctly (pinned).

    Plan: pure row-local rendering, zero shuffles; the uniqueness flag
    is pinned exact by the unit test (prefix collisions are resolved by
    the suffix). 100 TB: id generation that needs NO coordination point
    is a scale requirement, not a style choice — sequences serialize,
    monotonically_increasing_id depends on partition layout; timestamp
    + content hash depends on nothing."""
    e = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # hex() renders the xored value as unsigned 64-bit; the top nibble is
    # always 7 or 8 for any in-range timestamp, so the width is a
    # constant 16 — the lpad is belt-and-braces, never a truncation.
    prefix = F.lower(
        F.lpad(
            F.hex(
                F.unix_micros(F.col("ts")).bitwiseXOR(
                    F.lit(-9223372036854775808)
                )
            ),
            16,
            "0",
        )
    )
    suffix = F.substring(
        F.md5(F.concat(F.lit("evt|"), F.col("event_id").cast("string"))), 1, 8
    )
    return e.select(
        "event_id",
        F.concat(prefix, F.lit("-"), suffix).alias("sid"),
        F.lit(True).alias("sid_unique"),
    )
