"""Round-4 batch 22: data-governance and storage-codec surface (SURVEY §2
extension; the reference at /root/reference is an empty directory — SURVEY
§2 is the operative spec).

- ``fn_mask_pii``: the mask() expression — format-preserving redaction for
  display/export paths.
- ``fn_aes_roundtrip``: column-level AES encryption with a verified
  decrypt round-trip — at-rest protection for sensitive columns.
- ``sink_compression_codecs``: zstd parquet + gzip CSV sinks round-tripped
  and proven content-identical — codec choice is a storage/CPU trade,
  never a correctness one.
"""

from __future__ import annotations

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag


@query(
    "fn_mask_pii",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS name_masked,
           regexp_replace(
             printf('%03d-%07d', c_nationkey, (c_custkey * 7919) % 10000000),
             '[0-9]', 'n', 'g') AS phone_masked,
           length(c_name) AS name_len
    FROM customer ORDER BY c_custkey
    """,
)
def fn_mask_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-preserving PII redaction with the native mask() expression:
    uppercase→X, lowercase→x, digits→n, punctuation/spacing preserved — so
    masked exports keep their shape (lengths, separators) for debugging
    and joins-on-format while carrying zero identifying content. The
    oracle mirrors with regexp_replace chains, pinning mask()'s default
    character classes.

    100 TB: mask() is a codegen'd per-row expression (zero shuffle) —
    apply it AT EXPORT in the select list of the sink query, never by
    rewriting stored data; pair with fn_aes_roundtrip for the
    at-rest-reversible variant."""
    c = load(spark, sf_dir, "customer")
    # the corpus customer table has no phone column — derive a stable
    # phone-SHAPED string from the keys so the masked output keeps the
    # digit/dash format a real phone field would have
    phone = F.format_string(
        "%03d-%07d", F.col("c_nationkey"), (F.col("c_custkey") * 7919) % 10000000
    )
    return (
        c.withColumn("phone_src", phone)
        .select(
            "c_custkey",
            F.expr("mask(c_name)").alias("name_masked"),
            F.expr("mask(phone_src)").alias("phone_masked"),
            F.length("c_name").alias("name_len"),
        )
        .orderBy("c_custkey")
    )


@query(
    "fn_aes_roundtrip",
    # Self-validating FULL: the ciphertext is AES output (no DuckDB twin),
    # but the round-trip plaintext IS the source column, the PKCS7 padded
    # length is pure arithmetic, and the verified flag is deterministic.
    oracle="""
    SELECT c_custkey,
           c_name AS name_roundtrip,
           CAST((octet_length(encode(c_name)) // 16 + 1) * 16 AS INT) AS cipher_len,
           TRUE AS roundtrip_ok
    FROM customer ORDER BY c_custkey
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption: aes_encrypt the customer name (AES-128-ECB
    — deterministic, unlike the default GCM whose random IV would make
    every run differ; real deployments pick GCM + stored IVs) and verify
    try_aes_decrypt restores the exact plaintext. Output: the round-
    tripped name (oracle = the source column), the PKCS7 ciphertext
    length ((len/16 + 1)·16 — pure arithmetic), and the verified flag.

    100 TB: both directions are codegen'd JVM expressions — encrypt at
    ingest in the write path's select list, grant decrypt by key
    distribution, keep the key OUT of the data plane (here a fixture
    constant; production uses a KMS-resolved session conf)."""
    key = "sg-fixture-key16"  # exactly 16 bytes → AES-128; fixture, not a secret
    c = load(spark, sf_dir, "customer")
    enc = F.expr(f"aes_encrypt(c_name, '{key}', 'ECB')")
    dec = F.expr(
        f"cast(try_aes_decrypt(aes_encrypt(c_name, '{key}', 'ECB'), '{key}', 'ECB')"
        " as string)"
    )
    return c.select(
        "c_custkey",
        dec.alias("name_roundtrip"),
        F.octet_length(enc).cast("int").alias("cipher_len"),
        (dec == F.col("c_name")).alias("roundtrip_ok"),
    ).orderBy("c_custkey")


@query(
    "sink_compression_codecs",
    oracle="""
    SELECT 'csv_gzip' AS fmt, count(*) AS n,
           round(sum(l_extendedprice), 2) AS total
    FROM lineitem WHERE l_orderkey < 10000
    UNION ALL
    SELECT 'parquet_zstd', count(*), round(sum(l_extendedprice), 2)
    FROM lineitem WHERE l_orderkey < 10000
    ORDER BY fmt
    """,
)
def sink_compression_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec round-trips: the same slice written as zstd parquet and gzip
    CSV, read back through each codec, and aggregated — identical numbers
    from both paths (and from the oracle's direct scan) prove compression
    is storage-layer only. zstd is the modern parquet default (better
    ratio AND speed than snappy); gzip CSV is the interchange format
    everything legacy emits.

    100 TB: codec choice moves TBs — zstd parquet ≈ 2-4× smaller than
    snappy on text-heavy columns at similar scan CPU; gzip CSV is
    NON-SPLITTABLE (one task per file — keep files ≤ a few hundred MB or
    use bzip2/no compression for parallel ingest of giant files)."""
    base = scratch_dir(prefix=f"sg-codecs-{sftag(sf_dir)}-")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 10000).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    li.write.mode("overwrite").option("compression", "zstd").parquet(f"{base}/pq")
    li.write.mode("overwrite").option("compression", "gzip").option(
        "header", "true"
    ).csv(f"{base}/csv")
    pq = spark.read.parquet(f"{base}/pq")
    cs = spark.read.option("header", "true").schema(
        "l_orderkey long, l_linenumber int, l_extendedprice double"
    ).csv(f"{base}/csv")
    return (
        pq.agg(
            F.lit("parquet_zstd").alias("fmt"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .unionByName(
            cs.agg(
                F.lit("csv_gzip").alias("fmt"),
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("total"),
            )
        )
        .orderBy("fmt")
    )
