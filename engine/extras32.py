"""Extras batch 32 module (r05 continuation): training-shard manifests
and token-overlap F1 evaluation.

SURVEY §2 families extended: §2.I (shard packaging — the WebDataset/tar
step between a curated corpus and a dataloader: fixed-byte-budget shards
with a manifest; and SQuAD-style token-multiset F1 — the reference
implementation of the most-used text-eval metric, computed relationally).

Determinism discipline (SURVEY §5.3): shard assignment derives from an
exact integer cumulative byte sum in (doc_id) order; F1's multiset
intersection is integer min-of-counts; the one division rounds once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.registry import query
from engine.tables import load

_SHARD_BYTES = 20000


@query(
    "etl_shard_manifest",
    oracle=f"""
    WITH seq AS (
      SELECT doc_id, source, n_chars,
             sum(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
      FROM documents
    ),
    tagged AS (
      SELECT doc_id, source, n_chars,
             CAST((cum - 1) // {_SHARD_BYTES} AS BIGINT) AS shard_id
      FROM seq
    )
    SELECT shard_id,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS shard_bytes,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM tagged GROUP BY shard_id
    """,
)
def etl_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: documents packed in doc_id order into
    ~20 KB byte-budget shards (shard = floor of the exclusive cumulative
    byte count / budget — a document that crosses the boundary opens the
    next shard), with the per-shard manifest a dataloader needs: doc
    count, actual bytes, id range, source mix. This is the packaging
    contract of WebDataset/tar-shard training pipelines — the shards are
    contiguous id ranges, so resuming and range-reading are trivial.

    Plan note: the global ordered cumulative sum is the one inherently
    sequential step — at 100 TB run it hierarchically (per-partition
    subtotals, prefix-scan the ~thousands of subtotals on the driver,
    broadcast offsets back: the emb_pca_project bounded-collect shape);
    everything after is a shard-keyed partial aggregate. The manifest is
    shard-cardinality, not corpus-cardinality."""
    d = load(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    seq = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.sum("n_chars").over(w).alias("cum"),
    )
    tagged = seq.withColumn(
        "shard_id",
        F.floor((F.col("cum") - 1) / _SHARD_BYTES).cast("long"),
    )
    return tagged.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )


@query(
    "text_eval_token_f1",
    oracle="""
    WITH ref AS (
      SELECT doc_id, u.tok, count(*) AS rc
      FROM documents, UNNEST(string_split(text, ' ')) AS u(tok)
      GROUP BY doc_id, u.tok
    ),
    hyp AS (
      SELECT doc_id, CASE WHEN (k - 1) % 7 = 0 THEN 'UNK' ELSE t[k] END AS tok,
             count(*) AS hc
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(range(1, len(t) + 1)) AS u(k)
      GROUP BY 1, 2
    ),
    ov AS (
      SELECT r.doc_id, sum(least(r.rc, h.hc)) AS overlap
      FROM ref r JOIN hyp h ON r.doc_id = h.doc_id AND r.tok = h.tok
      GROUP BY r.doc_id
    ),
    tot AS (
      SELECT doc_id, sum(rc) AS n_ref FROM ref GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(o.overlap, 0) AS BIGINT) AS overlap,
           CAST(t.n_ref AS BIGINT) AS n_tokens,
           round(2.0 * coalesce(o.overlap, 0) / (t.n_ref + t.n_ref), 4) AS f1
    FROM tot t LEFT JOIN ov o ON o.doc_id = t.doc_id
    """,
)
def text_eval_token_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQuAD-style token F1, relationally: the 'model hypothesis' is the
    document with every 7th token masked to UNK (a deterministic stand-in
    for generation noise), the reference is the document itself, and F1
    is computed from the token-MULTISET intersection (sum of min counts
    per token — duplicate tokens must not double-credit). Hypothesis and
    reference have equal length here, so P = R = F1 = overlap/n — the
    multiset machinery is what the key exercises.

    Plan: two explode→count aggregations (token-grain), one
    (doc, token)-keyed join whose partials collapse per token, one
    per-doc sum — every stage hash-partitions; no Python. 100 TB: this
    IS the eval-harness scoring shape — hypothesis table joins reference
    table on (example_id, token); a million-example eval scores in one
    such pass."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    ref = (
        toks.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("rc"))
    )
    hyp = (
        toks.select(
            "doc_id",
            F.posexplode("t").alias("k0", "tok0"),
        )
        .select(
            "doc_id",
            F.when(F.col("k0") % 7 == 0, F.lit("UNK"))
            .otherwise(F.col("tok0"))
            .alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("hc"))
    )
    ov = (
        ref.join(hyp, ["doc_id", "tok"])
        .groupBy("doc_id")
        .agg(F.sum(F.least("rc", "hc")).alias("overlap"))
    )
    tot = ref.groupBy("doc_id").agg(F.sum("rc").alias("n_ref"))
    return (
        tot.join(ov, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
            F.col("n_ref").cast("long").alias("n_tokens"),
            F.round(
                2.0
                * F.coalesce("overlap", F.lit(0))
                / (F.col("n_ref") + F.col("n_ref")),
                4,
            ).alias("f1"),
        )
    )
