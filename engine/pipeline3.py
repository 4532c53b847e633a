"""Capstone #4: the dedup cascade — exact hash dedup, MinHash near-dedup,
and connected-component canonicalization composed into ONE fused pipeline
with a per-source attrition manifest.

This is the shape every production corpus pipeline runs nightly: a
re-crawl batch arrives (same content, new ids), exact dedup removes the
verbatim re-ingests, near-dedup removes the boilerplate-variant survivors,
and the manifest reports how much of each source survived each stage —
the attrition audit that catches a crawler gone wrong before training does.

The re-crawl is simulated deterministically (every doc_id % 10 == 0
document re-ingested under doc_id + 100000, same text) so the exact stage
has real work on this corpus (which has no verbatim dups of its own: 500
distinct texts at sf0.01) while staying SQL-reproducible for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load

_RECRAWL_SHIFT = 100000


@query(
    "pipeline_dedup_cascade",
    oracle=f"""
    WITH RECURSIVE
    ingest AS (
      SELECT doc_id, source, text FROM documents
      UNION ALL
      SELECT doc_id + {_RECRAWL_SHIFT} AS doc_id, source, text
      FROM documents WHERE doc_id % 10 = 0
    ),
    exact_keep AS (
      SELECT min(doc_id) AS doc_id FROM ingest GROUP BY md5(text)
    ),
    kept AS (
      SELECT i.doc_id, i.source, i.text
      FROM ingest i JOIN exact_keep e USING (doc_id)
    ),
    sh AS (
      SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 5) AS g
      FROM kept, UNNEST(range(1, greatest(length(text) - 4, 1) + 1)) AS t(i)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a_id, b_id FROM inter
      JOIN sz sa ON sa.doc_id = a_id
      JOIN sz sb ON sb.doc_id = b_id
      WHERE 1.0 - i / CAST(sa.n + sb.n - i AS DOUBLE) <= 0.6
    ),
    und AS (SELECT a_id AS src, b_id AS dst FROM pairs
            UNION ALL SELECT b_id, a_id FROM pairs),
    walk(node, label) AS (
      SELECT doc_id, doc_id FROM kept
      UNION
      SELECT u.dst, w.label FROM walk w JOIN und u ON u.src = w.node
    ),
    comp AS (SELECT node AS doc_id, min(label) AS cluster_id
             FROM walk GROUP BY node),
    near_kept AS (
      SELECT k.doc_id, k.source FROM kept k
      JOIN comp c ON c.doc_id = k.doc_id AND c.cluster_id = k.doc_id
    )
    SELECT i.source,
           count(*) AS n_ingested,
           count(k.doc_id) AS n_after_exact,
           count(nk.doc_id) AS n_after_near,
           round(CAST(count(nk.doc_id) AS DOUBLE) / count(*), 4) AS retention
    FROM ingest i
    LEFT JOIN kept k ON k.doc_id = i.doc_id
    LEFT JOIN near_kept nk ON nk.doc_id = i.doc_id
    GROUP BY i.source
    """,
)
def pipeline_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cascade capstone: (re-crawl ∪ corpus) → exact md5 dedup →
    MinHash-LSH near-dedup (the dedup_near_minhash kernel, reused on the
    exact survivors) → connected-component canonicalization (min-label
    propagation, dedup_cluster_components' Pregel shape) → per-source
    attrition manifest (ingested / after-exact / after-near / retention).

    Stage plan, in 100 TB terms:
    1. EXACT — one hash shuffle on md5(text) with partial-agg min; the
       keeper join is a left-semi on doc_id. Runs FIRST because it is the
       cheapest stage and every row it kills never reaches the shingle
       explode (the expensive part). md5 here, not xxhash64: the oracle
       must compute the identical hash, and a 128-bit digest makes
       cross-text collisions a non-concern at any corpus size.
    2. NEAR — the bucketed MinHash kernel (32 perms, 16×r=2 bands,
       frequency-capped buckets: candidate work O(Σ min(|bucket|,cap)²),
       recall 1.0 on this corpus, unit-tested at the kernel level).
    3. COMPONENTS — near-dup pairs are a tiny edge list (25 pairs at
       sf0.01); min-label propagation over broadcast edges converges in
       diameter rounds, collecting one scalar per round. Keeper = min
       doc_id per component, so a re-crawled variant can never oust an
       original.
    4. MANIFEST — three bounded per-source counts joined on the source
       key; output is source-cardinality, not corpus-cardinality.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    recrawl = d.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(_RECRAWL_SHIFT)
    )
    ingest = d.unionByName(recrawl)

    # Stage 1: exact dedup (keeper = min doc_id per content hash).
    keepers = (
        ingest.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = ingest.join(keepers, "doc_id", "left_semi")

    # Stage 2: near-dup pairs on the exact survivors (shared kernel).
    from engine.llmops import minhash_near_pairs

    pairs = minhash_near_pairs(kept).select("a_id", "b_id")

    # Stage 3: connected components over the pair graph — only nodes that
    # appear in a pair can lose their own label, so propagate over the
    # participant subgraph (tiny) and treat absent nodes as singletons.
    und = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).union(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    und = F.broadcast(und.cache())
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    prev_sum = None
    for _ in range(32):  # bound >> diameter; exits at fixpoint
        msgs = (
            und.join(labels, und.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(msgs, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # Drop every pair participant whose component label is not itself.
    losers = labels.filter(F.col("label") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    near_kept = kept.join(losers, "doc_id", "left_anti").select("doc_id", "source")

    # Stage 4: per-source attrition manifest. The three counts join with
    # eqNullSafe (r13): groupBy keeps a NULL-source group, and the
    # oracle's LEFT JOIN ... GROUP BY i.source counts it like any other
    # source — a plain equi-join would zero its attrition columns.
    n_in = ingest.groupBy("source").agg(F.count(F.lit(1)).alias("n_ingested"))
    n_ex = kept.groupBy(F.col("source").alias("s_ex")).agg(
        F.count(F.lit(1)).alias("n_after_exact")
    )
    n_nr = near_kept.groupBy(F.col("source").alias("s_nr")).agg(
        F.count(F.lit(1)).alias("n_after_near")
    )
    return (
        n_in.join(n_ex, F.col("source").eqNullSafe(F.col("s_ex")), "left")
        .join(n_nr, F.col("source").eqNullSafe(F.col("s_nr")), "left")
        .select(
            "source",
            "n_ingested",
            F.coalesce("n_after_exact", F.lit(0)).alias("n_after_exact"),
            F.coalesce("n_after_near", F.lit(0)).alias("n_after_near"),
            F.round(
                F.coalesce("n_after_near", F.lit(0)).cast("double")
                / F.col("n_ingested"),
                4,
            ).alias("retention"),
        )
    )
