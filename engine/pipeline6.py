"""Capstone #7: incremental corpus refresh — dedup the NEWLY ARRIVED
batch against the existing corpus without ever re-deduping the existing
corpus against itself.

pipeline_dedup_cascade is the full-rebuild pipeline; production corpora
refresh INCREMENTALLY: tonight's crawl must be checked (a) exactly and
(b) near-duplicately against everything already accepted, plus within
itself — but old-vs-old work is never repeated and old documents are
never dropped. The asymmetry is the entire cost model: incremental
refresh is O(new × collisions), not O((old+new)²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load


# Above this many within-new near-dup pairs, components run distributed
# (Pregel min-label) instead of as a driver-side union-find. A typical
# refresh yields tens of pairs, but a pathological batch (recrawl of a
# mirror site) can produce O(batch²) pairs that would OOM the driver if
# collected — the guard makes the capstone total-safe at any batch shape.
_UNION_FIND_MAX_PAIRS = 100_000


def _within_new_losers(
    spark: SparkSession,
    nn: DataFrame,
    *,
    n_pairs_bound: int | None = None,
    force_distributed: bool = False,
) -> DataFrame:
    """Connected components over the within-new near-dup pairs (columns
    a_id, b_id), returning the LOSERS (every member except the min-id
    keeper of its component) as a doc_id DataFrame.

    Two paths with identical keeper semantics, chosen by pair count:
    small graphs collect once into a driver union-find (path-halving;
    cheaper than 1+ distributed rounds when the pair list is KBs); past
    _UNION_FIND_MAX_PAIRS the pairs are never fully collected — the
    shared Pregel min-label kernel (engine.trainext.min_label_components,
    the dedup_cluster_components engine) labels them in O(diameter)
    shuffles. Guard mechanics: ``n_pairs_bound`` is a caller-provided
    UPPER bound on nn's row count (pipeline_incremental_refresh passes a
    count of the already-localCheckpoint'd superset pair list — a free
    job that recomputes nothing), letting the small case run ONE plain
    collect. Without a bound the guard is limit(cap+1).collect(): driver
    memory stays bounded by construction and an under-cap result is
    provably the complete set, at the cost of CollectLimit's incremental
    partition waves (r06 A/B: a separate count() doubled the capstone at
    sf0.1; the bound path matches the unguarded shape exactly)."""
    rows = None
    if not force_distributed:
        if n_pairs_bound is not None and n_pairs_bound <= _UNION_FIND_MAX_PAIRS:
            rows = nn.collect()
        elif n_pairs_bound is None:
            rows = nn.limit(_UNION_FIND_MAX_PAIRS + 1).collect()
    if rows is not None and len(rows) <= _UNION_FIND_MAX_PAIRS:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            a, b = r["a_id"], r["b_id"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        losers = [x for x in parent if find(x) != x]
        if losers:
            return spark.createDataFrame([(x,) for x in losers], "doc_id long")
        return spark.createDataFrame([], "doc_id long")

    from engine.trainext import min_label_components

    edges = nn.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).union(nn.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    # Only pair participants can lose; singletons keep themselves trivially.
    nodes = (
        nn.select(F.col("a_id").alias("node"))
        .union(nn.select(F.col("b_id").alias("node")))
        .distinct()
    )
    labels = min_label_components(edges, nodes)
    return labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )


@query(
    "pipeline_incremental_refresh",
    # FULL oracle under the kernel's recall-1.0 contract (see
    # dedup_near_minhash): near-dup pairs are recomputed exactly in SQL;
    # the incremental semantics (old never dropped, new checked against
    # old then within itself with min-id keepers) are pure set algebra.
    oracle="""
    WITH RECURSIVE
    old AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 5 != 0),
    new AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 5 = 0),
    ex_drop AS (
      SELECT n.doc_id FROM new n
      WHERE md5(n.text) IN (SELECT md5(text) FROM old)
    ),
    sh AS (
      SELECT doc_id, g FROM (
        SELECT doc_id, substring(text, CAST(i AS INT), 5) AS g
        FROM documents,
             UNNEST(range(1, greatest(length(text) - 4, 1) + 1)) AS t(i)
      ) GROUP BY doc_id, g
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
    new1 AS (  -- new docs surviving the exact stage
      SELECT doc_id, source FROM new
      WHERE doc_id NOT IN (SELECT doc_id FROM ex_drop)
    ),
    near_old_drop AS (  -- survivor pairs with ANY old partner
      SELECT DISTINCT n.doc_id FROM new1 n
      JOIN pairs p ON (p.a_id = n.doc_id AND p.b_id IN (SELECT doc_id FROM old))
                   OR (p.b_id = n.doc_id AND p.a_id IN (SELECT doc_id FROM old))
    ),
    new2 AS (
      SELECT doc_id, source FROM new1
      WHERE doc_id NOT IN (SELECT doc_id FROM near_old_drop)
    ),
    nn AS (  -- near pairs entirely within the remaining new docs
      SELECT a_id, b_id FROM pairs
      WHERE a_id IN (SELECT doc_id FROM new2)
        AND b_id IN (SELECT doc_id FROM new2)
    ),
    und AS (SELECT a_id AS src, b_id AS dst FROM nn
            UNION ALL SELECT b_id, a_id FROM nn),
    walk(node, label) AS (
      SELECT doc_id, doc_id FROM new2
      UNION
      SELECT u.dst, w.label FROM walk w JOIN und u ON u.src = w.node
    ),
    comp AS (SELECT node AS doc_id, min(label) AS cid FROM walk GROUP BY node),
    within_drop AS (SELECT doc_id FROM comp WHERE doc_id != cid)
    SELECT n.source,
           count(*) AS n_arrived,
           CAST(count(CASE WHEN n.doc_id IN (SELECT doc_id FROM ex_drop)
                      THEN 1 END) AS BIGINT) AS drop_exact_vs_old,
           CAST(count(CASE WHEN n.doc_id IN (SELECT doc_id FROM near_old_drop)
                      THEN 1 END) AS BIGINT) AS drop_near_vs_old,
           CAST(count(CASE WHEN n.doc_id IN (SELECT doc_id FROM within_drop)
                      THEN 1 END) AS BIGINT) AS drop_within_new,
           CAST(count(*)
                - count(CASE WHEN n.doc_id IN (SELECT doc_id FROM ex_drop)
                        THEN 1 END)
                - count(CASE WHEN n.doc_id IN (SELECT doc_id FROM near_old_drop)
                        THEN 1 END)
                - count(CASE WHEN n.doc_id IN (SELECT doc_id FROM within_drop)
                        THEN 1 END) AS BIGINT) AS n_accepted
    FROM new n GROUP BY n.source
    """,
)
def pipeline_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus refresh capstone: the arriving batch (doc_id %
    5 == 0, simulating tonight's crawl) is admitted through three
    asymmetric gates — exact hash vs the EXISTING corpus, near-dup vs
    the existing corpus, then near-dup within the batch itself
    (min-id-keeper components) — and the per-source manifest accounts
    for every arrival: dropped-exact, dropped-near-vs-old,
    dropped-within-new, accepted. Old documents are never candidates for
    dropping; old-vs-old pairs are never computed into any decision.

    Scale design: the pair kernel (minhash_near_pairs) runs over
    old ∪ new and pairs are CLASSIFIED by side — honest at this corpus
    size; the production swap (docstring contract, same semantics) is a
    PERSISTED band index of the accepted corpus that new signatures
    equi-join against (the pipeline_ann_index_build storage pattern
    applied to LSH bands), making refresh cost O(new × band collisions)
    with the old side read, never rebuilt. Either way the decision
    algebra here — exact gate, asymmetric near gate, within-batch
    components — is the incremental contract."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    is_new = F.col("doc_id") % 5 == 0
    new = d.filter(is_new)
    old = d.filter(~is_new)

    # Gate 1: exact vs old.
    old_hashes = old.select(F.md5("text").alias("h")).distinct()
    new_h = new.withColumn("h", F.md5("text"))
    ex_drop = new_h.join(old_hashes, "h", "left_semi").select("doc_id")
    new1 = new.join(ex_drop, "doc_id", "left_anti")

    # Near pairs over the full relation, classified by side.
    from engine.llmops import minhash_near_pairs

    # Materialize the (tiny) pair list once: five consumers read it below,
    # and without the checkpoint each would re-execute the band-join +
    # exact-verify subtree (measured 14.2 s -> ~8 s at sf0.01).
    pairs = minhash_near_pairs(d).select("a_id", "b_id").localCheckpoint()
    old_ids = old.select(F.col("doc_id").alias("oid"))
    new1_ids = new1.select("doc_id")
    # Gate 2: survivor has ANY old partner.
    p_a = pairs.join(old_ids, pairs["b_id"] == F.col("oid"), "left_semi").select(
        F.col("a_id").alias("doc_id")
    )
    p_b = pairs.join(old_ids, pairs["a_id"] == F.col("oid"), "left_semi").select(
        F.col("b_id").alias("doc_id")
    )
    near_old_drop = (
        p_a.union(p_b).distinct().join(new1_ids, "doc_id", "left_semi")
    )
    new2 = new1.join(near_old_drop, "doc_id", "left_anti")

    # Gate 3: components within the remaining new docs, min-id keeper.
    new2_ids = new2.select("doc_id")
    nn = (
        pairs.join(new2_ids, pairs["a_id"] == new2_ids["doc_id"], "left_semi")
        .join(new2_ids, pairs["b_id"] == new2_ids["doc_id"], "left_semi")
    )
    # The checkpointed full pair list bounds the within-new subset; its
    # count recomputes nothing, so the guard costs one trivial job.
    within_drop = _within_new_losers(
        spark, nn.select("a_id", "b_id"), n_pairs_bound=pairs.count()
    )

    # Manifest: classify every arrival exactly once.
    tag = (
        new.select("doc_id", "source")
        .join(ex_drop.withColumn("g1", F.lit(1)), "doc_id", "left")
        .join(near_old_drop.withColumn("g2", F.lit(1)), "doc_id", "left")
        .join(within_drop.withColumn("g3", F.lit(1)), "doc_id", "left")
    )
    return tag.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_arrived"),
        F.sum(F.coalesce("g1", F.lit(0))).cast("long").alias("drop_exact_vs_old"),
        F.sum(F.coalesce("g2", F.lit(0))).cast("long").alias("drop_near_vs_old"),
        F.sum(F.coalesce("g3", F.lit(0))).cast("long").alias("drop_within_new"),
        (
            F.count(F.lit(1))
            - F.sum(F.coalesce("g1", F.lit(0)))
            - F.sum(F.coalesce("g2", F.lit(0)))
            - F.sum(F.coalesce("g3", F.lit(0)))
        )
        .cast("long")
        .alias("n_accepted"),
    )
