"""Extras batch 20 module (r05 continuation): hidden _metadata columns,
distributed BFS hop counts, and Johnson-Lindenstrauss random projection.

SURVEY §2 families extended: §2.A (the reader's hidden `_metadata` struct
— file provenance without a custom source), the graph family (BFS frontier
expansion joins the Pregel shapes: pagerank, components, triangles), §2.I
(JL sketching — the third embedding-compression shape next to PCA and
matryoshka truncation, this one data-INDEPENDENT).

Determinism discipline (SURVEY §5.3): the projection's sign matrix is the
multiplier-mod integer idiom (identical bit pattern in both engines); the
in-array fold keeps Spark's summation order fixed; BFS emits min-hop per
node (order-free aggregate); file counts are pinned by an explicit
repartition(4).
"""

from __future__ import annotations

from engine.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load, sftag


@query(
    "scan_metadata_columns",
    oracle="""
    SELECT CAST(least(4, count(*)) AS BIGINT) AS n_files,
           count(*) AS n_rows,
           CASE WHEN count(*) = 0 THEN NULL ELSE TRUE END AS all_sizes_positive,
           TRUE AS paths_distinct_per_file
    FROM events
    """,
)
def scan_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reader's hidden `_metadata` struct: events re-written as
    exactly 4 parquet files, read back selecting `_metadata.file_name` /
    `file_size` / `file_path` alongside the data — per-row provenance
    with no custom source. The audit proves the metadata is real: 4
    distinct file names, every file size positive, and path↔name
    consistency; row count matches the source.

    100 TB: `_metadata` is the lineage column — which physical file did
    this row come from — used for incremental reprocessing (join against
    a bad-file manifest), audit trails, and debugging skewed files. It
    is populated from the scan's own file listing: zero extra IO, and
    filters on it prune at the FILE level like partition filters.

    Degenerate-source semantics (r12, hardened r13): Spark writes no
    part files for empty partitions, so an n-row source yields
    min(n, 4) files and an empty one a vacuous (NULL) min-size flag —
    the oracle's least(4, count(*)) + CASE mirror exactly that. The
    write uses repartitionByRange on the distinct event_id (NOT
    round-robin repartition(4): each input partition round-robins from
    its own seeded start, so a tiny MULTI-partition input can collide
    n < 4 rows into fewer than n output files and flake the parity
    check; the range partitioner provably places k <= 4 distinct keys
    in k distinct partitions — probed at n=1..7,100, ADVICE r12)."""
    base = scratch_dir(prefix=f"sg-meta-{sftag(sf_dir)}-")
    load(spark, sf_dir, "events").select("event_id", "value").repartitionByRange(
        4, "event_id"
    ).write.mode("overwrite").parquet(base)
    back = spark.read.parquet(base).select(
        "event_id",
        F.col("_metadata.file_name").alias("fname"),
        F.col("_metadata.file_path").alias("fpath"),
        F.col("_metadata.file_size").alias("fsize"),
    )
    return back.agg(
        F.countDistinct("fname").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.min("fsize") > 0).alias("all_sizes_positive"),
        (F.countDistinct("fpath") == F.countDistinct("fname")).alias(
            "paths_distinct_per_file"
        ),
    )


@query(
    "graph_bfs_hops",
    oracle="""
    WITH RECURSIVE
    edges0 AS (
      SELECT DISTINCT l_partkey AS part_node,
             100000 + l_suppkey AS supp_node
      FROM lineitem
    ),
    und AS (
      SELECT part_node AS src, supp_node AS dst FROM edges0
      UNION ALL SELECT supp_node, part_node FROM edges0
    ),
    walk(node, hop) AS (
      SELECT (SELECT min(l_partkey) FROM lineitem), 0
      UNION
      SELECT u.dst, w.hop + 1
      FROM walk w JOIN und u ON u.src = w.node
      WHERE w.hop < 3
    )
    SELECT node, CAST(min(hop) AS INT) AS hops
    FROM walk GROUP BY node
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BFS: minimum hop count from a source node over the
    part—supplier bipartite graph (edge = this supplier shipped this
    part; supplier nodes offset by 100000 to disjoin the id spaces),
    bounded at 3 hops. Hop parity tracks the bipartite structure: even
    hops land on parts, odd on suppliers.

    The Spark side is frontier expansion — per round, join the frontier
    to the edge list, anti-join out already-visited nodes, tag the rest
    with hop+1 — the BFS specialization of the Pregel loop
    (dedup_cluster_components propagates labels; this propagates
    distance). Each round is one shuffle on node id; visited state is a
    DataFrame, not driver memory; the loop runs a FIXED 3 rounds (the
    oracle's hop bound), so no convergence collect is needed at all.
    100 TB: hop-bounded BFS is the reachability primitive behind
    fraud-ring and recommendation features; the frontier is the only
    growing relation and it is capped by the node set."""
    li = load(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("part_node"),
        (F.lit(100000) + F.col("l_suppkey")).alias("supp_node"),
    ).distinct()
    from pyspark import StorageLevel

    # Persist the symmetrized edge relation ONCE: all three frontier
    # rounds join against it, and without the persist each round re-ran
    # the parquet scan + edge-distinct shuffle (the r05 plan audit's
    # "checkpoint I/O" was mostly this recompute — 5.2 s -> ~2 s sweep).
    und = (
        edges.select(F.col("part_node").alias("src"), F.col("supp_node").alias("dst"))
        .union(
            edges.select(
                F.col("supp_node").alias("src"), F.col("part_node").alias("dst")
            )
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    src_row = li.agg(F.min("l_partkey").alias("s")).first()
    if src_row["s"] is None:
        # empty edge table: the oracle's recursive base row is
        # (min-over-empty = NULL, hop 0) and no expansion joins it —
        # reproduce that single NULL-source row (r12 empty-corpus
        # hardening)
        return spark.createDataFrame([(None, 0)], "node long, hops int")
    visited = spark.createDataFrame([(int(src_row["s"]), 0)], "node long, hops int")
    frontier = visited
    for hop in range(1, 4):
        nxt = (
            und.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        # NO per-round checkpoint (r07): each frontier is referenced
        # twice per round (next expansion + visited anti-join), so the
        # un-materialized plan holds 2^3 copies of the deepest subtree —
        # but the hop bound is a FIXED 3, the copies end in identical
        # exchanges, and Spark's ReusedExchange dedups their execution
        # (15 ReusedExchange nodes in the executed plan; each frontier
        # computes once). One plan, zero materialization jobs: measured
        # 3.42 s -> 2.94 s warm at sf0.1 vs the per-round localCheckpoint
        # shape. An UNBOUNDED-depth traversal must go back to per-round
        # checkpoints (exponential plan size past ~8 rounds) — that shape
        # is what min_label_components uses for its data-dependent loop.
        visited = visited.union(nxt)
        frontier = nxt
    # The returned (lazy) plan references und in every round, so the
    # edge cache must outlive this function — NOT unpersisted, per the
    # engine convention (ADVICE r06 offered either release or documented
    # retention): Spark deduplicates cache entries by logical plan, so
    # repeat invocations hold ONE ~MB entry per sf_dir — not one per
    # call — and every frontier round reads it as an InMemoryTableScan.
    # Same convention as minhash_near_pairs and refresh_against_index;
    # MEMORY_AND_DISK spills under pressure.
    return visited.select("node", F.col("hops").cast("int").alias("hops"))


# JL sign matrix: s(j,k) in {-1,+1} from the engine-agnostic multiplier-mod
# idiom over the flattened (j, k) index.
_JL_K = 16


@query(
    "emb_random_projection_jl",
    oracle=f"""
    -- per-ROW list fold, not UNNEST(dims) + GROUP BY vec_id (r14 dup-id
    -- axis: grouping by a COLLIDING id summed two different vectors into
    -- one garbage projection); the projection is a per-vector-row map
    SELECT vec_id, CAST(u.k AS INT) AS k,
           round(coalesce(list_sum(list_transform(range(0, len(embedding)), j ->
               CASE WHEN (1103515245 * (j * {_JL_K} + u.k) + 12345) % 97 < 48
                    THEN -1.0 ELSE 1.0 END
                 * CAST(embedding[CAST(j + 1 AS INT)] AS DOUBLE))), 0.0)
             / sqrt({_JL_K}.0), 4) + 0.0 AS proj
    FROM embeddings, UNNEST(range(0, {_JL_K})) AS u(k)
    WHERE embedding IS NOT NULL AND len(embedding) = (SELECT len(embedding) FROM embeddings WHERE embedding IS NOT NULL GROUP BY 1 ORDER BY count(*) DESC, len(embedding) LIMIT 1)
    """,
)
def emb_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection: each embedding compressed
    from its native dimension to {_JL_K} components via a deterministic
    ±1 sign matrix (multiplier-mod hash over the flattened (dim, out)
    index), scaled by 1/√k. Unlike PCA (emb_pca_project) this is
    data-INDEPENDENT — no training pass, no centering — which is exactly
    why it is the 100 TB first-line compressor: the 'matrix' is a
    formula, so the projection runs as pure row-local codegen with ZERO
    shuffles and nothing broadcast.

    The Spark side computes all {_JL_K} outputs inside the array world
    (transform over the output index, fold over zip_with(embedding,
    index sequence)) and only then explodes to long format — the fold
    fixes the summation order left-to-right, matching the oracle's
    ordinality-ordered sum. Distance preservation (the JL guarantee) is
    audited in the named test on sampled pairs."""
    from engine.tables import vectors

    e = vectors(spark, sf_dir)
    proj = F.expr(
        f"""
        transform(sequence(0, {_JL_K} - 1), k ->
          round(
            aggregate(
              zip_with(embedding, sequence(0, size(embedding) - 1),
                (x, j) -> CASE WHEN (1103515245L * (j * {_JL_K} + k) + 12345L) % 97 < 48
                               THEN -1.0D ELSE 1.0D END * CAST(x AS DOUBLE)),
              0.0D, (acc, v) -> acc + v) / sqrt({_JL_K}.0D),
          4) + 0.0D)
        """
        # + 0.0 collapses IEEE -0.0 (SURVEY §5.3 rule 11): projections near
        # zero round to -0.0 on one engine and +0.0 on the other, and the
        # driver's formatted-float compare distinguishes them.
    )
    return e.select("vec_id", F.posexplode(proj).alias("k", "proj")).select(
        "vec_id", F.col("k").cast("int").alias("k"), "proj"
    )
