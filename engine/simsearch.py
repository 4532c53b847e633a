"""Similarity search beyond brute force: embedding-cosine near-dup and the
IVF-bucketed approximate-nearest-neighbor scale path.

The brute-force baselines live in engine.llmops (sim_topk_pairs /
sim_knn_query — blocked BLAS matmul). This module adds:

- ``dedup_embedding_cosine``: all pairs above a cosine threshold (the
  embedding near-dup primitive for training-data curation) — FULL oracle via
  DuckDB list_dot_product.
- ``sim_ann_ivf``: inverted-file ANN — deterministic coarse centroids,
  multi-probe assignment, per-cluster exact search. FULL oracle since r04
  (recall 1.0 on this corpus, pinned by tests); recall vs brute force is
  unit-tested (tests/test_trainops.py).

Scale notes (100 TB): the IVF shape is the one that survives — assignment is
a map-side matmul against broadcast centroids, candidate generation becomes a
shuffle on cluster_id, and per-cluster exact search is a bounded blocked
matmul. Nothing is O(n²) in the corpus; the probe count trades recall for
cost. Embeddings are L2-normalized (FIXTURES) so cosine ≡ dot everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.tables import load

_COS_THRESH = 0.4  # corpus max pair-sim is 0.51; 0.4 keeps a small stable set


@query(
    "dedup_embedding_cosine",
    # dim filter in a CTE, not a WHERE conjunct: DuckDB may evaluate the
    # list_dot_product conjunct before the dim check on the same filter,
    # crashing on mismatched lengths (r13 ragged hardening)
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE embedding IS NOT NULL
        AND len(embedding) = (SELECT len(embedding) FROM embeddings WHERE embedding IS NOT NULL GROUP BY 1 ORDER BY count(*) DESC, len(embedding) LIMIT 1)
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {_COS_THRESH}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ 0.4 (cosine ≡ dot on the
    L2-normalized corpus). Blocked BLAS matmul per Arrow batch against a
    broadcast matrix — same kernel as sim_topk_pairs but threshold-cut
    instead of top-k, so output size is data-dependent and exact.

    100 TB: swap the broadcast side for IVF buckets (sim_ann_ivf's layout)
    and run the identical block kernel per bucket. The broadcast side rides
    llmops._broadcast_side: pyarrow-direct (no collect job) and LOUDLY
    size-gated at ~1M vectors — past the gate the key refuses and points at
    the bucketed path rather than collecting unbounded data to the driver
    (round-1 verdict item 2).

    Kernel (r02, same select/refine split as sim_topk_pairs): one f32
    boolean pass finds candidates above thresh − 2e-4 (margin covers f32 dot
    error on unit vectors); exact f64 dots decide the REAL >= thresh cut on
    the small candidate set, so the published sims are full-precision."""
    import numpy as np
    import pyarrow as pa

    from engine.llmops import _side_broadcast
    from engine.tables import vectors

    emb = vectors(spark, sf_dir)
    bc, side_key = _side_broadcast(spark, sf_dir, emb)
    thresh = _COS_THRESH

    # Probe side = block index over the SAME gated ≤1M-row table (see
    # sim_topk_pairs r11 note): partitioning spark.range(width) drops the
    # second parquet scan and the spread_cpu exchange; each task slices its
    # probe block from the per-worker-cached f32 side.
    width = 8

    def block_pairs(batches):
        try:  # per-worker cache of the f32 side (see llmops._side_value)
            from engine.llmops import _side_value

            ids_all, m32 = _side_value(bc, side_key)
        except ImportError:
            ids_all, m32 = bc.value
        n = len(ids_all)
        for rb in batches:
            for blk in rb.column("id").to_pylist():
                lo = n * blk // width
                hi = n * (blk + 1) // width
                if lo >= hi:
                    continue
                a_ids = ids_all[lo:hi]
                a32 = m32[lo:hi]
                sims = a32 @ m32.T
                sims[a_ids[:, None] >= ids_all[None, :]] = -2.0  # a_id < b_id
                ai, bi = np.nonzero(sims >= thresh - 2e-4)
                # f32→f64 upcast is exact (source column is array<float>)
                exact = np.einsum(
                    "ij,ij->i",
                    a32[ai].astype(np.float64),
                    m32[bi].astype(np.float64),
                )
                keep = exact >= thresh
                ai, bi, exact = ai[keep], bi[keep], exact[keep]
                yield pa.RecordBatch.from_pydict(
                    {
                        "a_id": pa.array(a_ids[ai], pa.int64()),
                        "b_id": pa.array(ids_all[bi], pa.int64()),
                        "sim": pa.array(np.round(exact, 4), pa.float64()),
                    }
                )

    return spark.range(0, width, 1, width).mapInArrow(
        block_pairs, "a_id long, b_id long, sim double"
    )


@query(
    "sim_ann_ivf",
    # FULL oracle (r04): centroid assignment is not SQL-expressible, but the
    # exact top-10 pair list is — and on this corpus the IVF path achieves
    # recall 1.0 deterministically (fixed centroid choice, fixed data;
    # verified at sf0.001 and sf0.01, recall floor separately unit-tested in
    # tests/test_simsearch.py). Comparing ANN output against the exact
    # answer turns any recall regression into a driver hash mismatch.
    oracle="""
    SELECT a_id, b_id, sim FROM (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.embedding IS NOT NULL AND b.embedding IS NOT NULL
        AND len(a.embedding) = (SELECT len(embedding) FROM embeddings WHERE embedding IS NOT NULL GROUP BY 1 ORDER BY count(*) DESC, len(embedding) LIMIT 1)
        AND len(b.embedding) = (SELECT len(embedding) FROM embeddings WHERE embedding IS NOT NULL GROUP BY 1 ORDER BY count(*) DESC, len(embedding) LIMIT 1)
    ) ORDER BY sim DESC, a_id, b_id LIMIT 10
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 similar pairs via IVF: nlist deterministic
    coarse centroids (the nlist lowest-vec_id vectors; nlist = max(8,
    sqrt(n/32)) from footer stats — the e17ddf2 recalibration, pinned by
    tests/test_adaptive_params.py), each vector assigned to its
    nprobe=3 nearest centroids, exact blocked search within each cluster,
    global top-k merge. Compare sim_topk_pairs for the exact answer;
    tests/test_simsearch.py pins the recall.

    100 TB: assignment = map-side matmul vs broadcast centroids (no shuffle),
    candidates = one shuffle on cluster_id, per-cluster search bounded by
    cluster size — replaces the O(n²) pair space with Σ_c |c|². With
    nlist ∝ √n the two stages balance (assignment n·nlist vs search
    Σ|c|² ≈ n²·nprobe²/nlist) at Θ(n^1.5) total — the optimal exponent
    for SINGLE-LEVEL IVF all-pair mining; the engine's near-linear ANN
    path is sim_ann_rp_lsh (bucket-capped, 25× exponent 0.33).

    r09 exact-dup collapse (same design as sim_ann_rp_lsh's r07 fix,
    engine/vecops.py): a clone corpus routes every duplicate into the
    same probe clusters — no (nlist, nprobe) choice can separate
    identical vectors — and the r09 25× rehearsal measured exponent 1.13
    (1.5 s → 57 s) from dense blocks 25× taller. One cheap dup probe
    (footer rows vs countDistinct(xxhash64(embedding)); a collision only
    UNDER-counts, which routes to the collapse path whose grouping key
    is the full array) decides: with dups, the whole
    centroid/assign/search pipeline runs on min-id REPRESENTATIVES, then
    winning rep pairs expand to member pairs (members truncated to the
    k+1 smallest ids per group — decision-preserving for top-k under
    (sim desc, a_id, b_id), same proof as vecops) and intra-group pairs
    (sim = ‖v‖², identical vectors) bypass IVF entirely. Dup-free
    corpora (every driver/test SF) take the original path bit-identically
    at the cost of the one probe job."""
    import math

    import numpy as np
    import pandas as pd

    k = 10
    nprobe = 3
    # Coarse-quantizer size scales ~sqrt(n) (the comment below always
    # claimed it; implemented r06 after the 5× rehearsal measured exponent
    # 1.32 from the fixed nlist=8 — Σ_c |c|² is quadratic in n when the
    # cluster count stands still). nlist stays exactly 8 at every
    # driver/test SF (n=50/500 → the max() floor binds), so oracle results
    # and the pinned recall floor are unchanged; past that, cluster
    # population n·nprobe/nlist tracks sqrt(n), keeping per-cluster dense
    # blocks bounded. Footer-only count; non-parquet sources fall back to
    # the floor. Calibration: sqrt(n/32) releases the floor just past the
    # bench corpus (n=2000 -> 8, the measured-recall operating point;
    # 10k -> 18; 1M -> 177), so every tested SF keeps its exact plan and
    # growth pays the extra Python cluster-groups only when cluster sizes
    # would otherwise grow past ~750 postings.
    from engine.tables import all_rows_distinct, parquet_num_rows, swap_persist

    _n = parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    from engine.tables import vectors

    emb = vectors(spark, sf_dir)
    # r09 dup probe (see docstring), r11: shared memoized helper —
    # int64 hashes shuffle, never arrays; cached per (session, corpus).
    has_dups = not all_rows_distinct(
        spark, f"{sf_dir}/embeddings.parquet", emb, "embedding"
    )
    if has_dups:
        # The returned plan reads grp three times (ga/gb expansion +
        # intra blocks) lazily — persist via the shared swap (ADVICE
        # r10: at most one grp stays cached per session).
        grp = swap_persist(
            spark,
            emb.groupBy("embedding").agg(
                F.min("vec_id").alias("vec_id"),
                F.slice(F.sort_array(F.collect_list("vec_id")), 1, k + 1).alias(
                    "members"
                ),
                F.count("*").alias("grp_n"),
            ),
            "ivf_grp",
        )
        reps = grp.select("vec_id", "embedding")
        # nlist sizes from the relation actually indexed (the reps); the
        # count doubles as grp's materialization for the later consumers.
        _n = grp.count()
    else:
        grp = None
        reps = emb
    nlist = max(8, int(round(math.sqrt(_n / 32)))) if _n is not None else 8
    cents = (
        reps.orderBy("vec_id").limit(nlist).select("embedding").toPandas()
    )
    if len(cents) == 0:
        # empty corpus/shard: no centroids, no candidates, no pairs —
        # matches the oracle's empty pair list (r12 empty-corpus hardening)
        return spark.createDataFrame([], "a_id long, b_id long, sim double")
    c_mat = np.stack(cents["embedding"].to_numpy()).astype(np.float64)
    bc = spark.sparkContext.broadcast(c_mat)

    def assign(batches):
        c = bc.value
        for pb in batches:
            v_ids = pb["vec_id"].to_numpy()
            mat = np.stack(pb["embedding"].to_numpy()).astype(np.float64)
            sims = mat @ c.T
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            # fewer centroids than nprobe (tiny corpus/shard): the probe
            # width is whatever argsort produced, not the nominal nprobe
            p = top.shape[1]
            n = len(v_ids)
            yield pd.DataFrame(
                {
                    "cluster": top.ravel(),
                    "vec_id": np.repeat(v_ids, p),
                    "embedding": [pb["embedding"].iloc[i] for i in np.repeat(np.arange(n), p)],
                }
            )

    assigned = reps.mapInPandas(assign, "cluster int, vec_id long, embedding array<float>")
    # Shuffle into exactly n_centroids partitions keyed by cluster: the
    # downstream applyInPandas otherwise inherits spark.sql.shuffle.partitions
    # (32 locally) and fans a mostly-empty Python-worker task per partition —
    # measured 9.4 s cold / 0.75 s warm at sf0.1 from worker forks alone.
    # Partition count tracks the index layout (nlist grows ~sqrt(n) at scale),
    # so this stays right as the corpus grows.
    assigned = assigned.repartition(nlist, "cluster")

    def cluster_topk(key, pdf):
        v_ids = pdf["vec_id"].to_numpy()
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        sims = np.round(mat @ mat.T, 4)
        ai, bi = np.nonzero(v_ids[:, None] < v_ids[None, :])
        s = sims[ai, bi]
        if len(s) > k:
            thresh = np.partition(s, len(s) - k)[len(s) - k]
            keep = s >= thresh
            ai, bi, s = ai[keep], bi[keep], s[keep]
        order = np.lexsort((v_ids[bi], v_ids[ai], -s))
        # keep boundary TIES past k (r09): a same-sim pair cut here could
        # out-rank a kept pair on the global (sim desc, a_id, b_id) order
        # — measure-zero for real dots, routine for dup-group expansion.
        if len(order) > k:
            cutoff = s[order[k - 1]]
            order = order[s[order] >= cutoff]
        return pd.DataFrame(
            {"a_id": v_ids[ai][order], "b_id": v_ids[bi][order], "sim": s[order]}
        )

    per_cluster = assigned.groupBy("cluster").applyInPandas(
        cluster_topk, "a_id long, b_id long, sim double"
    )
    # a pair probed into two shared clusters appears twice — dedup, then
    # top-k. per_cluster is ≤ nlist×(k+ties) rows by construction, so
    # collapse to one partition instead of a 32-partition dedup shuffle
    # of ~80 rows.
    rep_pairs = per_cluster.coalesce(1).dropDuplicates(["a_id", "b_id"])
    if grp is None:  # dup-free: reps ≡ vectors, nothing to expand
        return rep_pairs.orderBy(F.col("sim").desc(), "a_id", "b_id").limit(k)
    # r09 expansion (same shape + proof as vecops.sim_ann_rp_lsh): each
    # winning rep pair carries its sim to every member combination of its
    # two dup groups (identical vectors ⇒ identical dots); intra-group
    # blocks are all-pairs of a group at sim = ‖v‖². Members are the k+1
    # smallest ids per group — enough to decide the global top-k under
    # (sim desc, a_id, b_id); every block is ≤ (k+1)² rows and rep_pairs
    # is ≤ nlist×(k+ties), so the expansion is driver-trivial.
    ga = grp.select(F.col("vec_id").alias("a_id"), F.col("members").alias("ma"))
    gb = grp.select(F.col("vec_id").alias("b_id"), F.col("members").alias("mb"))
    cross = (
        rep_pairs.join(ga, "a_id")
        .join(gb, "b_id")
        .select("sim", F.explode("ma").alias("va"), "mb")
        .select("sim", "va", F.explode("mb").alias("vb"))
        .select(
            F.least("va", "vb").alias("a_id"),
            F.greatest("va", "vb").alias("b_id"),
            "sim",
        )
    )
    vd = F.col("embedding").cast("array<double>")
    # bround (half-even) matches np.round in cluster_topk — one rounding
    # mode for every sim this operator emits (vecops r07 note).
    normsq = F.bround(
        F.aggregate(
            F.zip_with(vd, vd, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        4,
    )
    intra = (
        grp.filter(F.col("grp_n") >= 2)
        .select(normsq.alias("sim"), F.col("members").alias("ms"))
        .select("sim", F.explode("ms").alias("va"), "ms")
        .select("sim", "va", F.explode("ms").alias("vb"))
        .filter(F.col("va") < F.col("vb"))
        .select(F.col("va").alias("a_id"), F.col("vb").alias("b_id"), "sim")
    )
    return (
        cross.unionByName(intra)
        .orderBy(F.col("sim").desc(), "a_id", "b_id")
        .limit(k)
    )
