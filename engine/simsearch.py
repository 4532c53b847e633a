"""Similarity search beyond brute force: embedding-cosine near-dup and the
IVF-bucketed approximate-nearest-neighbor scale path.

The brute-force baselines live in engine.llmops (sim_topk_pairs /
sim_knn_query — blocked BLAS matmul). This module adds:

- ``dedup_embedding_cosine``: all pairs above a cosine threshold (the
  embedding near-dup primitive for training-data curation) — FULL oracle via
  DuckDB list_dot_product.
- ``sim_ann_ivf``: inverted-file ANN — deterministic coarse centroids,
  multi-probe assignment, per-cluster exact search. ROWS (random-projection /
  centroid assignment is not SQL-expressible); recall vs brute force is
  unit-tested (tests/test_simsearch.py).

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
    oracle=f"""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
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

    from engine.llmops import _broadcast_side

    emb = load(spark, sf_dir, "embeddings")
    bc = spark.sparkContext.broadcast(_broadcast_side(spark, sf_dir, emb))
    thresh = _COS_THRESH

    def block_pairs(batches):
        ids_all, m_all = bc.value
        m32 = m_all.astype(np.float32)
        for rb in batches:
            a_ids = rb.column("vec_id").to_numpy(zero_copy_only=False)
            if len(a_ids) == 0:
                continue
            flat = rb.column("embedding").flatten().to_numpy(zero_copy_only=False)
            a32 = flat.astype(np.float32).reshape(len(a_ids), -1)
            sims = a32 @ m32.T
            sims[a_ids[:, None] >= ids_all[None, :]] = -2.0  # keep a_id < b_id
            ai, bi = np.nonzero(sims >= thresh - 2e-4)
            a64 = flat.astype(np.float64).reshape(len(a_ids), -1)
            exact = np.einsum("ij,ij->i", a64[ai], m_all[bi])
            keep = exact >= thresh
            ai, bi, exact = ai[keep], bi[keep], exact[keep]
            yield pa.RecordBatch.from_pydict(
                {
                    "a_id": pa.array(a_ids[ai], pa.int64()),
                    "b_id": pa.array(ids_all[bi], pa.int64()),
                    "sim": pa.array(np.round(exact, 4), pa.float64()),
                }
            )

    from engine.textops import spread_cpu

    # spread the probe side past the 1-split scan (see sim_topk_pairs;
    # width 8 — Python-kernel stage, per-partition broadcast cost).
    return spread_cpu(emb.select("vec_id", "embedding"), width=8).mapInArrow(
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
    cluster size — replaces the O(n²) pair space with Σ_c |c|²."""
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
    from engine.tables import parquet_num_rows

    _n = parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    nlist = max(8, int(round(math.sqrt(_n / 32)))) if _n is not None else 8
    emb = load(spark, sf_dir, "embeddings")
    cents = (
        emb.orderBy("vec_id").limit(nlist).select("embedding").toPandas()
    )
    c_mat = np.stack(cents["embedding"].to_numpy()).astype(np.float64)
    bc = spark.sparkContext.broadcast(c_mat)

    def assign(batches):
        c = bc.value
        for pb in batches:
            v_ids = pb["vec_id"].to_numpy()
            mat = np.stack(pb["embedding"].to_numpy()).astype(np.float64)
            sims = mat @ c.T
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            n = len(v_ids)
            yield pd.DataFrame(
                {
                    "cluster": top.ravel(),
                    "vec_id": np.repeat(v_ids, nprobe),
                    "embedding": [pb["embedding"].iloc[i] for i in np.repeat(np.arange(n), nprobe)],
                }
            )

    assigned = emb.mapInPandas(assign, "cluster int, vec_id long, embedding array<float>")
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
        order = np.lexsort((v_ids[bi], v_ids[ai], -s))[:k]
        return pd.DataFrame(
            {"a_id": v_ids[ai][order], "b_id": v_ids[bi][order], "sim": s[order]}
        )

    per_cluster = assigned.groupBy("cluster").applyInPandas(
        cluster_topk, "a_id long, b_id long, sim double"
    )
    # a pair probed into two shared clusters appears twice — dedup, then
    # top-k. per_cluster is ≤ nlist×k rows by construction, so collapse to
    # one partition instead of a 32-partition dedup shuffle of ~80 rows.
    return (
        per_cluster.coalesce(1)
        .dropDuplicates(["a_id", "b_id"])
        .orderBy(F.col("sim").desc(), "a_id", "b_id")
        .limit(k)
    )
