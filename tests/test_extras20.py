"""Named tests for engine/extras20.py: metadata-column audit, BFS
equivalence vs Python reachability, and the JL distance-preservation
guarantee on sampled pairs."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_metadata_columns_audit(spark):
    from engine.tables import load

    row = _q("scan_metadata_columns")(spark, SF_DIR).collect()[0]
    assert row["n_files"] == 4
    assert row["n_rows"] == load(spark, SF_DIR, "events").count()
    assert row["all_sizes_positive"] is True
    assert row["paths_distinct_per_file"] is True


def test_bfs_hops_match_python_reachability(spark):
    """Hop counts equal a driver-side BFS over the same edge list; hop
    parity tracks the bipartite structure (even = part, odd = supplier)."""
    from collections import deque

    from engine.tables import load
    from pyspark.sql import functions as F

    got = {r["node"]: r["hops"] for r in _q("graph_bfs_hops")(spark, SF_DIR).collect()}
    li = load(spark, SF_DIR, "lineitem")
    edges = (
        li.select("l_partkey", "l_suppkey").distinct().collect()
    )
    adj: dict[int, set] = {}
    for e in edges:
        p, s = e["l_partkey"], 100000 + e["l_suppkey"]
        adj.setdefault(p, set()).add(s)
        adj.setdefault(s, set()).add(p)
    src = li.agg(F.min("l_partkey")).first()[0]
    dist = {src: 0}
    dq = deque([src])
    while dq:
        n = dq.popleft()
        if dist[n] >= 3:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                dq.append(m)
    assert got == dist and got
    for node, h in got.items():
        assert (node >= 100000) == (h % 2 == 1), (node, h)


def test_jl_projection_preserves_distances(spark):
    """The JL guarantee, empirically: over 100 sampled vector pairs, the
    median ratio of projected to original squared distance is near 1 and
    most pairs fall within a loose [0.3, 3] band (k=16 is a coarse
    sketch; the test pins the STRUCTURE, not tight epsilon)."""
    import numpy as np

    from engine.tables import load

    rows = _q("emb_random_projection_jl")(spark, SF_DIR).collect()
    by_vec: dict[int, dict] = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], {})[r["k"]] = r["proj"]
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, SF_DIR, "embeddings").collect()
    }
    assert set(by_vec) == set(emb)
    k = 16
    assert all(len(v) == k for v in by_vec.values())
    ids = sorted(by_vec)
    ratios = []
    for i in range(100):
        a, b = ids[i % len(ids)], ids[(i * 7 + 13) % len(ids)]
        if a == b:
            continue
        d_orig = float(np.sum((emb[a] - emb[b]) ** 2))
        pa = np.array([by_vec[a][j] for j in range(k)])
        pb = np.array([by_vec[b][j] for j in range(k)])
        d_proj = float(np.sum((pa - pb) ** 2))
        if d_orig > 1e-12:
            ratios.append(d_proj / d_orig)
    assert ratios
    med = sorted(ratios)[len(ratios) // 2]
    assert 0.6 <= med <= 1.7, med
    # k=16 on clustered synthetic vectors: sigma ~ sqrt(2/k) ~ 0.35 for
    # far pairs, heavier-tailed for same-cluster pairs whose distance is
    # noise-dominated — the band is correspondingly loose.
    inband = sum(0.2 <= r <= 5.0 for r in ratios) / len(ratios)
    assert inband >= 0.7, inband
