"""Properties of the training-data operators that the DuckDB oracle can't
express: SimHash Hamming locality, IVF-ANN recall vs brute force, and the
multimodal decode plumbing (schema, determinism, stub gating)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def test_simhash_hamming_locality(spark):
    """Near-dup doc pairs (word-3-gram Jaccard >= 0.2) must sit closer in
    SimHash Hamming distance than the average random pair."""
    from engine.registry import collect

    queries, _ = collect()
    sh = {r.doc_id: r.simhash for r in queries["dedup_simhash"](spark, SF_DIR).collect()}
    near = [(r.a_id, r.b_id) for r in queries["dedup_ngram_jaccard"](spark, SF_DIR).collect()]
    assert near, "corpus should contain near-dup pairs"

    def ham(a, b):
        return bin(sh[a] ^ sh[b]).count("1")

    near_avg = sum(ham(a, b) for a, b in near) / len(near)
    ids = sorted(sh)[:60]
    rand = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    rand_avg = sum(ham(a, b) for a, b in rand) / len(rand)
    assert near_avg < rand_avg * 0.6, (near_avg, rand_avg)


def test_ann_ivf_recall(spark):
    """IVF top-10 must recover a usable fraction of the exact top-10 pairs.
    The corpus embeddings are near-random (max pair cosine ~0.5) — the ANN
    worst case — so the floor is deliberately modest."""
    from engine.registry import collect

    queries, _ = collect()
    exact = {(r.a_id, r.b_id) for r in queries["sim_topk_pairs"](spark, SF_DIR).collect()}
    approx = {(r.a_id, r.b_id) for r in queries["sim_ann_ivf"](spark, SF_DIR).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"IVF recall {recall:.2f}"
    # every reported pair must carry its true sim: spot check determinism
    r2 = {(r.a_id, r.b_id) for r in queries["sim_ann_ivf"](spark, SF_DIR).collect()}
    assert approx == r2


def test_ann_ivf_recall_sf001(spark):
    """At the driver's verify SF (sf0.01) the cluster structure is richer and
    IVF must recover >=0.8 of the exact top-10 (measured 1.0; VERDICT r01
    item 6 asks for an oracle-checked bound at this SF, not just sf0.001)."""
    from engine.registry import collect
    from tests.conftest import SF_DIR_MID

    queries, _ = collect()
    exact = {(r.a_id, r.b_id) for r in queries["sim_topk_pairs"](spark, SF_DIR_MID).collect()}
    approx = {(r.a_id, r.b_id) for r in queries["sim_ann_ivf"](spark, SF_DIR_MID).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall:.2f} at sf0.01"


def test_multimodal_decode_shapes(spark):
    """Decode output: one row per doc, fixed 4x4 feature vector, floats;
    the queries() summary reconstructs each payload's byte sum exactly."""
    from engine.multimodal import THUMB, binary_table, decode_features
    from engine.registry import collect

    out = decode_features(spark, SF_DIR).collect()
    n_docs = binary_table(spark, SF_DIR).count()
    assert len(out) == n_docs
    for r in out[:20]:
        assert r.width == THUMB and r.height == THUMB
        feats = [float(v) for v in r.features.split(",")]
        assert len(feats) == THUMB * THUMB

    queries, _ = collect()
    summary = queries["multimodal_decode_pipeline"](spark, SF_DIR).collect()
    assert len(summary) == n_docs
    from engine.tables import load

    texts = dict(
        load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    )
    for r in summary[:20]:
        raw = texts[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.byte_sum == sum(raw)


def test_multimodal_real_decoder_gated():
    """The real decoder must raise a clearly-marked NotImplementedError in
    this container (codec libs absent), not crash obscurely."""
    from engine.multimodal import _decode_real

    with pytest.raises(NotImplementedError, match="PIL|pillow"):
        _decode_real(b"\x89PNG fake")


def test_fake_decode_deterministic():
    from engine.multimodal import _decode_fake

    a = _decode_fake(b"hello world, this is a fake image payload", 16)
    b = _decode_fake(b"hello world, this is a fake image payload", 16)
    assert a == b and len(a) == 16
    assert _decode_fake(b"", 16) == [0.0] * 16


def test_approx_median_error_bound(spark, duck):
    """agg_approx_median (self-validating FULL since r04): the query's own
    median_ok/p90_ok flags must all hold, AND the underlying GK sketch must
    sit within 1% of DuckDB's exact quantile per group (cross-engine bound,
    independent of the query's internal exact side)."""
    from pyspark.sql import functions as F

    from engine.registry import collect
    from engine.tables import load
    from tests.conftest import SF_DIR

    queries, _ = collect()
    got = {
        r["l_returnflag"]: r.asDict()
        for r in queries["agg_approx_median"](spark, SF_DIR).collect()
    }
    assert len(got) > 0
    assert all(r["median_ok"] and r["p90_ok"] for r in got.values()), got
    sketch = {
        r["l_returnflag"]: r.asDict()
        for r in load(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("am"),
            F.percentile_approx("l_extendedprice", 0.9, 10000).alias("ap"),
        )
        .collect()
    }
    exact = duck.sql(
        f"""
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS m,
               quantile_cont(l_extendedprice, 0.9) AS p90
        FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1
        """
    ).fetchall()
    assert len(exact) == len(got)
    for flag, m, p90 in exact:
        assert abs(sketch[flag]["am"] - m) / m < 0.01, (flag, m, sketch[flag])
        assert abs(sketch[flag]["ap"] - p90) / p90 < 0.01, (flag, p90, sketch[flag])


def test_ann_ivf_exact_dup_collapse(spark, tmp_path):
    """r09 clone-floor fix (mirrors vecops' r07 rp_lsh fix): on a corpus
    WITH exact-duplicate embeddings the dup probe must route through the
    collapse prestage (reps-only IVF + block expansion), and the result
    must be the exact top-10 pair list under (sim desc, a_id, b_id) —
    including the intra-group ‖v‖² pairs that bypass IVF entirely.
    Brute-force reference computed in numpy over the full clone corpus
    (recall on this corpus is 1.0, so exact equality is the right bar)."""
    import itertools

    import numpy as np
    from pyspark.sql import functions as F

    from engine.registry import collect

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    parts = [base] + [
        base.withColumn("vec_id", F.col("vec_id") + i * 1_000_000) for i in (1, 2)
    ]
    dup = parts[0]
    for p in parts[1:]:
        dup = dup.unionByName(p)
    dup.write.parquet(str(tmp_path / "embeddings.parquet"))

    queries, _ = collect()
    res = queries["sim_ann_ivf"].__wrapped__(spark, str(tmp_path)).collect()
    got = [(r["a_id"], r["b_id"], r["sim"]) for r in res]

    rows = sorted(
        (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        for r in dup.collect()
    )
    ids = [i for i, _ in rows]
    m = np.stack([v for _, v in rows])
    sims = np.round(m @ m.T, 4)
    allp = sorted(
        (-sims[i, j], ids[i], ids[j])
        for i, j in itertools.combinations(range(len(ids)), 2)
    )[:10]
    want = [(a, b, -s) for s, a, b in allp]
    assert got == want, f"collapse path diverged from brute force:\n{got}\nvs\n{want}"


def test_semdedup_exact_dup_collapse(spark, tmp_path):
    """r11 clone-floor fix (third of the family: rp_lsh r07, IVF r09): on
    a corpus WITH exact-duplicate embeddings dedup_semdedup must route
    through the collapse prestage (rep-level Lloyd + arithmetic member
    expansion) and still produce EXACTLY the full-corpus result — keeper
    ids and suppressor counts are integers, so the bar is equality
    against the registered DuckDB oracle run on the same clone corpus
    (which executes the member-level semantics directly)."""
    import duckdb
    from pyspark.sql import functions as F

    from engine.registry import collect

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    parts = [base] + [
        base.withColumn("vec_id", F.col("vec_id") + i * 1_000_000) for i in (1, 2)
    ]
    dup = parts[0]
    for p in parts[1:]:
        dup = dup.unionByName(p)
    dup.coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))

    queries, oracles = collect()
    res = queries["dedup_semdedup"].__wrapped__(spark, str(tmp_path)).collect()
    got = {
        r["dropped_vec_id"]: (r["keeper_vec_id"], r["n_suppressors"]) for r in res
    }

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet/*.parquet'"
    )
    want = {
        int(b): (int(k), int(n))
        for b, k, n in con.sql(oracles["dedup_semdedup"]).fetchall()
    }
    assert len(got) > 0 and got == want, (
        f"collapse path diverged: {len(got)} vs {len(want)} rows; "
        f"sample got={dict(list(got.items())[:3])} want={dict(list(want.items())[:3])}"
    )


def test_ngram_jaccard_exact_dup_collapse(spark, tmp_path):
    """r11 clone-floor fix, lexical edition: on a corpus with duplicate
    TEXTS dedup_ngram_jaccard must route through the collapse prestage
    (kernel over distinct texts + member expansion, intra pairs at
    jaccard 1.0) and equal the registered DuckDB oracle run on the same
    clone corpus — which executes the member-level Σ_g f_g² join
    directly. Jaccard is rounded to 4dp on both sides; pair ids are
    integers, so the bar is exact equality."""
    import duckdb
    from pyspark.sql import functions as F

    from engine.registry import collect

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    parts = [base] + [
        base.withColumn("doc_id", F.col("doc_id") + i * 1_000_000) for i in (1, 2)
    ]
    dup = parts[0]
    for p in parts[1:]:
        dup = dup.unionByName(p)
    dup.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    queries, oracles = collect()
    res = queries["dedup_ngram_jaccard"].__wrapped__(spark, str(tmp_path)).collect()
    got = sorted((r["a_id"], r["b_id"], r["jaccard"]) for r in res)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = sorted(
        (int(a), int(b), float(j))
        for a, b, j in con.sql(oracles["dedup_ngram_jaccard"]).fetchall()
    )
    assert len(got) > 0 and got == want, (
        f"collapse path diverged: {len(got)} vs {len(want)} rows; "
        f"got[:3]={got[:3]} want[:3]={want[:3]}"
    )


def test_kmeans_lloyd_exact_dup_collapse(spark, tmp_path):
    """emb_kmeans_lloyd's r11 collapse (dedup_semdedup's machinery): on a
    clone corpus the per-cluster counts and inertia from the rep-level
    weighted path must equal the registered DuckDB oracle run on the
    same corpus (full member-level Lloyd step)."""
    import duckdb
    from pyspark.sql import functions as F

    from engine.registry import collect

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dup = base.unionByName(
        base.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    ).unionByName(base.withColumn("vec_id", F.col("vec_id") + 2_000_000))
    dup.coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))

    queries, oracles = collect()
    res = queries["emb_kmeans_lloyd"].__wrapped__(spark, str(tmp_path)).collect()
    got = {r["cluster_id"]: (r["n_members"], round(r["inertia"], 2)) for r in res}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet/*.parquet'"
    )
    want = {
        int(c): (int(n), round(float(i), 2))
        for c, n, i in con.sql(oracles["emb_kmeans_lloyd"]).fetchall()
    }
    assert len(got) > 0 and got == want, f"{got} vs {want}"


def _write_mixed_dup_embeddings(spark, out_dir, shape):
    """Write a MOSTLY-SINGLETON embeddings corpus (ADVICE r11): unlike the
    uniform 3x clone corpora above, only a handful of rows are duplicated,
    so the collapse path's weighted centroid update mixes w=1 groups with
    skewed dup groups — the regime where sum(v*w)/sum(w) vs member-wise
    FP summation order could diverge before the shared round-to-8dp.

    shape "one_group": vec_id 200 duplicated twice (one group of 3).
    shape "skewed":    seed vec_id 3 duplicated 4x (group of 5, a seed
                       position) and vec_id 150 duplicated once (group
                       of 2) — skewed multiplicities including a dup'd
                       SEED, whose empty-duplicate position must survive
                       the update."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    extras = {"one_group": [(200, 2)], "skewed": [(3, 4), (150, 1)]}[shape]
    dup = base
    off = 1_000_000
    for vid, copies in extras:
        for c in range(copies):
            dup = dup.unionByName(
                base.filter(F.col("vec_id") == vid).withColumn(
                    "vec_id", F.col("vec_id") + (off := off + 1_000_000)
                )
            )
    dup.coalesce(1).write.parquet(str(out_dir / "embeddings.parquet"))


@pytest.mark.parametrize("shape", ["one_group", "skewed"])
def test_kmeans_lloyd_mixed_multiplicity_collapse(spark, tmp_path, shape):
    """ADVICE r11 (graphops.py:451): the uniform clone tests hold w
    constant, so they can't catch a weighted-update divergence. Pin
    oracle equality on mostly-singleton corpora with one dup group and
    with skewed group sizes (including a duplicated seed)."""
    import duckdb

    from engine.registry import collect

    _write_mixed_dup_embeddings(spark, tmp_path, shape)
    queries, oracles = collect()
    res = queries["emb_kmeans_lloyd"].__wrapped__(spark, str(tmp_path)).collect()
    got = {r["cluster_id"]: (r["n_members"], round(r["inertia"], 2)) for r in res}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet/*.parquet'"
    )
    want = {
        int(c): (int(n), round(float(i), 2))
        for c, n, i in con.sql(oracles["emb_kmeans_lloyd"]).fetchall()
    }
    assert len(got) > 0 and got == want, f"{shape}: {got} vs {want}"


@pytest.mark.parametrize("shape", ["one_group", "skewed"])
def test_semdedup_mixed_multiplicity_collapse(spark, tmp_path, shape):
    """ADVICE r11 (graphops.py:451), semdedup edition: a single duplicate
    flips the whole corpus onto the collapse path, so its output on a
    nearly-dup-free corpus must still equal the member-level oracle —
    keeper ids and suppressor counts are integers, so exact equality."""
    import duckdb

    from engine.registry import collect

    _write_mixed_dup_embeddings(spark, tmp_path, shape)
    queries, oracles = collect()
    res = queries["dedup_semdedup"].__wrapped__(spark, str(tmp_path)).collect()
    got = {
        r["dropped_vec_id"]: (r["keeper_vec_id"], r["n_suppressors"]) for r in res
    }

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet/*.parquet'"
    )
    want = {
        int(b): (int(k), int(n))
        for b, k, n in con.sql(oracles["dedup_semdedup"]).fetchall()
    }
    assert len(got) > 0 and got == want, (
        f"{shape}: {len(got)} vs {len(want)} rows; "
        f"sample got={dict(list(got.items())[:3])} want={dict(list(want.items())[:3])}"
    )


def test_ngram_jaccard_subset_dup_collapse(spark, tmp_path):
    """ADVICE r11 (textops.py): the uniform clone test duplicates every
    row, so w=1 groups (skipping the intra branch) and gramless dup
    groups (the n>0 guard) never occur. Duplicate only doc_ids 0-4
    (groups of 2, everything else singleton) and inject a duplicated
    EMPTY text plus a duplicated 2-word text (zero word-3-grams): both
    gramless groups must emit NO intra pair — matching the oracle's
    NULL 0/0 exclusion — while the five real dup groups emit jaccard
    1.0 intra pairs and singleton near-dups are unchanged."""
    import duckdb
    from pyspark.sql import functions as F

    from engine.registry import collect

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pieces = [base]
    # groups of 2 for doc_ids 0..4 (subset duplication, mostly singleton)
    pieces.append(
        base.filter(F.col("doc_id") < 5).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
    )
    # a duplicated empty text and a duplicated sub-n-gram text: take two
    # existing rows, rewrite text, and emit each under two fresh ids
    for txt, ids in (("", (2_000_000, 2_000_001)), ("two words", (3_000_000, 3_000_001))):
        donor = base.filter(F.col("doc_id") == 10).withColumn("text", F.lit(txt))
        for i in ids:
            pieces.append(donor.withColumn("doc_id", F.lit(i).cast("long")))
    dup = pieces[0]
    for p in pieces[1:]:
        dup = dup.unionByName(p)
    dup.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    queries, oracles = collect()
    res = queries["dedup_ngram_jaccard"].__wrapped__(spark, str(tmp_path)).collect()
    got = sorted((r["a_id"], r["b_id"], r["jaccard"]) for r in res)

    # gramless dup groups must not self-pair
    for a, b, _ in got:
        assert not (a == 2_000_000 and b == 2_000_001), "empty-text intra pair"
        assert not (a == 3_000_000 and b == 3_000_001), "sub-ngram intra pair"
    # the real dup groups must self-pair at 1.0
    for d in range(5):
        assert (d, d + 1_000_000, 1.0) in got, f"missing intra pair for doc {d}"

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = sorted(
        (int(a), int(b), float(j))
        for a, b, j in con.sql(oracles["dedup_ngram_jaccard"]).fetchall()
    )
    assert len(got) > 0 and got == want, (
        f"subset-dup collapse diverged: {len(got)} vs {len(want)} rows; "
        f"got[:3]={got[:3]} want[:3]={want[:3]}"
    )


@pytest.mark.parametrize(
    "key", ["text_ngram_freq", "text_fingerprint", "dedup_minhash_signature"]
)
def test_short_text_oracle_parity(spark, tmp_path, key):
    """r12 short-text fix: sequence(1, greatest(..., 0)) yields [1, 0]
    (step -1) for sub-n docs — crashing slice()/element_at() or hashing
    phantom windows the oracle's empty range() never produces. Pin oracle
    equality on a corpus containing empty, 1-word, 2-word, and 7-char
    docs (all below the respective n-gram/window thresholds)."""
    import duckdb
    from pyspark.sql import functions as F

    from engine.registry import collect

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    donor = base.filter(F.col("doc_id") == 10)
    pieces = [base]
    for txt, i in (("", 0), ("word", 1), ("two words", 2), ("7chars", 3)):
        pieces.append(
            donor.withColumn("text", F.lit(txt)).withColumn(
                "doc_id", F.lit(9_000_000 + i).cast("long")
            )
        )
    dup = pieces[0]
    for p in pieces[1:]:
        dup = dup.unionByName(p)
    dup.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    queries, oracles = collect()
    res = queries[key].__wrapped__(spark, str(tmp_path)).collect()
    cols = res[0].asDict().keys() if res else []
    got = sorted(tuple(r[c] for c in sorted(cols)) for r in res)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    cur = con.sql(oracles[key])
    names = sorted(cur.columns)
    idx = [cur.columns.index(n) for n in names]
    want = sorted(tuple(row[i] for i in idx) for row in cur.fetchall())
    assert len(got) > 0 and got == want, (
        f"{key}: {len(got)} vs {len(want)} rows; got[:2]={got[:2]} want[:2]={want[:2]}"
    )
