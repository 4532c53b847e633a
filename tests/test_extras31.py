"""Named tests for engine/extras31.py: path construction fidelity and
vector-hash dedup accounting."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_top_paths_match_python_recompute(spark):
    from engine.tables import load

    rows = _q("agg_top_paths")(spark, SF_DIR).collect()
    assert rows
    ev = load(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    counts: dict[str, int] = {}
    for es in by_user.values():
        es.sort(key=lambda e: (e["ts"], e["event_id"]))
        path = ">".join(e["event_type"] for e in es[:5])
        counts[path] = counts.get(path, 0) + 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["path"], r["n_users"]) for r in sorted(rows, key=lambda r: r["rnk"])]
    assert got == expect
    assert all(r["path"].count(">") <= 4 for r in rows)


def test_exact_embedding_dedup_accounting(spark):
    from engine.tables import load

    row = _q("dedup_exact_embedding")(spark, SF_DIR).collect()[0]
    n = load(spark, SF_DIR, "embeddings").count()
    assert row["n_vectors"] == n
    assert row["n_distinct"] + row["n_removable"] == n
    assert row["n_dup_groups"] <= row["n_removable"]
    assert row["n_distinct"] > 0
