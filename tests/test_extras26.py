"""Named tests for engine/extras26.py: transition-matrix stochasticity
and template render fidelity."""

from __future__ import annotations

import hashlib

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_markov_rows_are_stochastic(spark):
    from engine.tables import load

    rows = _q("agg_markov_transitions")(spark, SF_DIR).collect()
    assert rows
    by_from: dict[str, float] = {}
    total = 0
    for r in rows:
        assert 0.0 <= r["p"] <= 1.0
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["p"]
        total += r["n"]
    for ft, s in by_from.items():
        assert abs(s - 1.0) < 0.01, (ft, s)
    # total transitions == events - one per user (each user's last event
    # has no successor)
    e = load(spark, SF_DIR, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_chat_template_render_fidelity(spark):
    from engine.tables import load

    rows = {r["doc_id"]: r for r in _q("text_chat_template_render")(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").collect()
    assert len(rows) == len(docs)
    for d in docs[:30]:
        words = d["text"].split(" ")
        body = " ".join(words[:64]) if len(words) > 64 else d["text"]
        prompt = (
            "<|system|>You are a concise assistant.<|end|>"
            f"<|user|>Summarize the following {d['lang']} document from "
            f"{d['source']}.<|end|><|assistant|>{body}<|end|>"
        )
        r = rows[d["doc_id"]]
        assert r["prompt_md5"] == hashlib.md5(prompt.encode()).hexdigest()
        assert r["prompt_chars"] == len(prompt)
        assert r["truncated"] == (len(words) > 64)
        assert r["approx_tokens"] == min(len(words), 64) + 14
