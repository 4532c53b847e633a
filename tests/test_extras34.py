"""Named tests for engine/extras34.py: the isotropy identity vs a numpy
pairwise recompute, and Benford accounting."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name):
    from engine.registry import collect

    queries, _ = collect()
    return queries[name]


def test_isotropy_identity_matches_pairwise(spark):
    import numpy as np

    from engine.tables import load

    row = _q("emb_isotropy_audit")(spark, SF_DIR).collect()[0]
    mat = np.stack(
        [
            np.array(r["embedding"], dtype=np.float64)
            for r in load(spark, SF_DIR, "embeddings").collect()
        ]
    )
    n = len(mat)
    assert row["n_vectors"] == n
    sims = mat @ mat.T
    mean_pair = (sims.sum() - np.trace(sims)) / (n * (n - 1))
    assert abs(row["mean_pairwise_cos"] - round(float(mean_pair), 4)) <= 0.0001
    assert abs(row["mean_sq_norm"] - round(float(np.trace(sims) / n), 4)) <= 0.0001
    assert row["anisotropic"] == (mean_pair > 0.05)


def test_benford_accounting(spark):
    import math

    from engine.tables import load

    rows = {r["digit"]: r for r in _q("agg_benford_digit_audit")(spark, SF_DIR).collect()}
    assert set(rows) <= set(range(1, 10))
    total = sum(r["n"] for r in rows.values())
    assert total == load(spark, SF_DIR, "orders").count()
    assert abs(sum(r["observed_share"] for r in rows.values()) - 1.0) < 0.01
    for d, r in rows.items():
        assert r["benford_share"] == round(math.log10(1 + 1 / d), 4)
        assert (
            abs(r["abs_deviation"] - abs(r["observed_share"] - r["benford_share"]))
            <= 0.001
        )
    # synthetic order totals are NOT Benford-distributed — the audit
    # must show a material deviation somewhere
    assert max(r["abs_deviation"] for r in rows.values()) > 0.02
