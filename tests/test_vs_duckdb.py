"""Per-operator Spark-vs-DuckDB oracle checks at sf0.001 — the fast inner
loop mirroring the driver's t2 gate (which runs at sf0.01)."""

from __future__ import annotations

import pytest

from engine.registry import collect
from tests.conftest import run_compare

QUERIES, ORACLES = collect()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_match(spark, duck, key):
    run_compare(spark, duck, key)


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, key):
    """ROWS-only keys (no SQL-expressible oracle): must run and be stable."""
    from tests.conftest import SF_DIR

    df = QUERIES[key](spark, SF_DIR)
    n1 = df.count()
    assert n1 >= 0
